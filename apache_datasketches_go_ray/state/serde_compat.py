"""Readers for the reference's cross-language sketch binary formats.

The reference pins its correctness to golden files produced by the Java
and C++ DataSketches implementations (serialization_test_data/) and
deserializes them in Go (frequencies/sketch_serialization_test.go:142-245,
kll/items_sletch_serialization_test.go:48-95).  We replicate that
methodology: these readers parse the *identical* wire formats so our
pytest suite can assert the same semantic invariants against the same
golden bytes.  They are read-side only — our distributed aggregates
checkpoint through Arrow/Parquet, not this format — but parsing the
reference wire format end-to-end proves our (stream-length, error-bound,
level/weight) bookkeeping matches the reference bit-for-bit where it
matters.

Wire formats implemented here (all little-endian):

* Frequencies LongsSketch   — frequencies/longs_sketch.go:488-536
* Frequencies ItemsSketch   — frequencies/items_sketch.go:397-444 with
  the 4-byte-length-prefixed UTF-8 string item codec of
  frequencies/items_sketch_test.go:43-66
* KLL ItemsSketch[string]   — kll/items_sketch.go:332-404,
  kll/items_sketch_validate.go:57-172, kll/preamble_utils.go:22-98,
  string codec kll/items_sketch_test.go:44-83
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_FAMILY_FREQUENCY = 10  # internal/family.go:36
_FAMILY_KLL = 15  # internal/family.go:40
_FREQ_EMPTY_FLAG_MASK = 5  # frequencies/preamble_utils.go:38 (C+Java bits)
_FREQ_SER_VER = 1

# kll/preamble_utils.go:43-47
_KLL_SER_VER_EMPTY_FULL = 1
_KLL_SER_VER_SINGLE = 2
_KLL_PRE_INTS_EMPTY_SINGLE = 2
_KLL_PRE_INTS_FULL = 5
_KLL_DATA_START = 20
_KLL_DATA_START_SINGLE = 8
_KLL_EMPTY_BIT = 1
_KLL_SINGLE_ITEM_BIT = 4

# 3^0..3^30 — kll/items_sketch.go:64
_POWERS_OF_THREE = [3 ** i for i in range(31)]


def _read_strings(buf: bytes, offset: int, count: int) -> tuple[list[str], int]:
    """4-byte LE length-prefixed UTF-8 strings, back to back
    (frequencies/items_sketch_test.go:66-83)."""
    out = []
    for _ in range(count):
        (n,) = struct.unpack_from("<I", buf, offset)
        offset += 4
        out.append(buf[offset:offset + n].decode("utf-8"))
        offset += n
    return out, offset


# ---------------------------------------------------------------------------
# Frequencies (LongsSketch + ItemsSketch[string])
# ---------------------------------------------------------------------------

@dataclass
class FreqSketchView:
    """Parsed reference frequent-items sketch (longs or string items)."""

    lg_max_map_size: int
    lg_cur_map_size: int
    stream_length: int
    offset: int  # global error offset; GetMaximumError() == offset
    counts: dict = field(default_factory=dict)  # item -> stored count (= LB)

    @property
    def is_empty(self) -> bool:
        return not self.counts and self.stream_length == 0

    def get_estimate(self, item) -> int:
        # count + offset, absent items probe to 0 (longs_sketch.go:293-300,
        # reverse_purge_long_hash_map.go:78-87)
        return self.counts.get(item, 0) + self.offset

    def get_lower_bound(self, item) -> int:
        return self.counts.get(item, 0)

    def get_upper_bound(self, item) -> int:
        return self.counts.get(item, 0) + self.offset

    def get_maximum_error(self) -> int:
        return self.offset


def _freq_preamble(buf: bytes):
    if len(buf) < 8:
        raise ValueError("frequencies sketch: preamble too small")
    pre_longs = buf[0] & 0x3F
    ser_ver = buf[1]
    family = buf[2]
    lg_max = buf[3]
    lg_cur = buf[4]
    flags = buf[5]
    if ser_ver != _FREQ_SER_VER:
        raise ValueError(f"frequencies sketch: bad serVer {ser_ver}")
    if family != _FAMILY_FREQUENCY:
        raise ValueError(f"not a frequencies sketch: family {family}")
    empty = (flags & _FREQ_EMPTY_FLAG_MASK) != 0
    return pre_longs, lg_max, lg_cur, empty


def read_frequencies_longs(buf: bytes) -> FreqSketchView:
    """Parse a LongsSketch.ToSlice() image
    (frequencies/longs_sketch.go:488-536): preamble long, then
    [activeItems, streamWeight, offset] longs, then values, then keys."""
    pre_longs, lg_max, lg_cur, empty = _freq_preamble(buf)
    view = FreqSketchView(lg_max, lg_cur, 0, 0)
    if empty:
        return view
    active, = struct.unpack_from("<q", buf, 8)
    active &= 0xFFFFFFFF
    view.stream_length, view.offset = struct.unpack_from("<qq", buf, 16)
    pre_bytes = pre_longs << 3
    values = struct.unpack_from(f"<{active}q", buf, pre_bytes)
    keys = struct.unpack_from(f"<{active}q", buf, pre_bytes + (active << 3))
    view.counts = dict(zip(keys, values))
    return view


def read_frequencies_items_string(buf: bytes) -> FreqSketchView:
    """Parse an ItemsSketch[string].ToSlice() image
    (frequencies/items_sketch.go:397-444): same preamble/counts as the
    longs form, but keys are serialized strings appended after values."""
    pre_longs, lg_max, lg_cur, empty = _freq_preamble(buf)
    view = FreqSketchView(lg_max, lg_cur, 0, 0)
    if empty:
        return view
    active, = struct.unpack_from("<q", buf, 8)
    active &= 0xFFFFFFFF
    view.stream_length, view.offset = struct.unpack_from("<qq", buf, 16)
    pre_bytes = pre_longs << 3
    values = struct.unpack_from(f"<{active}q", buf, pre_bytes)
    keys, _ = _read_strings(buf, pre_bytes + (active << 3), active)
    view.counts = dict(zip(keys, values))
    return view


# ---------------------------------------------------------------------------
# KLL ItemsSketch[string]
# ---------------------------------------------------------------------------

def _kll_level_capacity(k: int, num_levels: int, level: int, m: int) -> int:
    # kll/items_sketch.go:839-862
    depth = num_levels - level - 1

    def aux_aux(kk: int, d: int) -> int:
        tmp = ((kk * 2) << d) // _POWERS_OF_THREE[d]
        result = (tmp + 1) >> 1
        return result if result <= kk else kk

    if depth <= 30:
        return max(m, aux_aux(k, depth))
    half = depth // 2
    return max(m, aux_aux(aux_aux(k, half), depth - half))


@dataclass
class KllStringSketchView:
    """Parsed reference KLL items sketch over fixed-width strings."""

    k: int
    m: int
    n: int
    min_k: int
    num_levels: int
    levels: list  # num_levels+1 entries, absolute indices into items[]
    items: list  # retained items, items[levels[0]:levels[num_levels]]
    min_item: str | None
    max_item: str | None
    level0_sorted: bool

    @property
    def is_empty(self) -> bool:
        return self.n == 0

    @property
    def is_estimation_mode(self) -> bool:
        return self.num_levels > 1  # kll/items_sketch.go (n exceeded k)

    def iter_weighted(self):
        """(item, weight=2^level) pairs, mirroring
        kll/items_sketch_iterator.go:43-77."""
        base = self.levels[0]
        for lvl in range(self.num_levels):
            for idx in range(self.levels[lvl], self.levels[lvl + 1]):
                yield self.items[idx - base], 1 << lvl

    def total_weight(self) -> int:
        return sum(w for _, w in self.iter_weighted())

    def get_rank(self, item: str, inclusive: bool = True) -> float:
        if self.n == 0:
            raise ValueError("empty sketch")
        pairs = sorted(self.iter_weighted(), key=lambda p: p[0])
        acc = 0
        for q, w in pairs:
            if (q <= item) if inclusive else (q < item):
                acc += w
            else:
                break
        return acc / self.n


def read_kll_string(buf: bytes) -> KllStringSketchView:
    """Parse ItemsSketch[string].ToSlice() (kll/items_sketch.go:332-404)
    in all three compact structures, reconstructing the implied top
    levels entry the way kll/items_sketch_validate.go:108-120 does."""
    if len(buf) < 8:
        raise ValueError("kll sketch: preamble too small")
    pre_ints, ser_ver, family, flags = buf[0], buf[1], buf[2], buf[3]
    if family != _FAMILY_KLL:
        raise ValueError(f"not a KLL sketch: family {family}")
    k, = struct.unpack_from("<H", buf, 4)
    m = buf[6]
    empty = bool(flags & _KLL_EMPTY_BIT)
    level0_sorted = bool(flags & 2)

    if pre_ints == _KLL_PRE_INTS_EMPTY_SINGLE and ser_ver == _KLL_SER_VER_EMPTY_FULL:
        if not empty:
            raise ValueError("compact-empty without empty flag")
        return KllStringSketchView(k, m, 0, k, 1, [k, k], [], None, None,
                                   level0_sorted)

    if pre_ints == _KLL_PRE_INTS_EMPTY_SINGLE and ser_ver == _KLL_SER_VER_SINGLE:
        (item,), _ = _read_strings(buf, _KLL_DATA_START_SINGLE, 1)
        return KllStringSketchView(k, m, 1, k, 1, [k - 1, k], [item],
                                   item, item, level0_sorted)

    if pre_ints != _KLL_PRE_INTS_FULL or ser_ver != _KLL_SER_VER_EMPTY_FULL:
        raise ValueError(
            f"unsupported KLL structure preInts={pre_ints} serVer={ser_ver}")

    n, = struct.unpack_from("<Q", buf, 8)
    min_k, = struct.unpack_from("<H", buf, 16)
    num_levels = buf[18]
    levels = list(struct.unpack_from(f"<{num_levels}I", buf, _KLL_DATA_START))
    capacity = sum(_kll_level_capacity(k, num_levels, lvl, m)
                   for lvl in range(num_levels))
    levels.append(capacity)
    off = _KLL_DATA_START + num_levels * 4
    (min_item, max_item), off = _read_strings(buf, off, 2)
    retained = levels[num_levels] - levels[0]
    items, _ = _read_strings(buf, off, retained)
    return KllStringSketchView(k, m, n, min_k, num_levels, levels, items,
                               min_item, max_item, level0_sorted)


def int_to_fixed_length_string(number: int, length: int) -> str:
    """kll/utils.go:101-104 — right-justified, space-padded."""
    return str(number).rjust(length)


def num_digits(n: int) -> int:
    """kll/utils.go:93-99."""
    import math
    if n % 10 == 0:
        n += 1
    return int(math.ceil(math.log(n) / math.log(10))) if n > 0 else 0


# ---------------------------------------------------------------------------
# HLL sketch (compact or updatable; LIST / SET / HLL modes; HLL_4/6/8)
# ---------------------------------------------------------------------------

# hll/preamble_utils.go:27-90
_HLL_FAMILY = 7
_HLL_SER_VER = 1
_HLL_LIST_INT_ARR_START = 8
_HLL_HASH_SET_INT_ARR_START = 12
_HLL_BYTE_ARR_START = 40
_HLL_EMPTY_MASK = 4
_HLL_COMPACT_MASK = 8
_HLL_OOO_MASK = 16
_HLL_REBUILD_MASK = 32
_HLL_AUX_TOKEN = 15  # hll/utils.go:44


def _hll6_unpack(arr, k):
    """get6Bit: startBit = slot*6; LE-short >> (startBit&7) & 0x3F
    (hll/hll_6array.go:127-132)."""
    import numpy as np
    a = np.frombuffer(bytes(arr) + b"\x00", dtype=np.uint8).astype(np.uint16)
    slots = np.arange(k)
    start = slots * 6
    byte_idx = start >> 3
    shift = (start & 7).astype(np.uint16)
    return ((a[byte_idx] | (a[byte_idx + 1] << 8)) >> shift) & 0x3F


def read_hll(buf: bytes):
    """Parse the reference HLL wire format into our ``HllSketch``.

    Dispatch mirrors NewHllSketchFromSlice (hll/hll_sketch.go:188-232):
    mode byte selects LIST/SET (coupon replay — identical promote
    thresholds reproduce the identical end state) or HLL, where the
    serialized registers land directly in our uint8 register array.
    HLL_4 nibbles rebase on curMin with auxToken exceptions resolved
    from the aux map (hll/hll_4array.go:29-40, aux_hash_map.go:60-95);
    HLL_6 unpacks 6-bit fields; HLL_8 is byte-per-slot.  Estimator
    state (hipAccum, kxq0/1, curMin, numAtCurMin, flags) is taken from
    the preamble so GetEstimate reproduces the reference exactly.
    """
    import numpy as np

    from .hll import MODE_HLL, HllSketch

    if len(buf) < 8:
        raise ValueError("HLL preamble truncated")
    pre_ints = buf[0] & 0x3F
    ser_ver = buf[1]
    family = buf[2]
    if family != _HLL_FAMILY or ser_ver != _HLL_SER_VER:
        raise ValueError(f"not an HLL sketch: family={family} ser={ser_ver}")
    lg_k = buf[3]
    lg_arr = buf[4]
    flags = buf[5]
    cur_mode = buf[7] & 3
    compact = bool(flags & _HLL_COMPACT_MASK)

    sk = HllSketch(lg_k)
    if flags & _HLL_EMPTY_MASK:
        return sk

    if cur_mode in (0, 1):  # LIST / SET: replay coupons
        if cur_mode == 0:
            start, count = _HLL_LIST_INT_ARR_START, buf[6]
        else:
            start = _HLL_HASH_SET_INT_ARR_START
            (count,) = struct.unpack_from("<I", buf, 8)
        n_ints = count if compact else (1 << lg_arr)
        coupons = np.frombuffer(buf, dtype="<u4", count=n_ints, offset=start)
        for c in coupons[coupons != 0]:
            sk.coupon_update(int(c))
        return sk

    # HLL mode — hll/hll_array.go preamble + register payload
    del pre_ints  # 10 ints; payload position is fixed by the constants
    (hip,) = struct.unpack_from("<d", buf, 8)
    (kxq0,) = struct.unpack_from("<d", buf, 16)
    (kxq1,) = struct.unpack_from("<d", buf, 24)
    cur_min = buf[6]
    (num_at_cur_min,) = struct.unpack_from("<I", buf, 32)
    (aux_count,) = struct.unpack_from("<I", buf, 36)
    tgt = (buf[7] >> 2) & 3  # 0=HLL_4, 1=HLL_6, 2=HLL_8
    k = 1 << lg_k

    if tgt == 2:
        n_bytes = k
        regs = np.frombuffer(buf, dtype=np.uint8, count=k,
                             offset=_HLL_BYTE_ARR_START).copy()
    elif tgt == 1:
        n_bytes = ((k * 3) >> 2) + 1  # hll/hll_6array.go:36-39
        regs = _hll6_unpack(
            buf[_HLL_BYTE_ARR_START:_HLL_BYTE_ARR_START + n_bytes],
            k).astype(np.uint8)
    else:
        n_bytes = k >> 1
        nib = np.frombuffer(buf, dtype=np.uint8, count=n_bytes,
                            offset=_HLL_BYTE_ARR_START)
        regs = np.empty(k, dtype=np.uint8)
        regs[0::2] = nib & 0x0F
        regs[1::2] = nib >> 4
        is_aux = regs == _HLL_AUX_TOKEN
        regs = np.where(is_aux, 0, regs + cur_min).astype(np.uint8)
        aux_off = _HLL_BYTE_ARR_START + n_bytes
        n_aux_ints = aux_count if compact else (1 << lg_arr)
        pairs = np.frombuffer(buf, dtype="<u4", count=n_aux_ints,
                              offset=aux_off)
        pairs = pairs[pairs != 0]
        slots = (pairs & ((1 << 26) - 1)) & (k - 1)
        regs[slots] = (pairs >> 26).astype(np.uint8)
        if np.count_nonzero(is_aux) != len(pairs):
            raise ValueError("HLL4 aux map inconsistent with nibble tokens")

    sk.mode = MODE_HLL
    sk.coupons = set()
    sk.registers = regs
    sk.cur_min = cur_min
    sk.num_at_cur_min = int(num_at_cur_min)
    sk.hip_accum = hip
    sk.kxq0 = kxq0
    sk.kxq1 = kxq1
    sk.ooo = bool(flags & _HLL_OOO_MASK)
    sk.rebuild_flag = bool(flags & _HLL_REBUILD_MASK)
    if sk.rebuild_flag:
        sk._rebuild_kxq()
    return sk
