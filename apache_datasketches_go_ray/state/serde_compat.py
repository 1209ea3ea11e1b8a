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
    sk.coupons = {}
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


# ---------------------------------------------------------------------------
# HLL sketch writer (bit-exact vs the reference wire format)
# ---------------------------------------------------------------------------

_HLL_KEY_MASK_26 = (1 << 26) - 1
# hll/utils.go:99-105 — Log2 aux table sizes indexed by lgK
_HLL_LG_AUX_ARR_INTS = [0, 2, 2, 2, 2, 2, 2, 3, 3, 3,
                        4, 4, 5, 5, 6, 7, 8, 9, 10, 11,
                        12, 13, 14, 15, 16, 17, 18]


def _set_probe(arr, lg_arr: int, coupon: int) -> int:
    """findCoupon (hll/coupon_hash_set.go:176-192): start at
    coupon & mask, stride = ((coupon & keyMask26) >> lgArr) | 1.
    Returns ~index for an empty slot, index for a duplicate."""
    mask = (1 << lg_arr) - 1
    probe = coupon & mask
    loop = probe
    while True:
        v = arr[probe]
        if v == 0:
            return ~probe
        if v == coupon:
            return probe
        probe = (probe + (((coupon & _HLL_KEY_MASK_26) >> lg_arr) | 1)) & mask
        if probe == loop:
            raise ValueError("coupon hash set full")


def _build_set_table(coupons, lg_k: int):
    """Reproduce the reference's open-addressed coupon table layout for a
    SET-mode sketch: insert in arrival order from lgArr=5, grow x2 at 3/4
    load reinserting in slot-scan order (coupon_hash_set.go:63-144).
    The compact image serializes this table in slot order, so layout IS
    the wire format."""
    lg_arr = 5  # lgInitSetSize, hll/utils.go:30
    arr = [0] * (1 << lg_arr)
    count = 0
    for c in coupons:
        idx = _set_probe(arr, lg_arr, c)
        if idx >= 0:
            continue
        arr[~idx] = c
        count += 1
        if 4 * count > 3 * (1 << lg_arr):  # resizeDenom/resizeNumber
            lg_arr += 1
            old = arr
            arr = [0] * (1 << lg_arr)
            for v in old:  # growHashSet: slot-scan reinsert
                if v:
                    arr[~_set_probe(arr, lg_arr, v)] = v
    return arr, lg_arr, count


def _aux_probe(arr, lg_aux: int, lg_k: int, slot_no: int) -> int:
    """findAuxHashMap (hll/aux_hash_map.go:197-218): key is the slot
    number in the low lgK bits of each stored pair."""
    mask = (1 << lg_aux) - 1
    k_mask = (1 << lg_k) - 1
    probe = slot_no & mask
    loop = probe
    while True:
        v = arr[probe]
        if v == 0:
            return ~probe
        if slot_no == (v & k_mask):
            return probe
        probe = (probe + ((slot_no >> lg_aux) | 1)) & mask
        if probe == loop:
            raise ValueError("aux map full")


def _build_aux_table(pairs, lg_k: int):
    """auxHashMap layout: insert (slot | value<<lgK) pairs in ascending
    slot order, grow x2 at 3/4 load with slot-scan reinsert
    (aux_hash_map.go:60-95,165-189). Ascending slot order matches the
    order HLL4 discovers exceptions for a monotone register build; with
    no collisions (every golden file here) layout is order-independent
    anyway."""
    lg_aux = _HLL_LG_AUX_ARR_INTS[lg_k]
    arr = [0] * (1 << lg_aux)
    count = 0
    for p in pairs:
        idx = _aux_probe(arr, lg_aux, lg_k, p & ((1 << lg_k) - 1))
        if idx >= 0:
            raise ValueError("duplicate aux slot")
        arr[~idx] = p
        count += 1
        if 4 * count > 3 * (1 << lg_aux):
            lg_aux += 1
            old = arr
            arr = [0] * (1 << lg_aux)
            for v in old:
                if v:
                    arr[~_aux_probe(arr, lg_aux, lg_k,
                                    v & ((1 << lg_k) - 1))] = v
    return arr, lg_aux, count


def _hll6_pack(regs) -> bytes:
    """put6Bit inverse of _hll6_unpack (hll/hll_6array.go:110-125)."""
    import numpy as np

    k = len(regs)
    n_bytes = ((k * 3) >> 2) + 1
    out = np.zeros(n_bytes + 1, dtype=np.uint16)
    for slot in range(k):
        start = slot * 6
        bi, sh = start >> 3, start & 7
        merged = (int(out[bi]) | (int(out[bi + 1]) << 8)) | \
            (int(regs[slot]) << sh)
        out[bi] = merged & 0xFF
        out[bi + 1] = (merged >> 8) & 0xFF
    return out[:n_bytes].astype(np.uint8).tobytes()


def write_hll(sk, tgt: int = 8, compact: bool = True,
              compact_flag: bool | None = None) -> bytes:
    """Serialize ``HllSketch`` to the reference wire format, bit-exact.

    Layout per to_slice_impl.go:25-168 / preamble_utils.go:27-290:
    LIST (8-byte preamble + coupons in arrival order), SET (12-byte
    preamble + open-addressed table image), HLL (40-byte preamble +
    register payload).  ``tgt`` picks the HLL payload encoding: 8
    (byte/slot), 6 (6-bit packed), 4 (nibbles rebased on curMin with
    aux-map exceptions).  Mirrors the Java writer's convention that
    HLL_6/HLL_8 register images are always in updatable form (compact
    flag clear), while HLL_4 and coupon modes honor ``compact``
    (observed in every golden file; Java ToByteArrayImpl).  The C++
    library instead sets the compact flag on HLL_6/8 images too; pass
    ``compact_flag=True`` to reproduce its bytes.  The HLL_4 image
    derives curMin = min(registers) and numAtCurMin from the register
    array — the end state of Java's lazy shiftToBiggerCurMin rebase
    (hll/hll_4update.go:25-225) — since our single uint8 representation
    follows HLL_8 bookkeeping (curMin pinned at 0).
    ``read_hll(write_hll(sk)) == sk`` for all modes.
    """
    import numpy as np

    from .hll import MODE_HLL, MODE_LIST

    tgt_code = {4: 0, 6: 1, 8: 2}[tgt]

    if sk.mode != MODE_HLL:
        coupons = list(sk.coupons)
        is_list = sk.mode == MODE_LIST
        if is_list:
            pre_ints, start, lg_arr = 2, _HLL_LIST_INT_ARR_START, 3
            arr = coupons + [0] * ((1 << lg_arr) - len(coupons))
            count = len(coupons)
        else:
            pre_ints, start = 3, _HLL_HASH_SET_INT_ARR_START
            arr, lg_arr, count = _build_set_table(coupons, sk.lg_k)
        flags = (_HLL_COMPACT_MASK if compact else 0) | \
            (_HLL_EMPTY_MASK if not coupons else 0) | \
            (_HLL_OOO_MASK if sk.ooo else 0)
        payload = [c for c in arr if c] if compact else arr
        if is_list and compact:
            payload = coupons  # arrival order, not table order
        buf = bytearray(start + 4 * len(payload))
        buf[0] = pre_ints
        buf[1] = _HLL_SER_VER
        buf[2] = _HLL_FAMILY
        buf[3] = sk.lg_k
        buf[4] = lg_arr
        buf[5] = flags
        buf[7] = sk.mode | (tgt_code << 2)
        if is_list:
            buf[6] = count
        else:
            struct.pack_into("<I", buf, 8, count)
        for i, c in enumerate(payload):
            struct.pack_into("<I", buf, start + 4 * i, c)
        return bytes(buf)

    # HLL mode
    regs = np.asarray(sk.registers, dtype=np.uint8)
    k = 1 << sk.lg_k
    aux_arr: list = []
    lg_arr_byte = 0
    aux_count = 0
    cur_min = sk.cur_min
    num_at_cur_min = sk.num_at_cur_min
    if tgt == 8:
        payload = regs.tobytes()
        compact = False  # Java: HLL_8 image is always updatable-form
    elif tgt == 6:
        payload = _hll6_pack(regs)
        compact = False
    else:
        cur_min = int(regs.min()) if k else 0
        num_at_cur_min = int(np.count_nonzero(regs == cur_min))
        nib = np.minimum(regs.astype(np.int64) - cur_min, 15)
        # pair = (value << 26) | slot (hll/utils.go:117-118)
        pairs = [(int(s) | (int(regs[s]) << 26))
                 for s in np.flatnonzero(nib == 15)
                 if regs[s] - cur_min >= 15]
        nib = nib.astype(np.uint8)
        payload = (nib[0::2] | (nib[1::2] << 4)).tobytes()
        if pairs:
            aux_arr, lg_aux, aux_count = _build_aux_table(pairs, sk.lg_k)
            lg_arr_byte = lg_aux
            if compact:
                aux_arr = [p for p in aux_arr if p]
        elif not compact:
            lg_arr_byte = _HLL_LG_AUX_ARR_INTS[sk.lg_k]
            aux_arr = [0] * (1 << lg_arr_byte)

    buf = bytearray(_HLL_BYTE_ARR_START + len(payload) + 4 * len(aux_arr))
    buf[0] = 10  # preInts for HLL mode
    buf[1] = _HLL_SER_VER
    buf[2] = _HLL_FAMILY
    buf[3] = sk.lg_k
    buf[4] = lg_arr_byte
    flag_bit = compact if compact_flag is None else compact_flag
    buf[5] = (_HLL_COMPACT_MASK if flag_bit else 0) | \
        (_HLL_OOO_MASK if sk.ooo else 0) | \
        (_HLL_REBUILD_MASK if getattr(sk, "rebuild_flag", False) else 0)
    buf[6] = cur_min
    buf[7] = MODE_HLL | (tgt_code << 2)
    struct.pack_into("<d", buf, 8, sk.hip_accum)
    struct.pack_into("<d", buf, 16, sk.kxq0)
    struct.pack_into("<d", buf, 24, sk.kxq1)
    struct.pack_into("<I", buf, 32, num_at_cur_min)
    struct.pack_into("<I", buf, 36, aux_count)
    buf[_HLL_BYTE_ARR_START:_HLL_BYTE_ARR_START + len(payload)] = payload
    for i, p in enumerate(aux_arr):
        struct.pack_into("<I", buf,
                         _HLL_BYTE_ARR_START + len(payload) + 4 * i, p)
    return bytes(buf)


# ---------------------------------------------------------------------------
# Write-side: frequencies (LongsSketch + ItemsSketch[string])
#
# Byte-exact emission parity with the reference's ToSlice() images requires
# reproducing the reverse-purge hash map's physical table layout, because
# serialization walks the table in slot order
# (frequencies/longs_sketch.go:488-536 via getActiveKeys/getActiveValues,
# reverse_purge_long_hash_map.go:308-332).  So this is a faithful scalar
# replica of the open-addressed map: linear probe with drift states
# (reverse_purge_long_hash_map.go:102-130), x2 growth to lgMaxMapSize
# (longs_sketch.go:424-434), purge = subtract median of the first
# sampleSize active values in slot order then back-shift-delete
# non-positive entries cluster-by-cluster
# (reverse_purge_long_hash_map.go:151-168,190-243).
# ---------------------------------------------------------------------------

_FREQ_LG_MIN_MAP_SIZE = 3  # frequencies/utils.go:28
_FREQ_SAMPLE_SIZE = 1024  # frequencies/utils.go:33
_FREQ_LOAD_FACTOR = 0.75
_FREQ_MAX_PRE_LONGS = 4  # internal/family.go:36


def _freq_hash_fn(key: int) -> int:
    """murmur3 64-bit finalizer used for longs probing
    (frequencies/utils.go:57-68)."""
    key &= 0xFFFFFFFFFFFFFFFF
    key ^= key >> 33
    key = (key * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    key ^= key >> 33
    key = (key * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    key ^= key >> 33
    return key


class _ReversePurgeHashMap:
    """Layout-faithful replica of reversePurgeLongHashMap /
    reversePurgeItemHashMap.  `probe_hash(key)` supplies the initial slot
    hash (finalizer for longs, murmur3-64 for items)."""

    def __init__(self, map_size: int, probe_hash):
        self.lg_length = map_size.bit_length() - 1
        self.load_threshold = int(map_size * _FREQ_LOAD_FACTOR)
        self.keys = [None] * map_size
        self.values = [0] * map_size
        self.states = [0] * map_size
        self.num_active = 0
        self._probe_hash = probe_hash

    def __len__(self):
        return len(self.keys)

    def adjust_or_put(self, key, amount: int) -> None:
        mask = len(self.keys) - 1
        probe = self._probe_hash(key) & mask
        drift = 1
        while self.states[probe] != 0 and self.keys[probe] != key:
            probe = (probe + 1) & mask
            drift += 1
        if self.states[probe] == 0:
            self.keys[probe] = key
            self.values[probe] = amount
            self.states[probe] = drift
            self.num_active += 1
        else:
            self.values[probe] += amount

    def resize(self, new_size: int) -> None:
        old = list(zip(self.keys, self.values, self.states))
        self.keys = [None] * new_size
        self.values = [0] * new_size
        self.states = [0] * new_size
        self.load_threshold = int(new_size * _FREQ_LOAD_FACTOR)
        self.lg_length = new_size.bit_length() - 1
        self.num_active = 0
        for k, v, st in old:
            if st > 0:
                self.adjust_or_put(k, v)

    def purge(self, sample_size: int) -> int:
        limit = min(sample_size, self.num_active)
        samples = []
        i = 0
        while len(samples) < limit:
            if self.states[i] > 0:
                samples.append(self.values[i])
            i += 1
        val = sorted(samples)[limit // 2]  # QuickSelect pivot limit/2
        for j in range(len(self.values)):
            self.values[j] -= val
        self._keep_only_positive()
        return val

    def _hash_delete(self, delete_probe: int) -> None:
        self.states[delete_probe] = 0
        drift = 1
        mask = len(self.keys) - 1
        probe = (delete_probe + drift) & mask
        while self.states[probe] != 0:
            if self.states[probe] > drift:
                self.keys[delete_probe] = self.keys[probe]
                self.values[delete_probe] = self.values[probe]
                self.states[delete_probe] = self.states[probe] - drift
                self.states[probe] = 0
                drift = 0
                delete_probe = probe
            probe = (probe + 1) & mask
            drift += 1

    def _keep_only_positive(self) -> None:
        first_probe = len(self.states) - 1
        while self.states[first_probe] > 0:
            first_probe -= 1
        for probe in range(first_probe - 1, -1, -1):
            if self.states[probe] > 0 and self.values[probe] <= 0:
                self._hash_delete(probe)
                self.num_active -= 1
        for probe in range(len(self.states) - 1, first_probe, -1):
            if self.states[probe] > 0 and self.values[probe] <= 0:
                self._hash_delete(probe)
                self.num_active -= 1

    def active_in_slot_order(self):
        return [(self.keys[i], self.values[i])
                for i in range(len(self.keys)) if self.states[i] > 0]


class FreqCompatSketch:
    """Update-path replica of frequencies LongsSketch / ItemsSketch[string]
    (longs_sketch.go:61-95,399-443); `kind` is 'longs' or 'string'."""

    def __init__(self, max_map_size: int = 64, kind: str = "longs",
                 lg_cur_map_size: int = _FREQ_LG_MIN_MAP_SIZE):
        lg_max = max_map_size.bit_length() - 1
        if 1 << lg_max != max_map_size:
            raise ValueError("maxMapSize must be a power of 2")
        self.kind = kind
        self.lg_max_map_size = max(lg_max, _FREQ_LG_MIN_MAP_SIZE)
        lg_cur_map_size = max(lg_cur_map_size, _FREQ_LG_MIN_MAP_SIZE)
        if kind == "longs":
            probe = _freq_hash_fn
        else:
            # The golden corpus is Java-generated: Java's
            # ReversePurgeItemHashMap probes with the murmur finalizer
            # over String.hashCode() (31-based rolling hash of UTF-16
            # code units), NOT Go's murmur3-64 — so Java parity requires
            # the Java probe.  (Go's own string layout therefore differs
            # from Java's; the Go test suite only checks estimates for
            # frequencies, frequencies/sketch_serialization_test.go.)
            def probe(s: str) -> int:
                h = 0
                raw = s.encode("utf-16-be")
                for i in range(0, len(raw), 2):
                    h = (31 * h + (raw[i] << 8 | raw[i + 1])) & 0xFFFFFFFF
                if h >= 1 << 31:  # Java int is signed; sign-extend to long
                    h -= 1 << 32
                return _freq_hash_fn(h)
        self.hash_map = _ReversePurgeHashMap(1 << lg_cur_map_size, probe)
        self.cur_map_cap = self.hash_map.load_threshold
        max_map_cap = int((1 << self.lg_max_map_size) * _FREQ_LOAD_FACTOR)
        self.sample_size = min(_FREQ_SAMPLE_SIZE, max_map_cap)
        self.offset = 0
        self.stream_weight = 0

    def update(self, item, count: int = 1) -> None:
        if count == 0:
            return
        if count < 0:
            raise ValueError("count may not be negative")
        self.stream_weight += count
        self.hash_map.adjust_or_put(item, count)
        if self.hash_map.num_active > self.cur_map_cap:
            if self.hash_map.lg_length < self.lg_max_map_size:
                self.hash_map.resize(2 * len(self.hash_map))
                self.cur_map_cap = self.hash_map.load_threshold
            else:
                self.offset += self.hash_map.purge(self.sample_size)

    @property
    def is_empty(self) -> bool:
        return self.hash_map.num_active == 0


def write_frequencies_longs(sk: FreqCompatSketch) -> bytes:
    """LongsSketch.ToSlice() (frequencies/longs_sketch.go:488-536):
    preamble long [preLongs, serVer=1, famID=10, lgMax, lgCur, flags],
    then activeItems / streamWeight / offset longs, then values then keys
    in hash-table slot order."""
    active = sk.hash_map.active_in_slot_order()
    head = bytes([
        1 if sk.is_empty else _FREQ_MAX_PRE_LONGS, _FREQ_SER_VER,
        _FAMILY_FREQUENCY, sk.lg_max_map_size, sk.hash_map.lg_length,
        _FREQ_EMPTY_FLAG_MASK if sk.is_empty else 0, 0, 0,
    ])
    if sk.is_empty:
        return head
    out = bytearray(head)
    out += struct.pack("<qqq", len(active), sk.stream_weight, sk.offset)
    for _, v in active:
        out += struct.pack("<q", v)
    for k, _ in active:
        out += struct.pack("<q", k)
    return bytes(out)


def write_frequencies_items_string(sk: FreqCompatSketch) -> bytes:
    """ItemsSketch[string].ToSlice() (frequencies/items_sketch.go:397-444):
    longs layout but keys are 4-byte-length-prefixed UTF-8 strings appended
    after the values block."""
    active = sk.hash_map.active_in_slot_order()
    head = bytes([
        1 if sk.is_empty else _FREQ_MAX_PRE_LONGS, _FREQ_SER_VER,
        _FAMILY_FREQUENCY, sk.lg_max_map_size, sk.hash_map.lg_length,
        _FREQ_EMPTY_FLAG_MASK if sk.is_empty else 0, 0, 0,
    ])
    if sk.is_empty:
        return head
    out = bytearray(head)
    out += struct.pack("<qqq", len(active), sk.stream_weight, sk.offset)
    for _, v in active:
        out += struct.pack("<q", v)
    for k, _ in active:
        raw = k.encode("utf-8")
        out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def write_frequencies_string_form(sk: FreqCompatSketch) -> str:
    """LongsSketch.ToString() (frequencies/longs_sketch.go:468-485):
    ``serVer,famID,lgMaxMapSize,flags,streamWeight,offset,`` followed by
    reversePurgeLongHashMap.serializeToString()
    (frequencies/reverse_purge_long_hash_map.go:170-179):
    ``numActive,curMapLen,key,value,...,`` — pairs in physical probe-table
    slot order, every field comma-terminated (incl. the last)."""
    if sk.kind != "longs":
        raise ValueError("string form is defined for the longs sketch")
    flags = _FREQ_EMPTY_FLAG_MASK if sk.is_empty else 0
    parts = [f"{_FREQ_SER_VER},{_FAMILY_FREQUENCY},{sk.lg_max_map_size},"
             f"{flags},{sk.stream_weight},{sk.offset},",
             f"{sk.hash_map.num_active},{len(sk.hash_map)},"]
    for k, v in sk.hash_map.active_in_slot_order():
        parts.append(f"{k},{v},")
    return "".join(parts)


def read_frequencies_string_form(s: str) -> FreqCompatSketch:
    """NewLongsSketchFromString (frequencies/longs_sketch.go:180-254):
    parse the CSV form back into a live sketch. Mirrors the reference's
    checks (SerVer, family, token count vs numActive) and its rebuild
    semantics — pairs re-enter via adjustOrPut, then streamWeight and
    offset are overridden from the preamble."""
    if not s:
        raise ValueError("string is empty")
    if s.endswith(","):
        s = s[:-1]
    tokens = s.split(",")
    _STR_PREAMBLE_TOKENS = 6  # frequencies/longs_sketch.go:50
    if len(tokens) < _STR_PREAMBLE_TOKENS + 2:
        raise ValueError(f"string not long enough: {len(tokens)}")
    ser_ve, fam_id, lg_max, flags = (int(tokens[i]) for i in range(4))
    stream_wt, offset = int(tokens[4]), int(tokens[5])
    num_active = int(tokens[6])
    cur_map_len = int(tokens[7])
    lg_cur = (cur_map_len & -cur_map_len).bit_length() - 1 \
        if cur_map_len else 0
    if ser_ve != _FREQ_SER_VER:
        raise ValueError(f"possible Corruption: Bad SerVer: {ser_ve}")
    if fam_id != _FAMILY_FREQUENCY:
        raise ValueError(f"possible Corruption: Bad Family: {fam_id}")
    empty = flags > 0
    if not empty and num_active == 0:
        raise ValueError(
            f"Possible Corruption: !Empty && NumActive=0;  strLen: "
            f"{num_active}")
    if 2 * num_active != len(tokens) - _STR_PREAMBLE_TOKENS - 2:
        raise ValueError(
            f"possible Corruption: Incorrect # of tokens: {len(tokens)}, "
            f"numActive: {num_active}")
    sk = FreqCompatSketch(1 << max(lg_max, _FREQ_LG_MIN_MAP_SIZE),
                          kind="longs", lg_cur_map_size=lg_cur)
    j = _STR_PREAMBLE_TOKENS + 2
    for _ in range(num_active):
        sk.hash_map.adjust_or_put(int(tokens[j]), int(tokens[j + 1]))
        j += 2
    sk.stream_weight = stream_wt
    sk.offset = offset
    return sk


# ---------------------------------------------------------------------------
# Write-side: KLL ItemsSketch[string]
#
# Byte-exact ToSlice() parity requires the physical items-array layout:
# level 0 fills from high index downward (kll/items_sketch.go:544-553), so
# its raw (unsorted) order appears in the output, and every compaction's
# deterministic offset=1 halving + in-place upward merge
# (kll/items_sketch.go:692-762,864-905) decides exactly which items
# survive and where.  This class replays that algorithm verbatim on a
# single Python list.
# ---------------------------------------------------------------------------


class KllStringCompatSketch:
    """Layout-faithful replica of kll.ItemsSketch[string]
    (kll/items_sketch.go:54-84,528-553,692-817)."""

    def __init__(self, k: int = 200, m: int = 8):
        if not (m <= k <= 65535):
            raise ValueError("k out of range")
        self.k = k
        self.m = m
        self.n = 0
        self.min_k = k
        self.num_levels = 1
        self.levels = [k, k]
        self.items: list = [None] * k
        self.is_level_zero_sorted = False
        self.min_item: str | None = None
        self.max_item: str | None = None

    def update(self, item: str) -> None:
        self.update_many([item])

    def update_many(self, vals: list) -> None:
        """Bulk update: between compactions the only effect of N single
        updates is filling level 0 from levels[0]-1 downward
        (items_sketch.go:544-553), so we slice-fill, which is exactly
        item-at-a-time equivalent."""
        if not vals:
            return
        lo = min(vals)
        hi = max(vals)
        if self.min_item is None:
            self.min_item, self.max_item = lo, hi
        else:
            if lo < self.min_item:
                self.min_item = lo
            if hi > self.max_item:
                self.max_item = hi
        pos = 0
        nv = len(vals)
        while pos < nv:
            space = self.levels[0]
            if space == 0:
                self._compress()
                space = self.levels[0]
            take = min(space, nv - pos)
            chunk = vals[pos:pos + take]
            self.items[space - take:space] = chunk[::-1]
            self.levels[0] = space - take
            self.n += take
            pos += take
            self.is_level_zero_sorted = False

    def _level_cap(self, num_levels: int, level: int) -> int:
        return _kll_level_capacity(self.k, num_levels, level, self.m)

    def _find_level_to_compact(self) -> int:
        # kll/items_sketch.go:819-830
        level = 0
        while True:
            pop = self.levels[level + 1] - self.levels[level]
            if pop >= self._level_cap(self.num_levels, level):
                return level
            level += 1

    def _add_empty_top_level(self) -> None:
        # kll/items_sketch.go:768-817
        cur_total = self.levels[self.num_levels]
        delta = self._level_cap(self.num_levels + 1, 0)
        if len(self.levels) < self.num_levels + 2:
            self.levels.append(0)
        self.num_levels += 1
        for lvl in range(self.num_levels):
            self.levels[lvl] += delta
        self.levels[self.num_levels] = cur_total + delta
        self.items = [None] * delta + self.items

    def _compress(self) -> None:
        # compressWhileUpdatingSketch (kll/items_sketch.go:692-762)
        level = self._find_level_to_compact()
        if level == self.num_levels - 1:
            self._add_empty_top_level()
        lv = self.levels
        buf = self.items
        raw_beg = lv[level]
        raw_end = lv[level + 1]
        pop_above = lv[level + 2] - raw_end
        raw_pop = raw_end - raw_beg
        odd = raw_pop % 2 == 1
        adj_beg = raw_beg + 1 if odd else raw_beg
        adj_pop = raw_pop - 1 if odd else raw_pop
        half = adj_pop // 2
        if level == 0:
            buf[adj_beg:adj_beg + adj_pop] = \
                sorted(buf[adj_beg:adj_beg + adj_pop])
        if pop_above == 0:
            # randomlyHalveUpItems, offset=1 (items_sketch.go:864-874)
            j = adj_beg + adj_pop - 2
            for i in range(adj_beg + adj_pop - 1, adj_beg + half - 1, -1):
                buf[i] = buf[j]
                j -= 2
        else:
            # randomlyHalveDownItems, offset=1 (items_sketch.go:875-884)
            j = adj_beg + 1
            for i in range(adj_beg, adj_beg + half):
                buf[i] = buf[j]
                j += 2
            # in-place upward merge (items_sketch.go:886-912; safe because
            # the write cursor never passes the B read cursor)
            a, b = adj_beg, raw_end
            lim_a, lim_b = adj_beg + half, raw_end + pop_above
            for c in range(adj_beg + half, adj_beg + half + half + pop_above):
                if a == lim_a:
                    buf[c] = buf[b]
                    b += 1
                elif b == lim_b:
                    buf[c] = buf[a]
                    a += 1
                elif buf[a] < buf[b]:
                    buf[c] = buf[a]
                    a += 1
                else:
                    buf[c] = buf[b]
                    b += 1
        lv[level + 1] = lv[level + 1] - half
        if odd:
            lv[level] = lv[level + 1] - 1
            buf[lv[level]] = buf[raw_beg]
        else:
            lv[level] = lv[level + 1]
        if level > 0:
            amount = raw_beg - lv[0]
            for i in range(amount, 0, -1):
                buf[lv[0] + half + i - 1] = buf[lv[0] + i - 1]
            for lvl in range(level):
                lv[lvl] += half


def _kll_total_capacity(k: int, m: int, num_levels: int) -> int:
    # computeTotalItemCapacity (kll/items_sketch.go:831-837)
    return sum(_kll_level_capacity(k, num_levels, lvl, m)
               for lvl in range(num_levels))


def _kll_ub_on_num_levels(n: int) -> int:
    # ubOnNumLevels (kll/utils.go:121-124): 1 + floor(log2(n))
    return 1 + max(0, int(n).bit_length() - 1)


def _kll_merge_sorted(buf_a, start_a, len_a, buf_b, start_b, len_b,
                      buf_c, start_c) -> None:
    # mergeSortedItemsArrays (kll/items_sketch.go:886-912)
    a, b = start_a, start_b
    lim_a, lim_b = start_a + len_a, start_b + len_b
    for c in range(start_c, start_c + len_a + len_b):
        if a == lim_a:
            buf_c[c] = buf_b[b]
            b += 1
        elif b == lim_b:
            buf_c[c] = buf_a[a]
            a += 1
        elif buf_a[a] < buf_b[b]:
            buf_c[c] = buf_a[a]
            a += 1
        else:
            buf_c[c] = buf_b[b]
            b += 1


def _kll_general_compress(k: int, m: int, num_levels_in: int, in_buf,
                          in_levels, out_buf, out_levels,
                          is_level_zero_sorted: bool):
    """generalItemsCompress (kll/items_sketch.go:950-1045) with the
    reference's deterministic offset=1 halving — used by merge, where
    in_buf and out_buf alias (as in the reference)."""
    num_levels = num_levels_in
    current = in_levels[num_levels] - in_levels[0]
    target = _kll_total_capacity(k, m, num_levels)
    out_levels[0] = 0
    cur = -1
    while True:
        cur += 1
        if cur == num_levels - 1:
            in_levels[cur + 2] = in_levels[cur + 1]
        raw_beg = in_levels[cur]
        raw_lim = in_levels[cur + 1]
        raw_pop = raw_lim - raw_beg
        if current < target or \
                raw_pop < _kll_level_capacity(k, num_levels, cur, m):
            out_buf[out_levels[cur]:out_levels[cur] + raw_pop] = \
                in_buf[raw_beg:raw_lim]
            out_levels[cur + 1] = out_levels[cur] + raw_pop
        else:
            pop_above = in_levels[cur + 2] - raw_lim
            odd = raw_pop % 2 == 1
            adj_beg = raw_beg + 1 if odd else raw_beg
            adj_pop = raw_pop - 1 if odd else raw_pop
            half = adj_pop // 2
            if odd:
                out_buf[out_levels[cur]] = in_buf[raw_beg]
                out_levels[cur + 1] = out_levels[cur] + 1
            else:
                out_levels[cur + 1] = out_levels[cur]
            if cur == 0 and not is_level_zero_sorted:
                in_buf[adj_beg:adj_beg + adj_pop] = \
                    sorted(in_buf[adj_beg:adj_beg + adj_pop])
            if pop_above == 0:
                # randomlyHalveUpItems, offset=1 (items_sketch.go:864-874)
                j = adj_beg + adj_pop - 2
                for i in range(adj_beg + adj_pop - 1,
                               adj_beg + half - 1, -1):
                    in_buf[i] = in_buf[j]
                    j -= 2
            else:
                # randomlyHalveDownItems, offset=1 (875-884), then the
                # in-place upward merge with the level above
                j = adj_beg + 1
                for i in range(adj_beg, adj_beg + half):
                    in_buf[i] = in_buf[j]
                    j += 2
                _kll_merge_sorted(in_buf, adj_beg, half,
                                  in_buf, raw_lim, pop_above,
                                  in_buf, adj_beg + half)
            current -= half
            in_levels[cur + 1] = in_levels[cur + 1] - half
            if cur == num_levels - 1:
                num_levels += 1
                target += _kll_level_capacity(k, num_levels, 0, m)
        if cur == num_levels - 1:
            return num_levels, target, current


def kll_string_merge(self_sk: KllStringCompatSketch,
                     other: KllStringCompatSketch) -> None:
    """ItemsSketch[string].Merge (kll/items_sketch.go:555-693): the
    other's level 0 replays through the update path; higher levels merge
    via work arrays + generalItemsCompress; minK degrades only when the
    other is in estimation mode; min/max fold at the end."""
    if other.n == 0:
        return
    my_empty = self_sk.n == 0
    my_min, my_max = self_sk.min_item, self_sk.max_item
    my_min_k = self_sk.min_k
    final_n = self_sk.n + other.n

    other_num = other.num_levels
    other_levels = list(other.levels)
    other_items = list(other.items)

    lvl0 = other_items[other_levels[0]:other_levels[1]]
    if lvl0:
        self_sk.update_many(lvl0)

    my_num = self_sk.num_levels
    my_levels = list(self_sk.levels)
    my_items = list(self_sk.items)
    new_num, new_levels, new_items = my_num, my_levels, my_items

    if other_num > 1:
        def lvl_size(lvl, n_lvls, levels):
            # currentLevelSizeItems (kll/utils.go:130-135)
            return 0 if lvl >= n_lvls else levels[lvl + 1] - levels[lvl]

        retained_self = my_levels[my_num] - my_levels[0]
        retained_other_above = other_levels[other_num] - other_levels[1]
        workbuf = [None] * (retained_self + retained_other_above)
        ub = _kll_ub_on_num_levels(final_n)
        worklevels = [0] * (ub + 2)
        outlevels = [0] * (ub + 2)
        prov = max(my_num, other_num)

        # populateItemWorkArrays (913-948); other's level 0 already
        # replayed above
        pop0 = lvl_size(0, my_num, my_levels)
        workbuf[0:pop0] = my_items[my_levels[0]:my_levels[0] + pop0]
        worklevels[1] = pop0
        for lvl in range(1, prov):
            sp = lvl_size(lvl, my_num, my_levels)
            op = lvl_size(lvl, other_num, other_levels)
            worklevels[lvl + 1] = worklevels[lvl] + sp + op
            if sp > 0 and op == 0:
                workbuf[worklevels[lvl]:worklevels[lvl] + sp] = \
                    my_items[my_levels[lvl]:my_levels[lvl] + sp]
            elif sp == 0 and op > 0:
                workbuf[worklevels[lvl]:worklevels[lvl] + op] = \
                    other_items[other_levels[lvl]:other_levels[lvl] + op]
            elif sp > 0 and op > 0:
                _kll_merge_sorted(my_items, my_levels[lvl], sp,
                                  other_items, other_levels[lvl], op,
                                  workbuf, worklevels[lvl])

        new_num, target_cnt, cur_cnt = _kll_general_compress(
            self_sk.k, self_sk.m, prov, workbuf, worklevels, workbuf,
            outlevels, self_sk.is_level_zero_sorted)
        free_bottom = target_cnt - cur_cnt
        new_items = [None] * target_cnt
        new_items[free_bottom:free_bottom + cur_cnt] = \
            workbuf[outlevels[0]:outlevels[0] + cur_cnt]
        shift = free_bottom - outlevels[0]
        final_len = max(len(my_levels), new_num + 1)
        new_levels = [0] * final_len
        for lvl in range(new_num + 1):
            new_levels[lvl] = outlevels[lvl] + shift

    self_sk.n = final_n
    if other_num > 1:  # other.IsEstimationMode (items_sketch.go:189-191)
        self_sk.min_k = min(my_min_k, other.min_k)
    self_sk.num_levels = new_num
    self_sk.levels = new_levels
    self_sk.items = new_items
    if my_empty:
        self_sk.min_item = other.min_item
        self_sk.max_item = other.max_item
    else:
        self_sk.min_item = min(my_min, other.min_item)
        self_sk.max_item = max(my_max, other.max_item)


def kll_string_compat_from_view(view: KllStringSketchView) \
        -> KllStringCompatSketch:
    """Rebuild a live (updatable, mergeable) compat sketch from a parsed
    wire image, the way NewItemsSketchFromSlice re-expands the compact
    form into updatable arrays (free space at the bottom,
    kll/items_sketch.go:406-470)."""
    sk = KllStringCompatSketch(view.k, view.m)
    if view.n == 0:
        return sk
    sk.n = view.n
    sk.min_k = view.min_k
    sk.num_levels = view.num_levels
    retained = view.levels[view.num_levels] - view.levels[0]
    cap = _kll_total_capacity(view.k, view.m, view.num_levels)
    free = cap - retained
    sk.items = [None] * free + list(
        view.items[-retained:] if len(view.items) > retained
        else view.items)
    base = view.levels[0]
    sk.levels = [free + (view.levels[i] - base)
                 for i in range(view.num_levels)] + [cap]
    sk.min_item = view.min_item
    sk.max_item = view.max_item
    sk.is_level_zero_sorted = view.level0_sorted
    return sk


def write_kll_string(sk: KllStringCompatSketch) -> bytes:
    """ItemsSketch[string].ToSlice() (kll/items_sketch.go:332-404):
    COMPACT_EMPTY (8 B) / COMPACT_SINGLE (preamble + one item) /
    COMPACT_FULL (preamble, n, minK, numLevels, levels[0..numLevels-1],
    min/max items, retained items), strings as 4-byte-LE-length-prefixed
    UTF-8 (kll/items_sketch_test.go:44-83)."""
    flags = 0
    if sk.n == 0:
        flags |= _KLL_EMPTY_BIT
    if sk.is_level_zero_sorted:
        flags |= 2
    if sk.n == 1:
        flags |= _KLL_SINGLE_ITEM_BIT

    def enc(s: str) -> bytes:
        raw = s.encode("utf-8")
        return struct.pack("<I", len(raw)) + raw

    if sk.n == 0:
        return bytes([_KLL_PRE_INTS_EMPTY_SINGLE, _KLL_SER_VER_EMPTY_FULL,
                      _FAMILY_KLL, flags]) + struct.pack("<HBB", sk.k,
                                                         sk.m, 0)
    if sk.n == 1:
        single = sk.items[sk.levels[0]]
        return bytes([_KLL_PRE_INTS_EMPTY_SINGLE, _KLL_SER_VER_SINGLE,
                      _FAMILY_KLL, flags]) + \
            struct.pack("<HBB", sk.k, sk.m, 0) + enc(single)

    out = bytearray()
    out += bytes([_KLL_PRE_INTS_FULL, _KLL_SER_VER_EMPTY_FULL,
                  _FAMILY_KLL, flags])
    out += struct.pack("<HBB", sk.k, sk.m, 0)
    out += struct.pack("<Q", sk.n)
    out += struct.pack("<HBB", sk.min_k, sk.num_levels, 0)
    for lvl in range(sk.num_levels):
        out += struct.pack("<I", sk.levels[lvl])
    out += enc(sk.min_item) + enc(sk.max_item)
    for idx in range(sk.levels[0], sk.levels[sk.num_levels]):
        out += enc(sk.items[idx])
    return bytes(out)
