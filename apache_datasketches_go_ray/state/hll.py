"""HLL distinct-count sketch, estimate-parity with the reference.

Reimplements the logical state machine of the reference HLL sketch
(hll/hll_sketch.go, hll/coupon_list.go, hll/coupon_hash_set.go,
hll/hll_8array.go, hll/union.go): LIST -> SET -> HLL promotion with the
same count thresholds, HIP/KxQ bookkeeping (hll/hll_array.go:261-308), the
composite estimator with cubic interpolation tables
(hll/hll_estimator.go:26-77), and HLL x HLL union = slotwise max with
deferred curMin/KxQ rebuild (hll/union.go:365-453).

The three storage widths (HLL4/6/8) are a memory optimization over
identical logical registers (proven by the reference's
hll/cross_counting_test.go); we keep a single uint8 register array.

Estimate parity is pinned by tests against the reference's doctest outputs
(hll/example_test.go:84-96): 104403 / 96390 / 151359 at lgK=10 — these
transitively validate murmur3-128(seed 9001), coupon extraction, promotion
thresholds, HIP accumulation and the composite estimator to the bit.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.murmur3 import murmur3_128, murmur3_128_u64, hash_strings
from . import _hll_tables as T

KEY_BITS_26 = 26
KEY_MASK_26 = (1 << 26) - 1
VAL_MASK_6 = (1 << 6) - 1
MIN_LOG_K = 4
MAX_LOG_K = 21
LG_INIT_LIST_SIZE = 3  # hll/utils.go:29
LG_INIT_SET_SIZE = 5  # hll/utils.go:30
RESIZE_NUMER = 3  # hll/utils.go:41-42
RESIZE_DENOM = 4
DEFAULT_LG_K = 12

HLL_HIP_RSE_FACTOR = math.sqrt(math.log(2.0))  # hll/utils.go:53
HLL_NONHIP_RSE_FACTOR = math.sqrt(3.0 * math.log(2.0) - 1.0)  # hll/utils.go:52
COUPON_RSE = 0.409 / (1 << 13)  # hll/utils.go:43-44

MODE_LIST = 0
MODE_SET = 1
MODE_HLL = 2


def inv_pow2(e: int) -> float:
    """Exact 2**-e for 0 <= e <= 1074 (internal/utils.go:57-63)."""
    return math.ldexp(1.0, -e)


def coupon(h1: int, h2: int) -> int:
    """KMV-style coupon from a 128-bit hash (hll/hll_sketch.go:338-343)."""
    addr26 = h1 & KEY_MASK_26
    lz = 64 - h2.bit_length() if h2 else 64
    value = min(lz, 62) + 1
    return (value << KEY_BITS_26) | addr26


def coupons_from_u64s(values: np.ndarray) -> np.ndarray:
    """Vectorized coupon extraction for uint64 items (LE-encoded then
    murmur3-128 seed 9001, as UpdateUInt64 does)."""
    h1, h2 = murmur3_128_u64(values)
    return _coupons_from_hashes(h1, h2)


def coupons_from_strings(strings) -> np.ndarray:
    h1, h2 = hash_strings(strings)
    return _coupons_from_hashes(h1, h2)


def _coupons_from_hashes(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    addr26 = h1 & np.uint64(KEY_MASK_26)
    # leading zeros of h2: 64 - bit_length
    lz = np.full(h2.shape, 64, dtype=np.uint64)
    nz = h2 != 0
    # bit_length via log2 is unsafe at 64-bit edge; use a loop over bit shifts
    x = h2.copy()
    n = np.zeros(h2.shape, dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = x >= (np.uint64(1) << s)
        n = np.where(mask, n + s, n)
        x = np.where(mask, x >> s, x)
    bitlen = np.where(nz, n + np.uint64(1), np.uint64(0))
    lz = np.uint64(64) - bitlen
    value = np.minimum(lz, np.uint64(62)) + np.uint64(1)
    return ((value << np.uint64(KEY_BITS_26)) | addr26).astype(np.uint64)


def _cubic_interpolate(x0, y0, x1, y1, x2, y2, x3, y3, x):
    # Lagrange form (hll/cubic_interpolation.go:100-117)
    l0 = ((x - x1) * (x - x2) * (x - x3)) / ((x0 - x1) * (x0 - x2) * (x0 - x3))
    l1 = ((x - x0) * (x - x2) * (x - x3)) / ((x1 - x0) * (x1 - x2) * (x1 - x3))
    l2 = ((x - x0) * (x - x1) * (x - x3)) / ((x2 - x0) * (x2 - x1) * (x2 - x3))
    l3 = ((x - x0) * (x - x1) * (x - x2)) / ((x3 - x0) * (x3 - x1) * (x3 - x2))
    return y0 * l0 + y1 * l1 + y2 * l2 + y3 * l3


def _find_straddle(x_arr, x):
    lo, hi = 0, len(x_arr) - 1
    while lo + 1 < hi:
        mid = lo + (hi - lo) // 2
        if x_arr[mid] <= x:
            lo = mid
        else:
            hi = mid
    return lo


def _interp_xy(x_arr, y_arr, x):
    """hll/cubic_interpolation.go:24-49 (X and Y tables)."""
    if x == x_arr[-1]:
        return y_arr[-1]
    offset = _find_straddle(x_arr, x)
    if offset == 0:
        base = 0
    elif offset == len(x_arr) - 2:
        base = offset - 2
    else:
        base = offset - 1
    return _cubic_interpolate(
        x_arr[base], y_arr[base], x_arr[base + 1], y_arr[base + 1],
        x_arr[base + 2], y_arr[base + 2], x_arr[base + 3], y_arr[base + 3], x,
    )


def _interp_x_stride(x_arr, y_stride, x):
    """hll/cubic_interpolation.go:60-83 (X array + Y stride)."""
    n = len(x_arr)
    if x == x_arr[n - 1]:
        return y_stride * (n - 1)
    offset = _find_straddle(x_arr, x)
    if offset == 0:
        base = 0
    elif offset == n - 2:
        base = offset - 2
    else:
        base = offset - 1
    return _cubic_interpolate(
        x_arr[base], y_stride * base, x_arr[base + 1], y_stride * (base + 1),
        x_arr[base + 2], y_stride * (base + 2), x_arr[base + 3], y_stride * (base + 3), x,
    )


def _coupon_estimate(count: int) -> float:
    """Coupon-collector estimate for LIST/SET modes (hll/coupon.go:74-78)."""
    est = _interp_xy(T.COUPON_MAPPING_X_ARR, T.COUPON_MAPPING_Y_ARR, float(count))
    return max(est, float(count))


_EXACT_HARMONIC = [
    0.0, 1.0, 1.5, 11.0 / 6.0, 25.0 / 12.0, 137.0 / 60.0, 49.0 / 20.0,
    363.0 / 140.0, 761.0 / 280.0, 7129.0 / 2520.0, 7381.0 / 2520.0,
    83711.0 / 27720.0, 86021.0 / 27720.0, 1145993.0 / 360360.0,
    1171733.0 / 360360.0, 1195757.0 / 360360.0, 2436559.0 / 720720.0,
    42142223.0 / 12252240.0, 14274301.0 / 4084080.0, 275295799.0 / 77597520.0,
    55835135.0 / 15519504.0, 18858053.0 / 5173168.0, 19093197.0 / 5173168.0,
    444316699.0 / 118982864.0, 1347822955.0 / 356948592.0,
]  # hll/harmonic_numbers.go:30-56
_EULER = 0.577215664901532860606512090082


def _harmonic(n: int) -> float:
    if n < 25:
        return _EXACT_HARMONIC[n]
    x = float(n)
    inv_sq = 1.0 / (x * x)
    s = math.log(x) + _EULER + 1.0 / (2.0 * x)
    p = inv_sq
    s -= p / 12.0
    p *= inv_sq
    s += p / 120.0
    p *= inv_sq
    s -= p / 252.0
    p *= inv_sq
    s += p / 240.0
    return s


def _bitmap_estimate(bits: int, set_bits: int) -> float:
    return float(bits) * (_harmonic(bits) - _harmonic(bits - set_bits))


def _rel_err_all_k(upper: bool, ooo: bool, lg_k: int, num_std_dev: int) -> float:
    """hll/hll_estimator.go:146-162 + relative_error_tables.go:79-96."""
    if lg_k > 12:
        factor = HLL_NONHIP_RSE_FACTOR if ooo else HLL_HIP_RSE_FACTOR
        return (num_std_dev * factor) / math.sqrt(float(1 << lg_k))
    idx = (lg_k - 4) * 3 + (num_std_dev - 1)
    sw = 2 * int(ooo) + int(upper)
    tbl = (T.HIP_LB, T.HIP_UB, T.NONHIP_LB, T.NONHIP_UB)[sw]
    return abs(tbl[idx])


class HllSketch:
    """Heap HLL sketch with reference-parity estimates.

    ``update_*`` methods follow exact single-stream semantics (HIP valid).
    ``update_coupons_bulk`` is the fast vectorized path for distributed
    partials: it applies a batch of coupons via slotwise max and marks the
    sketch out-of-order (composite estimator), mirroring what any union of
    partials does anyway (hll/hll_array.go:169-174).
    """

    __slots__ = (
        "lg_k", "mode", "coupons", "registers", "cur_min", "num_at_cur_min",
        "hip_accum", "kxq0", "kxq1", "ooo", "rebuild_flag", "_lg_coupon_arr",
        "tgt_type",
    )

    def __init__(self, lg_k: int = DEFAULT_LG_K):
        if not (MIN_LOG_K <= lg_k <= MAX_LOG_K):
            raise ValueError(f"lgK out of range: {lg_k}")
        self.lg_k = lg_k
        self.mode = MODE_LIST
        # dict-as-ordered-set: insertion order is the reference's LIST
        # array order, which the wire writer must reproduce
        self.coupons: dict[int, None] = {}
        self._lg_coupon_arr = LG_INIT_LIST_SIZE
        self.registers: np.ndarray | None = None
        self.cur_min = 0
        self.num_at_cur_min = 0
        self.hip_accum = 0.0
        self.kxq0 = 0.0
        self.kxq1 = 0.0
        self.ooo = False
        self.rebuild_flag = False
        self.tgt_type = 8  # declared storage width (4/6/8; CopyAs)

    # -- properties ---------------------------------------------------------
    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def is_empty(self) -> bool:
        return self.mode == MODE_LIST and not self.coupons

    # -- update paths -------------------------------------------------------
    def update_u64(self, v: int) -> None:
        h1, h2 = murmur3_128(int(v).to_bytes(8, "little", signed=False))
        self.coupon_update(coupon(h1, h2))

    def update_i64(self, v: int) -> None:
        self.update_u64(v & ((1 << 64) - 1))

    def update_str(self, s: str) -> None:
        b = s.encode("utf-8")
        if not b:
            return
        h1, h2 = murmur3_128(b)
        self.coupon_update(coupon(h1, h2))

    def update_bytes(self, b: bytes) -> None:
        if not b:
            return
        h1, h2 = murmur3_128(b)
        self.coupon_update(coupon(h1, h2))

    def coupon_update(self, c: int) -> None:
        if (c >> KEY_BITS_26) == 0:  # empty marker guard (hll_sketch.go:346)
            return
        if self.mode == MODE_HLL:
            self._hll_coupon_update(c)
            return
        if c in self.coupons:
            return
        self.coupons[c] = None
        self._check_promote()

    def _check_promote(self) -> None:
        count = len(self.coupons)
        if self.mode == MODE_LIST:
            if count >= (1 << LG_INIT_LIST_SIZE):  # coupon_list.go:70-77
                if self.lg_k < 8:
                    self._promote_to_hll()
                else:
                    self.mode = MODE_SET
                    self._lg_coupon_arr = LG_INIT_SET_SIZE
                    self._check_promote()  # re-check thresholds at SET sizes
        elif self.mode == MODE_SET:
            # coupon_hash_set.go:115-126: grow at 3/4 load; promote instead
            # of growing past lgK-3
            while RESIZE_DENOM * count > RESIZE_NUMER * (1 << self._lg_coupon_arr):
                if self._lg_coupon_arr == self.lg_k - 3:
                    self._promote_to_hll()
                    return
                self._lg_coupon_arr += 1

    def _promote_to_hll(self) -> None:
        # coupon_list.go:119-142 / coupon_hash_set.go:143-160: replay
        # coupons into fresh registers, then overwrite HIP with the coupon
        # estimate, ooo=False.
        count = len(self.coupons)
        est = _coupon_estimate(count)
        k = self.k
        self.registers = np.zeros(k, dtype=np.uint8)
        self.cur_min = 0
        self.num_at_cur_min = k
        self.kxq0 = float(k)
        self.kxq1 = 0.0
        self.hip_accum = 0.0
        self.mode = MODE_HLL
        for c in sorted(self.coupons):
            self._hll_coupon_update(c)
        self.coupons = {}
        self.hip_accum = est
        self.ooo = False

    def _hll_coupon_update(self, c: int) -> None:
        # hll/hll_8array.go:123-156
        new_v = c >> KEY_BITS_26
        slot = c & (self.k - 1)
        old_v = int(self.registers[slot])
        if new_v > old_v:
            if self.rebuild_flag:
                # KxQ/HIP are stale after a slotwise-max union; keep
                # maxing and let _rebuild_kxq recompute lazily
                self.registers[slot] = new_v
                return
            # HIP before KxQ update (hll/hll_array.go:261-272)
            self.hip_accum += float(self.k) / (self.kxq0 + self.kxq1)
            if old_v < 32:
                self.kxq0 -= inv_pow2(old_v)
            else:
                self.kxq1 -= inv_pow2(old_v)
            if new_v < 32:
                self.kxq0 += inv_pow2(new_v)
            else:
                self.kxq1 += inv_pow2(new_v)
            self.registers[slot] = new_v
            if old_v == 0:
                self.num_at_cur_min -= 1

    # -- bulk (vectorized, order-insensitive) path --------------------------
    def update_coupons_bulk(self, cs: np.ndarray) -> None:
        """Apply many coupons at once via slotwise max.

        Keeps exact coupon-set semantics while in coupon modes (so small
        streams stay exact); on promotion or in HLL mode applies a
        vectorized max and rebuilds KxQ/numAtCurMin, marking the sketch
        out-of-order (HIP dropped — same as any union)."""
        if cs.size == 0:
            return
        if self.mode != MODE_HLL:
            uniq = np.unique(cs)
            # conservative: staying exact while the merged coupon set is
            # below the promotion threshold
            self.coupons.update(dict.fromkeys(int(x) for x in uniq))
            self._check_promote_bulk()
            return
        self._bulk_max(cs)

    def _check_promote_bulk(self) -> None:
        count = len(self.coupons)
        if self.mode == MODE_LIST and count >= (1 << LG_INIT_LIST_SIZE):
            if self.lg_k < 8:
                pass  # fall through to promote below
            else:
                self.mode = MODE_SET
                self._lg_coupon_arr = LG_INIT_SET_SIZE
        if self.mode == MODE_SET:
            while RESIZE_DENOM * count > RESIZE_NUMER * (1 << self._lg_coupon_arr):
                if self._lg_coupon_arr == self.lg_k - 3:
                    break
                self._lg_coupon_arr += 1
            if not (RESIZE_DENOM * count > RESIZE_NUMER * (1 << self._lg_coupon_arr)):
                return
        elif self.mode == MODE_LIST and count < (1 << LG_INIT_LIST_SIZE):
            return
        # promote via bulk path
        cs = np.fromiter(self.coupons, count=count, dtype=np.uint64)
        est = _coupon_estimate(count)
        self.registers = np.zeros(self.k, dtype=np.uint8)
        self.mode = MODE_HLL
        self.coupons = {}
        self._bulk_max(cs)
        self.hip_accum = est  # matches promote semantics; ooo left as-is

    def _bulk_max(self, cs: np.ndarray) -> None:
        cs = cs.astype(np.uint64, copy=False)
        slots = (cs & np.uint64(self.k - 1)).astype(np.int64)
        vals = (cs >> np.uint64(KEY_BITS_26)).astype(np.uint8)
        np.maximum.at(self.registers, slots, vals)
        self.ooo = True
        self.hip_accum = 0.0
        self.rebuild_flag = True

    # -- merge --------------------------------------------------------------
    def merge(self, other: "HllSketch") -> None:
        """Union semantics with this sketch as the HLL_8 gadget
        (hll/union.go:200-308).

        Heterogeneous lgK is supported exactly as far as the reference
        supports it: coupons address slots at the full 26-bit resolution
        (hll/hll_sketch.go:338-343), so any LIST/SET-mode side replays
        into a gadget of any lgK, and a coupon-mode gadget can adopt an
        HLL-mode source of a different lgK. Only HLL-mode × HLL-mode at
        different lgK needs true register downsampling, which the
        reference leaves not-implemented (union.go:269-303) — mirrored
        here with the same error."""
        if other.is_empty():
            return
        if (self.lg_k != other.lg_k and self.mode == MODE_HLL
                and other.mode == MODE_HLL):
            raise ValueError(
                "HLL-mode x HLL-mode union at different lgK needs register "
                "downsampling (mirrors union.go:269-303 not-implemented)")
        if other.mode in (MODE_LIST, MODE_SET):
            if other.mode == MODE_SET and self.is_empty():
                self._copy_from(other)
                return
            for c in sorted(other.coupons):
                self.coupon_update(c)
            return
        # src is HLL mode
        if self.is_empty():
            self._copy_from(other)
            return
        if self.mode in (MODE_LIST, MODE_SET):
            # replay gadget coupons into a copy of src (union.go case 0,2)
            my_coupons = sorted(self.coupons)
            self._copy_from(other)
            for c in my_coupons:
                self.coupon_update(c)
            return
        # HLL x HLL: slotwise max, deferred rebuild, ooo (union.go:365-385)
        np.maximum(self.registers, other.registers, out=self.registers)
        self.rebuild_flag = True
        self.ooo = True
        self.hip_accum = 0.0

    def _copy_from(self, other: "HllSketch") -> None:
        if other.mode == MODE_HLL:
            # registers are sized to the source's lgK; adopt it. (In
            # coupon modes lgK is NOT adopted: coupons are
            # lgK-independent, so the gadget keeps its own resolution.)
            self.lg_k = other.lg_k
        self.mode = other.mode
        self.coupons = dict.fromkeys(other.coupons)
        self._lg_coupon_arr = other._lg_coupon_arr
        self.registers = None if other.registers is None else other.registers.copy()
        self.cur_min = other.cur_min
        self.num_at_cur_min = other.num_at_cur_min
        self.hip_accum = other.hip_accum
        self.kxq0 = other.kxq0
        self.kxq1 = other.kxq1
        self.ooo = other.ooo
        self.rebuild_flag = other.rebuild_flag

    def _rebuild_kxq(self) -> None:
        """union.go:310-363 (checkRebuildCurMinNumKxQ)."""
        if not self.rebuild_flag or self.mode != MODE_HLL:
            return
        v = self.registers.astype(np.int64)
        k = self.k
        nz = v > 0
        lo = nz & (v < 32)
        hi = v >= 32
        inv = np.ldexp(1.0, -v)
        kxq0 = float(k) + float(np.sum(inv[lo] - 1.0))
        kxq1 = float(np.sum(inv[hi] - 1.0))
        cur_min = int(v.min())
        num_at = int(np.sum(v == cur_min))
        self.kxq0 = kxq0
        self.kxq1 = kxq1
        self.cur_min = cur_min
        self.num_at_cur_min = num_at
        self.rebuild_flag = False

    # -- estimates ----------------------------------------------------------
    def get_estimate(self) -> float:
        if self.mode != MODE_HLL:
            return _coupon_estimate(len(self.coupons))
        self._rebuild_kxq()
        if self.ooo:
            return self._composite_estimate()
        return self.hip_accum

    def _composite_estimate(self) -> float:
        """hll/hll_estimator.go:26-77."""
        lg_k = self.lg_k
        k = self.k
        kxq = self.kxq0 + self.kxq1
        if lg_k == 4:
            cf = 0.673
        elif lg_k == 5:
            cf = 0.697
        elif lg_k == 6:
            cf = 0.709
        else:
            cf = 0.7213 / (1.0 + 1.079 / float(k))
        raw_est = (cf * k * k) / kxq

        x_arr = T.COMPOSITE_INTERPOLATION_XARRS[lg_k - MIN_LOG_K]
        y_stride = T.COMPOSITE_INTERPOLATION_YSTRIDES[lg_k - MIN_LOG_K]
        if raw_est < x_arr[0]:
            return 0.0
        if raw_est > x_arr[-1]:
            final_y = y_stride * (len(x_arr) - 1)
            return raw_est * (final_y / x_arr[-1])
        adj_est = _interp_x_stride(x_arr, y_stride, raw_est)
        if adj_est > float(3 << lg_k):
            return adj_est

        num_unhit = self.num_at_cur_min if self.cur_min == 0 else 0
        if num_unhit == 0:
            lin_est = float(k) * math.log(float(k) / 0.5)
        else:
            lin_est = _bitmap_estimate(k, k - num_unhit)
        avg_est = (adj_est + lin_est) / 2.0
        cross_over = 0.64
        if lg_k == 4:
            cross_over = 0.718
        elif lg_k == 5:
            cross_over = 0.672
        return adj_est if avg_est > (cross_over * k) else lin_est

    def get_upper_bound(self, num_std_dev: int = 2) -> float:
        if self.mode != MODE_HLL:
            est = _coupon_estimate(len(self.coupons))
            return max(est / (1.0 - num_std_dev * COUPON_RSE), float(len(self.coupons)))
        self._rebuild_kxq()
        rel = _rel_err_all_k(True, self.ooo, self.lg_k, num_std_dev)
        return self.get_estimate() / (1.0 - rel)

    def get_lower_bound(self, num_std_dev: int = 2) -> float:
        if self.mode != MODE_HLL:
            est = _coupon_estimate(len(self.coupons))
            return max(est / (1.0 + num_std_dev * COUPON_RSE), float(len(self.coupons)))
        self._rebuild_kxq()
        num_non_zero = float(self.k)
        if self.cur_min == 0:
            num_non_zero -= self.num_at_cur_min
        rel = _rel_err_all_k(False, self.ooo, self.lg_k, num_std_dev)
        return max(self.get_estimate() / (1.0 + rel), num_non_zero)

    # -- storage-type conversion ---------------------------------------------
    def copy_as(self, tgt: int) -> "HllSketch":
        """CopyAs(TgtHllType) — the reference's 4/6/8 storage-width
        conversion (hll/hll_sketch.go CopyAs). The runtime keeps one
        uint8 register representation (the declared mapping), so the
        copy is produced by round-tripping through the bit-exact wire
        encoders: an HLL_4 copy carries exactly the information an
        HLL_4 image carries (curMin-rebased nibbles + aux-map
        exceptions), an HLL_6 copy the 6-bit-clamped registers, and the
        declared ``tgt_type`` controls future ``to_reference_bytes``
        serializations. Coupon-mode sketches convert trivially (type
        only affects the HLL-mode payload)."""
        if tgt not in (4, 6, 8):
            raise ValueError("tgt must be 4, 6 or 8")
        from .serde_compat import read_hll, write_hll

        if self.mode != MODE_HLL:
            cp = HllSketch(self.lg_k)
            cp._copy_from(self)
        else:
            cp = read_hll(write_hll(self, tgt=tgt))
        cp.tgt_type = tgt
        return cp

    def to_reference_bytes(self, compact: bool = True) -> bytes:
        """Cross-language wire image in this sketch's declared storage
        type (serde_compat.write_hll; bit-exact vs the Java/C++ golden
        files)."""
        from .serde_compat import write_hll

        return write_hll(self, tgt=getattr(self, "tgt_type", 8),
                         compact=compact)

    # -- serde (checkpoint form) --------------------------------------------
    def to_bytes(self) -> bytes:
        """Compact checkpoint image (engine-internal, not the reference's
        cross-language binary format)."""
        import struct
        if self.mode != MODE_HLL:
            arr = np.fromiter(sorted(self.coupons), dtype=np.uint64,
                              count=len(self.coupons))
            head = struct.pack("<BBIB", 1, self.lg_k, len(self.coupons), self.mode)
            return head + arr.tobytes()
        self._rebuild_kxq()
        head = struct.pack(
            "<BBIB?d", 2, self.lg_k, 0, MODE_HLL, self.ooo, self.hip_accum
        )
        return head + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HllSketch":
        import struct
        kind, lg_k, count, mode = struct.unpack_from("<BBIB", data, 0)
        sk = cls(lg_k)
        if kind == 1:
            arr = np.frombuffer(data, dtype=np.uint64, offset=7, count=count)
            sk.coupons = dict.fromkeys(int(x) for x in arr)
            sk.mode = mode
            if mode == MODE_SET:
                sk._lg_coupon_arr = LG_INIT_SET_SIZE
                c = len(sk.coupons)
                while (RESIZE_DENOM * c > RESIZE_NUMER * (1 << sk._lg_coupon_arr)
                       and sk._lg_coupon_arr < sk.lg_k - 3):
                    sk._lg_coupon_arr += 1
            return sk
        ooo, hip = struct.unpack_from("<?d", data, 7)
        sk.mode = MODE_HLL
        sk.ooo = ooo
        sk.hip_accum = hip
        sk.registers = np.frombuffer(
            data[struct.calcsize("<BBIB?d"):], dtype=np.uint8
        ).copy()
        sk.rebuild_flag = True
        return sk
