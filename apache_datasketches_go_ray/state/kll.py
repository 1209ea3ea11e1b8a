"""KLL quantiles sketch (numeric), mergeable, deterministic compaction.

Reimplements the logical algorithm of the reference's KLL items sketch
(kll/items_sketch.go): level-0 insert buffer, level capacities
k*(2/3)^depth floored at m=8 (kll/items_sketch.go:819-862), deterministic
offset=1 halving (the reference deliberately comments out randomness so
runs are reproducible, kll/items_sketch.go:864-884), merge by replaying
level data and re-compacting, and a weighted sorted view for
rank/quantile/PMF/CDF/partition-boundary queries
(kll/items_sketch_sorted_view.go).

minK tracks the smallest k seen across merges for the error bound
(kll/items_sketch.go:289-291); rank errors follow kll/utils.go:29-36:
  PMF: 2.446 / k^0.9433      CDF: 2.296 / k^0.9723
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 200
MIN_M = 8
PMF_COEF = 2.446
PMF_EXP = 0.9433
CDF_COEF = 2.296
CDF_EXP = 0.9723


def normalized_rank_error(k: int, pmf: bool) -> float:
    """kll/utils.go:137-142."""
    if pmf:
        return PMF_COEF / pow(k, PMF_EXP)
    return CDF_COEF / pow(k, CDF_EXP)


def _level_capacity(k: int, num_levels: int, height: int) -> int:
    """Capacity of the level `height` levels below the top
    (kll/items_sketch.go:839-862): k * (2/3)^depth, floored at MIN_M."""
    depth = num_levels - height - 1
    cap = k
    for _ in range(depth):
        cap = cap * 2 // 3
    return max(cap, MIN_M)


class KllSketch:
    """Floats/ints KLL sketch. Items are float64 internally."""

    def __init__(self, k: int = DEFAULT_K):
        if not (MIN_M <= k <= 65535):
            raise ValueError("k out of range")
        self.k = k
        self.min_k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._compact_count = 0
        self.n = 0
        self.min_item = np.inf
        self.max_item = -np.inf

    # -- update -------------------------------------------------------------
    def update(self, v: float) -> None:
        self.update_many(np.asarray([v], dtype=np.float64))

    def update_many(self, vals: np.ndarray) -> None:
        """Vectorized bulk update (the map_batches partial-agg path).

        Feeds level 0 in capacity-sized chunks so the level structure
        matches item-at-a-time semantics (level 0 never grows past its
        capacity before compacting), keeping the sketch balanced."""
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.n += len(vals)
        self.min_item = min(self.min_item, float(vals.min()))
        self.max_item = max(self.max_item, float(vals.max()))
        pos = 0
        while pos < len(vals):
            cap0 = _level_capacity(self.k, len(self.levels), 0)
            room = max(cap0 - len(self.levels[0]), 32)
            chunk = vals[pos : pos + room]
            pos += len(chunk)
            self.levels[0] = np.concatenate([self.levels[0], chunk])
            self._compress()

    def _capacity(self) -> int:
        return sum(_level_capacity(self.k, len(self.levels), h)
                   for h in range(len(self.levels)))

    def _compress(self) -> None:
        # compress while total items exceed total capacity
        # (compressWhileUpdatingSketch, kll/items_sketch.go:692-762)
        while sum(len(lv) for lv in self.levels) > self._capacity():
            # find lowest level at/over its capacity
            for h in range(len(self.levels)):
                cap = _level_capacity(self.k, len(self.levels), h)
                if len(self.levels[h]) >= cap:
                    break
            lv = np.sort(self.levels[h], kind="stable")
            # Deterministic halving. The reference pins offset=1
            # (kll/items_sketch.go:864-884, commented-out rand), which is
            # reproducible but upward-biased; we alternate the offset per
            # compaction — still fully deterministic for a given update
            # sequence, but unbiased. An odd leftover item stays in the
            # level so total weight is conserved exactly.
            offset = self._compact_count & 1
            self._compact_count += 1
            if len(lv) % 2 == 1:
                keep = lv[:1]
                promoted = lv[1 + offset :: 2]
            else:
                keep = lv[:0]
                promoted = lv[offset::2]
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            self.levels[h] = keep

    # -- merge --------------------------------------------------------------
    def merge(self, other: "KllSketch") -> None:
        """kll/items_sketch.go:555-690: level data is merged level-by-level
        then re-compacted; minK degrades to the smaller k."""
        if other.n == 0:
            return
        self.n += other.n
        self.min_item = min(self.min_item, other.min_item)
        self.max_item = max(self.max_item, other.max_item)
        self.min_k = min(self.min_k, other.min_k)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self._compress()

    # -- queries ------------------------------------------------------------
    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray]:
        """(items sorted, cumulative weights). kll sorted view
        (kll/items_sketch_sorted_view.go:184-272)."""
        items = []
        weights = []
        for h, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], np.cumsum(wt[order])

    def get_quantile(self, rank: float) -> float:
        """Inclusive quantile (kll/items_sketch_sorted_view.go:75-101)."""
        if self.n == 0:
            return float("nan")
        if not (0.0 <= rank <= 1.0):
            raise ValueError("rank must be in [0,1]")
        items, cum = self._sorted_view()
        pos = rank * self.n
        idx = int(np.searchsorted(cum, pos, side="left"))
        if idx >= len(items):
            idx = len(items) - 1
        return float(items[idx])

    def get_rank(self, value: float, inclusive: bool = True) -> float:
        if self.n == 0:
            return float("nan")
        items, cum = self._sorted_view()
        side = "right" if inclusive else "left"
        idx = int(np.searchsorted(items, value, side=side))
        if idx == 0:
            return 0.0
        return float(cum[idx - 1]) / self.n

    def get_pmf(self, split_points: np.ndarray) -> np.ndarray:
        sp = np.asarray(split_points, dtype=np.float64)
        if not (np.diff(sp) > 0).all():
            raise ValueError("split points must be strictly increasing")
        ranks = np.array([self.get_rank(s, inclusive=False) for s in sp] + [1.0])
        return np.diff(np.concatenate([[0.0], ranks]))

    def get_cdf(self, split_points: np.ndarray) -> np.ndarray:
        sp = np.asarray(split_points, dtype=np.float64)
        if not (np.diff(sp) > 0).all():
            raise ValueError("split points must be strictly increasing")
        return np.array([self.get_rank(s, inclusive=False) for s in sp] + [1.0])

    def get_partition_boundaries(self, num_parts: int) -> np.ndarray:
        """Evenly-spaced-rank boundaries for range partitioning
        (kll/items_sketch_partition_boundaries.go:35-59) — used to size
        shuffle partitions / salt fan-out."""
        if self.n == 0:
            return np.empty(0)
        ranks = np.linspace(0, 1, num_parts + 1)
        out = [self.get_quantile(r) for r in ranks]
        out[0] = self.min_item
        out[-1] = self.max_item
        return np.asarray(out)

    # -- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        import struct
        # _compact_count is serialized so the deterministic alternating-
        # offset compaction sequence (kll/kll_sketch.go compressWhile-
        # Updating's offset flip) survives a checkpoint/resume round-trip;
        # dropping it would make resumed merges diverge from in-memory runs.
        head = struct.pack("<IIQddII", self.k, self.min_k, self.n,
                           self.min_item, self.max_item,
                           self._compact_count, len(self.levels))
        parts = [head]
        for lv in self.levels:
            parts.append(struct.pack("<I", len(lv)))
            parts.append(np.ascontiguousarray(lv).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KllSketch":
        import struct
        k, min_k, n, mn, mx, cc, n_levels = struct.unpack_from(
            "<IIQddII", data, 0)
        sk = cls(k)
        sk.min_k, sk.n, sk.min_item, sk.max_item = min_k, n, mn, mx
        sk._compact_count = cc
        off = struct.calcsize("<IIQddII")
        sk.levels = []
        for _ in range(n_levels):
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            sk.levels.append(np.frombuffer(data, dtype=np.float64,
                                           count=cnt, offset=off).copy())
            off += cnt * 8
        return sk


class ItemSketchOp:
    """Pluggable item operations for :class:`KllItemsSketch` — the
    runtime analogue of the reference's ``ItemSketchOp[C]`` interface
    (kll/items_sketch.go:29-37: identity / lessFn / serialize /
    deserialize, ordering type common/types.go:20).

    * ``less_fn`` — optional custom strict ordering; ``None`` means the
      items' natural Python ``<`` (numpy argsort fast path).
    * ``ser_one`` / ``deser_one`` — serialize one item to bytes and
      parse it back; variable-width items are length-prefixed by the
      sketch, fixed-width items declare ``fixed_width`` and skip the
      prefix (mirroring the reference's long vs string layouts).
    """

    def __init__(self, name: str, ser_one, deser_one,
                 less_fn=None, fixed_width: int | None = None):
        self.name = name
        self.ser_one = ser_one
        self.deser_one = deser_one
        self.less_fn = less_fn
        self.fixed_width = fixed_width


def _ser_i64(v):
    import struct
    return struct.pack("<q", int(v))


def _deser_i64(b):
    import struct
    return struct.unpack("<q", b)[0]


def _ser_f64(v):
    import struct
    return struct.pack("<d", float(v))


def _deser_f64(b):
    import struct
    return struct.unpack("<d", b)[0]


STRING_ITEM_OP = ItemSketchOp(
    "string", lambda v: str(v).encode(), lambda b: b.decode())
INT64_ITEM_OP = ItemSketchOp("int64", _ser_i64, _deser_i64, fixed_width=8)
FLOAT64_ITEM_OP = ItemSketchOp("float64", _ser_f64, _deser_f64,
                               fixed_width=8)

_ITEM_OPS = {op.name: op for op in (STRING_ITEM_OP, INT64_ITEM_OP,
                                    FLOAT64_ITEM_OP)}


class KllItemsSketch:
    """Generic ordered-item KLL sketch — the runtime analogue of the
    reference's ``ItemsSketch[C]`` with an injected ordering
    (kll/items_sketch.go:29-37, common/types.go:20); strings are the
    primary item type (the reference's own serde tests use string
    sketches). Identical level machinery to :class:`KllSketch`
    (capacities, deterministic alternating-offset halving, merge by
    level replay), with items held in numpy object arrays so any
    Python-comparable type works.

    ``op`` injects the item operations (ordering + serde) exactly like
    the reference's ``ItemSketchOp[C]``; defaults to string items with
    natural ordering (the golden-file layer in state/serde_compat.py
    stays string-specific)."""

    def __init__(self, k: int = DEFAULT_K, op: ItemSketchOp | None = None):
        if not (MIN_M <= k <= 65535):
            raise ValueError("k out of range")
        self.k = k
        self.min_k = k
        self.op = op or STRING_ITEM_OP
        self.levels: list[np.ndarray] = [np.empty(0, dtype=object)]
        self._compact_count = 0
        self.n = 0
        self.min_item = None
        self.max_item = None

    # -- ordering helpers (natural `<` fast path; injected less_fn
    #    falls back to comparator sorts on the bounded in-sketch arrays)
    def _argsort(self, arr: np.ndarray) -> np.ndarray:
        if self.op.less_fn is None:
            return np.argsort(arr, kind="stable")
        import functools
        less = self.op.less_fn
        keyf = functools.cmp_to_key(
            lambda x, y: -1 if less(x, y) else (1 if less(y, x) else 0))
        return np.asarray(
            sorted(range(len(arr)), key=lambda i: keyf(arr[i])),
            dtype=np.int64)

    def _less(self, a, b) -> bool:
        return a < b if self.op.less_fn is None else self.op.less_fn(a, b)

    # -- update -------------------------------------------------------------
    def update(self, item) -> None:
        self.update_many([item])

    def update_many(self, items) -> None:
        vals = np.asarray([i for i in items if i is not None], dtype=object)
        if len(vals) == 0:
            return
        self.n += len(vals)
        if self.op.less_fn is None:
            lo, hi = min(vals), max(vals)
        else:
            lo = hi = vals[0]
            for v in vals[1:]:
                if self.op.less_fn(v, lo):
                    lo = v
                if self.op.less_fn(hi, v):
                    hi = v
        if self.min_item is None or self._less(lo, self.min_item):
            self.min_item = lo
        if self.max_item is None or self._less(self.max_item, hi):
            self.max_item = hi
        pos = 0
        while pos < len(vals):
            cap0 = _level_capacity(self.k, len(self.levels), 0)
            room = max(cap0 - len(self.levels[0]), 32)
            chunk = vals[pos : pos + room]
            pos += len(chunk)
            self.levels[0] = np.concatenate([self.levels[0], chunk])
            self._compress()

    def _capacity(self) -> int:
        return sum(_level_capacity(self.k, len(self.levels), h)
                   for h in range(len(self.levels)))

    def _compress(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._capacity():
            for h in range(len(self.levels)):
                cap = _level_capacity(self.k, len(self.levels), h)
                if len(self.levels[h]) >= cap:
                    break
            lv = self.levels[h][self._argsort(self.levels[h])]
            offset = self._compact_count & 1
            self._compact_count += 1
            if len(lv) % 2 == 1:
                keep = lv[:1]
                promoted = lv[1 + offset :: 2]
            else:
                keep = lv[:0]
                promoted = lv[offset::2]
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=object))
            self.levels[h + 1] = np.concatenate(
                [self.levels[h + 1], promoted])
            self.levels[h] = keep

    # -- merge --------------------------------------------------------------
    def merge(self, other: "KllItemsSketch") -> None:
        if other.n == 0:
            return
        self.n += other.n
        if other.min_item is not None:
            if self.min_item is None or self._less(other.min_item,
                                                   self.min_item):
                self.min_item = other.min_item
        if other.max_item is not None:
            if self.max_item is None or self._less(self.max_item,
                                                   other.max_item):
                self.max_item = other.max_item
        self.min_k = min(self.min_k, other.min_k)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=object))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self._compress()

    # -- queries ------------------------------------------------------------
    def _sorted_view(self):
        items = []
        weights = []
        for h, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not items:
            return (np.empty(0, dtype=object),
                    np.empty(0, dtype=np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = self._argsort(it)
        return it[order], np.cumsum(wt[order])

    def get_quantile(self, rank: float):
        """Inclusive quantile: in the exact (never-compacted) regime
        this is the ceil(rank*n)-th order statistic — ANSI
        percentile_disc semantics."""
        if self.n == 0:
            return None
        if not (0.0 <= rank <= 1.0):
            raise ValueError("rank must be in [0,1]")
        items, cum = self._sorted_view()
        pos = rank * self.n
        idx = int(np.searchsorted(cum, pos, side="left"))
        if idx >= len(items):
            idx = len(items) - 1
        return items[idx]

    def get_rank(self, item, inclusive: bool = True) -> float:
        if self.n == 0:
            return float("nan")
        items, cum = self._sorted_view()
        if self.op.less_fn is None:
            side = "right" if inclusive else "left"
            idx = int(np.searchsorted(items, item, side=side))
        else:
            less = self.op.less_fn
            idx = 0
            for it in items:  # in-sketch array is O(k log(n/k)) small
                if less(it, item) or (inclusive and not less(item, it)):
                    idx += 1
                else:
                    break
        if idx == 0:
            return 0.0
        return float(cum[idx - 1]) / self.n

    def get_partition_boundaries(self, num_parts: int) -> list:
        """Evenly-spaced-rank item boundaries for range-partitioning a
        string key (kll/items_sketch_partition_boundaries.go:35-59) —
        the generic-items analogue of the numeric sketch's method, used
        to size range shuffles over id-like columns."""
        if self.n == 0:
            return []
        ranks = np.linspace(0, 1, num_parts + 1)
        out = [self.get_quantile(float(r)) for r in ranks]
        out[0] = self.min_item
        out[-1] = self.max_item
        return out

    # -- serde (item layout injected by the op, mirroring the
    #    reference's SerializeManyToSlice/DeserializeFromSlice split:
    #    fixed-width ops pack raw values, variable-width ops are
    #    length-prefixed) ----------------------------------------------------
    def to_bytes(self) -> bytes:
        import struct
        # _compact_count serialized for the same resume-determinism reason
        # as the numeric sketch (see KllSketch.to_bytes).
        parts = [struct.pack("<IIQII", self.k, self.min_k, self.n,
                             self._compact_count, len(self.levels))]
        ser = self.op.ser_one
        fixed = self.op.fixed_width
        for extremum in (self.min_item, self.max_item):
            b = b"" if extremum is None else ser(extremum)
            parts.append(struct.pack("<i", -1 if extremum is None
                                     else len(b)))
            parts.append(b)
        for lv in self.levels:
            parts.append(struct.pack("<I", len(lv)))
            for it in lv:
                b = ser(it)
                if fixed is None:
                    parts.append(struct.pack("<I", len(b)))
                parts.append(b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes,
                   op: ItemSketchOp | None = None) -> "KllItemsSketch":
        import struct
        op = op or STRING_ITEM_OP
        deser = op.deser_one
        fixed = op.fixed_width
        k, min_k, n, cc, n_levels = struct.unpack_from("<IIQII", data, 0)
        off = struct.calcsize("<IIQII")
        sk = cls(k, op=op)
        sk.min_k, sk.n = min_k, n
        sk._compact_count = cc
        ext = []
        for _ in range(2):
            (ln,) = struct.unpack_from("<i", data, off)
            off += 4
            if ln < 0:
                ext.append(None)
            else:
                ext.append(deser(data[off:off + ln]))
                off += ln
        sk.min_item, sk.max_item = ext
        sk.levels = []
        for _ in range(n_levels):
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            items = []
            for _ in range(cnt):
                if fixed is None:
                    (ln,) = struct.unpack_from("<I", data, off)
                    off += 4
                else:
                    ln = fixed
                items.append(deser(data[off:off + ln]))
                off += ln
            sk.levels.append(np.asarray(items, dtype=object))
        return sk
