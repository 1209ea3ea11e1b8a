"""Count-Min Sketch: mergeable point-frequency estimates in fixed memory.

A depth x width int64 matrix; item i adds its weight to one cell per row
(row r's column = murmur3-128 of the item's UTF-8/LE-byte image under
seed 9001 + r, the same hashing discipline as every sketch here —
hll/hll_sketch.go:367-369). A point query is the MINIMUM over the
depth cells, giving the classic one-sided guarantee

    true <= estimate <= true + eps * N   with prob >= 1 - delta,
    eps = e / width,  delta = exp(-depth)      (Cormode & Muthukrishnan)

where N is the total stream weight. The sketch is PERFECTLY mergeable:
merge = elementwise matrix add (sketch(A) + sketch(B) == sketch(A ∪ B),
bit-exact — the same contract the reference's union carries,
hll/union.go:151-158), so the Ray shape is a per-block partial +
elementwise-sum fold with no row limit and ~depth*width*8 bytes of
state regardless of cardinality.

The reference implements no CMS (README.md:38-76 marks it absent in
the Go port's scope); this extends the engine's sketch family with the
same construction/merge/bounds discipline the HLL/KLL/frequencies
ports follow.
"""
from __future__ import annotations

import math

import numpy as np

from ..functions.murmur3 import DEFAULT_UPDATE_SEED, hash_strings


class CountMinSketch:
    def __init__(self, depth: int = 4, lg_width: int = 12,
                 seed: int = DEFAULT_UPDATE_SEED):
        if depth < 1 or depth > 16:
            raise ValueError("depth must be in [1, 16]")
        if lg_width < 3 or lg_width > 26:
            raise ValueError("lg_width must be in [3, 26]")
        self.depth = depth
        self.lg_width = lg_width
        self.width = 1 << lg_width
        self.seed = seed
        self.table = np.zeros((depth, self.width), dtype=np.int64)
        self.stream_weight = 0

    # ---- error bounds ------------------------------------------------------
    @property
    def relative_error(self) -> float:
        """eps: over-estimate is <= eps * stream_weight w.p. 1 - delta."""
        return math.e / self.width

    @property
    def error_probability(self) -> float:
        return math.exp(-self.depth)

    def get_upper_bound(self, item) -> int:
        return self.get_estimate(item)

    def get_lower_bound(self, item) -> int:
        """estimate - eps*N: a conservative (possibly negative) floor."""
        return max(0, self.get_estimate(item)
                   - int(math.ceil(self.relative_error
                                   * self.stream_weight)))

    # ---- update ------------------------------------------------------------
    def _columns(self, items) -> np.ndarray:
        """(depth, n) column indices for the items (strings/bytes)."""
        cols = np.empty((self.depth, len(items)), dtype=np.int64)
        for r in range(self.depth):
            h1, _ = hash_strings(items, seed=(self.seed + r) & 0xFFFFFFFF)
            cols[r] = (h1 & np.uint64(self.width - 1)).astype(np.int64)
        return cols

    def update_many(self, items, weights=None) -> None:
        """Vectorized bulk update (the map_batches partial step): one
        murmur pass per row, one scatter-add per row."""
        n = len(items)
        if n == 0:
            return
        if weights is None:
            w = np.ones(n, dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
            if (w < 0).any():
                raise ValueError("weights must be >= 0")
        cols = self._columns(items)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], w)
        self.stream_weight += int(w.sum())

    def update(self, item, weight: int = 1) -> None:
        self.update_many([item], [weight])

    # ---- query / merge -----------------------------------------------------
    def get_estimate(self, item) -> int:
        return int(self.get_estimates([item])[0])

    def get_estimates(self, items) -> np.ndarray:
        """Vectorized point queries: min over depth cells per item."""
        if len(items) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._columns(items)
        est = self.table[0][cols[0]]
        for r in range(1, self.depth):
            est = np.minimum(est, self.table[r][cols[r]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.lg_width, other.seed) != (
                self.depth, self.lg_width, self.seed):
            raise ValueError("incompatible CMS configurations")
        self.table += other.table
        self.stream_weight += other.stream_weight
        return self

    # ---- serde (engine checkpoint form, little-endian like the wire
    # formats in serde_compat) ------------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.depth, self.lg_width, self.seed,
                         self.stream_weight], dtype="<i8").tobytes()
        return head + self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketch":
        head = np.frombuffer(buf[:32], dtype="<i8")
        sk = cls(depth=int(head[0]), lg_width=int(head[1]),
                 seed=int(head[2]))
        sk.stream_weight = int(head[3])
        sk.table = np.frombuffer(
            buf[32:], dtype="<i8").reshape(sk.depth, sk.width).copy()
        return sk
