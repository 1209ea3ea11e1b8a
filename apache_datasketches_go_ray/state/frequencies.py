"""Frequent-items (heavy hitters) sketch, Misra-Gries with median purge.

Reimplements the logical algorithm of the reference's frequencies package
(frequencies/longs_sketch.go): counters grow to a max map size; at
capacity the median of the counts is subtracted and added to a global
``offset`` (reverse_purge_long_hash_map.go:151-168 — we take the exact
median of all counters via np.partition instead of the reference's
1024-sample quickselect, a strictly-no-worse deterministic variant), so
for every tracked item:  lower_bound = count <= true <= count + offset =
upper_bound, and the a-priori error is epsilon = 3.5/maxMapSize
(frequencies/longs_sketch.go:275-284).

Merge replays (item, count) pairs and adds offsets
(frequencies/longs_sketch.go:451-466).
"""

from __future__ import annotations

import numpy as np

LOAD_FACTOR = 0.75  # reference loads map to 3/4 (utils.go:41-42)
EPSILON_FACTOR = 3.5  # frequencies/longs_sketch.go:275-284


class FrequentItemsSketch:
    def __init__(self, lg_max_map_size: int = 10):
        if lg_max_map_size < 3:
            raise ValueError("lgMaxMapSize must be >= 3")
        self.lg_max = lg_max_map_size
        self.capacity = int((1 << lg_max_map_size) * LOAD_FACTOR)
        self.counts: dict = {}
        self.offset = 0
        self.stream_weight = 0

    @property
    def epsilon(self) -> float:
        return EPSILON_FACTOR / (1 << self.lg_max)

    def update(self, item, weight: int = 1) -> None:
        if weight <= 0:
            if weight == 0:
                return
            raise ValueError("weight must be >= 0")
        self.stream_weight += weight
        self.counts[item] = self.counts.get(item, 0) + weight
        if len(self.counts) > self.capacity:
            self._purge()

    def update_many(self, items, weights=None) -> None:
        """Batched update with in-batch pre-aggregation (the map_batches
        partial path mirrors pyarrow value_counts -> UpdateMany)."""
        if weights is None:
            vals, cnts = np.unique(np.asarray(items), return_counts=True)
        else:
            vals, cnts = np.asarray(items), np.asarray(weights)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            self.update(v, int(c))

    def _purge(self) -> None:
        vals = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(self.counts))
        median = int(np.partition(vals, len(vals) // 2)[len(vals) // 2])
        self.offset += median
        self.counts = {k: c - median for k, c in self.counts.items()
                       if c - median > 0}

    def merge(self, other: "FrequentItemsSketch") -> None:
        self.stream_weight += other.stream_weight
        for item, c in other.counts.items():
            self.counts[item] = self.counts.get(item, 0) + c
            if len(self.counts) > self.capacity:
                self._purge()
        self.offset += other.offset

    # -- queries ------------------------------------------------------------
    def get_estimate(self, item) -> int:
        c = self.counts.get(item, 0)
        return c + self.offset if c else 0

    def get_lower_bound(self, item) -> int:
        return self.counts.get(item, 0)

    def get_upper_bound(self, item) -> int:
        return self.counts.get(item, 0) + self.offset

    def get_maximum_error(self) -> int:
        return self.offset

    def get_frequent_items(self, error_type: str = "no_false_positives",
                           threshold: int | None = None):
        """frequencies/longs_sketch.go:345-360,558-606. Returns rows of
        (item, estimate, lower_bound, upper_bound) sorted by estimate desc
        then item for determinism."""
        t = max(threshold or 0, self.offset)
        rows = []
        for item, c in self.counts.items():
            lb = c
            ub = c + self.offset
            keep = (lb >= t) if error_type == "no_false_positives" else (ub >= t)
            if keep:
                rows.append((item, ub, lb, ub))
        rows.sort(key=lambda r: (-r[1], str(r[0])))
        return rows

    # -- serde --------------------------------------------------------------
    def to_items(self) -> tuple[list, list]:
        items = sorted(self.counts, key=lambda x: (str(x)))
        return items, [self.counts[i] for i in items]
