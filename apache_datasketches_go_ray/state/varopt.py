"""VarOpt-style weighted reservoir sampling: a mergeable bounded-k
weighted sample with the tau / heavy-heap split.

The reference marks the sampling family (VarOpt / reservoir) as not
implemented in its own scope (README.md:57-60); this extends the
engine's sketch surface with the canonical mergeable weighted sampler a
curation pipeline needs for corpus subsampling, following the same
construction/merge/bounds discipline as the HLL/KLL/frequencies ports.

Structure (the VarOpt state shape, Cohen et al. 2009, "Stream sampling
for variance-optimal estimation of subset sums"): after seeing more
than k items the sketch holds

  * H — "heavy" items with weight > tau, kept EXACTLY;
  * R — k - |H| "light" items, each carried at the threshold weight tau;

and the subset-sum estimator sums max(weight, tau) over retained items
matching a predicate — unbiased over the randomization.

Determinism: the classic algorithm consumes fresh randomness at each
eviction, which would make the realized sample depend on partition
order. This engine's merge discipline (every distributed fold must be a
pure function of the data — the reference pins the same property with
its isomorphism tests) replaces it with COORDINATED per-item variates
u_i = murmur3(item, seed) / 2^64, i.e. priority sampling (Duffield,
Lund & Thorup 2007): keep the k largest priorities p_i = w_i / u_i and
set tau to the largest evicted priority. The estimator max(w_i, tau) is
the Duffield-Lund-Thorup unbiased subset-sum estimator; the retained
set is a pure function of the item multiset, so merge(A, B) ==
single-pass(A ∪ B) bit-for-bit at ANY partitioning — the merge-parity
property tested in tests/test_varopt.py. Heavy/light split falls out
identically: w_i >= tau ⟹ always retained with exact weight.

Exact regime: with n <= k every item is retained at its exact weight
and tau == 0 — SQL-oracle-checkable (the varopt_sample_docs query).

Wire format (engine-native; the reference has no VarOpt serde to match):
  u8 version=1 | u8 flags | u16 unused | u32 k | u64 tau_bits(float64)
  | u64 total_weight_bits | u64 n_items | n_items x
  (u64 item_len | item utf-8 bytes | f64 weight) — all LE.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.murmur3 import DEFAULT_UPDATE_SEED, hash_strings

_TWO64 = float(1 << 64)


class VarOptSketch:
    """Bounded-k mergeable weighted sample (tau/heavy split)."""

    def __init__(self, k: int, seed: int = DEFAULT_UPDATE_SEED):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.tau = 0.0            # largest evicted priority
        self.total_weight = 0.0   # exact stream weight (all updates)
        self.n_stream = 0
        # retained state, parallel lists: item (str), weight (float),
        # priority (float)
        self._items: list[str] = []
        self._weights: list[float] = []
        self._prios: list[float] = []

    # ---- update ------------------------------------------------------------
    def _priority(self, items) -> np.ndarray:
        h1, _ = hash_strings(list(items), seed=self.seed)
        # u in (0, 1]: +1 keeps u > 0 so w/u is finite
        return (h1.astype(np.float64) + 1.0) / _TWO64

    def update(self, item, weight: float) -> None:
        self.update_many([item], [weight])

    def update_many(self, items, weights) -> None:
        items = [str(i) for i in items]
        w = np.asarray(weights, dtype=np.float64)
        if len(items) != len(w):
            raise ValueError("items/weights length mismatch")
        if len(items) == 0:
            return
        if (w < 0).any():
            raise ValueError("weights must be >= 0")
        u = self._priority(items)
        self.n_stream += len(items)
        self.total_weight += float(w.sum())
        self._items.extend(items)
        self._weights.extend(float(x) for x in w)
        self._prios.extend(float(x) for x in (w / u))
        if len(self._items) > self.k:
            self._trim()

    def _trim(self) -> None:
        """Keep the k largest priorities; tau rises to the largest
        evicted priority. Deterministic tie-break: priority desc, then
        item asc (UTF-8 order) — a pure function of the data."""
        n = len(self._items)
        if n <= self.k:
            return
        it = np.asarray(self._items, dtype=object)
        pr = np.asarray(self._prios, dtype=np.float64)
        wt = np.asarray(self._weights, dtype=np.float64)
        order = np.lexsort((it, -pr))
        keep = order[: self.k]
        evicted = order[self.k:]
        self.tau = max(self.tau, float(pr[evicted].max()))
        self._items = [str(x) for x in it[keep]]
        self._weights = [float(x) for x in wt[keep]]
        self._prios = [float(x) for x in pr[keep]]

    # ---- merge -------------------------------------------------------------
    def merge(self, other: "VarOptSketch") -> None:
        if other.k != self.k or other.seed != self.seed:
            raise ValueError("cannot merge VarOpt sketches with "
                             "different k or seed")
        self.tau = max(self.tau, other.tau)
        self.total_weight += other.total_weight
        self.n_stream += other.n_stream
        self._items.extend(other._items)
        self._weights.extend(other._weights)
        self._prios.extend(other._prios)
        # coordinated priorities: duplicates of the same (item, weight)
        # entry across partials carry identical priority, so the union
        # trim reproduces the single-pass sketch exactly
        if len(self._items) > self.k:
            self._trim()

    # ---- results -----------------------------------------------------------
    def result(self):
        """Retained rows as (item, weight, adjusted_weight, is_heavy),
        sorted by priority desc then item asc. adjusted_weight =
        max(weight, tau) is the unbiased subset-sum estimator weight;
        heavy rows (weight >= tau) are exact."""
        it = np.asarray(self._items, dtype=object)
        pr = np.asarray(self._prios, dtype=np.float64)
        wt = np.asarray(self._weights, dtype=np.float64)
        order = np.lexsort((it, -pr))
        out = []
        for i in order:
            w = float(wt[i])
            adj = max(w, self.tau)
            out.append((str(it[i]), w, adj, w >= self.tau))
        return out

    def estimate_subset_sum(self, predicate=None) -> dict:
        """Unbiased estimate of the total weight of items matching
        ``predicate`` (None = the whole stream: returns the exact total
        for the full-stream query, like the reference's sketches report
        exact stream totals)."""
        if predicate is None:
            return {"estimate": self.total_weight,
                    "total_weight": self.total_weight}
        est = 0.0
        for item, w, adj, _heavy in self.result():
            if predicate(item):
                est += adj
        return {"estimate": est, "total_weight": self.total_weight}

    # ---- serde -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        out = [struct.pack("<BBHIdQ", 1, 0, 0, self.k, self.tau,
                           self.n_stream)]
        out.append(struct.pack("<d", self.total_weight))
        out.append(struct.pack("<Q", len(self._items)))
        for item, w in zip(self._items, self._weights):
            bs = item.encode("utf-8")
            out.append(struct.pack("<Q", len(bs)))
            out.append(bs)
            out.append(struct.pack("<d", w))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, buf: bytes, seed: int = DEFAULT_UPDATE_SEED
                   ) -> "VarOptSketch":
        ver, _fl, _u, k, tau, n_stream = struct.unpack_from("<BBHIdQ",
                                                            buf, 0)
        if ver != 1:
            raise ValueError(f"unsupported VarOpt serde version {ver}")
        off = struct.calcsize("<BBHIdQ")
        (total_w,) = struct.unpack_from("<d", buf, off)
        off += 8
        (n_items,) = struct.unpack_from("<Q", buf, off)
        off += 8
        sk = cls(k, seed=seed)
        sk.tau = tau
        sk.total_weight = total_w
        sk.n_stream = n_stream
        items, weights = [], []
        for _ in range(n_items):
            (ln,) = struct.unpack_from("<Q", buf, off)
            off += 8
            items.append(buf[off:off + ln].decode("utf-8"))
            off += ln
            (w,) = struct.unpack_from("<d", buf, off)
            off += 8
            weights.append(w)
        sk._items = items
        sk._weights = weights
        sk._prios = [float(p) for p in
                     (np.asarray(weights, dtype=np.float64)
                      / sk._priority(items))] if items else []
        return sk
