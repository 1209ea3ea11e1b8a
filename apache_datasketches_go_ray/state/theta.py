"""Theta/KMV distinct-count sketch with SET OPERATIONS (union,
intersect, a-not-b) — net-new beyond the reference (datasketches-go
ports hll/kll/frequencies only); the algorithm is public (Beyer et al.
2007 k-minimum-values; Dasgupta et al. 2016 theta sketch framework).

Hash substrate: the engine's vectorized murmur3-128 h1 with
DEFAULT_UPDATE_SEED — the same int64-LE / UTF-8 canonicalization
discipline the HLL runtime uses (reference hll/hll_sketch.go:338-343),
so a value hashes identically everywhere in the engine.

Semantics: keep the k smallest distinct 64-bit hashes strictly below
theta. While fewer than k distinct hashes have been seen, theta stays
2^64 and every estimate is the EXACT retained count — the regime the
DuckDB value-exact oracle pins at test scale; at corpus scale the same
operator degrades to the bounded-error sketch (rse ~ 1/sqrt(k-1)).
When full: theta = k-th smallest hash (exclusive), k-1 hashes retained,
estimate = retained / (theta / 2^64).

Set ops operate at theta' = min(theta_a, theta_b) — both retained sets
are uniform samples of their streams below theta', so intersection /
difference of the SETS estimates intersection / difference of the
STREAMS scaled by 1/theta' (the standard theta-sketch argument).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_THETA = float(2 ** 64)


class ThetaSketch:
    """Sorted distinct uint64 hashes below theta; mergeable."""

    __slots__ = ("k", "hashes", "_theta")

    def __init__(self, k: int = 4096):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.hashes = np.empty(0, dtype=np.uint64)
        self._theta = 2 ** 64            # exclusive upper bound (int)

    # -- updates ----------------------------------------------------------

    def update_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            return
        if self._theta < 2 ** 64:
            h = h[h < np.uint64(self._theta)]
        self.hashes = np.union1d(self.hashes, h)
        self._trim()

    def _trim(self) -> None:
        if len(self.hashes) >= self.k:
            self._theta = int(self.hashes[self.k - 1])
            self.hashes = self.hashes[: self.k - 1]

    # -- queries ----------------------------------------------------------

    @property
    def theta(self) -> float:
        return self._theta / _MAX_THETA

    @property
    def is_exact(self) -> bool:
        return self._theta == 2 ** 64

    def get_estimate(self) -> float:
        return len(self.hashes) / self.theta

    def get_retained(self) -> int:
        return len(self.hashes)

    # -- set operations ----------------------------------------------------

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """In-place union (gadget form, like HllSketch.merge)."""
        self._theta = min(self._theta, other._theta)
        t = np.uint64(self._theta) if self._theta < 2 ** 64 else None
        mine = self.hashes if t is None else self.hashes[self.hashes < t]
        theirs = other.hashes if t is None \
            else other.hashes[other.hashes < t]
        self.hashes = np.union1d(mine, theirs)
        self._trim()
        return self

    @staticmethod
    def intersect(a: "ThetaSketch", b: "ThetaSketch") -> "ThetaSketch":
        out = ThetaSketch(min(a.k, b.k))
        out._theta = min(a._theta, b._theta)
        common = np.intersect1d(a.hashes, b.hashes)
        if out._theta < 2 ** 64:
            common = common[common < np.uint64(out._theta)]
        out.hashes = common
        return out

    @staticmethod
    def a_not_b(a: "ThetaSketch", b: "ThetaSketch") -> "ThetaSketch":
        out = ThetaSketch(a.k)
        out._theta = min(a._theta, b._theta)
        diff = np.setdiff1d(a.hashes, b.hashes)
        if out._theta < 2 ** 64:
            diff = diff[diff < np.uint64(out._theta)]
        out.hashes = diff
        return out

    # -- serde (engine-internal wire form, version-tagged) ------------------

    def to_bytes(self) -> bytes:
        return (struct.pack("<BIQI", 1, self.k,
                            self._theta % (2 ** 64)
                            if self._theta < 2 ** 64 else 0,
                            len(self.hashes))
                + self.hashes.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        ver, k, theta_raw, n = struct.unpack_from("<BIQI", data, 0)
        if ver != 1:
            raise ValueError(f"unknown theta serde version {ver}")
        sk = cls(k)
        sk._theta = theta_raw if theta_raw else 2 ** 64
        sk.hashes = np.frombuffer(data, dtype="<u8", count=n,
                                  offset=struct.calcsize("<BIQI")).copy()
        return sk


def hash_int64_values(values: np.ndarray) -> np.ndarray:
    """int64 values -> uint64 theta hashes (murmur3-128 h1, engine
    seed, little-endian 8-byte canonical form — the HLL discipline)."""
    from ..functions.murmur3 import murmur3_128_u64

    h1, _ = murmur3_128_u64(np.asarray(values, dtype=np.int64)
                            .astype(np.uint64))
    return h1.astype(np.uint64)
