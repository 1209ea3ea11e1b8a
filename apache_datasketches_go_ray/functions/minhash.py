"""128-permutation MinHash signatures and LSH band hashing, vectorized.

The signature is the distributed analogue of the reference's coupon /
register array: permutation i keeps ``min_i(shingles)`` exactly the way an
HLL slot keeps its max rank (hll/hll_8array.go:123-156), and signatures
merge by elementwise min exactly as HLL unions merge by slotwise max
(hll/union.go:376-385) — associative, commutative, bounded-size state.

The permutation family is ``h_i(x) = fmix64(x ^ K_i)`` where fmix64 is
murmur3's 64-bit finalizer — the same avalanche the reference uses as its
cheap re-hash (frequencies/utils.go:57-68) — and the keys K_i derive from
murmur3-128(seed 9001) of the permutation index, so the whole substrate
stays on the parity-pinned hash.
"""

from __future__ import annotations

import numpy as np

from .murmur3 import murmur3_128, fmix64

EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)


def perm_keys(num_perms: int, seed: int = 9001) -> np.ndarray:
    """Deterministic permutation keys from the parity hash substrate."""
    keys = np.empty(num_perms, dtype=np.uint64)
    for i in range(num_perms):
        h1, _ = murmur3_128(f"minhash-perm-{i}".encode(), seed)
        keys[i] = h1
    return keys


def signatures(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    keys: np.ndarray,
) -> np.ndarray:
    """MinHash signatures for many docs at once.

    flat_shingles: uint64 shingle hashes for all docs concatenated;
    offsets: (n_docs+1,) boundaries; keys: (P,) permutation keys.
    Returns (n_docs, P) uint64. Empty docs get all-EMPTY_SLOT signatures.
    """
    n_docs = len(offsets) - 1
    P = len(keys)
    out = np.full((n_docs, P), EMPTY_SLOT, dtype=np.uint64)
    if len(flat_shingles) == 0:
        return out
    lens = np.diff(offsets)
    flat = np.ascontiguousarray(flat_shingles, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)

    # chunk over doc boundaries so each permutation pass works on an
    # L2-resident slice: the P=128 passes re-read the same hot ~4 MB
    # instead of streaming the full shingle array from DRAM 128 times
    CHUNK = 1 << 16
    sub = np.empty(min(len(flat), CHUNK * 2), dtype=np.uint64)
    d0 = 0
    while d0 < n_docs:
        d1 = int(np.searchsorted(offsets, offsets[d0] + CHUNK, side="left"))
        d1 = min(max(d1, d0 + 1), n_docs)
        lo, hi = offsets[d0], offsets[d1]
        if hi == lo:
            d0 = d1
            continue
        part = flat[lo:hi]
        ne = lens[d0:d1] > 0
        starts_local = (offsets[d0:d1][ne] - lo).astype(np.int64)
        docs_local = np.arange(d0, d1)[ne]
        if len(part) > len(sub):
            sub = np.empty(len(part), dtype=np.uint64)
        s = sub[: len(part)]
        col = np.empty(len(starts_local), dtype=np.uint64)
        for p in range(P):
            np.bitwise_xor(part, keys[p], out=s)
            # inline fmix64 (murmur3 finalizer), in place
            s ^= s >> np.uint64(33)
            s *= np.uint64(0xFF51AFD7ED558CCD)
            s ^= s >> np.uint64(33)
            s *= np.uint64(0xC4CEB9FE1A85EC53)
            s ^= s >> np.uint64(33)
            np.minimum.reduceat(s, starts_local, out=col)
            out[docs_local, p] = col
        d0 = d1
    return out


def merge_signatures(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise-min merge — the MinHash union (mirror of slotwise-max
    HLL merge, hll/union.go:376-385)."""
    return np.minimum(a, b)


def band_keys(
    sigs: np.ndarray, num_bands: int, rows_per_band: int
) -> np.ndarray:
    """LSH band hashes: (n_docs, num_bands) uint64.

    Band j covers signature rows [j*r, (j+1)*r); its key is an iterated
    fmix64 fold of the r values seeded with the band index, so different
    bands with identical row values cannot collide.
    """
    n = sigs.shape[0]
    out = np.empty((n, num_bands), dtype=np.uint64)
    for j in range(num_bands):
        acc = fmix64(np.full(n, np.uint64(j + 1), dtype=np.uint64))
        for r in range(rows_per_band):
            acc = fmix64(acc ^ sigs[:, j * rows_per_band + r])
        out[:, j] = acc
    return out


def estimate_jaccard_from_sigs(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased MinHash Jaccard estimate (fraction of agreeing slots)."""
    return float(np.mean(sig_a == sig_b))
