"""Exact Jaccard / containment over sorted-unique uint64 shingle sets."""

from __future__ import annotations

import numpy as np


def intersect_size(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| for sorted unique uint64 arrays."""
    if len(a) == 0 or len(b) == 0:
        return 0
    return len(np.intersect1d(a, b, assume_unique=True))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = intersect_size(a, b)
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def containment(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| / min(|A|, |B|) — 1.0 when the smaller set is contained."""
    m = min(len(a), len(b))
    if m == 0:
        return 1.0 if len(a) == len(b) else 0.0
    return intersect_size(a, b) / m


def jaccard_many(
    flat: np.ndarray,
    offsets: np.ndarray,
    left_idx: np.ndarray,
    right_idx: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish exact Jaccard + containment for many index pairs over
    one shingle store. Returns (jaccard, containment) float arrays."""
    n = len(left_idx)
    jac = np.empty(n, dtype=np.float64)
    con = np.empty(n, dtype=np.float64)
    for i in range(n):
        a = flat[offsets[left_idx[i]] : offsets[left_idx[i] + 1]]
        b = flat[offsets[right_idx[i]] : offsets[right_idx[i] + 1]]
        inter = intersect_size(a, b)
        union = len(a) + len(b) - inter
        jac[i] = inter / union if union else 1.0
        m = min(len(a), len(b))
        con[i] = inter / m if m else (1.0 if len(a) == len(b) else 0.0)
    return jac, con
