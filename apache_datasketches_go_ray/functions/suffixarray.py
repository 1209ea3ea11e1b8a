"""Suffix array construction + longest-common-substring, for the
containment verification pass.

Prefix-doubling construction with numpy argsort (O(n log^2 n)), Kasai LCP.
Used to decide containment duplicates: a pair (A, B) is a containment dup
when their longest common substring covers at least ``frac`` of the
shorter text (FIXTURES.md F2 'containment': a copy keeping a contiguous
50-80% turn range).
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (values >= 0)."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(data, dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k])
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order
        # recompute ranks
        tmp[sa[0]] = 0
        prev_r = rank[sa[:-1]]
        cur_r = rank[sa[1:]]
        prev_s = second[sa[:-1]]
        cur_s = second[sa[1:]]
        newgrp = (cur_r != prev_r) | (cur_s != prev_s)
        tmp[sa[1:]] = np.cumsum(newgrp)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm; lcp[i] = LCP(sa[i], sa[i-1]), lcp[0] = 0."""
    n = len(data)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and data[i + h] == data[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: bytes | str, b: bytes | str) -> int:
    """Length of the longest common substring via suffix array + LCP over
    the separated concatenation."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    if not a or not b:
        return 0
    # fast path: direct containment
    if len(a) <= len(b) and a in b:
        return len(a)
    if len(b) < len(a) and b in a:
        return len(b)
    xa = np.frombuffer(a, dtype=np.uint8).astype(np.int64) + 2
    xb = np.frombuffer(b, dtype=np.uint8).astype(np.int64) + 2
    data = np.concatenate([xa, [1], xb])  # separator 1 < all symbols+2
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    na = len(xa)
    side = sa < na  # suffix starts in a (the separator belongs to 'b' side)
    if len(sa) < 2:
        return 0
    cross = side[1:] != side[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def is_containment_dup(a: str, b: str, frac: float) -> bool:
    """True when the longest shared substring covers >= frac of the
    shorter text."""
    if not a or not b:
        return False
    lcs = longest_common_substring(a, b)
    return lcs >= frac * min(len(a.encode()), len(b.encode()))
