"""Tokenization and k-gram shingling over Arrow batches, fully vectorized.

Canonical encoding rule (mirrors the reference's item canonicalization,
hll/hll_sketch.go:274-295): a token is hashed as its UTF-8 bytes with
murmur3-128 seed 9001 (h1 kept as the 64-bit token hash) — that is the
bit-parity surface vs. the reference. A k-gram shingle is then an fmix64
fold (murmur3's 64-bit finalizer, the reference's cheap re-hash,
frequencies/utils.go:57-68) of its k token hashes, seeded with the
window's effective length: acc = fmix64(len); acc = fmix64(acc ^ h_j).
Pure uint64 lanes — ~16x cheaper than re-running full murmur3 over the
concatenated byte image while staying on the parity-pinned substrate.
Everything downstream (MinHash, bands, clusters) inherits
reproducibility from this rule.

Hot path design: tokens are dictionary-encoded per batch so each distinct
token is murmur-hashed once; shingle windows are built with numpy stride
tricks; no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .murmur3 import fmix64, hash_strings


def tokenize_column(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a string column; hash each token to uint64.

    Returns (flat_token_hashes, doc_offsets) where doc i's token hashes are
    flat[offsets[i]:offsets[i+1]].
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # native whitespace splitter (same token stream as r"\s+" splitting
    # after trim, ~3x faster than the regex kernel)
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    # null / empty strings produce empty lists after fill
    toks = pc.if_else(pc.is_valid(toks), toks, pa.scalar([], type=toks.type))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    # offsets may not start at 0 if `values` is a slice; normalize
    offsets = offsets - offsets[0]
    # drop empty tokens (splitting "" yields one empty token)
    tok_lens = (
        pc.binary_length(flat).to_numpy(zero_copy_only=False)
        if len(flat)
        else np.empty(0, dtype=np.int64)
    )
    keep = tok_lens > 0
    if not keep.all():
        doc_of_tok = np.repeat(
            np.arange(len(offsets) - 1), np.diff(offsets)
        )
        kept_counts = np.bincount(doc_of_tok[keep], minlength=len(offsets) - 1)
        offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
        flat = flat.filter(pa.array(keep))
    # hash only distinct tokens (dictionary encode), then gather
    dict_arr = pc.dictionary_encode(flat)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    h1, _ = hash_strings(dict_arr.dictionary)
    indices = dict_arr.indices.to_numpy(zero_copy_only=False)
    token_hashes = h1[indices] if len(indices) else np.empty(0, dtype=np.uint64)
    return token_hashes, offsets


def shingle_hashes(
    token_hashes: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle hashes per document, deduplicated and sorted.

    Documents with fewer than k tokens contribute one shingle over all
    their tokens (zero-padded window) so short docs still participate.
    Returns (flat_shingles, doc_offsets) with each doc's shingles sorted
    unique uint64.
    """
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    # pad the flat array with k-1 zeros so windows at doc tails are valid
    padded = np.concatenate([token_hashes, np.zeros(k - 1, dtype=np.uint64)])
    if len(padded) >= k:
        windows = np.lib.stride_tricks.sliding_window_view(padded, k)
    else:
        windows = np.zeros((0, k), dtype=np.uint64)

    # valid window starts: for doc i with L tokens, starts offsets[i] ..
    # offsets[i] + max(L - k, 0)  (short docs -> single zero-padded window)
    n_sh = np.maximum(lens - k + 1, 1)
    n_sh = np.where(lens == 0, 0, n_sh)
    starts_rep = np.repeat(offsets[:-1], n_sh)
    within = _ranges(n_sh)
    window_idx = starts_rep + within

    sel = windows[window_idx]  # (total_shingles, k) uint64
    doc_of_window = np.repeat(np.arange(n_docs), n_sh)
    # hash each window: fmix64 fold over the min(L, k) real token hashes
    # (zero-padding past a short doc's length is excluded via the mask),
    # seeded with the effective window length
    eff = (np.minimum(lens[doc_of_window], k).astype(np.uint64)
           if len(sel) else np.empty(0, np.uint64))
    h1 = fmix64(eff)
    for j in range(k):
        mask = np.uint64(j) < eff
        h1 = np.where(mask, fmix64(h1 ^ sel[:, j]), h1)

    # dedup + sort per doc
    order = np.lexsort((h1, doc_of_window))
    d_sorted = doc_of_window[order]
    h_sorted = h1[order]
    keep = np.ones(len(h_sorted), dtype=bool)
    if len(h_sorted) > 1:
        keep[1:] = (h_sorted[1:] != h_sorted[:-1]) | (d_sorted[1:] != d_sorted[:-1])
    d_keep = d_sorted[keep]
    h_keep = h_sorted[keep]
    counts = np.bincount(d_keep, minlength=n_docs)
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    return h_keep, out_offsets


def shingles_of_texts(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Convenience: texts (pa.Array | list[str]) -> sorted unique shingle
    hash sets as (flat, offsets)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.string())
    th, off = tokenize_column(texts)
    return shingle_hashes(th, off, k)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,0,2] -> [0,1,2,0,1] (vectorized per-segment aranges)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    idx = np.arange(total, dtype=np.int64)
    return idx - np.repeat(starts, counts)
