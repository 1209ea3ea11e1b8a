"""LSH banding -> candidate pairs.

Shuffle #2 (band key) and #3 (pair dedup). Band rows are exploded as
(band_hash, conv_id) — band index is already folded into the hash
(functions/minhash.band_keys) so a single uint64 key carries both.
Hash-partitioning by band_hash co-locates each bucket in one block; pair
emission is then a vectorized in-block group scan, not per-group Python.

Skew handling (SURVEY §7.8): identical boilerplate produces mega-buckets
whose naive pair count is g·(g-1)/2. Buckets larger than
``max_band_group`` emit a sorted consecutive chain (g-1 pairs) instead of
the quadratic set: connectivity within the bucket (what union-find needs)
is preserved while the pair count stays linear. The same rule runs in the
single-process oracle, so clusters stay identical. Bucket membership is
global (independent of partitioning), so the emitted pair set is
deterministic under any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig


def explode_bands(batch: pa.Table) -> pa.Table:
    """signature rows -> (band_hash, conv_id, sig_digest) rows."""
    from .arrow_util import as_array

    bands = as_array(batch.column("bands"))
    flat = bands.flatten().to_numpy(zero_copy_only=False)
    n_bands = len(flat) // max(len(batch), 1) if len(batch) else 0
    rep = pa.array(np.repeat(np.arange(len(batch)), n_bands))
    return pa.table({"band_hash": pa.array(flat, type=pa.uint64()),
                     "conv_id": batch.column("conv_id").take(rep),
                     "sig_digest": batch.column("sig_digest").take(rep)})


def _digest_matrix(col, n: int) -> np.ndarray:
    """Fixed-width large_binary digest column -> (n, slots) uint8."""
    from .arrow_util import as_array

    arr = as_array(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1]
    width = int(offs[1] - offs[0])
    vals = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    base = int(offs[0])
    return vals[base : base + n * width].reshape(n, width)


def pairs_in_block(batch: pa.Table, max_group: int,
                   min_matches: int) -> pa.Table:
    """Emit digest-prefiltered candidate pairs for every band bucket in
    this block. A pair survives only if >= min_matches of its sampled
    signature slots agree — rejecting the mass of low-Jaccard band
    collisions here, before any payload ever ships."""
    n = len(batch)
    bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
    conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
    dig = _digest_matrix(batch.column("sig_digest"), n)
    order = np.lexsort((conv, bh))
    bh_s = bh[order]
    conv_s = conv[order]
    dig_s = dig[order] if n else dig
    # bucket boundaries
    newgrp = np.ones(len(bh_s), dtype=bool)
    if len(bh_s) > 1:
        newgrp[1:] = bh_s[1:] != bh_s[:-1]
    starts = np.flatnonzero(newgrp)
    ends = np.concatenate([starts[1:], [len(bh_s)]])
    a_out: list = []
    b_out: list = []
    for s, e in zip(starts, ends):
        g = e - s
        if g < 2:
            continue
        members, first = np.unique(conv_s[s:e], return_index=True)
        g = len(members)
        if g < 2:
            continue
        mdig = dig_s[s:e][first]
        if g <= max_group:
            ia, ib = np.triu_indices(g, k=1)
        else:
            # skew cap: sorted consecutive chain bounds pair count while
            # preserving bucket connectivity
            ia = np.arange(g - 1)
            ib = ia + 1
        keep = (mdig[ia] == mdig[ib]).sum(axis=1) >= min_matches
        if keep.any():
            a_out.append(members[ia[keep]])
            b_out.append(members[ib[keep]])
    if a_out:
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
    else:
        a = np.empty(0, dtype=object)
        b = np.empty(0, dtype=object)
    return pa.table({"a": pa.array(a, type=pa.string()),
                     "b": pa.array(b, type=pa.string())})


def dedup_pairs_block(batch: pa.Table) -> pa.Table:
    """Per-block pair dedup (pairs were hash-partitioned on (a, b))."""
    if len(batch) == 0:
        return batch
    import pyarrow.compute as pc
    return batch.group_by(["a", "b"]).aggregate([]).select(["a", "b"])


def candidate_pairs(sig_ds, config: DedupConfig, *, dedup: bool = True):
    """signature table -> candidate pair table (a < b).

    ``dedup=True`` adds a hash shuffle on (a, b) that removes pairs
    emitted by several colliding bands. The full pipeline passes
    ``dedup=False``: verify_pairs' first co-partition join already
    hash-partitions pairs on ``a`` (same-key colocation), so the dedup
    happens for free inside that join's block scan and the extra
    all-to-all exchange is skipped."""
    from .context import auto_partitions

    P = auto_partitions(sig_ds.count() * config.num_bands, 200_000,
                        config.num_partitions)
    pairs = (
        sig_ds.map_batches(explode_bands, batch_format="pyarrow",
                           zero_copy_batch=True)
        .repartition(P, keys=["band_hash"])
        .map_batches(
            lambda b: pairs_in_block(b, config.max_band_group,
                                     config.prefilter_min_matches),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
    )
    if not dedup:
        return pairs
    return (
        pairs.repartition(P, keys=["a", "b"])
        .map_batches(dedup_pairs_block, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
    )
