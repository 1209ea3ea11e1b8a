"""LSH banding -> candidate pairs, with salted repartitioning for hot keys.

Shuffle #2 (band key) and #3 (pair dedup). Band rows are exploded as
(band_hash, conv_id) — band index is already folded into the hash
(functions/minhash.band_keys) so a single uint64 key carries both.
Hash-partitioning by band_hash co-locates each bucket in one block; pair
emission is then a vectorized in-block group scan, not per-group Python.

Skew handling (SURVEY §7.8, north_rule "band-key skew handled via salted
repartitioning"):

* **Chain cap** — buckets larger than ``max_band_group`` emit a sorted
  consecutive chain (g-1 pairs) instead of the quadratic set:
  connectivity within the bucket (what union-find needs) is preserved
  while the pair count stays linear.
* **Salted repartitioning** — a single mega-bucket (identical boilerplate
  across millions of convs) would otherwise land wholly in ONE shuffle
  partition. A deterministic conv-id sample (murmur % hot_sample_rate)
  is counted per bucket BEFORE the shuffle; buckets over the sampled
  threshold are "hot" and their rows get ``salt = murmur(conv_id) %
  hot_key_salt``, spreading the bucket across shards. Each shard chains
  its members, and one representative (min member) per shard flows into
  a tiny second pass that chains representatives per bucket, restoring
  cross-shard connectivity. All decisions are pure functions of the data
  (never of the partitioning), so the single-process oracle reproduces
  the exact pair set and clusters stay identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import DedupConfig
from ..functions.murmur3 import hash_strings


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


def detect_hot_bands(sig_ds, config: DedupConfig) -> np.ndarray:
    """Sorted uint64 array of hot band hashes (sampled-count rule).

    Partition-independent: membership in the sample is decided by
    murmur(conv_id) % hot_sample_rate, so the result is a pure function
    of the data. The sampled band rows are ~1/rate of the full explode,
    value-counted per block and merged on the driver (tiny at the
    configured rate; raise hot_sample_rate with corpus size to keep the
    driver merge bounded)."""
    rate = np.uint64(config.hot_sample_rate)

    def partial(batch: pa.Table) -> pa.Table:
        from .arrow_util import as_array

        conv = as_array(batch.column("conv_id")).to_pylist()
        h, _ = hash_strings(conv)
        mask = h % rate == 0
        if not mask.any():
            return pa.table({"h": pa.array([], type=pa.uint64()),
                             "cnt": pa.array([], type=pa.int64())})
        bands = as_array(batch.column("bands"))
        flat = bands.flatten().to_numpy(zero_copy_only=False)
        n_bands = len(flat) // max(len(batch), 1)
        sel = flat.reshape(len(batch), n_bands)[mask].reshape(-1)
        uniq, cnt = np.unique(sel, return_counts=True)
        return pa.table({"h": pa.array(uniq, type=pa.uint64()),
                         "cnt": pa.array(cnt, type=pa.int64())})

    totals: dict[int, int] = {}
    for blk in sig_ds.select_columns(["conv_id", "bands"]).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        hs = blk.column("h").to_numpy(zero_copy_only=False)
        cs = blk.column("cnt").to_numpy(zero_copy_only=False)
        for hh, cc in zip(hs.tolist(), cs.tolist()):
            totals[hh] = totals.get(hh, 0) + cc
    hot = np.array(
        sorted(h for h, c in totals.items() if c >= config.hot_sampled_count),
        dtype=np.uint64,
    )
    return hot


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership of uint64 values in a sorted uint64 array."""
    if len(sorted_arr) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    idx[idx >= len(sorted_arr)] = 0
    return sorted_arr[idx] == values


def explode_bands_salted(batch: pa.Table, hot_ref) -> pa.Table:
    """explode_bands + salt column: rows of hot buckets are spread by
    murmur(conv_id) % hot_key_salt (encoded in the salt value passed via
    the broadcast tuple), others keep salt 0."""
    from .arrow_util import as_array

    hot, n_salt = ray.get(hot_ref)
    out = explode_bands(batch)
    bh = out.column("band_hash").to_numpy(zero_copy_only=False)
    conv = as_array(out.column("conv_id")).to_pylist()
    h, _ = hash_strings(conv)
    salt = np.where(_in_sorted(bh, hot),
                    (h % np.uint64(n_salt)).astype(np.int32),
                    np.int32(0))
    return out.append_column("salt", pa.array(salt, type=pa.int32()))


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


def _emit_group_pairs(members: np.ndarray, mdig: np.ndarray, max_group: int,
                      min_matches: int):
    """Cap-rule pair emission + digest prefilter for one (sub)bucket."""
    g = len(members)
    if g <= max_group:
        ia, ib = np.triu_indices(g, k=1)
    else:
        # skew cap: sorted consecutive chain bounds pair count while
        # preserving bucket connectivity
        ia = np.arange(g - 1)
        ib = ia + 1
    keep = (mdig[ia] == mdig[ib]).sum(axis=1) >= min_matches
    return members[ia[keep]], members[ib[keep]]


def _sorted_groups(batch: pa.Table, with_salt: bool):
    """Sort the block's band rows and yield (start, end, bh, order arrays).

    Returns (conv_s, dig_s, bh_s, starts, ends)."""
    n = len(batch)
    bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
    conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
    dig = _digest_matrix(batch.column("sig_digest"), n)
    if with_salt:
        salt = batch.column("salt").to_numpy(zero_copy_only=False)
        order = np.lexsort((conv, salt, bh))
        salt_s = salt[order]
    else:
        order = np.lexsort((conv, bh))
        salt_s = None
    bh_s = bh[order]
    conv_s = conv[order]
    dig_s = dig[order] if n else dig
    newgrp = np.ones(len(bh_s), dtype=bool)
    if len(bh_s) > 1:
        newgrp[1:] = bh_s[1:] != bh_s[:-1]
        if salt_s is not None:
            newgrp[1:] |= salt_s[1:] != salt_s[:-1]
    starts = np.flatnonzero(newgrp)
    ends = np.concatenate([starts[1:], [len(bh_s)]])
    return conv_s, dig_s, bh_s, starts, ends


def pairs_in_block(batch: pa.Table, max_group: int,
                   min_matches: int) -> pa.Table:
    """Emit digest-prefiltered candidate pairs for every band bucket in
    this block. A pair survives only if >= min_matches of its sampled
    signature slots agree — rejecting the mass of low-Jaccard band
    collisions here, before any payload ever ships."""
    conv_s, dig_s, _bh_s, starts, ends = _sorted_groups(batch, False)
    a_out: list = []
    b_out: list = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        members, first = np.unique(conv_s[s:e], return_index=True)
        if len(members) < 2:
            continue
        a, b = _emit_group_pairs(members, dig_s[s:e][first], max_group,
                                 min_matches)
        if len(a):
            a_out.append(a)
            b_out.append(b)
    a = np.concatenate(a_out) if a_out else np.empty(0, dtype=object)
    b = np.concatenate(b_out) if b_out else np.empty(0, dtype=object)
    return pa.table({"a": pa.array(a, type=pa.string()),
                     "b": pa.array(b, type=pa.string())})


def pairs_and_reps_in_block(batch: pa.Table, max_group: int,
                            min_matches: int, hot_ref) -> pa.Table:
    """Salted variant: groups are (band_hash, salt) shards. Hot buckets
    additionally emit one representative row (their min member + digest)
    per shard for the cross-shard chaining pass. Output union schema:
    pair rows (is_rep=false, a/b set) and rep rows (is_rep=true,
    band_hash/conv_id/sig_digest set)."""
    hot, _n_salt = ray.get(hot_ref)
    conv_s, dig_s, bh_s, starts, ends = _sorted_groups(batch, True)
    a_out: list = []
    b_out: list = []
    rep_bh: list = []
    rep_conv: list = []
    rep_dig: list = []
    for s, e in zip(starts, ends):
        members, first = np.unique(conv_s[s:e], return_index=True)
        mdig = dig_s[s:e][first]
        is_hot = len(hot) and bool(_in_sorted(bh_s[s : s + 1], hot)[0])
        if is_hot:
            rep_bh.append(int(bh_s[s]))
            rep_conv.append(members[0])
            rep_dig.append(mdig[0].tobytes())
        if len(members) < 2:
            continue
        a, b = _emit_group_pairs(members, mdig, max_group, min_matches)
        if len(a):
            a_out.append(a)
            b_out.append(b)
    a = np.concatenate(a_out) if a_out else np.empty(0, dtype=object)
    b = np.concatenate(b_out) if b_out else np.empty(0, dtype=object)
    n_p = len(a)
    n_r = len(rep_bh)
    return pa.table({
        "a": pa.array(np.concatenate([a, np.full(n_r, None, dtype=object)]),
                      type=pa.string()),
        "b": pa.array(np.concatenate([b, np.full(n_r, None, dtype=object)]),
                      type=pa.string()),
        "band_hash": pa.array([0] * n_p + rep_bh, type=pa.uint64()),
        "conv_id": pa.array([None] * n_p + rep_conv, type=pa.string()),
        "sig_digest": pa.array([None] * n_p + rep_dig,
                               type=pa.large_binary()),
        "is_rep": pa.array([False] * n_p + [True] * n_r),
    })


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
    import functools

    from .context import auto_partitions

    P = auto_partitions(sig_ds.count() * config.num_bands, 200_000,
                        config.num_partitions)

    hot = detect_hot_bands(sig_ds, config)
    if len(hot) == 0:
        # no skew detected: plain band shuffle, zero salting overhead
        pairs = (
            sig_ds.map_batches(explode_bands, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(P, keys=["band_hash"])
            .map_batches(
                functools.partial(pairs_in_block,
                                  max_group=config.max_band_group,
                                  min_matches=config.prefilter_min_matches),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            )
        )
    else:
        # salted repartitioning: hot buckets spread over hot_key_salt
        # shards; shard chains + a tiny representative-chain pass restore
        # cross-shard connectivity
        hot_ref = ray.put((hot, config.hot_key_salt))
        mixed = (
            sig_ds.map_batches(
                functools.partial(explode_bands_salted, hot_ref=hot_ref),
                batch_format="pyarrow", zero_copy_batch=True)
            .repartition(P, keys=["band_hash", "salt"])
            .map_batches(
                functools.partial(pairs_and_reps_in_block,
                                  max_group=config.max_band_group,
                                  min_matches=config.prefilter_min_matches,
                                  hot_ref=hot_ref),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            )
        ).materialize()
        shard_pairs = mixed.filter(expr="is_rep == False") \
            .select_columns(["a", "b"])
        reps = mixed.filter(expr="is_rep == True") \
            .select_columns(["band_hash", "conv_id", "sig_digest"])
        rep_pairs = (
            reps.repartition(min(P, 8), keys=["band_hash"])
            .map_batches(
                functools.partial(pairs_in_block,
                                  max_group=config.max_band_group,
                                  min_matches=config.prefilter_min_matches),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True,
            )
        )
        pairs = shard_pairs.union(rep_pairs)
    if not dedup:
        return pairs
    return (
        pairs.repartition(P, keys=["a", "b"])
        .map_batches(dedup_pairs_block, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
    )
