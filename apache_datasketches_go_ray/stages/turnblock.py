"""Exact turn-collision candidate blocking.

MinHash LSH over whole-conversation shingle sets cannot reach
containment duplicates whose kept turn range is a small token fraction
of the base: the full-text Jaccard sits far below the banding
threshold even though exact containment is ~1.0 (a contiguous-turn
copy of a 2-turn conversation that keeps the 10-token turn of a
10+190-token base has shingle-J ~ 0.05 — invisible to any banding at
the configured thresholds, yet squarely in-spec via the containment
gate). Measured on the planted fixture, these pairs were ~90% of all
in-spec recall misses.

Every containment / exact / reorder copy shares whole turns VERBATIM
with its base, so an exact turn-text hash collision is a cheap,
high-precision candidate signal that is independent of full-text
Jaccard: hash each qualifying turn text to u64, key-shuffle the
distinct (conv_id, hash) rows by hash, and emit conversation pairs per
hash bucket with the standard hot-key cap (a turn text shared by more
than ``turn_block_max_convs`` conversations is boilerplate, not dup
evidence — dropping it bounds the pair yield exactly like the band
group cap in stages/lsh.py). Pairs union with the LSH candidates and
flow through the same exact verification, so precision is unchanged —
this stage only adds candidates.

Scale shape: the shuffle payload is distinct (conv_id, u64) — ~20
bytes per turn, far lighter than the signature shuffle — and pair
emission is bucket-local with bucket sizes capped, so no all-pairs
blowup exists at any scale. The reference's substrate contribution is
the same hashing discipline its sketches use for identity
(hll/hll_sketch.go:338-343); the blocking rule itself is the classic
exact-fragment candidate pass of large-scale dedup systems.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..functions.murmur3 import hash_strings
from .arrow_util import as_array

_ROWS_SCHEMA = pa.schema([("conv_id", pa.string()), ("h", pa.uint64())])
_PAIRS_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])


def turn_hash_rows(batch: pa.Table, min_chars: int) -> pa.Table:
    """Raw turn rows -> block-local distinct (conv_id, turn-text hash),
    keeping only turns with >= ``min_chars`` codepoints (trivial short
    turns — "ok", "thanks" — carry no dup evidence and would only feed
    the hot cap)."""
    if len(batch) == 0:
        return _ROWS_SCHEMA.empty_table()
    texts = as_array(batch.column("text"))
    keep = pc.greater_equal(pc.utf8_length(texts), min_chars)
    t = pa.table({"conv_id": as_array(batch.column("conv_id")),
                  "text": texts}).filter(keep)
    if len(t) == 0:
        return _ROWS_SCHEMA.empty_table()
    h1, _ = hash_strings(as_array(t.column("text")))
    return pa.table({"conv_id": t.column("conv_id"),
                     "h": pa.array(h1, type=pa.uint64())}).group_by(
        ["conv_id", "h"]).aggregate([])


def pairs_block(batch: pa.Table, max_convs: int,
                bridge_ref=None) -> pa.Table:
    """hash-co-located (conv_id, h) rows -> candidate pairs (a < b).

    Global distinct per (h, conv) happens here (the keyed shuffle
    co-locates every copy), then every bucket with 2..max_convs member
    conversations emits its full pair set — vectorized per distinct
    bucket size, the same expansion pattern as lsh._vector_pairs.

    In dense-id mode (uint64 conv column, stages/ids.py) the ranks ARE
    the global lexicographic order, so the per-block string
    dictionary/sort is skipped and pairs are decoded on exit — output
    is bit-identical to the string path."""
    if len(batch) == 0:
        return _PAIRS_SCHEMA.empty_table()
    d = batch.group_by(["h", "conv_id"]).aggregate([])
    conv = as_array(d.column("conv_id"))
    if pa.types.is_integer(conv.type):
        rank = conv.to_numpy(zero_copy_only=False).astype(np.int64)
        sorted_strings = None
    else:
        dict_arr = as_array(pc.dictionary_encode(conv))
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        # rank table: pair order must match lexicographic conv order (the
        # oracle emits sorted pairs; UTF-8 byte order == codepoint order)
        sort_idx = pc.sort_indices(dict_arr.dictionary)
        rank_of = np.empty(len(dict_arr.dictionary), dtype=np.int64)
        rank_of[sort_idx.to_numpy(zero_copy_only=False)] = \
            np.arange(len(dict_arr.dictionary))
        rank = rank_of[codes]
        sorted_strings = dict_arr.dictionary.take(sort_idx)

    h = d.column("h").to_numpy(zero_copy_only=False)
    order = np.lexsort((rank, h))
    h_s, r_s = h[order], rank[order]
    n = len(h_s)
    newgrp = np.ones(n, dtype=bool)
    newgrp[1:] = h_s[1:] != h_s[:-1]
    starts = np.flatnonzero(newgrp)
    sizes = np.diff(np.concatenate([starts, [n]]))
    a_out: list = []
    b_out: list = []
    for g in np.unique(sizes):
        if g < 2 or g > max_convs:
            continue
        bsel = np.flatnonzero(sizes == g)
        idx = starts[bsel][:, None] + np.arange(g)     # (nb, g)
        mem = r_s[idx]
        ia, ib = np.triu_indices(int(g), k=1)
        a_out.append(mem[:, ia].reshape(-1))
        b_out.append(mem[:, ib].reshape(-1))
    if not a_out:
        return _PAIRS_SCHEMA.empty_table()
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    if sorted_strings is None:
        from .ids import decode_ids

        return pa.table({
            "a": decode_ids(a.astype(np.uint64), bridge_ref),
            "b": decode_ids(b.astype(np.uint64), bridge_ref),
        })
    return pa.table({
        "a": sorted_strings.take(pa.array(a)).cast(pa.string()),
        "b": sorted_strings.take(pa.array(b)).cast(pa.string()),
    })


def turn_hash_dataset(transcripts_ds, config: DedupConfig):
    """Raw transcript turns -> distinct (conv_id, h) rows (pre-shuffle,
    block-local distinct only; the keyed shuffle in pairs_from_hashes
    finishes it). Checkpointed by the pipeline so an incremental run
    can band a new batch against the old corpus without re-reading it."""
    return transcripts_ds.map_batches(
        functools.partial(turn_hash_rows,
                          min_chars=config.turn_block_min_chars),
        batch_format="pyarrow", zero_copy_batch=True)


def hashes_from_assembled(assembled_ds, config: DedupConfig):
    """Fallback for checkpoints written before the turn_hashes surface:
    re-derive turn hashes by splitting assembled text on TURN_SEP.
    Identical to raw-turn hashing whenever turn texts contain no
    TURN_SEP themselves (the per-turn-text-equality invariant the
    assembled surface preserves); checkpoints written by this version
    carry the exact raw-turn hashes instead."""
    from .assemble import TURN_SEP

    def split_rows(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _ROWS_SCHEMA.empty_table()
        texts = as_array(b.column("text"))
        parts = pc.split_pattern(texts, TURN_SEP)
        counts = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rep = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        t = pa.table({
            "conv_id": as_array(b.column("conv_id")).take(pa.array(rep)),
            "text": pc.list_flatten(parts),
        })
        return turn_hash_rows(t, config.turn_block_min_chars)

    return assembled_ds.map_batches(split_rows, batch_format="pyarrow",
                                    zero_copy_batch=True)


def _encode_rows(batch: pa.Table, bridge_ref) -> pa.Table:
    """(conv_id string, h) -> (conv_id u64 rank, h): the turn-hash
    shuffle then moves 16 bytes/row instead of a string + u64."""
    from .ids import encode_ids

    if len(batch) == 0:
        return pa.table({"conv_id": pa.array([], type=pa.uint64()),
                         "h": pa.array([], type=pa.uint64())})
    cid = encode_ids(batch.column("conv_id"), bridge_ref)
    return pa.table({"conv_id": pa.array(cid, type=pa.uint64()),
                     "h": batch.column("h")})


def _filter_hashes(batch: pa.Table, hash_filter_ref) -> pa.Table:
    """Keep only rows whose turn hash is in the broadcast sorted set
    (the increment's hashes): buckets without a new conv can only
    yield old-old pairs, which an incremental run drops anyway."""
    import ray as _ray

    if len(batch) == 0:
        return batch
    hs = batch.column("h").to_numpy(zero_copy_only=False)
    allowed = _ray.get(hash_filter_ref)
    if len(allowed) == 0:
        return batch.slice(0, 0)
    idx = np.searchsorted(allowed, hs)
    idx[idx >= len(allowed)] = 0
    return batch.filter(pa.array(allowed[idx] == hs))


def pairs_from_hashes(hash_ds, config: DedupConfig, bridge_ref=None,
                      hash_filter_ref=None):
    """(conv_id, h) rows -> candidate pair dataset (a < b, not deduped —
    verify's first co-partition join dedups for free). With a dense-id
    bridge the conv column is encoded to u64 ranks BEFORE the keyed
    shuffle (the checkpointable hash surface keeps strings);
    ``hash_filter_ref`` restricts rows to an increment's turn-hash set
    before the shuffle (exact — see _filter_hashes)."""
    if hash_filter_ref is not None:
        hash_ds = hash_ds.map_batches(
            functools.partial(_filter_hashes,
                              hash_filter_ref=hash_filter_ref),
            batch_format="pyarrow", zero_copy_batch=True)
    if bridge_ref is not None:
        hash_ds = hash_ds.map_batches(
            functools.partial(_encode_rows, bridge_ref=bridge_ref),
            batch_format="pyarrow", zero_copy_batch=True)
    return (hash_ds.repartition(config.num_partitions, keys=["h"])
            .map_batches(
                functools.partial(pairs_block,
                                  max_convs=config.turn_block_max_convs,
                                  bridge_ref=bridge_ref),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True))


def turn_block_pairs(transcripts_ds, config: DedupConfig):
    """Full blocking pass: raw turns -> candidate pairs."""
    return pairs_from_hashes(turn_hash_dataset(transcripts_ds, config),
                             config)
