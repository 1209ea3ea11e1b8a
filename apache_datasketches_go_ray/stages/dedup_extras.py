"""Document-table dedup + analysis operators (training-data pipeline ops).

All operators follow the engine's two shapes: vectorized stateless
``map_batches`` or hash-shuffle (``repartition(keys=...)``) + per-block
vectorized group fold. They run on any table with (id, text) columns —
the driver's ``documents`` table and the transcript pipeline's assembled
conversations alike.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .arrow_util import as_array
from ..config import DedupConfig
from ..functions.murmur3 import hash_strings
from ..functions.shingle import tokenize_column


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int = 32):
    """Exact duplicate groups by full text equality: one row per distinct
    text with (keeper id = min id, n_copies). Hash-partitions on a 64-bit
    text hash so each group folds in one block; the fold groups by the
    full text (hash collisions can't merge distinct texts)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = as_array(batch.column(text_col))
        h1, _ = hash_strings(texts.to_pylist())
        return pa.table({
            id_col: batch.column(id_col),
            text_col: texts,
            "text_hash": pa.array(h1, type=pa.uint64()),
        })

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"keeper_id": pa.array([], type=pa.int64()),
                             "n_copies": pa.array([], type=pa.int64())})
        t = batch.group_by(text_col).aggregate(
            [(id_col, "min"), (id_col, "count")])
        return pa.table({
            "keeper_id": t.column(f"{id_col}_min").cast(pa.int64()),
            "n_copies": t.column(f"{id_col}_count").cast(pa.int64()),
        })

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions, keys=["text_hash"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def minhash_dedup_documents(ds, cfg: DedupConfig | None = None,
                            id_col: str = "doc_id", text_col: str = "text"):
    """Near-duplicate clusters over a flat document table: the transcript
    pipeline's sign -> band -> verify -> cluster stages without the
    assembly shuffle. Returns (conv_id=str(id), cluster_id)."""
    from .signature import sign
    from .lsh import candidate_pairs
    from .verify import verify_pairs
    from .cluster import cluster_edges

    cfg = cfg or DedupConfig()

    def adapt(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": as_array(batch.column(id_col)).cast(pa.string()),
            "text": as_array(batch.column(text_col)).cast(pa.string()),
            "n_turns": pa.array(np.ones(len(batch), dtype=np.int32)),
        })

    docs = ds.select_columns([id_col, text_col]).map_batches(
        adapt, batch_format="pyarrow", zero_copy_batch=True)
    # materialize between stages: sigs and pairs are each consumed by two
    # downstream ops (pairs + verify; candidate-id scan + joins) — without
    # pinning them the lazy chains re-execute the signer several times
    docs = docs.materialize()
    sigs = sign(docs, cfg, keep_text=False).materialize()
    pairs = candidate_pairs(sigs, cfg, dedup=False).materialize()
    verified = verify_pairs(pairs, sigs, cfg, dedup_pairs=True,
                            texts_ds=docs)
    edges = verified.filter(expr="is_dup == True").select_columns(["a", "b"])
    return cluster_edges(edges, cfg.num_partitions)


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  num_partitions: int = 32):
    """SimHash near-exact dedup: docs sharing an identical 64-bit SimHash
    form a group. Returns (simhash, keeper_id, n_docs) for groups with
    n_docs >= 2."""
    from .textops import simhash_batch

    def prep(batch: pa.Table) -> pa.Table:
        b = pa.table({
            id_col: batch.column(id_col),
            "text": as_array(batch.column(text_col)).cast(pa.string()),
        })
        return simhash_batch(b)

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"simhash": pa.array([], type=pa.uint64()),
                             "keeper_id": pa.array([], type=pa.int64()),
                             "n_docs": pa.array([], type=pa.int64())})
        t = batch.group_by("simhash").aggregate(
            [(id_col, "min"), (id_col, "count")])
        t = t.filter(pc.greater_equal(t.column(f"{id_col}_count"), 2))
        return pa.table({
            "simhash": t.column("simhash"),
            "keeper_id": t.column(f"{id_col}_min").cast(pa.int64()),
            "n_docs": t.column(f"{id_col}_count").cast(pa.int64()),
        })

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions, keys=["simhash"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def _ngram_hashes(tok: np.ndarray, n: int) -> np.ndarray:
    """Fold consecutive token hashes into n-gram hashes (n=1: identity).
    Same role as the reference's item->bytes->hash canonicalization
    (hll/hll_sketch.go:274-295): a fixed injective-in-practice encoding
    so set comparisons match string-level n-gram distinctness."""
    from ..functions.murmur3 import fmix64

    if n == 1:
        return tok
    if len(tok) < n:
        return tok[:0]
    m = len(tok) - n + 1
    g = tok[:m].copy()
    gold = np.uint64(0x9E3779B97F4A7C15)
    for j in range(1, n):
        g = fmix64(g * gold ^ tok[j:m + j])
    return g


def consecutive_token_jaccard(ds, id_col: str = "doc_id",
                              text_col: str = "text",
                              num_partitions: int = 32, ngram: int = 1):
    """Exact (token- or token-n-gram-)set Jaccard between each doc and
    the next id (doc i vs i+1) — an oracle-checkable exact-similarity
    operator. Returns (doc_a, doc_b, jacc) with jacc rounded to 6
    decimals; docs whose gram sets are both empty score 1.0.

    Distributed shape: each doc emits its gram set keyed to both pair
    slots (i pairs with i-1 and i+1); a hash shuffle on the pair key
    co-locates both members; the fold computes exact Jaccard."""

    def emit(batch: pa.Table) -> pa.Table:
        ids = as_array(batch.column(id_col)).to_numpy(zero_copy_only=False)
        texts = as_array(batch.column(text_col))
        tok, off = tokenize_column(texts)
        pair_key, member, payload = [], [], []
        for i, d in enumerate(ids):
            toks = np.unique(_ngram_hashes(tok[off[i]:off[i + 1]], ngram))
            blob = toks.tobytes()
            pair_key.append(int(d))      # pair (d, d+1)
            member.append(0)
            payload.append(blob)
            if d > 0:
                pair_key.append(int(d) - 1)  # pair (d-1, d)
                member.append(1)
                payload.append(blob)
        return pa.table({
            "pair_key": pa.array(pair_key, type=pa.int64()),
            "member": pa.array(member, type=pa.int8()),
            "toks": pa.array(payload, type=pa.large_binary()),
        })

    def fold(batch: pa.Table) -> pa.Table:
        keys = as_array(batch.column("pair_key")).to_numpy(zero_copy_only=False)
        member = as_array(batch.column("member")).to_numpy(zero_copy_only=False)
        blobs = as_array(batch.column("toks")).to_pylist()
        order = np.lexsort((member, keys))
        out_a, out_b, out_j = [], [], []
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and keys[order[j + 1]] == keys[order[i]]:
                j += 1
            if j == i + 1:  # both members present
                A = np.frombuffer(blobs[order[i]], dtype=np.uint64)
                B = np.frombuffer(blobs[order[j]], dtype=np.uint64)
                inter = len(np.intersect1d(A, B, assume_unique=True))
                union = len(A) + len(B) - inter
                out_a.append(int(keys[order[i]]))
                out_b.append(int(keys[order[i]]) + 1)
                # half-up rounding (SQL round semantics, not banker's)
                out_j.append(
                    np.floor(inter / union * 1e6 + 0.5) / 1e6
                    if union else 1.0)
            i = j + 1
        return pa.table({
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "jacc": pa.array(out_j, type=pa.float64()),
        })

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions, keys=["pair_key"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def exact_top_tokens(ds, text_col: str = "text", k: int = 20,
                     num_partitions: int = 32) -> pa.Table:
    """Exact global top-k whitespace tokens: per-block value_counts
    (combiner) -> hash shuffle on token -> per-block sum -> driver-side
    top-k of the (small) per-partition winners. Deterministic tie-break
    (count desc, token asc)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = as_array(batch.column(text_col)).cast(pa.string())
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(col), r"\s+"))
        vc = toks.value_counts()
        if len(vc) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        t = pa.table({"token": vc.field("values"),
                      "cnt": vc.field("counts").cast(pa.int64())})
        return t.filter(pc.not_equal(t.column("token"), ""))

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        t = batch.group_by("token").aggregate([("cnt", "sum")])
        return pa.table({"token": t.column("token"),
                         "cnt": t.column("cnt_sum").cast(pa.int64())})

    folded = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions, keys=["token"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
    # per-partition winners only (k rows per block) travel to the driver
    def topk_block(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(batch, k=min(k, len(batch)),
                                   sort_keys=[("cnt", "descending"),
                                              ("token", "ascending")])
        return batch.take(idx)

    winners = folded.map_batches(topk_block, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)
    allw = pa.concat_tables([pa.Table.from_pylist(
        [r], schema=pa.schema([("token", pa.string()), ("cnt", pa.int64())]))
        for r in winners.take_all()]) if winners.count() else None
    if allw is None or allw.num_rows == 0:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    idx = pc.select_k_unstable(allw, k=min(k, allw.num_rows),
                               sort_keys=[("cnt", "descending"),
                                          ("token", "ascending")])
    return allw.take(idx).sort_by([("cnt", "descending"),
                                   ("token", "ascending")])


def simhash_near_dup_pairs(ds, id_col: str = "doc_id",
                           text_col: str = "text", max_hamming: int = 3,
                           num_partitions: int = 32,
                           max_bucket: int = 256):
    """SimHash near-duplicate pairs within a Hamming radius.

    The 64-bit SimHash is split into 4 x 16-bit bands; a pair differing
    in <= 3 bits leaves at least one band untouched (pigeonhole), so
    banding has exact recall for max_hamming <= 3. Buckets co-locate via
    the band-key hash shuffle; in-block popcount of XORed fingerprints
    keeps pairs within the radius; a final (a, b) shuffle dedups pairs
    found by several bands. Returns (doc_a, doc_b, hamming)."""
    from .textops import simhash_batch

    def emit_bands(batch: pa.Table) -> pa.Table:
        b = pa.table({
            id_col: batch.column(id_col),
            "text": as_array(batch.column(text_col)).cast(pa.string()),
        })
        s = simhash_batch(b)
        sh = s.column("simhash").to_numpy(zero_copy_only=False)
        ids = as_array(s.column(id_col)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(sh)
        keys, did, shs = [], [], []
        for band in range(4):
            bits = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            key = (np.uint64(band) << np.uint64(16)) | bits
            keys.append(key)
            did.append(ids)
            shs.append(sh)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys), type=pa.uint64()),
            "doc_id": pa.array(np.concatenate(did), type=pa.int64()),
            "simhash": pa.array(np.concatenate(shs), type=pa.uint64()),
        })

    def pairs_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        if len(batch) == 0:
            return empty
        bk = batch.column("band_key").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        bk, ids, sh = bk[order], ids[order], sh[order]
        newgrp = np.ones(len(bk), dtype=bool)
        newgrp[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(newgrp)
        ends = np.concatenate([starts[1:], [len(bk)]])
        a_o, b_o, h_o = [], [], []
        for s, e in zip(starts, ends):
            mem_ids, first = np.unique(ids[s:e], return_index=True)
            g = len(mem_ids)
            if g < 2:
                continue
            mem_sh = sh[s:e][first]
            if g > max_bucket:
                ia = np.arange(g - 1)
                ib = ia + 1
            else:
                ia, ib = np.triu_indices(g, k=1)
            x = np.bitwise_xor(mem_sh[ia], mem_sh[ib])
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                                axis=1).sum(axis=1)
            keep = ham <= max_hamming
            a_o.append(mem_ids[ia[keep]])
            b_o.append(mem_ids[ib[keep]])
            h_o.append(ham[keep])
        if not a_o:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(a_o), type=pa.int64()),
            "doc_b": pa.array(np.concatenate(b_o), type=pa.int64()),
            "hamming": pa.array(np.concatenate(h_o).astype(np.int64)),
        })

    def dedup(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        return batch.group_by(["doc_a", "doc_b"]).aggregate(
            [("hamming", "min")]).rename_columns(
            ["doc_a", "doc_b", "hamming"])

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(emit_bands, batch_format="pyarrow",
                     zero_copy_batch=True)
        .repartition(num_partitions, keys=["band_key"])
        .map_batches(pairs_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .repartition(num_partitions, keys=["doc_a", "doc_b"])
        .map_batches(dedup, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
