"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript dedup pipeline on a deterministic
synthetic transcript table derived from sf0.001; ``queries()`` exposes one
entry per implemented operator family (SURVEY.md §2 + training-data ops);
``oracle_sql()`` gives DuckDB-checkable SQL for every exactly-computable
query (approx sketches and murmur-based ops are rows-only by nature).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

_TRANSCRIPT_CACHE: dict[str, str] = {}

# sf_dir basename -> synthetic transcript conv count (deterministic seed 42)
_SF_CONVS = {"sf0.001": 150, "sf0.01": 600, "sf0.1": 3000}


def _dedup_config():
    from apache_datasketches_go_ray.config import DedupConfig

    return DedupConfig(num_partitions=16)


def _transcripts_dir(sf_dir: str) -> str:
    """Deterministic synthetic transcripts sized to the sf tier (the
    driver's tables carry no transcript table; BASELINE.json input_hint
    defines the schema, FIXTURES.md F1/F2 the generator)."""
    from apache_datasketches_go_ray.sources.transcripts import write_transcripts

    name = os.path.basename(os.path.normpath(sf_dir))
    n = _SF_CONVS.get(name, 150)
    cache_dir = f"/tmp/adgr_entry_cache/{name}"
    key = f"{name}:{n}"
    marker = os.path.join(cache_dir, "_complete")
    if key not in _TRANSCRIPT_CACHE:
        if not os.path.exists(marker):
            write_transcripts(cache_dir, n, seed=42, shards=8)
            with open(marker, "w") as f:
                f.write("ok")
        _TRANSCRIPT_CACHE[key] = os.path.join(cache_dir, "transcripts")
    return _TRANSCRIPT_CACHE[key]


def _read(sf_dir: str, table: str, columns: list | None = None):
    """Read one driver table; pass ``columns`` to prune at the reader —
    Ray 2.49 does NOT push a later select_columns into the parquet
    read, so an explicit column list is the difference between reading
    2 columns and reading the whole table (15x bytes on documents)."""
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship transcript near-dup dedup pipeline at sf0.001 scale."""
    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup

    tdir = _transcripts_dir("/root/testdata/sf0.001")
    ds = ray.data.read_parquet(
        tdir, columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    return res["clusters"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_transcript_dedup(sf_dir: str):
    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    return res["clusters"].sort(["conv_id"])


def _q_turn_collision_pairs(sf_dir: str):
    """Exact turn-collision candidate pairs (stages/turnblock.py):
    conversation pairs sharing at least one verbatim qualifying turn
    text. Semantics are pure text equality — the u64 turn hash only
    buckets the shuffle (two distinct texts colliding would need a
    64-bit murmur collision, absent at any test scale) — so the
    operator is SQL-oracled value-exact."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.turnblock import turn_block_pairs

    cfg = _dedup_config()
    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "text"])

    def dedupe(b: pa.Table) -> pa.Table:
        return b.group_by(["a", "b"]).aggregate([])

    # pair-keyed shuffle + in-block fold = global distinct (candidate
    # stream is emitted per colliding turn, so pairs repeat)
    return (turn_block_pairs(ds, cfg)
            .repartition(cfg.num_partitions, keys=["a", "b"])
            .map_batches(dedupe, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["a", "b"]))


def _q_incremental_dedup(sf_dir: str):
    """Incremental dedup vs a prior checkpoint: dedup the even-conv half,
    checkpoint it, then dedup the odd-conv half AGAINST that checkpoint
    (no re-signing of the old corpus). Output equals the full-corpus
    flagship clusters (pinned by tests/test_incremental_dedup.py)."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import (
        run_dedup, run_dedup_incremental)

    def _part(b, want_even):
        nums = np.array([int(c.rsplit("-", 1)[1]) for c in
                         b.column("conv_id").to_pylist()])
        m = nums % 2 == 0
        return b.filter(pa.array(m if want_even else ~m))

    tdir = _transcripts_dir(sf_dir)
    ds_a = ray.data.read_parquet(
        tdir, columns=["conv_id", "turn_idx", "text"]).map_batches(
        lambda b: _part(b, True), batch_format="pyarrow")
    ds_b = ray.data.read_parquet(
        tdir, columns=["conv_id", "turn_idx", "text"]).map_batches(
        lambda b: _part(b, False), batch_format="pyarrow")
    ck = tempfile.mkdtemp(prefix="adgr_incr_ck_")
    try:
        run_dedup(ds_a, _dedup_config(), checkpoint_dir=ck)
        res = run_dedup_incremental(ds_b, against=ck,
                                    config=_dedup_config())
        return res["clusters"].sort(["conv_id"]).materialize()
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def _q_doc_novelty_scores(sf_dir: str):
    """Selection-based-curation contribution score: per doc, how many
    of its distinct 3-gram token windows are corpus-FIRST (min doc_id
    owns the gram) and the integer novelty ppm. Gram-keyed keep-min
    fold + doc-keyed totals + one keyed left join; single integer
    division (IEEE-free)."""
    from apache_datasketches_go_ray.stages.corpusops import (
        novelty_scores,
    )

    return novelty_scores(_read(sf_dir, "documents", ["doc_id", "text"]),
                          n=3, num_partitions=8)


def _q_assistant_run_lengths(sf_dir: str):
    """Agent-runaway QA: per conversation, the longest run of
    CONSECUTIVE assistant turns (a loop of assistant turns with no
    user/tool interleave is the classic stuck-agent signature). One
    conv-key shuffle + in-block lexsort + vectorized run-length
    encoding over (conv, role) change flags."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role"])
    _empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "max_assistant_run": pa.array([], type=pa.int64()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        conv = as_array(b.column("conv_id")).to_numpy(
            zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        role = as_array(b.column("role")).to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        c, r = ccodes[order], role[order]
        new_run = np.empty(len(c), dtype=bool)
        new_run[0] = True
        np.not_equal(c[1:], c[:-1], out=new_run[1:])
        new_run[1:] |= r[1:] != r[:-1]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(c)))
        is_asst = r[starts] == "assistant"
        run_conv = c[starts][is_asst]
        run_len = lens[is_asst]
        mx = np.zeros(int(c.max()) + 1 if len(c) else 0, dtype=np.int64)
        np.maximum.at(mx, run_conv, run_len)
        keep = np.unique(run_conv)
        # conv codes were assigned by np.unique order == sorted order
        uniq = pa.array(np.unique(conv), type=pa.string())
        return pa.table({
            "conv_id": uniq.take(pa.array(keep, type=pa.int64())),
            "max_assistant_run": pa.array(mx[keep]),
        })

    return (ds.repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_tool_latency_quartiles(sf_dir: str):
    """Per-tool execution-latency quartiles: for every turn that
    invokes a tool, the gap to the conversation's next turn (exact
    epoch-us integers), folded through the exact grouped
    percentile_disc operator. Conv-key shuffle + in-block lead kernel,
    then the one-lexsort-per-group quantile fold."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
    )

    ds = ray.data.read_parquet(
        _transcripts_dir(sf_dir),
        columns=["conv_id", "turn_idx", "tool", "ts"])
    _empty = pa.table({"tool": pa.array([], type=pa.string()),
                       "gap_us": pa.array([], type=pa.int64())})

    def gaps(b):
        if len(b) == 0:
            return _empty
        conv = as_array(b.column("conv_id")).to_numpy(
            zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        tool = as_array(b.column("tool")).to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        c, t, tl = ccodes[order], ts[order], tool[order]
        has_next = np.empty(len(c), dtype=bool)
        has_next[-1] = False
        np.equal(c[1:], c[:-1], out=has_next[:-1])
        gap = np.empty(len(c), dtype=np.int64)
        gap[:-1] = t[1:] - t[:-1]
        gap[-1] = 0
        keep = has_next & (tl != "") & (tl != None)  # noqa: E711
        if not keep.any():
            return _empty
        return pa.table({
            "tool": pa.array(tl[keep].astype(str), type=pa.string()),
            "gap_us": pa.array(gap[keep]),
        })

    pairs = ds.repartition(8, keys=["conv_id"]).map_batches(
        gaps, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return grouped_quantile_disc(pairs, "tool", "gap_us",
                                 (0.25, 0.50, 0.75), num_partitions=4)


def _q_windowed_near_dups(sf_dir: str):
    """Time-windowed near-dup pairs: verified dup conversations whose
    start times differ by <= 2 days. Candidates come from a
    (band, time-bucket) shuffle with two-bucket emission, so the
    candidate space is bounded by the window's own collision volume —
    the trailing-window dedup an append-only ingest runs. Rows-only at
    the gate (LSH banding); window semantics, bucket-boundary recall
    and flagship-equivalence-within-window are pinned by
    tests/test_windowed_dedup.py."""
    import ray.data

    from apache_datasketches_go_ray.stages.windowed_dedup import (
        windowed_near_dups,
    )

    ds = ray.data.read_parquet(
        _transcripts_dir(sf_dir),
        columns=["conv_id", "turn_idx", "text", "ts"])
    out = windowed_near_dups(ds, _dedup_config(),
                             window_us=2 * 24 * 3600 * 1_000_000)
    return out.sort(["a", "b"]).materialize()


def _q_deletion_dedup(sf_dir: str):
    """Right-to-be-forgotten deletion from a dedup checkpoint: run the
    flagship once with a checkpoint, then delete one member of every
    multi-member cluster and re-derive labels from the checkpointed
    verified edge set — no re-assembly, re-signing or re-verification
    of the surviving corpus. Equality to a from-scratch dedup of the
    survivors (including bridge-removal cluster SPLITS) is pinned by
    tests/test_delete_convs.py; rows-only at the driver gate."""
    import shutil
    import tempfile

    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import (
        delete_convs, run_dedup)

    tdir = _transcripts_dir(sf_dir)
    ds = ray.data.read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])
    ck = tempfile.mkdtemp(prefix="adgr_del_ck_")
    try:
        full = run_dedup(ds, _dedup_config(), checkpoint_dir=ck)
        by_cluster: dict = {}
        for r in full["clusters"].take_all():
            by_cluster.setdefault(r["cluster_id"], []).append(r["conv_id"])
        removed = sorted(max(v) for v in by_cluster.values() if len(v) >= 2)
        res = delete_convs(ck, removed, _dedup_config())
        return res["clusters"].sort(["conv_id"]).materialize()
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def _q_transcript_assemble(sf_dir: str):
    import ray.data
    from apache_datasketches_go_ray.stages.assemble import assemble
    import pyarrow.compute as pc
    import pyarrow as pa

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    out = assemble(ds, 16)

    def stats(b):
        return pa.table({
            "conv_id": b.column("conv_id"),
            "n_turns": b.column("n_turns").cast(pa.int64()),
            "n_chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
        })
    return out.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def _q_exact_dedup_docs(sf_dir: str):
    from apache_datasketches_go_ray.stages.dedup_extras import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                       num_partitions=16)


def _q_eval_decontaminate(sf_dir: str):
    """Eval-set decontamination: docs sharing a 13-gram with the eval
    split (doc_id % 7 == 0). The eval gram-hash set broadcasts once;
    the train side is a pure map — no corpus shuffle."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.decontaminate import (
        eval_ngram_hashes, flag_contaminated)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _split(b, want_eval):
        m = b.column("doc_id").to_numpy(zero_copy_only=False) % 7 == 0
        return b.filter(pa.array(m if want_eval else ~m))

    ev_ds = docs.map_batches(lambda b: _split(b, True),
                             batch_format="pyarrow", zero_copy_batch=True)
    tr_ds = docs.map_batches(lambda b: _split(b, False),
                             batch_format="pyarrow", zero_copy_batch=True)
    ev = eval_ngram_hashes(ev_ds, n=13)
    flagged = flag_contaminated(tr_ds, ev, n=13)
    return flagged.select_columns(["doc_id", "n_grams", "n_hits"]) \
        .sort("doc_id")


def _q_token_counts(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import token_count_batch

    def fn(b):
        out = token_count_batch(b)
        return pa.table({"doc_id": out.column("doc_id"),
                         "n_tokens": out.column("n_tokens").cast(pa.int64())})
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_doc_stats(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import quality_stats_batch

    def fn(b):
        out = quality_stats_batch(b, round_to=None)
        # floor-scaling keeps float comparisons exact vs SQL
        mtl = np.floor(
            out.column("mean_token_len").to_numpy(zero_copy_only=False) * 10000
        ) / 10000
        return pa.table({
            "doc_id": out.column("doc_id"),
            "n_chars": out.column("n_chars").cast(pa.int64()),
            "n_tokens": out.column("n_tokens").cast(pa.int64()),
            "mean_token_len": pa.array(mtl, type=pa.float64()),
        })
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_top_tokens(sf_dir: str):
    from apache_datasketches_go_ray.stages.dedup_extras import exact_top_tokens

    return exact_top_tokens(_read(sf_dir, "documents", ["text"]), k=20,
                            num_partitions=16)


def _q_session_path_dups(sf_dir: str):
    """Behavioral-sequence dedup: gap-sessionize every user's event
    stream (30-min gap, (ts, event_id) order) and count sessions whose
    '>'-joined event-type path occurs in >= 2 sessions corpus-wide —
    bot/replay detection over event streams. One user-keyed shuffle
    (sessions are sub-runs of one user, so paths build in-block via the
    ListArray/binary_join pattern), then a path-keyed count fold."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    GAP_US = np.int64(30 * 60_000_000)
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])

    _pempty = pa.table({"path": pa.array([], type=pa.large_string()),
                        "n": pa.array([], type=pa.int64())})

    def paths(b):
        if len(b) == 0:
            return _pempty
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        types = as_array(b.column("event_type")).cast(
            pa.large_string()).take(pa.array(order, type=pa.int64()))
        new_s = np.empty(len(us), dtype=bool)
        new_s[0] = True
        np.not_equal(us[1:], us[:-1], out=new_s[1:])
        new_s[1:] |= (tss[1:] - tss[:-1]) > GAP_US
        starts = np.flatnonzero(new_s)
        offsets = np.append(starts, len(us)).astype(np.int64)
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets), types),
            pa.scalar(">", type=pa.large_string()))
        g = pa.table({"path": joined}).group_by("path").aggregate(
            [([], "count_all")])
        return pa.table({"path": g.column("path"),
                         "n": g.column("count_all").cast(pa.int64())})

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "path": pa.array([], type=pa.large_string()),
                "n_sessions": pa.array([], type=pa.int64())})
        g = b.group_by("path").aggregate([("n", "sum")])
        t = pa.table({"path": g.column("path"),
                      "n_sessions": g.column("n_sum").cast(pa.int64())})
        return t.filter(pc.greater_equal(t.column("n_sessions"), 2))

    return (ds.repartition(16, keys=["user_id"])
            .map_batches(paths, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(8, keys=["path"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_cms_token_counts(sf_dir: str):
    """Count-Min point-frequency estimates for the corpus's exact
    top-20 tokens: per-block depth x width int64 partials folded by
    elementwise add (perfectly mergeable, cardinality-independent
    state — the sketch family the reference's Go port leaves
    unimplemented, built with the same seed-9001 murmur discipline).
    Rows-only at the gate (estimates are hash-dependent); exactness in
    the wide regime, bit-exact mergeability and distributed parity are
    pinned by tests/test_cms.py."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.dedup_extras import (
        exact_top_tokens,
    )
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        cms_point_counts,
    )
    from apache_datasketches_go_ray.stages.textops import (
        explode_tokens_batch,
    )

    probe_tbl = exact_top_tokens(
        _read(sf_dir, "documents", ["text"]), k=20,
        num_partitions=16).to_pandas()
    probe = sorted(probe_tbl["token"].tolist())

    toks = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        explode_tokens_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(["tok"])
    out, _sk = cms_point_counts(toks, "tok", probe,
                                depth=4, lg_width=18)
    return out


def _q_lang_stats(sf_dir: str):
    import pyarrow as pa

    def partial(b):
        return pa.table({
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars").cast(pa.int64()),
        })

    def fold(b):
        t = b.group_by("lang").aggregate(
            [("n_chars", "count"), ("n_chars", "sum"),
             ("n_chars", "min"), ("n_chars", "max")])
        return pa.table({
            "lang": t.column("lang"),
            "n_docs": t.column("n_chars_count").cast(pa.int64()),
            "sum_chars": t.column("n_chars_sum").cast(pa.int64()),
            "min_chars": t.column("n_chars_min").cast(pa.int64()),
            "max_chars": t.column("n_chars_max").cast(pa.int64()),
        })

    return (
        _read(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8, keys=["lang"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def _q_consecutive_jaccard(sf_dir: str):
    from apache_datasketches_go_ray.stages.dedup_extras import (
        consecutive_token_jaccard,
    )

    return consecutive_token_jaccard(
        _read(sf_dir, "documents", ["doc_id", "text"]), num_partitions=16)


def _q_jaccard_join(sf_dir: str):
    """Exact all-pairs token-set Jaccard >= 0.9 via prefix filtering
    (AllPairs/PPJoin family): recall 1.0 by construction, so it carries
    a value-exact SQL oracle — the only dedup-family operator where the
    candidate stage provably cannot miss a qualifying pair."""
    from apache_datasketches_go_ray.stages.dedup_extras import (
        jaccard_similarity_join,
    )

    return jaccard_similarity_join(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.9,
                                   num_partitions=16)


def _q_dup_source_matrix(sf_dir: str):
    """Mirrored-feed detector at the PAIR level: near-dup document pairs
    (exact token-set Jaccard >= 0.9, recall-1.0 PPJoin) rolled up to a
    source x source matrix — which feed pairs re-publish each other.
    Composition: the exact similarity self-join -> two keyed joins to
    attach each side's source -> canonical (least, greatest) source
    pair -> tiny count fold. Value-exact because every stage is."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.dedup_extras import (
        jaccard_similarity_join,
    )
    from apache_datasketches_go_ray.stages.join import hash_join

    pairs = jaccard_similarity_join(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.9,
        num_partitions=16).select_columns(["doc_a", "doc_b"])
    srcs = _read(sf_dir, "documents", ["doc_id", "source"])
    j1 = hash_join(pairs, srcs.rename_columns(["doc_id", "source_x"]),
                   on=("doc_a", "doc_id"), num_partitions=8)
    j2 = hash_join(j1, srcs.rename_columns(["doc_id", "source_y"]),
                   on=("doc_b", "doc_id"), num_partitions=8)

    _empty = pa.table({
        "source_a": pa.array([], type=pa.string()),
        "source_b": pa.array([], type=pa.string()),
        "n_pairs": pa.array([], type=pa.int64()),
    })

    def canon(b):
        if len(b) == 0:
            return _empty
        sx = b.column("source_x").cast(pa.string())
        sy = b.column("source_y").cast(pa.string())
        lo = pc.min_element_wise(sx, sy)
        hi = pc.max_element_wise(sx, sy)
        g = pa.table({"source_a": lo, "source_b": hi}).group_by(
            ["source_a", "source_b"]).aggregate([([], "count_all")])
        return pa.table({
            "source_a": g.column("source_a"),
            "source_b": g.column("source_b"),
            "n_pairs": g.column("count_all").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return _empty
        g = b.group_by(["source_a", "source_b"]).aggregate(
            [("n_pairs", "sum")])
        return pa.table({
            "source_a": g.column("source_a"),
            "source_b": g.column("source_b"),
            "n_pairs": g.column("n_pairs_sum").cast(pa.int64()),
        })

    return (j2.map_batches(canon, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_jaccard_join_bigram(sf_dir: str):
    """n-gram variant of the exact similarity self-join: bigram-set
    Jaccard >= 0.75 over all pairs, same prefix-filter recall
    guarantee."""
    from apache_datasketches_go_ray.stages.dedup_extras import (
        jaccard_similarity_join,
    )

    return jaccard_similarity_join(
        _read(sf_dir, "documents", ["doc_id", "text"]), tau=0.75,
                                   num_partitions=16, ngram=2)


def _q_events_hourly(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        cents = pc.round(pc.multiply(b.column("value"), 100)).cast(pa.int64())
        return pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                         "hour": hour, "cents": cents})

    def fold(b):
        t = b.group_by(["user_id", "hour"]).aggregate(
            [("cents", "count"), ("cents", "sum")])
        return pa.table({
            "user_id": t.column("user_id"),
            "hour": t.column("hour"),
            "n_events": t.column("cents_count").cast(pa.int64()),
            "sum_cents": t.column("cents_sum").cast(pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(16, keys=["user_id"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq
    from apache_datasketches_go_ray.stages.ann import brute_force_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(emb_path).slice(0, 5)
    q_ids = head.column("vec_id").to_pylist()
    qm = np.array(head.column("embedding").to_pylist(), dtype=np.float32)
    out = brute_force_topk(_read(sf_dir, "embeddings",
                                 ["vec_id", "embedding"]), q_ids, qm, k=10,
                           round_to=4)
    # drop raw scores (float-parity risk across engines); rank is exact
    return out.select(["query_id", "vec_id", "rank"])


def _q_minhash_doc_clusters(sf_dir: str):
    from apache_datasketches_go_ray.stages.dedup_extras import (
        minhash_dedup_documents,
    )

    return minhash_dedup_documents(_read(sf_dir, "documents",
                                         ["doc_id", "text"]),
                                   _dedup_config()).sort(["conv_id"])


def _q_simhash_groups(sf_dir: str):
    from apache_datasketches_go_ray.stages.dedup_extras import simhash_dedup

    return simhash_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                         num_partitions=16)


def _q_hll_distinct_users(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.sketch_aggs import approx_distinct

    r = approx_distinct(_read(sf_dir, "events", ["user_id"]), "user_id",
                        lg_k=12)
    return pa.table({
        "estimate": pa.array([round(r["estimate"], 4)]),
        "lower_bound": pa.array([round(r["lower_bound"], 4)]),
        "upper_bound": pa.array([round(r["upper_bound"], 4)]),
    })


def _q_kll_quantiles_nchars(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.sketch_aggs import approx_quantiles

    r = approx_quantiles(_read(sf_dir, "documents", ["n_chars"]),
                         "n_chars", [0.25, 0.5, 0.75], k=200)
    return pa.table({
        "n": pa.array([r["n"]], type=pa.int64()),
        "min": pa.array([r["min"]]),
        "max": pa.array([r["max"]]),
        "q25": pa.array([r["quantiles"][0.25]]),
        "q50": pa.array([r["quantiles"][0.5]]),
        "q75": pa.array([r["quantiles"][0.75]]),
    })


def _q_kll_cdf_nchars(sf_dir: str):
    """KLL PMF/CDF over documents.n_chars at fixed split points
    (kll/items_sketch_sorted_view.go:103-139 role)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.state.kll import KllSketch
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def partial(b):
        sk = KllSketch(200)
        sk.update_many(as_array(b.column("n_chars"))
                       .to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()],
                                        type=pa.large_binary())})

    merged = KllSketch(200)
    for row in _read(sf_dir, "documents", ["n_chars"]) \
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).take_all():
        merged.merge(KllSketch.from_bytes(row["sk"]))
    splits = np.array([200.0, 400.0, 800.0, 1600.0])
    pmf = merged.get_pmf(splits)
    cdf = merged.get_cdf(splits)
    return pa.table({
        "split": pa.array(list(splits) + [float("inf")]),
        "pmf": pa.array([round(float(x), 6) for x in pmf]),
        "cdf": pa.array([round(float(x), 6) for x in cdf]),
    })


def _q_freq_top_tokens(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.sketch_aggs import approx_top_k

    rows = approx_top_k(_read(sf_dir, "documents", ["text"]), "text", k=15,
                        lg_max_map_size=12, tokenize=True)
    return pa.table({
        "item": pa.array([r[0] for r in rows], type=pa.string()),
        "estimate": pa.array([r[1] for r in rows], type=pa.int64()),
        "lower_bound": pa.array([r[2] for r in rows], type=pa.int64()),
        "upper_bound": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def _q_kll_quantiles_nchars_exact(sf_dir: str):
    """Global KLL quantiles in the exact no-compaction regime (k=8192 >
    corpus size at the oracle tier): the same operator as
    kll_quantiles_nchars but SQL-oracle-checked value-exact."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        approx_quantiles,
    )

    r = approx_quantiles(_read(sf_dir, "documents", ["n_chars"]),
                         "n_chars", [0.25, 0.5, 0.75], k=8192)
    return pa.table({
        "n": pa.array([r["n"]], type=pa.int64()),
        "min": pa.array([r["min"]]),
        "max": pa.array([r["max"]]),
        "q25": pa.array([r["quantiles"][0.25]]),
        "q50": pa.array([r["quantiles"][0.5]]),
        "q75": pa.array([r["quantiles"][0.75]]),
    })


def _q_kll_cdf_nchars_exact(sf_dir: str):
    """Global KLL PMF/CDF at fixed splits, exact regime (k=8192):
    GetRank(split, exclusive) == count(x < split)/n, SQL-checked."""
    import pyarrow as pa
    from apache_datasketches_go_ray.state.kll import KllSketch
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def partial(b):
        sk = KllSketch(8192)
        sk.update_many(as_array(b.column("n_chars"))
                       .to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()],
                                        type=pa.large_binary())})

    merged = KllSketch(8192)
    for row in _read(sf_dir, "documents", ["n_chars"]) \
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).take_all():
        merged.merge(KllSketch.from_bytes(row["sk"]))
    splits = np.array([200.0, 400.0, 800.0, 1600.0])
    # finite splits only: the +inf tail bucket is 1 - cdf[-1] (the
    # driver compare can't float-diff infinities)
    pmf = merged.get_pmf(splits)[:-1]
    cdf = merged.get_cdf(splits)[:-1]
    return pa.table({
        "split": pa.array(splits),
        "pmf": pa.array([round(float(x), 6) for x in pmf]),
        "cdf": pa.array([round(float(x), 6) for x in cdf]),
    })


def _q_freq_top_tokens_exact(sf_dir: str):
    """Global frequent-items top-15 tokens, exact regime (map capacity
    49k > corpus vocab at the oracle tier, offset stays 0 so
    lb == estimate == ub == true count) — SQL-checked including the
    deterministic (estimate desc, item asc) ordering."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.sketch_aggs import approx_top_k

    rows = approx_top_k(_read(sf_dir, "documents", ["text"]), "text", k=15,
                        lg_max_map_size=16, tokenize=True)
    return pa.table({
        "item": pa.array([r[0] for r in rows], type=pa.string()),
        "estimate": pa.array([r[1] for r in rows], type=pa.int64()),
        "lower_bound": pa.array([r[2] for r in rows], type=pa.int64()),
        "upper_bound": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def _q_top_tokens_by_lang(sf_dir: str):
    """Grouped heavy hitters: per-language top-10 tokens via distributed
    frequent-items sketches. Map capacity exceeds the per-lang vocab at
    test scale, so offset stays 0 and the sketch output is exact —
    SQL-oracle-checked."""
    from apache_datasketches_go_ray.stages.sketch_aggs import approx_top_k_by

    return approx_top_k_by(_read(sf_dir, "documents", ["lang", "text"]),
                           "lang", "text",
                           k=10, lg_max_map_size=16, tokenize=True,
                           num_partitions=8)


def _q_langid(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import langid_batch

    def fn(b):
        out = langid_batch(b)
        return pa.table({"doc_id": out.column("doc_id"),
                         "lang_pred": out.column("lang_pred")})
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_quality_scores(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import quality_stats_batch

    def fn(b):
        # raw doubles: both engines run the identical IEEE op sequence,
        # so values compare exactly with no rounding-mode hazards
        out = quality_stats_batch(b, round_to=None)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "stopword_ratio": out.column("stopword_ratio"),
            "digit_ratio": out.column("digit_ratio"),
            "quality_score": out.column("quality_score"),
        })
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality filters (duplicate-line fraction,
    duplicate-line char fraction, top-bigram char fraction — Rae et al.
    2021): the pre-dedup quality gate every LLM training-data pipeline
    runs. One vectorized map_batches pass; integer counting + a single
    x*1.0/y division per metric makes the DuckDB oracle value-exact."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import (
        repetition_stats_batch,
    )

    def fn(b):
        out = repetition_stats_batch(b)
        return out.select(["doc_id", "n_lines", "dup_line_frac",
                           "dup_line_char_frac", "top_bigram_char_frac"])
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_pii_redact(sf_dir: str):
    """PII scrubbing (email + phone redaction): plant one deterministic
    email and phone per doc via identical string concat on both sides,
    then scan/replace with RE2 patterns — pyarrow's regex kernels and
    DuckDB's regexp_replace are both RE2-backed, so the oracle compares
    the redacted text value-exact, not approximately."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.textops import redact_pii_batch

    def fn(b):
        ids = b.column("doc_id").cast(pa.string())
        aug = pc.binary_join_element_wise(
            b.column("text").combine_chunks(),
            pa.scalar(" contact user"), ids,
            pa.scalar("@example.com or call +1 (555) 010-"), ids, "")
        out = redact_pii_batch(pa.table({
            "doc_id": b.column("doc_id"), "text": aug}))
        return out.select(["doc_id", "n_emails", "n_phones",
                           "redacted_text"])
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_domain_reweight(sf_dir: str):
    """Domain-mixture reweighting: resample the 20 sources to a ramp
    mixture (share of src{i} proportional to i+1). Streaming
    hash-threshold filter, no shuffle — the scalable form of "adjust
    the web/books/code mix before training". Pure int/float arithmetic
    on the Knuth hash keeps the DuckDB oracle value-exact."""
    from apache_datasketches_go_ray.stages.mixing import reweight_sample

    weights = {f"src{i}": (i + 1) / 210.0 for i in range(20)}
    return reweight_sample(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        "source", weights, "doc_id")


def _q_pack_sequences(sf_dir: str):
    """Sequence packing: greedy fill of docs into 256-token packs, one
    independent packing per (doc_id % 4) partition key — the
    batch-construction step of LLM training. The in-block kernel jumps
    pack-by-pack along the token prefix sum (np.searchsorted), matching
    the sequential recurrence the DuckDB recursive-CTE oracle runs."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.packing import pack_sequences
    from apache_datasketches_go_ray.stages.textops import (
        token_count_batch,
    )

    def tok(b):
        out = token_count_batch(b)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "n_tokens": out.column("n_tokens").cast(pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tok, batch_format="pyarrow", zero_copy_batch=True)
    return pack_sequences(ds, budget=256, n_parts=4,
                          tok_col="n_tokens", id_col="doc_id")


def _q_fingerprints(sf_dir: str):
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import fingerprint_batch

    def fn(b):
        out = fingerprint_batch(b)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "doc_fingerprint": out.column("doc_fingerprint"),
        })
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_embedding_near_dups(sf_dir: str):
    """The sf embeddings are near-orthogonal (no natural near-dups), so
    plant deterministic near-duplicates (vec + 2% noise, new ids offset by
    10^6) and recover them with the LSH-bucketed exact-cosine operator."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from apache_datasketches_go_ray.stages.ann import embedding_near_dup_pairs

    base = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    m = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(base.column("vec_id").to_pylist(), dtype=np.int64)
    rng = np.random.default_rng(42)
    k = min(50, len(ids))
    noise = rng.standard_normal((k, m.shape[1])).astype(np.float32)
    dup = m[:k] + 0.02 * noise * np.linalg.norm(
        m[:k], axis=1, keepdims=True) / np.sqrt(m.shape[1])
    aug = pa.table({
        "vec_id": pa.array(np.concatenate([ids, ids[:k] + 1_000_000]),
                           type=pa.int64()),
        "embedding": pa.array(
            list(np.concatenate([m, dup]).astype(np.float32)),
            type=pa.list_(pa.float32())),
    })
    return embedding_near_dup_pairs(ray.data.from_arrow(aug),
                                    threshold=0.95, n_planes=6,
                                    num_partitions=16)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup: plant near-duplicate embeddings
    (2% noise, ids offset by 10^6) and prune them with the
    kmeans-cluster + in-cluster cosine operator. Rows-only (kmeans is
    not SQL); the planted-dup drop contract is pinned by pytest."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from apache_datasketches_go_ray.stages.ann import semantic_dedup

    base = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    m = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(base.column("vec_id").to_pylist(), dtype=np.int64)
    rng = np.random.default_rng(42)
    k = min(50, len(ids))
    noise = rng.standard_normal((k, m.shape[1])).astype(np.float32)
    dup = m[:k] + 0.02 * noise * np.linalg.norm(
        m[:k], axis=1, keepdims=True) / np.sqrt(m.shape[1])
    aug = pa.table({
        "vec_id": pa.array(np.concatenate([ids, ids[:k] + 1_000_000]),
                           type=pa.int64()),
        "embedding": pa.array(
            list(np.concatenate([m, dup]).astype(np.float32)),
            type=pa.list_(pa.float32())),
    })
    return semantic_dedup(ray.data.from_arrow(aug), threshold=0.95,
                          n_clusters=8, num_partitions=8)


def _q_lm_quality_scores(sf_dir: str):
    """CCNet-style LM quality scoring: byte-trigram model trained on
    the corpus's own leading sample (bounded, deterministic), broadcast
    once, scored in one streaming vectorized pass. Rows-only (the
    smoothed log-prob model is not SQL); kernel parity vs a dict-based
    reference and gibberish discrimination are pinned by pytest."""
    from apache_datasketches_go_ray.stages.lmscore import lm_quality_score

    def fin(b):
        import pyarrow as pa
        import pyarrow.compute as pc
        return b.set_column(
            b.schema.get_field_index("lm_score"), "lm_score",
            pc.round(b.column("lm_score"), ndigits=6))
    return lm_quality_score(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        sample_size=256).map_batches(
        fin, batch_format="pyarrow", zero_copy_batch=True)


def _q_theta_user_overlap(sf_dir: str):
    """Theta/KMV sketch SET OPERATIONS: per-event-type distinct-user
    sketches (per-block partials -> keyed merge), then pairwise
    intersect / a-not-b on the driver (5 tiny sketches). k=4096 exceeds
    the user cardinality through sf0.1, so the sketches are in the
    exact regime and the DuckDB oracle checks the overlap counts
    value-exact; at corpus scale the same operator degrades to the
    bounded-error sketch (state/theta.py)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.state.theta import (
        ThetaSketch, hash_int64_values,
    )

    K = 4096

    def partial(b):
        et = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        uid = b.column("user_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = hash_int64_values(uid)
        order = np.argsort(et, kind="stable")
        ets, hs = et[order], h[order]
        newgrp = np.ones(len(ets), dtype=bool)
        if len(ets) > 1:
            newgrp[1:] = ets[1:] != ets[:-1]
        starts = np.flatnonzero(newgrp)
        ends = np.concatenate([starts[1:], [len(ets)]])
        out_k, out_s = [], []
        for s, e in zip(starts, ends):
            sk = ThetaSketch(K)
            sk.update_hashes(hs[s:e])
            out_k.append(ets[s])
            out_s.append(sk.to_bytes())
        return pa.table({"event_type": pa.array(out_k, type=pa.string()),
                         "sk": pa.array(out_s, type=pa.large_binary())})

    def combine(b):
        ks = np.asarray(b.column("event_type").to_pylist(), dtype=object)
        sks = b.column("sk").to_pylist()
        order = np.argsort(ks, kind="stable")
        out_k, out_s = [], []
        i = 0
        while i < len(order):
            j = i
            sk = ThetaSketch.from_bytes(sks[order[i]])
            while j + 1 < len(order) and ks[order[j + 1]] == ks[order[i]]:
                j += 1
                sk.merge(ThetaSketch.from_bytes(sks[order[j]]))
            out_k.append(ks[order[i]])
            out_s.append(sk.to_bytes())
            i = j + 1
        return pa.table({"event_type": pa.array(out_k, type=pa.string()),
                         "sk": pa.array(out_s, type=pa.large_binary())})

    rows = (_read(sf_dir, "events", ["event_type", "user_id"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["event_type"])
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .take_all())
    sketches = {r["event_type"]: ThetaSketch.from_bytes(r["sk"])
                for r in rows}
    types = sorted(sketches)
    ta, tb, na, nb, nc, nao = [], [], [], [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            common = ThetaSketch.intersect(sketches[a], sketches[b])
            only_a = ThetaSketch.a_not_b(sketches[a], sketches[b])
            ta.append(a)
            tb.append(b)
            na.append(sketches[a].get_retained())
            nb.append(sketches[b].get_retained())
            nc.append(common.get_retained())
            nao.append(only_a.get_retained())
    return pa.table({
        "type_a": pa.array(ta, type=pa.string()),
        "type_b": pa.array(tb, type=pa.string()),
        "n_a": pa.array(na, type=pa.int64()),
        "n_b": pa.array(nb, type=pa.int64()),
        "n_common": pa.array(nc, type=pa.int64()),
        "n_a_only": pa.array(nao, type=pa.int64()),
    })


def _q_customer_nation_revenue(sf_dir: str):
    """orders ⋈ customer (engine hash_join: broadcast or co-partition by
    size) -> per-nation order count + revenue in exact cents."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    def prep_orders(b):
        cents = pc.round(pc.multiply(b.column("o_totalprice"), 100)) \
            .cast(pa.int64())
        return pa.table({"o_custkey": b.column("o_custkey").cast(pa.int64()),
                         "cents": cents})

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_totalprice"]).map_batches(
        prep_orders, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_join(orders, cust, on=("o_custkey", "c_custkey"))

    def partial(b):
        return pa.table({
            "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            "cents": b.column("cents"),
        })

    def fold(b):
        t = b.group_by("c_nationkey").aggregate(
            [("cents", "count"), ("cents", "sum")])
        return pa.table({
            "c_nationkey": t.column("c_nationkey"),
            "n_orders": t.column("cents_count").cast(pa.int64()),
            "sum_cents": t.column("cents_sum").cast(pa.int64()),
        })

    return (joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(8, keys=["c_nationkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-style pricing summary (exact cents arithmetic)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        qty = pc.round(pc.multiply(b.column("l_quantity"), 100)) \
            .cast(pa.int64())
        price = pc.round(pc.multiply(b.column("l_extendedprice"), 100)) \
            .cast(pa.int64())
        t = pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty_c": qty, "price_c": price,
        })
        # in-block combiner before the shuffle (tiny group cardinality)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("qty_c", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty_c": g.column("qty_c_sum"),
            "sum_price_c": g.column("price_c_sum"),
            "n_rows": g.column("qty_c_count").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty_c", "sum"), ("sum_price_c", "sum"),
             ("n_rows", "sum")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty_c": g.column("sum_qty_c_sum").cast(pa.int64()),
            "sum_price_c": g.column("sum_price_c_sum").cast(pa.int64()),
            "n_rows": g.column("n_rows_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["l_returnflag", "l_linestatus"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_kll_partition_bounds(sf_dir: str):
    """KLL sample-based range-partition boundaries over documents.n_chars
    (the reference's GetPartitionBoundaries role: sizing shuffle
    partitions, kll/items_sketch_partition_boundaries.go)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.state.kll import KllSketch
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def partial(b):
        sk = KllSketch(200)
        sk.update_many(as_array(b.column("n_chars"))
                       .to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()],
                                        type=pa.large_binary())})

    merged = KllSketch(200)
    for row in _read(sf_dir, "documents", ["n_chars"]) \
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).take_all():
        merged.merge(KllSketch.from_bytes(row["sk"]))
    bounds = merged.get_partition_boundaries(8)
    return __import__("pyarrow").table({
        "part": list(range(len(bounds))),
        "boundary": [float(x) for x in bounds],
    })


def _q_hll_users_by_type(sf_dir: str):
    """Grouped HLL distinct count (events.user_id per event_type)."""
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        approx_distinct_by,
    )

    out = approx_distinct_by(_read(sf_dir, "events",
                                   ["event_type", "user_id"]), "event_type",
                             "user_id", lg_k=12, num_partitions=8)
    return out


def _q_ann_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate top-k (the ANN scale path): same 5
    queries as ann_topk, multi-probe bucket scan instead of full matmul."""
    import pyarrow.parquet as pq
    from apache_datasketches_go_ray.stages.ann import lsh_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(emb_path).slice(0, 5)
    q_ids = head.column("vec_id").to_pylist()
    qm = np.array(head.column("embedding").to_pylist(), dtype=np.float32)
    out = lsh_topk(_read(sf_dir, "embeddings",
                         ["vec_id", "embedding"]), q_ids, qm, k=10,
                   n_planes=6, round_to=4)
    return out.select(["query_id", "vec_id", "rank"])


def _q_ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate top-k (spherical-k-means coarse
    quantizer): same 5 queries as ann_topk, n_probe cells scanned."""
    import pyarrow.parquet as pq
    from apache_datasketches_go_ray.stages.ann import ivf_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(emb_path).slice(0, 5)
    q_ids = head.column("vec_id").to_pylist()
    qm = np.array(head.column("embedding").to_pylist(), dtype=np.float32)
    out = ivf_topk(_read(sf_dir, "embeddings",
                         ["vec_id", "embedding"]), q_ids, qm, k=10,
                   n_clusters=16, n_probe=4, round_to=4)
    return out.select(["query_id", "vec_id", "rank"])


def _q_ann_ivf_kmeans_topk(sf_dir: str):
    """IVF top-k with the coarse quantizer trained by the EXACT
    distributed Lloyd k-means (embops.kmeans_fit) instead of a bounded
    driver sample — the full-corpus index-build path for skewed
    corpora; querying is the same n_probe cell scan."""
    import pyarrow.parquet as pq

    from apache_datasketches_go_ray.stages.ann import ivf_topk
    from apache_datasketches_go_ray.stages.embops import kmeans_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _assign, C = kmeans_fit(emb, k=16, n_iter=5, num_partitions=8)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(emb_path).slice(0, 5)
    q_ids = head.column("vec_id").to_pylist()
    qm = np.array(head.column("embedding").to_pylist(), dtype=np.float32)
    out = ivf_topk(_read(sf_dir, "embeddings",
                         ["vec_id", "embedding"]), q_ids, qm, k=10,
                   n_probe=4, round_to=4, centroids=C)
    return out.select(["query_id", "vec_id", "rank"])


def _q_simhash_near_dups(sf_dir: str):
    """Hamming-radius SimHash near-dup pairs. The sf documents are all
    distinct, so plant deterministic copies: 20 exact + 20 one-token
    edits (new ids offset by 10^6); the 4x16-bit band index recovers
    pairs within hamming <= 3."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from apache_datasketches_go_ray.stages.dedup_extras import (
        simhash_near_dup_pairs,
    )

    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist()
    new_ids = [i + 1_000_000 for i in ids[:40]]
    new_texts = list(texts[:20])
    for t in texts[20:40]:
        words = t.split(" ")
        words[len(words) // 2] = "zzqx"
        new_texts.append(" ".join(words))
    aug = pa.table({
        "doc_id": pa.array(ids + new_ids, type=pa.int64()),
        "text": pa.array(texts + new_texts, type=pa.string()),
    })
    return simhash_near_dup_pairs(ray.data.from_arrow(aug),
                                  max_hamming=3, num_partitions=16)


def _q_events_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min) — the windowed-aggregate op."""
    from apache_datasketches_go_ray.stages.windows import sessionize

    return sessionize(_read(sf_dir, "events",
                            ["user_id", "ts", "event_id", "value"]),
                      gap_minutes=30,
                      num_partitions=16)


def _q_events_running(sf_dir: str):
    """Per-user ordered running sum + row number (lag/lead window)."""
    from apache_datasketches_go_ray.stages.windows import running_sum

    return running_sum(_read(sf_dir, "events",
                             ["user_id", "ts", "event_id", "value"]),
                       num_partitions=16)


def _q_top_orders(sf_dir: str):
    """Global top-25 orders by price — distributed top-k (sort+limit
    without a global sort)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import top_k

    def prep(b):
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "price_c": pc.round(pc.multiply(b.column("o_totalprice"), 100))
                .cast(pa.int64()),
        })

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True)
    return top_k(ds, [("price_c", "descending"), ("o_orderkey", "ascending")],
                 k=25)


def _q_order_priority(sf_dir: str):
    """TPC-H Q4-flavored EXISTS: orders per priority having a lineitem
    shipped after the order date. lineitem is pre-aggregated to
    max(l_shipdate) per orderkey (combiner) before the join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    def pre(b):
        g = b.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        return pa.table({
            "l_orderkey": g.column("l_orderkey").cast(pa.int64()),
            "max_ship": g.column("l_shipdate_max"),
        })

    def combine(b):
        g = b.group_by("l_orderkey").aggregate([("max_ship", "max")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "max_ship": g.column("max_ship_max")})

    li = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
          .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
          .repartition(16, keys=["l_orderkey"])
          .map_batches(combine, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = hash_join(orders, li, on=("o_orderkey", "l_orderkey"))

    def partial(b):
        keep = b.filter(pc.greater(b.column("max_ship"),
                                   b.column("o_orderdate")))
        g = keep.group_by("o_orderpriority").aggregate(
            [("o_orderkey", "count")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "n_orders": g.column("o_orderkey_count").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("o_orderpriority").aggregate([("n_orders", "sum")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "n_orders": g.column("n_orders_sum").cast(pa.int64()),
        })

    return (joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(4, keys=["o_orderpriority"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_customers_no_orders(sf_dir: str):
    """Broadcast anti-join: customers with no order since 2000-01-01
    (the unfiltered variant is empty at every sf tier)."""
    import datetime
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import anti_join

    cutoff = pa.scalar(datetime.datetime(2000, 1, 1),
                       type=pa.timestamp("us"))

    def recent(b):
        keep = b.filter(pc.greater_equal(b.column("o_orderdate"), cutoff))
        return keep.select(["o_custkey"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(recent, batch_format="pyarrow", zero_copy_batch=True)
    return anti_join(cust, orders, on=("c_custkey", "o_custkey"))


def _q_region_revenue(sf_dir: str):
    """Multi-hop broadcast join chain (orders -> customer -> nation ->
    region) with exact-cents revenue per region name."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    nat = hash_join(
        _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
        _read(sf_dir, "region", ["r_regionkey", "r_name"]),
        on=("n_regionkey", "r_regionkey"))
    cust = hash_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        nat.select_columns(["n_nationkey", "r_name"]),
        on=("c_nationkey", "n_nationkey"))

    def prep_orders(b):
        return pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("o_totalprice"), 100))
                .cast(pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_totalprice"]).map_batches(
        prep_orders, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(orders, cust.select_columns(["c_custkey", "r_name"]),
                       on=("o_custkey", "c_custkey"))

    def partial(b):
        g = b.group_by("r_name").aggregate(
            [("cents", "count"), ("cents", "sum")])
        return pa.table({
            "region": g.column("r_name"),
            "n_orders": g.column("cents_count").cast(pa.int64()),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("region").aggregate(
            [("n_orders", "sum"), ("sum_cents", "sum")])
        return pa.table({
            "region": g.column("region"),
            "n_orders": g.column("n_orders_sum").cast(pa.int64()),
            "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
        })

    return (joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(4, keys=["region"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_distinct_users_daily(sf_dir: str):
    """Exact count(DISTINCT user_id) per day — grouped distinct without
    co-locating whole groups."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import distinct_count_by

    def project(b):
        return pa.table({
            "day": pc.floor_temporal(b.column("ts"), unit="day"),
            "user_id": b.column("user_id").cast(pa.int64()),
        })

    out = distinct_count_by(
        _read(sf_dir, "events", ["ts", "user_id"])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        "day", "user_id", num_partitions=16)

    def rename(b):
        return pa.table({"day": b.column("day"),
                         "n_users": b.column("n_distinct")})
    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def _q_asof_event_order(sf_dir: str):
    """As-of join: each event matched to the user's most recent order
    placed at-or-before the event time (ties -> greatest orderkey)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.asof import asof_join

    out = asof_join(
        _read(sf_dir, "events", ["event_id", "user_id",
                                                "ts"]),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                                "o_orderkey"]),
        on=("user_id", "o_custkey"), ts=("ts", "o_orderdate"),
        tie_break="o_orderkey", left_cols=["event_id"],
        right_cols=["o_orderkey"], num_partitions=16)

    def project(b):
        return pa.table({
            "event_id": b.column("event_id").cast(pa.int64()),
            "matched_orderkey": b.column("o_orderkey").cast(pa.int64()),
        })
    return out.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)


def _q_consecutive_bigram_jaccard(sf_dir: str):
    from apache_datasketches_go_ray.stages.dedup_extras import (
        consecutive_token_jaccard,
    )

    return consecutive_token_jaccard(
        _read(sf_dir, "documents", ["doc_id", "text"]), num_partitions=16,
        ngram=2)


def _q_transcript_turn_gaps(sf_dir: str):
    """Per-conversation turn-timing stats via the windowed kernels:
    number of >5-min gaps, mean inter-turn seconds — the conversation
    analogue of event sessionization (rows-only: transcripts are
    synthesized, not a driver table)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "ts"])

    def project(b):
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx").cast(pa.int32()),
            "ts": b.column("ts").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
                "n_long_gaps": pa.array([], type=pa.int64()),
                "mean_gap_s": pa.array([], type=pa.float64()),
            })
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        ts = as_array(b.column("ts")).to_numpy(zero_copy_only=False)
        # stable per-conv ordering by turn_idx (string keys: argsort of
        # codes via np.unique inverse)
        _, codes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, codes))
        c, t = codes[order], ts[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        gaps_us = np.diff(t)  # integer microseconds: sums stay exact
        inner = ~first[1:]  # gaps within a conv
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c))
        n_turns = ends - starts
        gsum = np.concatenate(
            [[0], np.cumsum(np.where(inner, gaps_us, 0))])
        gbig = np.concatenate(
            [[0], np.cumsum(inner & (gaps_us > 300_000_000))])
        span = ends - 1
        # (int_sum / n) / 1e6 then half-up to 3 decimals — the same two
        # IEEE ops the SQL oracle performs, so results are bit-identical
        mean_gap = np.where(
            n_turns > 1,
            (gsum[span] - gsum[starts]).astype(np.float64)
            / np.maximum(n_turns - 1, 1) / 1e6, 0.0)
        return pa.table({
            "conv_id": pa.array(conv[order][starts]),
            "n_turns": pa.array(n_turns, type=pa.int64()),
            "n_long_gaps": pa.array(gbig[span] - gbig[starts],
                                    type=pa.int64()),
            "mean_gap_s": pa.array(
                np.floor(mean_gap * 1000.0 + 0.5) / 1000.0,
                type=pa.float64()),
        })

    return (ds.select_columns(["conv_id", "turn_idx", "ts"])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_transcript_role_stats(sf_dir: str):
    """Per-conversation role profile over the transcript table: turn
    counts by role (user/assistant/tool), tool-call count and text
    volume — the conversation-level pivot (conditional partial counts
    + one conv_id shuffle, same shape as event_type_pivot). Rows-only:
    transcripts are synthesized, not a driver table; exactness is
    pinned by the pandas ground-truth test."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    def partial(b):
        role = b.column("role")
        t = pa.table({
            "conv_id": b.column("conv_id"),
            "n_user": pc.equal(role, "user").cast(pa.int64()),
            "n_assistant": pc.equal(role, "assistant").cast(pa.int64()),
            "n_tool": pc.equal(role, "tool").cast(pa.int64()),
            "n_tool_calls": pc.not_equal(b.column("tool"), "")
                .cast(pa.int64()),
            "n_chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
        })
        g = t.group_by("conv_id").aggregate(
            [(c, "sum") for c in ("n_user", "n_assistant", "n_tool",
                                  "n_tool_calls", "n_chars")])
        return g.rename_columns(
            ["conv_id", "n_user", "n_assistant", "n_tool",
             "n_tool_calls", "n_chars"])

    def fold(b):
        if len(b) == 0:
            return b
        g = b.group_by("conv_id").aggregate(
            [(c, "sum") for c in ("n_user", "n_assistant", "n_tool",
                                  "n_tool_calls", "n_chars")])
        return g.rename_columns(
            ["conv_id", "n_user", "n_assistant", "n_tool",
             "n_tool_calls", "n_chars"])

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "role", "tool", "text"])
    return (ds.select_columns(["conv_id", "role", "tool", "text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_boilerplate_turns(sf_dir: str):
    """Boilerplate-turn detection: turn texts repeated across >= 2
    conversations (the skew source the LSH stage salts against —
    SURVEY §7.8). Exact distributed count-distinct-conv per turn-text
    hash: in-block (hash, conv) dedup, one keyed shuffle, exact fold;
    only 16-byte rows cross the wire, never the texts. Top-20 by
    (n_convs DESC, text ASC) — a total order SQL can reproduce: a
    hash-ranked top-20 finds the count threshold, texts are resolved
    only for hashes at/above it (bounded by the cross-conv dup rate),
    and the final text-tie-broken cut happens on that small set."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "text"])

    def pre(b):
        h1, _ = hash_strings(as_array(b.column("text")))
        t = pa.table({
            "h": pa.array(h1.view(np.int64), type=pa.int64()),
            "conv_id": b.column("conv_id"),
        })
        g = t.group_by(["h", "conv_id"]).aggregate([])
        return g

    def fold(b):
        if len(b) == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "n_convs": pa.array([], type=pa.int64())})
        g = b.group_by(["h", "conv_id"]).aggregate([]) \
            .group_by("h").aggregate([("conv_id", "count")])
        return pa.table({"h": g.column("h"),
                         "n_convs": g.column("conv_id_count")
                         .cast(pa.int64())})

    from apache_datasketches_go_ray.stages.relational import top_k
    counts = (
        ds.select_columns(["conv_id", "text"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8, keys=["h"])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .filter(expr="n_convs >= 2")
        .materialize())
    # count threshold from a hash-ranked top-20 (texts never ship);
    # every hash at/above it is a candidate for the text-tie-broken cut
    top = top_k(counts,
                [("n_convs", "descending"), ("h", "ascending")],
                k=20).to_pandas()
    if len(top) == 0:
        return pa.table({"text": pa.array([], type=pa.string()),
                         "n_convs": pa.array([], type=pa.int64())})
    thr = int(top["n_convs"].min())
    hot_tbl = counts.filter(
        expr=f"n_convs >= {thr}").to_pandas()
    wanted = set(hot_tbl["h"].tolist())

    def resolve(b):
        h1, _ = hash_strings(as_array(b.column("text")))
        h = h1.view(np.int64)
        mask = np.isin(h, np.fromiter(wanted, dtype=np.int64))
        if not mask.any():
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())})
        t = pa.table({"h": pa.array(h[mask], type=pa.int64()),
                      "text": as_array(b.column("text"))
                      .filter(pa.array(mask))})
        return t.group_by(["h", "text"]).aggregate([])

    texts = ds.select_columns(["text"]).map_batches(
        resolve, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas().drop_duplicates("h")
    out = hot_tbl.merge(texts, on="h", how="left") \
        .sort_values(["n_convs", "text"], ascending=[False, True],
                     ignore_index=True).head(20)
    return pa.table({
        "text": pa.array(out["text"], type=pa.string()),
        "n_convs": pa.array(out["n_convs"], type=pa.int64()),
    })


def _q_containment_dups(sf_dir: str):
    """Suffix-array containment dedup, standalone: plant docs that are
    60%-prefix copies of reals (ids offset by 3*10^6) and recover them
    via sign -> band -> verify with the containment (substring) pass —
    the pairs where Jaccard alone is below threshold but the shared
    substring covers the smaller doc (method == 'containment' or
    jaccard for near-total overlap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from apache_datasketches_go_ray.stages.dedup_extras import (
        minhash_dedup_documents,
    )
    from apache_datasketches_go_ray.stages.signature import sign
    from apache_datasketches_go_ray.stages.lsh import candidate_pairs
    from apache_datasketches_go_ray.stages.verify import verify_pairs
    import numpy as _np

    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist()
    new_ids, new_texts = [], []
    for i in range(25):
        words = texts[i].split(" ")
        new_ids.append(ids[i] + 3_000_000)
        # 15 at 60% prefix (Jaccard >= tau path) + 10 at 45% prefix
        # (Jaccard < tau, containment ~1.0 -> suffix-array path)
        frac = 3 / 5 if i < 15 else 9 / 20
        new_texts.append(
            " ".join(words[:max(3, int(len(words) * frac))]))
    aug = pa.table({
        "conv_id": pa.array([str(x) for x in ids + new_ids],
                            type=pa.string()),
        "text": pa.array(texts + new_texts, type=pa.string()),
        "n_turns": pa.array(_np.ones(len(ids) + 25, dtype=_np.int32)),
    })
    cfg = _dedup_config()
    docs = ray.data.from_arrow(aug).materialize()
    sigs = sign(docs, cfg, keep_text=False).materialize()
    pairs = candidate_pairs(sigs, cfg, dedup=False)
    verified = verify_pairs(pairs, sigs, cfg, dedup_pairs=True,
                            texts_ds=docs)
    out = verified.filter(expr="is_dup == True")

    def project(b):
        return pa.table({
            "a": b.column("a"), "b": b.column("b"),
            "method": b.column("method"),
        })
    return out.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True).sort(["a", "b"])


def _q_video_frame_features(sf_dir: str):
    """Video frame sampling over a MIXED column: raw-buffer videos plus
    REAL MP4 containers whose sample tables are parsed at the ISO-BMFF
    box level (functions/mp4box.py — stsz/stsc/stco offsets, no codec
    library) -> every-6th-frame rows -> per-frame channel features
    (actor-pool stages, flat-map batch expansion)."""
    import ray.data
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.multimodal import (
        make_fake_video_batch, make_real_video_batch, frame_pipeline,
    )

    media = ray.data.from_arrow(pa.concat_tables([
        make_fake_video_batch(list(range(16))),
        make_real_video_batch(list(range(16, 28))),
    ]))
    out = frame_pipeline(media, every_k=6, batch_size=4)

    def project(b):
        feats = [np.frombuffer(x, dtype=np.float32)
                 for x in b.column("features").to_pylist()]
        return pa.table({
            "media_id": b.column("media_id"),
            "frame_idx": b.column("frame_idx").cast(pa.int32()),
            "feat_dim": pa.array([len(f) for f in feats], type=pa.int64()),
            "feat_sum": pa.array([round(float(f.sum()), 2) for f in feats]),
        })
    return out.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True).sort(["media_id",
                                                       "frame_idx"])


def _q_curate_docs(sf_dir: str):
    """End-to-end training-data curation funnel on the documents table
    with planted exact + near duplicates (ids offset by 10^6/2*10^6):
    annotate -> filter -> exact dedup -> near dedup -> curated ids."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from apache_datasketches_go_ray.pipelines.curate import (
        CurateConfig, run_curate,
    )

    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist()
    exact_ids = [i + 1_000_000 for i in ids[:15]]
    near_ids = [i + 2_000_000 for i in ids[15:30]]
    near_texts = []
    for t in texts[15:30]:
        words = t.split(" ")
        words[len(words) // 2] = "zzqx"
        near_texts.append(" ".join(words))
    aug = pa.table({
        "doc_id": pa.array(ids + exact_ids + near_ids, type=pa.int64()),
        "text": pa.array(texts + texts[:15] + near_texts,
                         type=pa.string()),
    })
    res = run_curate(ray.data.from_arrow(aug),
                     CurateConfig(min_quality=0.2, num_partitions=16))

    def project(b):
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64())})
    return res["curated"].map_batches(project, batch_format="pyarrow",
                                      zero_copy_batch=True).sort("doc_id")


def _q_curate_transcripts(sf_dir: str):
    """Transcript curation funnel — the axes-A+B composition: assemble
    conversations from the transcript table, then run the checkpointed
    curation pipeline (annotate -> quality filter -> exact dedup ->
    MinHash near-dedup) with conv_id as the document key. The synthetic
    corpus plants exact + near duplicate conversations (FIXTURES F2),
    so the funnel's dedup stages do real work. Rows-only: curated conv
    set is pinned by the funnel/recall pytest machinery."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.pipelines.curate import (
        CurateConfig,
        run_curate,
    )
    from apache_datasketches_go_ray.stages.assemble import assemble

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    convs = assemble(ds, 8).select_columns(["conv_id", "text"])
    # synthetic token texts classify as 'unknown' — pass it through so
    # the funnel exercises the dedup stages, not just the lang gate
    res = run_curate(convs, CurateConfig(min_quality=0.0, min_chars=1,
                                         allowed_langs=("en", "unknown"),
                                         num_partitions=8),
                     id_col="conv_id", text_col="text")

    def project(b):
        return pa.table({"conv_id": b.column("conv_id").cast(pa.string())})

    return res["curated"].map_batches(project, batch_format="pyarrow",
                                      zero_copy_batch=True).sort("conv_id")


def _q_largest_event_per_user(sf_dir: str):
    """Per-group argmax: each user's single largest event (by cents,
    deterministic event_id tie-break) — per-block partial argmax
    combiner, then one keyed shuffle and a final argmax fold. Only one
    row per (block, user) ever moves through the shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def argmax_block(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
        u = as_array(b.column("user_id")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = as_array(b.column("event_id")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        c = as_array(b.column("cents")).to_numpy(zero_copy_only=False)
        # sort by (user, cents desc, event_id asc); take first per user
        order = np.lexsort((e, -c, u))
        uu = u[order]
        first = np.ones(len(uu), dtype=bool)
        first[1:] = uu[1:] != uu[:-1]
        keep = order[first]
        return pa.table({
            "user_id": pa.array(u[keep], type=pa.int64()),
            "event_id": pa.array(e[keep], type=pa.int64()),
            "cents": pa.array(c[keep], type=pa.int64()),
        })

    def prep(b):
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })

    return (_read(sf_dir, "events", ["user_id", "event_id", "value"])
            .map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(argmax_block, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["user_id"])
            .map_batches(argmax_block, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def _q_event_type_pivot(sf_dir: str):
    """Pivot: per-user event counts spread into one column per event
    type (conditional partial counts + keyed fold — the columnar
    reshape every feature pipeline needs)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    types = ["click", "error", "purchase", "signup", "view"]

    def partial(b):
        cols = {"user_id": b.column("user_id").cast(pa.int64())}
        et = b.column("event_type")
        for t in types:
            cols[f"n_{t}"] = pc.equal(et, t).cast(pa.int64())
        g = pa.table(cols).group_by("user_id").aggregate(
            [(f"n_{t}", "sum") for t in types])
        return pa.table(
            {"user_id": g.column("user_id"),
             **{f"n_{t}": g.column(f"n_{t}_sum").cast(pa.int64())
                for t in types}})

    def fold(b):
        g = b.group_by("user_id").aggregate(
            [(f"n_{t}", "sum") for t in types])
        return pa.table(
            {"user_id": g.column("user_id"),
             **{f"n_{t}": g.column(f"n_{t}_sum").cast(pa.int64())
                for t in types}})

    return (_read(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_kll_rank_annotate(sf_dir: str):
    """KLL GetRank as an annotator: each document's inclusive
    normalized rank of n_chars (== cume_dist when the sketch is in the
    exact no-compaction regime). k is sized to the corpus (next pow2
    >= row count, metadata-only count on the untransformed read) so the
    regime holds at every sf tier; at true scale one would fix k and
    accept the published rank error instead. The merged sketch ships
    once via broadcast; the annotate pass is a vectorized searchsorted
    per batch."""
    import pyarrow as pa
    import ray
    from apache_datasketches_go_ray.state.kll import KllSketch
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    k = max(4096, 1 << int(np.ceil(np.log2(max(docs.count(), 1)))))

    def partial(b):
        sk = KllSketch(k)
        sk.update_many(as_array(b.column("n_chars"))
                       .to_numpy(zero_copy_only=False)
                       .astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()],
                                        type=pa.large_binary())})

    merged = KllSketch(k)
    for row in docs.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True).take_all():
        merged.merge(KllSketch.from_bytes(row["sk"]))
    items, cum = merged._sorted_view()
    n = merged.n
    ref = ray.put((items, cum, n))

    def annotate(b):
        it, cw, total = ray.get(ref)
        v = as_array(b.column("n_chars")).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        idx = np.searchsorted(it, v, side="right")
        rank = np.where(idx > 0, cw[np.maximum(idx - 1, 0)], 0) / total
        return pa.table({
            "doc_id": b.column("doc_id"),
            "chars_rank": pa.array(np.round(rank, 6), type=pa.float64()),
        })

    return docs.map_batches(annotate, batch_format="pyarrow",
                            zero_copy_batch=True)


def _q_partitioned_sink_roundtrip(sf_dir: str):
    """Resumable-output path as a first-class operator: write documents
    as hive-partitioned Parquet (one directory per lang — the per-key
    layout a failed 100 TB run resumes from), read the partitioned
    layout back, and aggregate per partition. Value-exact vs SQL on the
    original table, so the sink+source round-trip is lossless."""
    import shutil
    import pyarrow as pa
    import ray.data

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/adgr_sink/{name}/documents_by_lang"
    shutil.rmtree(out_dir, ignore_errors=True)
    _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).write_parquet(
        out_dir, partition_cols=["lang"])

    back = ray.data.read_parquet(out_dir)

    def partial(b):
        g = pa.table({
            "lang": b.column("lang").cast(pa.string()),
            "n_chars": b.column("n_chars").cast(pa.int64()),
        }).group_by("lang").aggregate(
            [("n_chars", "count"), ("n_chars", "sum")])
        return pa.table({
            "lang": g.column("lang"),
            "n_docs": g.column("n_chars_count").cast(pa.int64()),
            "sum_chars": g.column("n_chars_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("lang").aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return pa.table({
            "lang": g.column("lang"),
            "n_docs": g.column("n_docs_sum").cast(pa.int64()),
            "sum_chars": g.column("sum_chars_sum").cast(pa.int64()),
        })

    return (back.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .repartition(2, keys=["lang"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_varopt_sample_by_source(sf_dir: str):
    """Grouped VarOpt-style weighted sample: k retained docs PER SOURCE
    (weight = n_chars) — the per-domain corpus-subsampling form of
    varopt_sample_docs. k sizes to the corpus so every group is in the
    exact regime (SQL value-exact); bounded-k behavior and merge parity
    are pinned by tests/test_varopt.py."""
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        varopt_sample_by,
    )

    ds = _read(sf_dir, "documents", ["source", "doc_id", "n_chars"])
    n = ds.count()
    k = max(2048, 1 << (int(n) - 1).bit_length())
    return varopt_sample_by(ds, "source", "doc_id", "n_chars", k=k,
                            num_partitions=8)


def _q_varopt_sample_docs(sf_dir: str):
    """VarOpt-style weighted bounded-k sample over documents, weight =
    n_chars (state/varopt.py: tau/heavy split, coordinated hash
    priorities, mergeable partials — the sampling family the reference
    marks not-implemented, README.md:57-60). k exceeds the sf0.01
    corpus, so the exact regime holds: every doc retained at its exact
    weight, tau == 0, adjusted == weight — SQL-oracle value-exact. The
    sampling regime (k < n) is pinned by tests/test_varopt.py merge-
    parity and estimator tests."""
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import varopt_sample

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    # size k to the corpus (next pow2 >= rowcount, the kll_rank_annotate
    # precedent) so the exact regime holds at every sf tier; the
    # bounded-k sampling regime is pinned by tests/test_varopt.py
    n = ds.count()
    k = max(2048, 1 << (int(n) - 1).bit_length())
    tbl = varopt_sample(ds, "doc_id", "n_chars", k=k)
    return ray.data.from_arrow(tbl)


def _q_sample_docs_bottomk(sf_dir: str):
    """Deterministic uniform sample without replacement via bottom-k
    hashing — the KMV idea behind the reference's coupon/k-minimum-
    values machinery (hll/hll_sketch.go:338-343) as a sampling
    operator: keep the k rows with the smallest hash of the key.
    Mergeable (bottom-k of a union = bottom-k of per-block bottom-ks),
    so it runs as per-block partial top-k with no shuffle. Knuth
    multiplicative hash keeps it SQL-oracle-exact."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.relational import top_k

    def prep(b):
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = (ids * 2654435761) % 4294967296
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "h": pa.array(h, type=pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return top_k(ds, [("h", "ascending"), ("doc_id", "ascending")], k=100)


def _q_sliding_window(sf_dir: str):
    """Row-based sliding window (3-row trailing sum) per user over
    events — prefix-sum difference kernel, one hash shuffle."""
    from apache_datasketches_go_ray.stages.windows import (
        sliding_window_sum,
    )

    return sliding_window_sum(_read(sf_dir, "events",
                                  ["user_id", "ts", "event_id", "value"]),
                              preceding=2,
                              num_partitions=16)


def _q_doc_encoding_qa(sf_dir: str):
    """Per-document encoding-hygiene scan (crawl QA): U+FFFD count,
    UTF-8-as-Latin-1 mojibake artifacts, stray C0 controls, pure-ASCII
    flag — one vectorized RE2 map (stages/textops.encoding_qa_batch),
    no shuffle; DuckDB runs the IDENTICAL RE2 patterns."""
    from apache_datasketches_go_ray.stages.textops import encoding_qa_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        encoding_qa_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_bpe_token_counts(sf_dir: str):
    """BPE-ish pretokenizer counts per document: one vectorized RE2
    scan (pc.count_substring_regex); the identical pattern runs in the
    DuckDB oracle (both engines are RE2)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import (
        bpe_token_count_batch,
    )

    def project(b):
        out = bpe_token_count_batch(b)
        return pa.table({"doc_id": out.column("doc_id"),
                         "n_bpe_tokens": out.column("n_bpe_tokens")})

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True))


def _q_train_eval_split(sf_dir: str):
    """Deterministic train/eval split by Knuth multiplicative hash of
    doc_id (~10% eval) — the reproducible splitter every training-data
    pipeline needs; pure int64 arithmetic so it is SQL-expressible and
    stable across engines, runs and partitionings."""
    import pyarrow as pa

    def project(b):
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = (ids * 2654435761) % 4294967296
        split = np.where(h % 100 < 10, "eval", "train")
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "split": pa.array(split, type=pa.string()),
        })

    return (_read(sf_dir, "documents", ["doc_id"])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True))


def _q_kll_quantiles_by_lang(sf_dir: str):
    """Grouped KLL quantiles of documents.n_chars per language; k=4096
    exceeds every per-group count through sf0.1, so the sketch stays in
    the exact no-compaction regime and the DuckDB oracle checks it
    value-exact (at corpus scale the same operator degrades gracefully
    to the error-bounded sketch)."""
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        approx_quantiles_by,
    )

    return approx_quantiles_by(
        _read(sf_dir, "documents", ["lang", "n_chars"]),
        "lang", "n_chars", ranks=[0.25, 0.5, 0.75], k=4096,
        num_partitions=8)


def _q_revenue_filter(sf_dir: str):
    """TPC-H Q6-flavored forecast-revenue filter: one pruned-column
    read, vectorized predicate, exact-cents partial sums folded to a
    single row (no shuffle beyond the 1-partition fold)."""
    import datetime
    import pyarrow as pa
    import pyarrow.compute as pc

    lo = pa.scalar(datetime.datetime(1997, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1998, 1, 1), type=pa.timestamp("us"))

    def partial(b):
        mask = pc.and_(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi)),
            pc.and_(
                pc.and_(pc.greater_equal(b.column("l_discount"), 0.05),
                        pc.less_equal(b.column("l_discount"), 0.07)),
                pc.less(b.column("l_quantity"), 24.0)))
        t = b.filter(mask)
        # floor(x*100+0.5): identical IEEE op order as the oracle SQL
        rev = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * t.column("l_discount").to_numpy(zero_copy_only=False)
            * 100 + 0.5).astype(np.int64)
        return pa.table({
            "revenue_c": pa.array([int(rev.sum())], type=pa.int64()),
            "n_rows": pa.array([len(t)], type=pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return b
        return pa.table({
            "revenue_c": pa.array(
                [pc.sum(b.column("revenue_c")).as_py() or 0],
                type=pa.int64()),
            "n_rows": pa.array([pc.sum(b.column("n_rows")).as_py() or 0],
                               type=pa.int64()),
        })

    return (_read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity",
                             "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_brand_revenue(sf_dir: str):
    """TPC-H Q14-flavored: lineitem (1997 shipments) joined to part by
    broadcast hash join, exact-cents revenue per brand."""
    import datetime
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    lo = pa.scalar(datetime.datetime(1997, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1998, 1, 1), type=pa.timestamp("us"))

    def prep(b):
        t = b.filter(pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                             pc.less(b.column("l_shipdate"), hi)))
        rev = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
            * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_partkey": t.column("l_partkey").cast(pa.int64()),
            "rev_c": pa.array(rev, type=pa.int64()),
        })

    li = (_read(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice",
                           "l_discount"])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    joined = hash_join(
        li, _read(sf_dir, "part", ["p_partkey", "p_brand"]),
        on=("l_partkey", "p_partkey"))

    def partial(b):
        g = b.group_by("p_brand").aggregate(
            [("rev_c", "count"), ("rev_c", "sum")])
        return pa.table({
            "p_brand": g.column("p_brand"),
            "n_items": g.column("rev_c_count").cast(pa.int64()),
            "revenue_c": g.column("rev_c_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("p_brand").aggregate(
            [("n_items", "sum"), ("revenue_c", "sum")])
        return pa.table({
            "p_brand": g.column("p_brand"),
            "n_items": g.column("n_items_sum").cast(pa.int64()),
            "revenue_c": g.column("revenue_c_sum").cast(pa.int64()),
        })

    return (joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(4, keys=["p_brand"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_supplier_balance(sf_dir: str):
    """supplier ⋈ nation broadcast join; exact-cents account-balance
    rollup per nation name."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    def prep(b):
        return pa.table({
            "s_nationkey": b.column("s_nationkey").cast(pa.int64()),
            "bal_c": pc.round(pc.multiply(b.column("s_acctbal"), 100))
                .cast(pa.int64()),
        })

    def prep_nation(b):
        return pa.table({
            "n_nationkey": b.column("n_nationkey").cast(pa.int64()),
            "n_name": b.column("n_name"),
        })

    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True)
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .map_batches(prep_nation, batch_format="pyarrow",
                     zero_copy_batch=True)
    joined = hash_join(sup, nat, on=("s_nationkey", "n_nationkey"))

    def fold(b):
        g = b.group_by("n_name").aggregate(
            [("bal_c", "count"), ("bal_c", "sum")])
        return pa.table({
            "n_name": g.column("n_name"),
            "n_suppliers": g.column("bal_c_count").cast(pa.int64()),
            "sum_bal_c": g.column("bal_c_sum").cast(pa.int64()),
        })

    def fold2(b):
        g = b.group_by("n_name").aggregate(
            [("n_suppliers", "sum"), ("sum_bal_c", "sum")])
        return pa.table({
            "n_name": g.column("n_name"),
            "n_suppliers": g.column("n_suppliers_sum").cast(pa.int64()),
            "sum_bal_c": g.column("sum_bal_c_sum").cast(pa.int64()),
        })

    return (joined.map_batches(fold, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(2, keys=["n_name"])
            .map_batches(fold2, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3-flavored shipping priority: lineitem revenue per order
    (pre-aggregated partial+fold), BUILDING-segment customers broadcast
    into orders, then distributed top-10 by revenue."""
    import datetime
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join
    from apache_datasketches_go_ray.stages.relational import (
        semi_join, top_k,
    )

    cut = pa.scalar(datetime.datetime(1997, 6, 1), type=pa.timestamp("us"))

    def prep_li(b):
        t = b.filter(pc.greater(b.column("l_shipdate"), cut))
        rev = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
            * 100 + 0.5).astype(np.int64)
        g = pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "rev_c": pa.array(rev, type=pa.int64()),
        }).group_by("l_orderkey").aggregate([("rev_c", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "rev_c": g.column("rev_c_sum")})

    def fold_li(b):
        g = b.group_by("l_orderkey").aggregate([("rev_c", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "revenue_c": g.column("rev_c_sum")
                         .cast(pa.int64())})

    rev = (_read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice",
                            "l_discount"])
           .map_batches(prep_li, batch_format="pyarrow",
                        zero_copy_batch=True)
           .repartition(16, keys=["l_orderkey"])
           .map_batches(fold_li, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True))

    def prep_orders(b):
        t = b.filter(pc.less(b.column("o_orderdate"), cut))
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64()),
            "o_orderdate": t.column("o_orderdate"),
        })

    def prep_cust(b):
        t = b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING"))
        return t.select(["c_custkey"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(prep_orders, batch_format="pyarrow",
                     zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(prep_cust, batch_format="pyarrow",
                     zero_copy_batch=True)
    building = semi_join(orders, cust, on=("o_custkey", "c_custkey")) \
        .select_columns(["o_orderkey", "o_orderdate"])
    joined = hash_join(building, rev, on=("o_orderkey", "l_orderkey"))
    return top_k(joined.select_columns(["o_orderkey", "revenue_c",
                                        "o_orderdate"]),
                 [("revenue_c", "descending"), ("o_orderkey", "ascending")],
                 k=10)


def _q_event_followups(sf_dir: str):
    """Interval (range) join: for each signup event, count + cents-sum
    of the same user's events within the following 6 hours (window
    start inclusive, end exclusive; the signup itself is in-window).
    Boundary-merge kernel — see stages/rangejoin.py."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.rangejoin import (
        interval_join_agg,
    )

    def signups(b):
        return b.filter(pc.equal(b.column("event_type"), "signup")) \
            .select(["event_id", "user_id", "ts"])

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    left = ev.map_batches(signups, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = interval_join_agg(
        left, ev.select_columns(["user_id", "ts", "value"]),
        on=("user_id", "user_id"), ts=("ts", "ts"),
        window_us=6 * 3600 * 1_000_000, left_cols=["event_id"],
        right_val="value", count_name="n_follow", sum_name="sum_cents",
        num_partitions=16)

    def project(b):
        return pa.table({
            "event_id": b.column("event_id").cast(pa.int64()),
            "n_follow": b.column("n_follow"),
            "sum_cents": b.column("sum_cents"),
        })
    return out.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)


def _q_props_extract(sf_dir: str):
    """JSON field extraction from the events.props payload column
    (vectorized regex capture, no Python-level JSON parsing) + grouped
    exact rollup per event type."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        k = pc.cast(pc.struct_field(
            pc.extract_regex(b.column("props"), r'"k":\s*(?P<k>-?\d+)'),
            "k"), pa.int64())
        g = pa.table({"event_type": b.column("event_type"), "k": k}) \
            .group_by("event_type").aggregate(
                [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")])
        return pa.table({
            "event_type": g.column("event_type"),
            "n_events": g.column("k_count").cast(pa.int64()),
            "sum_k": g.column("k_sum").cast(pa.int64()),
            "min_k": g.column("k_min").cast(pa.int64()),
            "max_k": g.column("k_max").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("event_type").aggregate(
            [("n_events", "sum"), ("sum_k", "sum"), ("min_k", "min"),
             ("max_k", "max")])
        return pa.table({
            "event_type": g.column("event_type"),
            "n_events": g.column("n_events_sum").cast(pa.int64()),
            "sum_k": g.column("sum_k_sum").cast(pa.int64()),
            "min_k": g.column("min_k_min").cast(pa.int64()),
            "max_k": g.column("max_k_max").cast(pa.int64()),
        })

    return (_read(sf_dir, "events", ["event_type", "props"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["event_type"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_multimodal_features(sf_dir: str):
    """REAL image decode path: a MIXED-format media column — 8-bit PNG
    (stdlib zlib + numpy scanline unfilter) and baseline JPEG (pure
    numpy/struct SOF0 Huffman decoder, functions/jpegcodec.py) — decoded
    through one actor-pool pipeline with no codec libraries and no fake
    decode, then resize + features. mp4 video frames remain the only
    stubbed codec."""
    import ray.data
    from apache_datasketches_go_ray.stages.multimodal import (
        make_real_media_batch, decode_pipeline,
    )
    import pyarrow as pa

    media = ray.data.from_arrow(pa.concat_tables([
        make_real_media_batch(list(range(64)), kind="image/png"),
        make_real_media_batch(list(range(64, 96)), kind="image/jpeg"),
        make_real_media_batch(list(range(96, 128)), kind="image/gif"),
    ]))
    out = decode_pipeline(media, fake=False, batch_size=16)

    def project(b):
        feats = [np.frombuffer(x, dtype=np.float32)
                 for x in b.column("features").to_pylist()]
        return pa.table({
            "media_id": b.column("media_id"),
            "feat_dim": pa.array([len(f) for f in feats], type=pa.int64()),
            "feat_sum": pa.array([round(float(f.sum()), 2) for f in feats]),
        })
    return out.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)


def _q_audio_wav_features(sf_dir: str):
    """REAL (non-stub) audio decode path: deterministic RIFF/PCM WAV
    payloads decoded byte-exactly through the actor-pool DecodeStage
    (stdlib wave + numpy, no codec libraries), then per-clip features.
    Rows-only: SQL cannot decode WAV; exactness is pinned by the
    round-trip tests (tests/test_multimodal.py)."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.multimodal import (
        DecodeStage,
        make_real_media_batch,
    )

    media = ray.data.from_arrow(
        make_real_media_batch(list(range(64)), kind="audio/wav"))
    decoded = media.map_batches(
        DecodeStage, fn_constructor_args=(False,), batch_size=16,
        concurrency=2, batch_format="pyarrow", zero_copy_batch=True)

    def feats(b):
        import json as _json

        out_n, out_peak, out_rms = [], [], []
        for raw, shp in zip(b.column("decoded").to_pylist(),
                            b.column("decoded_shape").to_pylist()):
            sh = _json.loads(shp)
            arr = np.frombuffer(raw, dtype=sh["dtype"]).astype(np.int64)
            out_n.append(len(arr))
            out_peak.append(int(np.abs(arr).max()))
            out_rms.append(int(np.sqrt(np.mean(arr * arr))))
        return pa.table({
            "media_id": b.column("media_id"),
            "n_samples": pa.array(out_n, type=pa.int64()),
            "peak": pa.array(out_peak, type=pa.int64()),
            "rms": pa.array(out_rms, type=pa.int64()),
        })

    return decoded.map_batches(feats, batch_format="pyarrow",
                               zero_copy_batch=True)


def _q_lag_delta(sf_dir: str):
    """lag() window: each event's previous value (exact cents) and the
    delta, per user ordered by (ts, event_id) — shifted-view kernel
    after one hash shuffle (stages/windows.lag_delta)."""
    from apache_datasketches_go_ray.stages.windows import lag_delta

    return lag_delta(_read(sf_dir, "events",
                           ["user_id", "ts", "event_id", "value"]),
                     num_partitions=16)


def _q_lead_delta(sf_dir: str):
    """lead() window: each event's next value (exact cents) and the
    delta to it — the mirror of events_lag_delta (same one-shuffle
    shifted-view kernel, zeroed at segment ends)."""
    from apache_datasketches_go_ray.stages.windows import lead_delta

    return lead_delta(_read(sf_dir, "events",
                            ["user_id", "ts", "event_id", "value"]),
                      num_partitions=16)


def _q_time_window(sf_dir: str):
    """Time-range sliding window: trailing 1-hour sum/count per user
    (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW,
    peer-inclusive like SQL)."""
    from apache_datasketches_go_ray.stages.windows import time_window_sum

    return time_window_sum(_read(sf_dir, "events",
                                 ["user_id", "ts", "event_id", "value"]),
                           preceding_seconds=3600, num_partitions=16)


def _q_dense_rank_orders(sf_dir: str):
    """dense_rank() of each customer's orders by total price desc —
    per-group ranking with tie sharing, one hash shuffle + cumsum-of-
    change-flags kernel."""
    from apache_datasketches_go_ray.stages.windows import dense_rank_in_group

    return dense_rank_in_group(_read(sf_dir, "orders",
                                     ["o_custkey", "o_totalprice",
                                      "o_orderkey"]), "o_custkey",
                               "o_totalprice", "o_orderkey",
                               num_partitions=8)


def _q_event_paths(sf_dir: str):
    """Per-user ordered event-type path (string_agg ORDER BY ts, id) —
    the conversation-assembly shape (groupby + stable sort + native
    binary_join) applied to behavioral sequences."""
    from apache_datasketches_go_ray.stages.sequence import event_paths

    return event_paths(_read(sf_dir, "events",
                             ["user_id", "ts", "event_id", "event_type"]),
                       num_partitions=16)


def _q_funnel_depth(sf_dir: str):
    """Ordered funnel view->click->purchase per user: depth of the
    min-chained stage sequence plus first/deepest stage timestamps.
    Vectorized masked minimum.reduceat chain, one shuffle."""
    from apache_datasketches_go_ray.stages.sequence import funnel_depth

    return funnel_depth(_read(sf_dir, "events",
                              ["user_id", "ts", "event_id", "event_type"]),
                        ["view", "click", "purchase"], num_partitions=16)


def _q_top3_events_per_user(sf_dir: str):
    """Top-3 events per user by cents (row_number QUALIFY pattern):
    per-block partial keeps <=3 rows per (block,user) before the
    shuffle, so the exchange is O(3 * users)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import top_n_per_group

    def prep(b):
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "event_id": b.column("event_id").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })

    raw = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    nrows = raw.count()  # metadata-only on an untransformed parquet read
    ds = (raw
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    return top_n_per_group(ds, "user_id", "cents", "event_id", 3,
                           num_partitions=8, nrows=nrows)


def _q_kll_source_quantiles(sf_dir: str):
    """Per-language quartiles of the SOURCE STRING column via the
    generic-items KLL runtime (KllItemsSketch — the reference's
    ItemsSketch[C] string path, kll/items_sketch.go:29-37). k is sized
    to the corpus (next pow2 >= row count) so the sketch stays in the
    exact no-compaction regime and quantiles are the exact
    percentile_disc order statistics at every sf tier; at true scale
    one fixes k and accepts the published rank error."""
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        string_quantiles_by,
    )

    docs = _read(sf_dir, "documents", ["lang", "source"])
    k = min(65535,
            max(4096, 1 << int(np.ceil(np.log2(max(docs.count(), 1))))))
    return string_quantiles_by(docs, "lang", "source",
                               (0.25, 0.5, 0.75), k=k, num_partitions=4)


def _q_kll_int64_quantiles(sf_dir: str):
    """Per-source n_chars quartiles via the generic-items KLL runtime
    with the INT64 ItemSketchOp (pluggable serde surface,
    kll/items_sketch.go:29-37) — the int64-items twin of the string
    query; exact regime via corpus-sized k, same discipline."""
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        items_quantiles_by,
    )

    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    k = min(65535,
            max(4096, 1 << int(np.ceil(np.log2(max(docs.count(), 1))))))
    return items_quantiles_by(docs, "source", "n_chars",
                              (0.25, 0.5, 0.75), k=k, num_partitions=4,
                              item_type="int64")


def _q_ann_knn_join(sf_dir: str):
    """Exact cosine top-5 with a DATASET-sized query side (every 37th
    vector) via knn_join: query chunks staged in the object store, each
    corpus block scans them sequentially, query-keyed shuffle folds the
    global top-k — the large-query-side path a broadcast query matrix
    cannot take. Scores dropped from the output (rank is exact; raw
    floats are cross-engine parity risk, same discipline as ann_topk)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.ann import knn_join

    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick(b):
        from apache_datasketches_go_ray.stages.arrow_util import as_array

        vid = as_array(b.column("vec_id")).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(vid % 37 == 0))

    queries = corpus.map_batches(pick, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return knn_join(corpus, queries, k=5, chunk_rows=2048,
                    num_partitions=8).sort(["query_id", "rank"])


def _q_ann_lsh_knn_join(sf_dir: str):
    """Approximate dataset-to-dataset kNN (the scale path when Q*N
    exact is infeasible): both sides bucketed into 6 hyperplane-sign
    tables, co-partitioned per (table, bucket), in-bucket exact cosine
    top-k, query-keyed dedup fold. Rows-only: recall vs knn_join ground
    truth is gated by pytest (tests/test_kernels.py)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.ann import lsh_knn_join
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    corpus = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick(b):
        vid = as_array(b.column("vec_id")).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(vid % 37 == 0))

    queries = corpus.map_batches(pick, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return lsh_knn_join(corpus, queries, k=5, n_planes=6, n_tables=6,
                        num_partitions=8).sort(["query_id", "rank"])


def _q_lang_quantiles_exact(sf_dir: str):
    """Exact per-language quartiles of document length — ANSI
    percentile_disc semantics (element at 1-based index ceil(q*n)),
    one shuffle + one lexsort serving all three quantiles."""
    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
    )

    return grouped_quantile_disc(_read(sf_dir, "documents",
                                       ["lang", "n_chars"]), "lang",
                                 "n_chars", (0.25, 0.5, 0.75),
                                 num_partitions=4)


def _q_order_quartiles(sf_dir: str):
    """Exact global ntile(4) of orders by (totalprice, orderkey) —
    distributed exact ranking: KLL range boundaries -> per-range counts
    -> offsets -> range shuffle + local sort. No single-node sort ever
    sees the whole table."""
    from apache_datasketches_go_ray.stages.relational import global_ntile

    return global_ntile(_read(sf_dir, "orders",
                              ["o_totalprice", "o_orderkey"]),
                        "o_totalprice", "o_orderkey", 4,
                        num_partitions=16)


def _q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day): counts and exact cents at the
    (type, day), (type, ALL) and (ALL, ALL) levels, with 'ALL' sentinel
    labels. Per-block partial counts shrink to the tiny (type, day)
    grid before a single-block rollup expansion — the grouping-sets
    operator as partial+fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        day = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        t = pa.table({
            "event_type": b.column("event_type"),
            "day": day,
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by(["event_type", "day"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "day": g.column("day"),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
            "n": g.column("cents_count").cast(pa.int64()),
        })

    def rollup(b):
        if len(b) == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "day": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "sum_cents": pa.array([], type=pa.int64()),
            })
        fine = b.group_by(["event_type", "day"]).aggregate(
            [("sum_cents", "sum"), ("n", "sum")])
        fine = pa.table({
            "event_type": fine.column("event_type"),
            "day": fine.column("day"),
            "n": fine.column("n_sum").cast(pa.int64()),
            "sum_cents": fine.column("sum_cents_sum").cast(pa.int64()),
        })
        mid_g = fine.group_by("event_type").aggregate(
            [("sum_cents", "sum"), ("n", "sum")])
        mid = pa.table({
            "event_type": mid_g.column("event_type"),
            "day": pa.array(["ALL"] * len(mid_g), type=pa.string()),
            "n": mid_g.column("n_sum").cast(pa.int64()),
            "sum_cents": mid_g.column("sum_cents_sum").cast(pa.int64()),
        })
        top = pa.table({
            "event_type": pa.array(["ALL"], type=pa.string()),
            "day": pa.array(["ALL"], type=pa.string()),
            "n": pa.array([pc.sum(fine.column("n")).as_py() or 0],
                          type=pa.int64()),
            "sum_cents": pa.array(
                [pc.sum(fine.column("sum_cents")).as_py() or 0],
                type=pa.int64()),
        })
        return pa.concat_tables([fine, mid, top])

    return (_read(sf_dir, "events", ["event_type", "ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(rollup, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_users_intersect_customers(sf_dir: str):
    """INTERSECT (distinct): event user ids that are also customer keys
    — tagged-union hash shuffle + per-key presence-bit fold."""
    from apache_datasketches_go_ray.stages.relational import set_op_keys

    return set_op_keys(_read(sf_dir, "events", ["user_id"]),
                       _read(sf_dir, "customer", ["c_custkey"]),
                       ("user_id", "c_custkey"), "intersect",
                       num_partitions=8)


def _q_customers_except_users(sf_dir: str):
    """EXCEPT (distinct): customer keys with no event activity — same
    tagged-union presence fold, left-only filter."""
    from apache_datasketches_go_ray.stages.relational import set_op_keys

    return set_op_keys(_read(sf_dir, "customer", ["c_custkey"]),
                       _read(sf_dir, "events", ["user_id"]),
                       ("c_custkey", "user_id"), "except",
                       num_partitions=8)


def _q_doc_token_positions(sf_dir: str):
    """Explode tokens with 1-based ordinal (unnest WITH ORDINALITY) —
    pure offsets arithmetic, no shuffle, row count fans out ~200x."""
    from apache_datasketches_go_ray.stages.textops import (
        explode_tokens_batch,
    )

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(explode_tokens_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


def _q_docs_normalized(sf_dir: str):
    """Canonical text cleaning (lower, strip non-alnum, collapse
    whitespace) as a stateless vectorized map — the normalize step every
    dedup/shingle pipeline runs first."""
    from apache_datasketches_go_ray.stages.textops import (
        normalize_text_batch,
    )

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(normalize_text_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


def _q_lang_quantiles_cont(sf_dir: str):
    """Exact interpolated median/p90 of document length per language
    (ANSI percentile_cont: linear interpolation at q*(n-1))."""
    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_cont,
    )

    return grouped_quantile_cont(_read(sf_dir, "documents",
                                       ["lang", "n_chars"]), "lang",
                                 "n_chars", (0.5, 0.9),
                                 num_partitions=4)


def _q_order_share_of_customer(sf_dir: str):
    """Each order's integer ppm share of its customer's total spend —
    the ratio-to-group-total window in pure int64 (exact vs SQL
    integer division)."""
    from apache_datasketches_go_ray.stages.windows import share_of_group

    return share_of_group(_read(sf_dir, "orders",
                                ["o_custkey", "o_orderkey",
                                 "o_totalprice"]), key_col="o_custkey",
                          id_col="o_orderkey", value_col="o_totalprice",
                          num_partitions=8)


def _q_user_top_event_type(sf_dir: str):
    """Grouped mode: each user's most frequent event type (count desc,
    type asc tie-break) — per-block (key,value) count combiner, one
    keyed shuffle, argmax fold."""
    from apache_datasketches_go_ray.stages.relational import mode_per_group

    return mode_per_group(_read(sf_dir, "events",
                                ["user_id", "event_type"]), "user_id",
                          "event_type", num_partitions=8)


def _q_nchars_histogram(sf_dir: str):
    """Fixed-width histogram (width_bucket): document length bucketed
    by 200 chars with count/min/max per bucket — in-block combiner +
    tiny keyed fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        n = b.column("n_chars").cast(pa.int64())
        t = pa.table({
            "bucket": pc.divide(n, 200),
            "n_chars": n,
        })
        g = t.group_by("bucket").aggregate(
            [("n_chars", "count"), ("n_chars", "min"),
             ("n_chars", "max")])
        return pa.table({
            "bucket": g.column("bucket"),
            "n": g.column("n_chars_count").cast(pa.int64()),
            "min_chars": g.column("n_chars_min"),
            "max_chars": g.column("n_chars_max"),
        })

    def fold(b):
        g = b.group_by("bucket").aggregate(
            [("n", "sum"), ("min_chars", "min"), ("max_chars", "max")])
        return pa.table({
            "bucket": g.column("bucket"),
            "n": g.column("n_sum").cast(pa.int64()),
            "min_chars": g.column("min_chars_min"),
            "max_chars": g.column("max_chars_max"),
        })

    return (_read(sf_dir, "documents", ["n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["bucket"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_orders_bloom_semi(sf_dir: str):
    """Semi-join with a broadcast bloom prefilter: orders of BUILDING-
    segment customers. The bloom bitset (~1.25 B/key) drops non-member
    orders map-side before the exact verify — the shape that cuts
    shuffle volume when the right side is too big to broadcast raw."""
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import bloom_semi_join

    right = (_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
             .map_batches(lambda b: b.filter(
                 pc.equal(b.column("c_mktsegment"), "BUILDING")),
                 batch_format="pyarrow", zero_copy_batch=True))
    left = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return bloom_semi_join(left, right, ("o_custkey", "c_custkey"))


def _q_event_value_cume(sf_dir: str):
    """Per-user cume_dist of event value (peer-inclusive ties) — the
    grouped percentile-rank window via a tie-run kernel."""
    from apache_datasketches_go_ray.stages.windows import cume_dist_in_group

    return cume_dist_in_group(_read(sf_dir, "events",
                                    ["user_id", "value", "event_id"]),
                              "user_id",
                              "value", "event_id", num_partitions=8)


def _q_events_debounce(sf_dir: str):
    """Windowed dedup (debounce): per (user, event_type), keep a row
    only when the last KEPT row is >= 5 min older — the cascade
    semantics event pipelines want (a burst collapses to one row per
    window). Oracle is a recursive CTE; the kernel jumps between kept
    rows with searchsorted."""
    from apache_datasketches_go_ray.stages.windows import debounce

    return debounce(_read(sf_dir, "events",
                          ["user_id", "event_type", "ts", "event_id"]),
                    ["user_id", "event_type"],
                    min_gap_seconds=300, num_partitions=8)


def _q_stratified_sample_docs(sf_dir: str):
    """Stratified deterministic sample: 3 docs per language, ordered by
    Knuth hash of doc_id (same substrate as train_eval_split, so the
    sample is reproducible across runs/partitionings and
    SQL-expressible). Per-block ≤3-per-lang partial (combiner) before
    the keyed shuffle; langs are dictionary-coded block-locally for the
    segment kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def project(b):
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": b.column("lang"),
            "doc_id": pa.array(ids, type=pa.int64()),
            "h": pa.array((ids * 2654435761) % 4294967296,
                          type=pa.int64()),
        })

    def keep3(b):
        if len(b) == 0:
            return b
        codes = pc.dictionary_encode(
            b.column("lang").combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        h = b.column("h").to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, codes))
        sk = codes[order]
        first = np.empty(len(sk), dtype=bool)
        first[0] = True
        np.not_equal(sk[1:], sk[:-1], out=first[1:])
        idx = np.arange(len(sk), dtype=np.int64)
        seg_start = idx[np.flatnonzero(first)][np.cumsum(first) - 1]
        keep = (idx - seg_start) < 3
        return b.take(pa.array(order[keep], type=pa.int64()))

    return (_read(sf_dir, "documents", ["lang", "doc_id"])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(keep3, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["lang"])
            .map_batches(keep3, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_user_customer_full_outer(sf_dir: str):
    """Distributed FULL OUTER join (co-partition path): per-user event
    counts against the customer table — unmatched users AND unmatched
    customers both survive, with sentinel fills so the output is
    null-free and exactly SQL-comparable."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    def count_partial(b):
        g = b.select(["user_id"]).group_by("user_id").aggregate(
            [([], "count_all")])
        return pa.table({
            "user_id": g.column("user_id").cast(pa.int64()),
            "n_events": g.column("count_all").cast(pa.int64()),
        })

    def count_fold(b):
        g = b.group_by("user_id").aggregate([("n_events", "sum")])
        return pa.table({
            "user_id": g.column("user_id"),
            "n_events": g.column("n_events_sum").cast(pa.int64()),
        })

    counts = (_read(sf_dir, "events", ["user_id"])
              .map_batches(count_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(4, keys=["user_id"])
              .map_batches(count_fold, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    joined = hash_join(counts, cust, ("user_id", "c_custkey"),
                       join_type="full outer", broadcast_threshold=0,
                       num_partitions=8)

    def finish(b):
        return pa.table({
            "ukey": b.column("user_id"),
            "n_events": pc.coalesce(b.column("n_events"),
                                    pa.scalar(0, type=pa.int64())),
            "acctbal": pc.coalesce(b.column("c_acctbal"),
                                   pa.scalar(-1.0, type=pa.float64())),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def _q_events_weekly(sf_dir: str):
    """Weekly rollup: ISO-Monday week truncation (pc.floor_temporal ==
    date_trunc('week')), exact cents — temporal binning beyond the
    hourly/daily queries."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        wk = pc.strftime(
            pc.floor_temporal(b.column("ts"), unit="week",
                              week_starts_monday=True),
            format="%Y-%m-%d")
        t = pa.table({
            "week": wk,
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by("week").aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "week": g.column("week"),
            "n": g.column("cents_count").cast(pa.int64()),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("week").aggregate(
            [("n", "sum"), ("sum_cents", "sum")])
        return pa.table({
            "week": g.column("week"),
            "n": g.column("n_sum").cast(pa.int64()),
            "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(2, keys=["week"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_consecutive_edit_distance(sf_dir: str):
    """Exact Levenshtein (UTF-8 byte costs, 32-codepoint prefixes)
    between each doc and the next — fuzzy near-exact-dup signal; pair-
    key shuffle + one vectorized DP per block."""
    from apache_datasketches_go_ray.stages.dedup_extras import (
        consecutive_edit_distance,
    )

    return consecutive_edit_distance(
        _read(sf_dir, "documents", ["doc_id", "text"]), num_partitions=8)


def _q_exact_dedup_normalized(sf_dir: str):
    """Exact dedup AFTER canonical normalization — the compose-then-
    dedup shape real cleaning pipelines run (catches case/punctuation
    variants plain text equality misses)."""
    from apache_datasketches_go_ray.stages.dedup_extras import exact_dedup
    from apache_datasketches_go_ray.stages.textops import (
        normalize_text_batch,
    )

    norm = (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(normalize_text_batch, batch_format="pyarrow",
                         zero_copy_batch=True))
    return exact_dedup(norm, id_col="doc_id", text_col="norm_text",
                       num_partitions=8)


def _q_source_langs(sf_dir: str):
    """Sorted-distinct string_agg per group: the language list of each
    source — per-block (source, lang) pre-distinct combiner, keyed
    shuffle, then sort + native binary_join per segment."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def pre(b):
        return b.select(["source", "lang"]) \
            .group_by(["source", "lang"]).aggregate([])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "n_langs": pa.array([], type=pa.int64()),
                "langs": pa.array([], type=pa.string()),
            })
        d = b.group_by(["source", "lang"]).aggregate([])
        idx = pc.sort_indices(d, sort_keys=[("source", "ascending"),
                                            ("lang", "ascending")])
        d = d.take(idx)
        src = d.column("source").to_numpy(zero_copy_only=False)
        first = np.empty(len(src), dtype=bool)
        first[0] = True
        np.not_equal(src[1:], src[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        offsets = np.append(starts, len(src)).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), d.column("lang").combine_chunks())
        return pa.table({
            "source": pa.array(src[starts]),
            "n_langs": pa.array(np.diff(offsets), type=pa.int64()),
            "langs": pc.binary_join(lists, ","),
        })

    return (_read(sf_dir, "documents", ["source", "lang"])
            .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(4, keys=["source"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_user_first_last_event(sf_dir: str):
    """first_value/last_value window endpoints: each user's first and
    last event type by (ts, event_id) — one keyed shuffle, segment
    endpoints off the sorted block."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "first_type": pa.array([], type=pa.string()),
                "last_type": pa.array([], type=pa.string()),
                "n_events": pa.array([], type=pa.int64()),
            })
        u = as_array(b.column("user_id")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = as_array(b.column("ts")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ids = as_array(b.column("event_id")).to_numpy(zero_copy_only=False)
        et = as_array(b.column("event_type"))
        order = np.lexsort((ids, ts, u))
        su = u[order]
        first = np.empty(len(su), dtype=bool)
        first[0] = True
        np.not_equal(su[1:], su[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(su)) - 1
        take = pa.array(order, type=pa.int64())
        ets = et.take(take)
        return pa.table({
            "user_id": pa.array(su[starts], type=pa.int64()),
            "first_type": ets.take(pa.array(starts, type=pa.int64())),
            "last_type": ets.take(pa.array(ends, type=pa.int64())),
            "n_events": pa.array(ends - starts + 1, type=pa.int64()),
        })

    return (_read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .repartition(8, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_revenue_by_price_quartile(sf_dir: str):
    """Composition: exact global ntile(4) quartile of order price, then
    grouped revenue per quartile — distributed ranking feeding a
    partial+fold aggregate (the 'bucketize then aggregate' analytics
    shape)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import global_ntile

    q = global_ntile(_read(sf_dir, "orders",
                           ["o_totalprice", "o_orderkey"]),
                     "o_totalprice", "o_orderkey", 4, num_partitions=16)

    def partial(b):
        t = pa.table({
            "bucket": b.column("bucket"),
            "cents": pc.round(pc.multiply(b.column("o_totalprice"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by("bucket").aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "bucket": g.column("bucket"),
            "n_orders": g.column("cents_count").cast(pa.int64()),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("bucket").aggregate(
            [("n_orders", "sum"), ("sum_cents", "sum")])
        return pa.table({
            "bucket": g.column("bucket"),
            "n_orders": g.column("n_orders_sum").cast(pa.int64()),
            "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
        })

    return (q.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(2, keys=["bucket"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_order_rank_gaps(sf_dir: str):
    """rank() with gaps (ties share a rank, next rank skips) per
    customer by price desc — completes the ranking-window family
    (row_number ✓ running, dense_rank ✓, cume_dist ✓). Kernel: position
    of the first peer in the segment via tie-run starts."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "o_totalprice": pa.array([], type=pa.float64()),
                "rnk": pa.array([], type=pa.int64()),
            })
        k = as_array(b.column("o_custkey")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = as_array(b.column("o_totalprice")) \
            .to_numpy(zero_copy_only=False)
        ids = as_array(b.column("o_orderkey")).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v, k))
        sk, sv = k[order], v[order]
        first = np.empty(len(sk), dtype=bool)
        first[0] = True
        np.not_equal(sk[1:], sk[:-1], out=first[1:])
        chg = first.copy()
        chg[1:] |= sv[1:] != sv[:-1]
        idx = np.arange(len(sk), dtype=np.int64)
        run_start = idx[np.flatnonzero(chg)][np.cumsum(chg) - 1]
        seg_start = idx[np.flatnonzero(first)][np.cumsum(first) - 1]
        rnk = run_start - seg_start + 1
        return pa.table({
            "o_orderkey": pa.array(ids[order], type=pa.int64()),
            "o_custkey": pa.array(sk, type=pa.int64()),
            "o_totalprice": pa.array(sv, type=pa.float64()),
            "rnk": pa.array(rnk, type=pa.int64()),
        })

    return (_read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
            .repartition(8, keys=["o_custkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_order_percent_rank(sf_dir: str):
    """percent_rank() per customer by price desc: (rank-1)/(n-1) with
    gap-rank semantics (ties share), 0.0 for single-row groups — the
    same double division SQL performs, so values are bit-identical."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "pct_rank": pa.array([], type=pa.float64()),
            })
        k = as_array(b.column("o_custkey")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = as_array(b.column("o_totalprice")) \
            .to_numpy(zero_copy_only=False)
        ids = as_array(b.column("o_orderkey")).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v, k))
        sk, sv = k[order], v[order]
        first = np.empty(len(sk), dtype=bool)
        first[0] = True
        np.not_equal(sk[1:], sk[:-1], out=first[1:])
        chg = first.copy()
        chg[1:] |= sv[1:] != sv[:-1]
        idx = np.arange(len(sk), dtype=np.int64)
        run_start = idx[np.flatnonzero(chg)][np.cumsum(chg) - 1]
        seg_start = idx[np.flatnonzero(first)][np.cumsum(first) - 1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(sk)))
        n_in_group = np.repeat(sizes, sizes)
        rnk = run_start - seg_start + 1
        pr = np.where(n_in_group > 1,
                      (rnk - 1).astype(np.float64)
                      / np.maximum(n_in_group - 1, 1), 0.0)
        return pa.table({
            "o_orderkey": pa.array(ids[order], type=pa.int64()),
            "pct_rank": pa.array(pr, type=pa.float64()),
        })

    return (_read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_totalprice"])
            .repartition(8, keys=["o_custkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_order_ntile(sf_dir: str):
    """ntile(4) per customer (price desc, orderkey tie-break): ANSI
    bucket sizing — the first (n mod k) buckets take ceil(n/k) rows —
    computed from each row's 0-based position within its group."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    K = 4

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
            })
        k = as_array(b.column("o_custkey")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = as_array(b.column("o_totalprice")) \
            .to_numpy(zero_copy_only=False)
        ids = as_array(b.column("o_orderkey")).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v, k))
        sk = k[order]
        first = np.empty(len(sk), dtype=bool)
        first[0] = True
        np.not_equal(sk[1:], sk[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(sk)))
        n = np.repeat(sizes, sizes)
        pos = np.arange(len(sk), dtype=np.int64) \
            - np.repeat(starts, sizes)
        q, r = n // K, n % K
        big = (q + 1) * r  # rows covered by the ceil-sized buckets
        bucket = np.where(
            pos < big,
            pos // np.maximum(q + 1, 1) + 1,
            r + (pos - big) // np.maximum(q, 1) + 1,
        )
        return pa.table({
            "o_orderkey": pa.array(ids[order], type=pa.int64()),
            "bucket": pa.array(bucket.astype(np.int64), type=pa.int64()),
        })

    return (_read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_totalprice"])
            .repartition(8, keys=["o_custkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_daily_top_event(sf_dir: str):
    """Composite-key window: the single largest event per (user, day)
    (cents desc, event_id tie-break) — top-1 under a two-column
    partition, via a packed int64 composite key reusing the ≤n-per-key
    combiner discipline."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import top_n_per_group

    def prep(b):
        day = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        epoch_day = pc.divide(
            pc.floor_temporal(b.column("ts"), unit="day")
            .cast(pa.int64()), 86_400_000_000)
        ck = pc.add(pc.multiply(b.column("user_id").cast(pa.int64()),
                                100_000), epoch_day)
        return pa.table({
            "ckey": ck,
            "user_id": b.column("user_id").cast(pa.int64()),
            "day": day,
            "event_id": b.column("event_id").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })

    raw = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    nrows = raw.count()
    ds = (raw
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))

    def unpack(b):
        ck = b.column("ckey").to_numpy(zero_copy_only=False)
        day_ts = pa.array((ck % 100_000) * 86_400_000_000,
                          type=pa.int64()).cast(pa.timestamp("us"))
        return pa.table({
            "user_id": pa.array(ck // 100_000, type=pa.int64()),
            "day": pc.strftime(day_ts, format="%Y-%m-%d"),
            "event_id": b.column("event_id"),
            "cents": b.column("cents"),
        })

    return top_n_per_group(ds, "ckey", "cents", "event_id", 1,
                           num_partitions=8, nrows=nrows) \
        .map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)


def _q_lang_nchars_stddev(sf_dir: str):
    """Grouped population stddev via exact integer moments: per-block
    partial (n, Σx, Σx²) int64 sums -> keyed fold -> ONE double
    expression identical in shape to the oracle SQL, so the float
    result is bit-identical (no Welford-vs-textbook drift)."""
    import pyarrow as pa

    def partial(b):
        x = b.column("n_chars").cast(pa.int64())
        t = pa.table({
            "lang": b.column("lang"),
            "n": pa.array(np.ones(len(b), dtype=np.int64)),
            "sx": x,
            "sxx": pa.array(
                x.to_numpy(zero_copy_only=False) ** 2, type=pa.int64()),
        })
        g = t.group_by("lang").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
        return pa.table({
            "lang": g.column("lang"),
            "n": g.column("n_sum").cast(pa.int64()),
            "sx": g.column("sx_sum").cast(pa.int64()),
            "sxx": g.column("sxx_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "lang": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "sd_pop": pa.array([], type=pa.float64()),
            })
        g = b.group_by("lang").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
        n = g.column("n_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sx = g.column("sx_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sxx = g.column("sxx_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # EXACT same double expression as the SQL oracle
        sd = np.sqrt(sxx / n - (sx / n) * (sx / n))
        return pa.table({
            "lang": g.column("lang"),
            "n_docs": g.column("n_sum").cast(pa.int64()),
            "sd_pop": pa.array(sd, type=pa.float64()),
        })

    return (_read(sf_dir, "documents", ["lang", "n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(2, keys=["lang"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_transcript_reply_latency(sf_dir: str):
    """Per-conversation assistant reply latency: over (conv, turn_idx)-
    ordered turns, every user→assistant adjacency contributes
    (ts[i+1]-ts[i]); returns n_replies / mean / max seconds per conv
    (0 / 0.0 when the conv has no such adjacency). One conv-key shuffle,
    masked adjacent-diff kernel — the transcript analogue of lag()."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "ts", "role"])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_replies": pa.array([], type=pa.int64()),
                "mean_reply_s": pa.array([], type=pa.float64()),
                "max_reply_s": pa.array([], type=pa.float64()),
            })
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        ts = as_array(b.column("ts")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        role = as_array(b.column("role")).to_numpy(zero_copy_only=False)
        _, codes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, codes))
        c, t, r = codes[order], ts[order], role[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        adj = (~first[1:]) & (r[:-1] == "user") & (r[1:] == "assistant")
        lat_us = np.where(adj, t[1:] - t[:-1], 0)  # int µs: exact sums
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c))
        csum = np.concatenate([[0], np.cumsum(lat_us)])
        ccnt = np.concatenate([[0], np.cumsum(adj)])
        # per-conv segment of the adjacency arrays is [start, end-1)
        n_rep = ccnt[ends - 1] - ccnt[starts]
        s_rep = csum[ends - 1] - csum[starts]
        # max per segment over masked latencies
        lat_masked = np.where(adj, lat_us, -1)
        mx = np.maximum.reduceat(
            np.append(lat_masked, -1), starts)
        mx = np.where(n_rep > 0, mx, 0)
        # (int_sum / n) / 1e6 + half-up round3: same IEEE op order as
        # the SQL oracle -> bit-identical doubles
        mean_s = np.where(
            n_rep > 0,
            s_rep.astype(np.float64) / np.maximum(n_rep, 1) / 1e6, 0.0)
        return pa.table({
            "conv_id": pa.array(conv[order][starts]),
            "n_replies": pa.array(n_rep, type=pa.int64()),
            "mean_reply_s": pa.array(
                np.floor(mean_s * 1000.0 + 0.5) / 1000.0,
                type=pa.float64()),
            "max_reply_s": pa.array(
                np.floor(mx.astype(np.float64) / 1e6 * 1000.0 + 0.5)
                / 1000.0, type=pa.float64()),
        })

    return (ds.select_columns(["conv_id", "turn_idx", "ts", "role"])
            .repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_fuzzy_boilerplate_turns(sf_dir: str):
    """Near-duplicate boilerplate turns ACROSS conversations: turns
    sharing an identical 64-bit SimHash (catching small wording
    variants exact text-hash grouping misses) ranked by distinct-conv
    spread. SimHash shuffle + per-group distinct-conv fold, top-20."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.relational import top_k
    from apache_datasketches_go_ray.stages.textops import simhash_batch

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "text"])

    def prep(b):
        t = pa.table({
            "conv_id": b.column("conv_id"),
            "text": b.column("text").cast(pa.string()),
        })
        t = simhash_batch(t)
        # pre-distinct (simhash, conv) per block — the combiner
        return t.select(["simhash", "conv_id"]) \
            .group_by(["simhash", "conv_id"]).aggregate([])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "simhash": pa.array([], type=pa.uint64()),
                "n_convs": pa.array([], type=pa.int64()),
            })
        d = b.group_by(["simhash", "conv_id"]).aggregate([])
        g = d.group_by("simhash").aggregate([("conv_id", "count")])
        g = g.filter(pc.greater_equal(g.column("conv_id_count"), 2))
        return pa.table({
            "simhash": g.column("simhash"),
            "n_convs": g.column("conv_id_count").cast(pa.int64()),
        })

    folded = (ds.select_columns(["conv_id", "text"])
              .map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(16, keys=["simhash"])
              .map_batches(fold, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True))
    return top_k(folded, [("n_convs", "descending"),
                          ("simhash", "ascending")], 20)


def _q_orders_above_customer_avg(sf_dir: str):
    """Correlated-subquery shape: orders strictly above their customer's
    average price. The comparison stays in integers (cents * n_group >
    sum_cents) so it is exact — no float-average drift; one keyed
    shuffle, segment sums broadcast back to rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def project(b):
        return pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("o_totalprice"), 100))
                .cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
        k = as_array(b.column("o_custkey")).to_numpy(zero_copy_only=False)
        ids = as_array(b.column("o_orderkey")).to_numpy(zero_copy_only=False)
        cents = as_array(b.column("cents")).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        sk, sc = k[order], cents[order]
        first = np.empty(len(sk), dtype=bool)
        first[0] = True
        np.not_equal(sk[1:], sk[:-1], out=first[1:])
        seg_id = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        totals = np.add.reduceat(sc, starts)
        lens = np.diff(np.append(starts, len(sk)))
        keep = sc * lens[seg_id] > totals[seg_id]
        return pa.table({
            "o_orderkey": pa.array(ids[order][keep], type=pa.int64()),
            "o_custkey": pa.array(sk[keep], type=pa.int64()),
            "cents": pa.array(sc[keep], type=pa.int64()),
        })

    return (_read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
            .map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["o_custkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_event_pivot_melt(sf_dir: str):
    """UNPIVOT/melt: the wide per-user pivot folded back to long
    (user_id, event_type, n) rows with zero cells dropped — the
    columns→rows reshape, proving the pivot round-trips to the plain
    grouped counts. Stateless flat expansion over the pivot output."""
    import pyarrow as pa

    types = ["click", "error", "purchase", "signup", "view"]
    wide = _q_event_type_pivot(sf_dir)

    def melt(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        outs_u, outs_t, outs_n = [], [], []
        for t in types:
            n = b.column(f"n_{t}").to_numpy(zero_copy_only=False)
            keep = n > 0
            outs_u.append(u[keep])
            outs_t.append(np.full(int(keep.sum()), t, dtype=object))
            outs_n.append(n[keep])
        return pa.table({
            "user_id": pa.array(np.concatenate(outs_u), type=pa.int64()),
            "event_type": pa.array(np.concatenate(outs_t),
                                   type=pa.string()),
            "n": pa.array(np.concatenate(outs_n), type=pa.int64()),
        })

    return wide.map_batches(melt, batch_format="pyarrow",
                            zero_copy_batch=True)


def _q_latest_event_per_user_type(sf_dir: str):
    """CDC latest-record-wins dedup: one row per (user, event_type),
    keeping the most recent event (ts desc, event_id desc tie-break) —
    the upsert/compaction shape. Packed composite key through the
    ≤1-per-key combiner; value payload travels as packed (ts, id)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import top_n_per_group

    types = ["click", "error", "purchase", "signup", "view"]
    tcode = {t: i for i, t in enumerate(types)}

    def prep(b):
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        codes = np.array([tcode.get(t, len(types)) for t in et],
                         dtype=np.int64)
        ck = b.column("user_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) * 8 + codes
        # order key: latest ts wins, then larger event_id (desc both)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "ckey": pa.array(ck, type=pa.int64()),
            "ts_us": pa.array(ts, type=pa.int64()),
            "event_id": b.column("event_id").cast(pa.int64()),
        })

    raw = _read(sf_dir, "events",
                ["user_id", "event_type", "ts", "event_id"])
    nrows = raw.count()
    ds = (raw
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))

    def unpack(b):
        ck = b.column("ckey").to_numpy(zero_copy_only=False)
        code = ck % 8
        return pa.table({
            "user_id": pa.array(ck // 8, type=pa.int64()),
            "event_type": pa.array(
                np.array(types, dtype=object)[code], type=pa.string()),
            "event_id": b.column("event_id"),
            "ts": b.column("ts_us").cast(pa.timestamp("us")),
        })

    # top-1 by (ts desc, event_id desc): top_n_per_group breaks ties by
    # id ASC, so ship the negated id as the tiebreak column and flip it
    # back afterwards
    def negid(b):
        return pa.table({
            "ckey": b.column("ckey"),
            "ts_us": b.column("ts_us"),
            "event_id": pc.negate(b.column("event_id")),
        })

    picked = top_n_per_group(
        ds.map_batches(negid, batch_format="pyarrow",
                       zero_copy_batch=True),
        "ckey", "ts_us", "event_id", 1, num_partitions=8, nrows=nrows)

    def fix(b):
        return pa.table({
            "ckey": b.column("ckey"),
            "ts_us": b.column("ts_us"),
            "event_id": pc.negate(b.column("event_id")),
        })

    return picked.map_batches(fix, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)


def _q_events_dow_hour(sf_dir: str):
    """Calendar heatmap: event counts + exact cents by (ISO day-of-week,
    hour-of-day) — temporal field extraction (pc.day_of_week pinned to
    DuckDB isodow semantics) through the in-block combiner."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        ts = b.column("ts")
        t = pa.table({
            "dow": pc.day_of_week(ts, count_from_zero=False,
                                  week_start=1).cast(pa.int64()),
            "hour": pc.hour(ts).cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by(["dow", "hour"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "dow": g.column("dow"),
            "hour": g.column("hour"),
            "n": g.column("cents_count").cast(pa.int64()),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by(["dow", "hour"]).aggregate(
            [("n", "sum"), ("sum_cents", "sum")])
        return pa.table({
            "dow": g.column("dow"),
            "hour": g.column("hour"),
            "n": g.column("n_sum").cast(pa.int64()),
            "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(2, keys=["dow", "hour"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_join_size_estimate(sf_dir: str):
    """Planner statistic: HLL-estimated cardinality of orders⋈customer
    without running the join (one KB-sized streaming pass per side) —
    the reference's mergeable-sketch substrate applied to query
    planning. Rows-only: returns the one-row statistics frame."""
    import pandas as pd
    from apache_datasketches_go_ray.stages.relational import (
        estimate_join_size,
    )

    res = estimate_join_size(_read(sf_dir, "orders", ["o_custkey"]),
                             _read(sf_dir, "customer", ["c_custkey"]),
                             ("o_custkey", "c_custkey"))
    return pd.DataFrame([res])


def _q_events_grouping_sets(sf_dir: str):
    """General GROUPING SETS ((event_type), (day)): two independent
    groupings of one pass over the data, unioned with 'ALL' markers —
    the non-hierarchical cousin of ROLLUP. One combiner pass computes
    the fine (type, day) grid; both sets fold from it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        day = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        t = pa.table({
            "event_type": b.column("event_type"),
            "day": day,
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by(["event_type", "day"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "day": g.column("day"),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
            "n": g.column("cents_count").cast(pa.int64()),
        })

    def expand(b):
        if len(b) == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "day": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "sum_cents": pa.array([], type=pa.int64()),
            })
        by_type = b.group_by("event_type").aggregate(
            [("sum_cents", "sum"), ("n", "sum")])
        by_day = b.group_by("day").aggregate(
            [("sum_cents", "sum"), ("n", "sum")])
        return pa.concat_tables([
            pa.table({
                "event_type": by_type.column("event_type"),
                "day": pa.array(["ALL"] * len(by_type),
                                type=pa.string()),
                "n": by_type.column("n_sum").cast(pa.int64()),
                "sum_cents": by_type.column("sum_cents_sum")
                .cast(pa.int64()),
            }),
            pa.table({
                "event_type": pa.array(["ALL"] * len(by_day),
                                       type=pa.string()),
                "day": by_day.column("day"),
                "n": by_day.column("n_sum").cast(pa.int64()),
                "sum_cents": by_day.column("sum_cents_sum")
                .cast(pa.int64()),
            }),
        ])

    return (_read(sf_dir, "events", ["event_type", "ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(expand, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_events_hopping_window(sf_dir: str):
    """Hopping (sliding) event-time windows: 1-hour windows advancing
    every 15 minutes — each event lands in 4 overlapping windows. The
    streaming-style windowed aggregate as a batch op: 4× flat expansion
    in the combiner (pure int64 bucket math), then the usual keyed
    fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    HOP_US = 15 * 60 * 1_000_000
    N_HOPS = 4  # window size 1h / hop 15min

    def partial(b):
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.round(pc.multiply(b.column("value"), 100)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // HOP_US) * HOP_US
        starts = np.concatenate(
            [base - i * HOP_US for i in range(N_HOPS)])
        t = pa.table({
            "ws_us": pa.array(starts, type=pa.int64()),
            "cents": pa.array(np.tile(cents, N_HOPS), type=pa.int64()),
        })
        g = t.group_by("ws_us").aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "ws_us": g.column("ws_us"),
            "n": g.column("cents_count").cast(pa.int64()),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "window_start": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "sum_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by("ws_us").aggregate(
            [("n", "sum"), ("sum_cents", "sum")])
        ws = pc.strftime(g.column("ws_us").cast(pa.timestamp("us")),
                         format="%Y-%m-%d %H:%M")
        return pa.table({
            "window_start": ws,
            "n": g.column("n_sum").cast(pa.int64()),
            "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["ws_us"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_dup_rate_by_source(sf_dir: str):
    """Dedup analytics: per source, how many docs are exact duplicates
    of some other doc (globally). Text-hash shuffle co-locates each
    text's copies, the flag folds back per (source) — the measurement
    every dedup run reports."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def add_hash(b):
        texts = as_array(b.column("text"))
        h1, _ = hash_strings(texts)
        return pa.table({
            "source": b.column("source"),
            "text": texts,
            "text_hash": pa.array(h1, type=pa.uint64()),
        })

    def flag(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "n_dup_docs": pa.array([], type=pa.int64()),
            })
        counts = b.group_by("text").aggregate([("text", "count")])
        joined = b.select(["source", "text"]).join(
            counts, keys=["text"], join_type="inner")
        dup = pc.greater(joined.column("text_count"), 1).cast(pa.int64())
        t = pa.table({"source": joined.column("source"), "dup": dup})
        g = t.group_by("source").aggregate(
            [("dup", "sum"), ("dup", "count")])
        return pa.table({
            "source": g.column("source"),
            "n_docs": g.column("dup_count").cast(pa.int64()),
            "n_dup_docs": g.column("dup_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_dup_docs", "sum")])
        return pa.table({
            "source": g.column("source"),
            "n_docs": g.column("n_docs_sum").cast(pa.int64()),
            "n_dup_docs": g.column("n_dup_docs_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "documents", ["source", "text"])
            .map_batches(add_hash, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["text_hash"])
            .map_batches(flag, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(2, keys=["source"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_dup_rate_weekly(sf_dir: str):
    """Dedup-pressure trend: per ISO week of each conversation's first
    turn, how many conversations' assembled texts are exact duplicates
    of some other conversation (globally) — the trend an ongoing-ingest
    dedup run watches (rising dup share = the crawl is re-fetching).
    conv_id-keyed assembly carrying min(ts), then a text-hash shuffle
    flags global copies, folding back per week."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.assemble import TURN_SEP

    _CONV_SCHEMA = pa.schema([("week", pa.string()),
                              ("text", pa.string()),
                              ("text_hash", pa.uint64())])

    def conv_rows(b):
        if len(b) == 0:
            return _CONV_SCHEMA.empty_table()
        conv = as_array(b.column("conv_id"))
        dict_arr = as_array(pc.dictionary_encode(conv))
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, codes))
        codes_s = codes[order]
        texts = as_array(b.column("text")).take(pa.array(order))
        n_convs = len(dict_arr.dictionary)
        counts = np.bincount(codes_s, minlength=n_convs)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        turns = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            texts.cast(pa.string()) if texts.type != pa.string() else texts)
        joined = pc.binary_join(turns, TURN_SEP)
        ts = as_array(b.column("ts")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        first_ts = np.full(n_convs, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_ts, codes, ts)
        wk = pc.strftime(
            pc.floor_temporal(
                pa.array(first_ts, type=pa.int64()).cast(pa.timestamp("us")),
                unit="week", week_starts_monday=True),
            format="%Y-%m-%d")
        h1, _ = hash_strings(joined)
        return pa.table({"week": wk, "text": joined,
                         "text_hash": pa.array(h1, type=pa.uint64())})

    def flag(b):
        if len(b) == 0:
            return pa.table({
                "week": pa.array([], type=pa.string()),
                "n_convs": pa.array([], type=pa.int64()),
                "n_dup_convs": pa.array([], type=pa.int64()),
            })
        counts = b.group_by("text").aggregate([("text", "count")])
        joined = b.select(["week", "text"]).join(
            counts, keys=["text"], join_type="inner")
        dup = pc.greater(joined.column("text_count"), 1).cast(pa.int64())
        t = pa.table({"week": joined.column("week"), "dup": dup})
        g = t.group_by("week").aggregate([("dup", "sum"), ("dup", "count")])
        return pa.table({
            "week": g.column("week"),
            "n_convs": g.column("dup_count").cast(pa.int64()),
            "n_dup_convs": g.column("dup_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("week").aggregate(
            [("n_convs", "sum"), ("n_dup_convs", "sum")])
        return pa.table({
            "week": g.column("week"),
            "n_convs": g.column("n_convs_sum").cast(pa.int64()),
            "n_dup_convs": g.column("n_dup_convs_sum").cast(pa.int64()),
        })

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text", "ts"])
    return (ds.repartition(8, keys=["conv_id"])
            .map_batches(conv_rows, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(8, keys=["text_hash"])
            .map_batches(flag, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(2, keys=["week"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_conv_prefix_dups(sf_dir: str, k: int = 3):
    """Shared-prefix conversation families: conversations whose first
    ``k`` turns are textually identical — the shared system-prompt /
    template openings an agent-transcript dedup run collapses before
    near-dup LSH ever sees them. conv-keyed shuffle + in-block prefix
    assembly, then a prefix-hash shuffle folds families; only families
    with >= 2 members are emitted."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.assemble import TURN_SEP

    _PREFIX_SCHEMA = pa.schema([("conv_id", pa.string()),
                                ("prefix", pa.string()),
                                ("prefix_hash", pa.uint64())])

    def prefix_rows(b):
        b = b.filter(pc.less(b.column("turn_idx"), k))
        if len(b) == 0:
            return _PREFIX_SCHEMA.empty_table()
        conv = as_array(b.column("conv_id"))
        dict_arr = as_array(pc.dictionary_encode(conv))
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, codes))
        texts = as_array(b.column("text")).take(
            pa.array(order, type=pa.int64()))
        n_convs = len(dict_arr.dictionary)
        counts = np.bincount(codes[order], minlength=n_convs)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        turns = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            texts.cast(pa.string()) if texts.type != pa.string() else texts)
        joined = pc.binary_join(turns, TURN_SEP)
        h1, _ = hash_strings(joined)
        return pa.table({"conv_id": dict_arr.dictionary,
                         "prefix": joined,
                         "prefix_hash": pa.array(h1, type=pa.uint64())})

    _OUT_SCHEMA = pa.schema([("keeper_conv", pa.string()),
                             ("n_convs", pa.int64()),
                             ("prefix_chars", pa.int64())])

    def fold(b):
        if len(b) == 0:
            return _OUT_SCHEMA.empty_table()
        g = b.group_by("prefix").aggregate(
            [("conv_id", "min"), ("conv_id", "count")])
        g = g.filter(pc.greater_equal(g.column("conv_id_count"), 2))
        return pa.table({
            "keeper_conv": g.column("conv_id_min"),
            "n_convs": g.column("conv_id_count").cast(pa.int64()),
            "prefix_chars": pc.utf8_length(g.column("prefix"))
            .cast(pa.int64()),
        })

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    return (ds.repartition(8, keys=["conv_id"])
            .map_batches(prefix_rows, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(8, keys=["prefix_hash"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_sft_pair_dups(sf_dir: str):
    """Duplicate SFT training pairs: identical (user prompt ->
    assistant response) adjacent-turn pairs occurring more than once
    across the corpus — exactly the repeated examples an SFT-prep run
    must drop to avoid training-set over-weighting. conv-keyed pair
    extraction (same adjacency mask as sft_pairs), then a pair-hash
    shuffle counts copies."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    _PAIR_SCHEMA = pa.schema([("prompt", pa.large_string()),
                              ("response", pa.large_string()),
                              ("pair_hash", pa.uint64())])

    def pairs(b):
        if len(b) == 0:
            return _PAIR_SCHEMA.empty_table()
        conv = as_array(b.column("conv_id"))
        dict_arr = as_array(pc.dictionary_encode(conv))
        ccodes = dict_arr.indices.to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, ccodes))
        role = as_array(b.column("role")).take(
            pa.array(order, type=pa.int64()))
        is_user = pc.equal(role, "user").to_numpy(zero_copy_only=False)
        is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
        c = ccodes[order]
        same_conv = np.concatenate([c[1:] == c[:-1], [False]])
        nxt_asst = np.concatenate([is_asst[1:], [False]])
        take = np.flatnonzero(is_user & same_conv & nxt_asst)
        text = as_array(b.column("text")).cast(pa.large_string())
        o = np.asarray(order)
        prompt = text.take(pa.array(o[take], type=pa.int64()))
        response = text.take(pa.array(o[take + 1], type=pa.int64()))
        # hash the pair as one string with an unlikely separator
        h1, _ = hash_strings(pc.binary_join_element_wise(
            prompt.cast(pa.string()), response.cast(pa.string()),
            "\x1f"))
        return pa.table({"prompt": prompt, "response": response,
                         "pair_hash": pa.array(h1, type=pa.uint64())})

    _OUT_SCHEMA = pa.schema([("prompt", pa.large_string()),
                             ("response", pa.large_string()),
                             ("n_copies", pa.int64())])

    def fold(b):
        if len(b) == 0:
            return _OUT_SCHEMA.empty_table()
        g = b.group_by(["prompt", "response"]).aggregate(
            [("pair_hash", "count")])
        g = g.filter(pc.greater_equal(g.column("pair_hash_count"), 2))
        return pa.table({
            "prompt": g.column("prompt"),
            "response": g.column("response"),
            "n_copies": g.column("pair_hash_count").cast(pa.int64()),
        })

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role",
                                        "text"])
    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(pairs, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(8, keys=["pair_hash"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_conv_shared_turns(sf_dir: str, lo: int = 2, hi: int = 20):
    """Exact-collision blocking for conversation dedup: pairs of
    conversations sharing >= 2 identical turn texts — the cheap
    candidate generator that catches template-heavy near-dups before
    MinHash runs, with the standard hot-key cap (texts in more than
    ``hi`` convs are boilerplate, not dup evidence, and would blow the
    pair count quadratically). Per-block (conv, text) distinct, a
    text-hash shuffle emits in-block pairs, a pair-key shuffle sums."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def distinct_rows(b):
        d = b.group_by(["conv_id", "text"]).aggregate([])
        h1, _ = hash_strings(as_array(d.column("text")))
        return pa.table({"conv_id": d.column("conv_id"),
                         "text": d.column("text"),
                         "text_hash": pa.array(h1, type=pa.uint64())})

    _PAIR_SCHEMA = pa.schema([("conv_a", pa.string()),
                              ("conv_b", pa.string()),
                              ("n_shared", pa.int64())])

    def pairs(b):
        if len(b) == 0:
            return _PAIR_SCHEMA.empty_table()
        d = b.select(["conv_id", "text"]).group_by(
            ["conv_id", "text"]).aggregate([])
        counts = d.group_by("text").aggregate([("conv_id", "count")])
        keep = counts.filter(
            pc.and_(pc.greater_equal(counts.column("conv_id_count"), lo),
                    pc.less_equal(counts.column("conv_id_count"), hi)))
        d = d.join(keep.select(["text"]), keys=["text"],
                   join_type="left semi")
        other = pa.table({"conv_b": d.column("conv_id"),
                          "text": d.column("text")})
        j = d.join(other, keys=["text"], join_type="inner")
        j = j.filter(pc.less(j.column("conv_id"), j.column("conv_b")))
        g = pa.table({"conv_a": j.column("conv_id"),
                      "conv_b": j.column("conv_b")}).group_by(
            ["conv_a", "conv_b"]).aggregate([("conv_a", "count")])
        return pa.table({
            "conv_a": g.column("conv_a"),
            "conv_b": g.column("conv_b"),
            "n_shared": g.column("conv_a_count").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return _PAIR_SCHEMA.empty_table()
        g = b.group_by(["conv_a", "conv_b"]).aggregate(
            [("n_shared", "sum")])
        g = g.filter(pc.greater_equal(g.column("n_shared_sum"), 2))
        return pa.table({
            "conv_a": g.column("conv_a"),
            "conv_b": g.column("conv_b"),
            "n_shared": g.column("n_shared_sum").cast(pa.int64()),
        })

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "text"])
    return (ds.map_batches(distinct_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(8, keys=["text_hash"])
            .map_batches(pairs, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(4, keys=["conv_a"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_template_dups(sf_dir: str):
    """Template dedup over transcript turns: turns identical after
    lowercasing and masking digit runs ('order 12345' == 'ORDER 999')
    — the boilerplate/template family exact equality misses and LSH
    wastes candidates on. Masked-hash shuffle, per-family turn count +
    conversation spread; only families with >= 2 members."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def mask(b):
        texts = as_array(b.column("text"))
        m = pc.utf8_lower(pc.replace_substring_regex(
            texts, pattern="[0-9]+", replacement="0"))
        h1, _ = hash_strings(m)
        return pa.table({"conv_id": b.column("conv_id"),
                         "mtext": m,
                         "mhash": pa.array(h1, type=pa.uint64())})

    _OUT_SCHEMA = pa.schema([("keeper_conv", pa.string()),
                             ("n_turns", pa.int64()),
                             ("n_convs", pa.int64()),
                             ("mtext_chars", pa.int64())])

    def fold(b):
        if len(b) == 0:
            return _OUT_SCHEMA.empty_table()
        g = b.group_by("mtext").aggregate(
            [("conv_id", "min"), ("conv_id", "count"),
             ("conv_id", "count_distinct")])
        g = g.filter(pc.greater_equal(g.column("conv_id_count"), 2))
        return pa.table({
            "keeper_conv": g.column("conv_id_min"),
            "n_turns": g.column("conv_id_count").cast(pa.int64()),
            "n_convs": g.column("conv_id_count_distinct")
            .cast(pa.int64()),
            "mtext_chars": pc.utf8_length(g.column("mtext"))
            .cast(pa.int64()),
        })

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "text"])
    return (ds.map_batches(mask, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(8, keys=["mhash"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_trailing_active_users(sf_dir: str):
    """Trailing 7-day active users per day — the sliding *distinct*
    window (an id counts once per window it falls in, not once per
    day) that no single groupby expresses. Pre-distinct (day, user)
    pairs expand to the <= 7 target days each covers, then a keyed
    shuffle makes the expansion globally distinct; raw events never
    re-ship. Exact counts, value-exact vs the SQL window."""
    from apache_datasketches_go_ray.stages.windows import (
        trailing_distinct_by_day,
    )

    return trailing_distinct_by_day(
        _read(sf_dir, "events", ["ts", "user_id"]),
        ts_col="ts", id_col="user_id", days=7, num_partitions=16)


def _q_bigram_diversity_by_source(sf_dir: str):
    """Per-source bigram type-token ratio (distinct adjacent token
    pairs / total pairs) — the n-gram diversity score that flags
    templated or machine-generated feeds (low diversity at high
    volume). Distinct side rides the 2-level pre-distinct shuffle of
    relational.distinct_count_by; totals are one tiny grouped
    partial; a single x*1.0/y division keeps the DuckDB oracle
    value-exact."""
    from apache_datasketches_go_ray.stages.corpusops import (
        ngram_diversity_by,
    )

    return ngram_diversity_by(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        group_col="source")


def _q_nb_lang_token_probs(sf_dir: str):
    """Distributed Naive-Bayes classifier training over (lang → token)
    counts: the per-class Laplace-smoothed token likelihoods
    p(token|lang) = (c+1)/(total_lang+V) for the top-10 tokens per
    language — classifier *training as count aggregation*, the
    mergeable-partials discipline of the reference's sketches
    (hll/union.go:151-158) applied to supervised model fitting. All
    intermediates are exact int64 counts; the single final division
    makes the oracle value-exact."""
    from apache_datasketches_go_ray.stages.corpusops import (
        nb_token_likelihoods,
    )

    return nb_token_likelihoods(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        class_col="lang", top_k=10)


def _q_bpe_merges(sf_dir: str):
    """BPE tokenizer training: learn the first 40 byte-pair merges of
    the corpus (classic word-frequency BPE — Sennrich et al. 2016).
    The distributed part is the exact word-frequency fold (the same
    shuffle discipline as top_tokens); the merge loop then runs on the
    bounded top-V word-frequency table, exactly how sentencepiece-style
    trainers operate. Deterministic tie-break (count desc, pair
    lexicographic asc); parity vs a single-process reference trainer is
    pinned by pytest (iterative — no SQL equivalent, rows-only here)."""
    from apache_datasketches_go_ray.stages.corpusops import (
        bpe_learn_merges,
    )

    return bpe_learn_merges(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        n_merges=40, vocab_size=20000)


def _q_logreg_quality(sf_dir: str):
    """Distributed quality-classifier training: fit a binary logistic
    regression (keep/drop head of every learned quality filter) by
    full-batch gradient descent — each iteration is one streaming pass
    emitting (d+1)-float gradient partials per block, the model vector
    broadcast back. Iterative optimization, no SQL equivalent
    (rows-only); parity vs a single-process trainer and same-partition
    bit-determinism are pinned by pytest."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.textops import (
        token_count_batch,
    )
    from apache_datasketches_go_ray.stages.train import logreg_train

    def feats(b):
        out = token_count_batch(b)
        n_tok = out.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype("float64")
        nchars = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype("float64")
        n_digit = pc.binary_length(pc.replace_substring_regex(
            b.column("text"), pattern="[^0-9]", replacement="")) \
            .to_numpy(zero_copy_only=False).astype("float64")
        return pa.table({
            "f_ntok": pa.array(n_tok / 100.0),
            "f_mean_toklen": pa.array(
                nchars / np.maximum(n_tok, 1.0) / 10.0),
            "f_digit_frac": pa.array(
                n_digit / np.maximum(nchars, 1.0)),
            "label": pa.array(
                (nchars >= 300.0).astype("int64"), type=pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]) \
        .map_batches(feats, batch_format="pyarrow", zero_copy_batch=True)
    return logreg_train(
        ds, ["f_ntok", "f_mean_toklen", "f_digit_frac"], "label",
        n_iters=30, lr=0.5)


def _q_logreg_quality_scores(sf_dir: str):
    """Learned-quality-filter inference: train the logreg head (same
    deterministic full-batch GD as logreg_quality_train), then score
    EVERY document with one broadcast-weights map-only pass — (doc_id,
    score_e6, keep). The train->filter loop every learned quality
    pipeline ships; rows-only (iterative optimization has no SQL
    form), exactness pinned by the brute-scoring pytest."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.textops import (
        token_count_batch,
    )
    from apache_datasketches_go_ray.stages.train import (
        logreg_apply, logreg_train,
    )

    def feats(b):
        out = token_count_batch(b)
        n_tok = out.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype("float64")
        nchars = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype("float64")
        n_digit = pc.binary_length(pc.replace_substring_regex(
            b.column("text"), pattern="[^0-9]", replacement="")) \
            .to_numpy(zero_copy_only=False).astype("float64")
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "f_ntok": pa.array(n_tok / 100.0),
            "f_mean_toklen": pa.array(
                nchars / np.maximum(n_tok, 1.0) / 10.0),
            "f_digit_frac": pa.array(
                n_digit / np.maximum(nchars, 1.0)),
            "label": pa.array(
                (nchars >= 300.0).astype("int64"), type=pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]) \
        .map_batches(feats, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()
    fcols = ["f_ntok", "f_mean_toklen", "f_digit_frac"]
    model = logreg_train(ds, fcols, "label", n_iters=30, lr=0.5)
    return logreg_apply(ds, model, fcols, "doc_id", threshold=0.5)


def _q_cluster_size_histogram(sf_dir: str):
    """Dedup report: histogram of near-dup cluster sizes from the
    flagship pipeline output (rows-only: clusters are murmur-seeded).
    Composition proof that the flagship output feeds ordinary
    analytics."""
    import pyarrow as pa

    clusters = _q_transcript_dedup(sf_dir)

    def partial(b):
        g = b.group_by("cluster_id").aggregate([("conv_id", "count")])
        return pa.table({
            "cluster_id": g.column("cluster_id"),
            "n": g.column("conv_id_count").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "cluster_size": pa.array([], type=pa.int64()),
                "n_clusters": pa.array([], type=pa.int64()),
            })
        g = b.group_by("cluster_id").aggregate([("n", "sum")])
        h = pa.table({"size": g.column("n_sum").cast(pa.int64())}) \
            .group_by("size").aggregate([("size", "count")])
        return pa.table({
            "cluster_size": h.column("size"),
            "n_clusters": h.column("size_count").cast(pa.int64()),
        })

    return (clusters
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["cluster_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(lambda b: b.group_by("cluster_size").aggregate(
                [("n_clusters", "sum")]).rename_columns(
                ["cluster_size", "n_clusters"]),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True))


def _q_user_spend_summary(sf_dir: str):
    """Aggregate-of-aggregate: per-user spend totals re-aggregated into
    one global summary row (n_users, total, min/max per-user cents) —
    the two-level rollup shape, all int64."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        t = pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by("user_id").aggregate([("cents", "sum")])
        return pa.table({
            "user_id": g.column("user_id"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("user_id").aggregate([("cents", "sum")])
        return pa.table({
            "user_id": g.column("user_id"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "n_users": pa.array([], type=pa.int64()),
                "total_cents": pa.array([], type=pa.int64()),
                "min_user_cents": pa.array([], type=pa.int64()),
                "max_user_cents": pa.array([], type=pa.int64()),
            })
        c = b.column("cents")
        return pa.table({
            "n_users": pa.array([len(b)], type=pa.int64()),
            "total_cents": pa.array([pc.sum(c).as_py()], type=pa.int64()),
            "min_user_cents": pa.array([pc.min(c).as_py()],
                                       type=pa.int64()),
            "max_user_cents": pa.array([pc.max(c).as_py()],
                                       type=pa.int64()),
        })

    return (_read(sf_dir, "events", ["user_id", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_docs_containing_pattern(sf_dir: str):
    """LIKE filter surface: per-language count of documents containing
    a literal substring (vectorized match_substring — the predicate
    pushdown every scan runs)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    PAT = "and"

    def partial(b):
        hit = pc.match_substring(b.column("text"), PAT).cast(pa.int64())
        t = pa.table({"lang": b.column("lang"), "hit": hit})
        g = t.group_by("lang").aggregate([("hit", "sum"),
                                          ("hit", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "n_docs": g.column("hit_count").cast(pa.int64()),
            "n_match": g.column("hit_sum").cast(pa.int64()),
        })

    def fold(b):
        g = b.group_by("lang").aggregate([("n_docs", "sum"),
                                          ("n_match", "sum")])
        return pa.table({
            "lang": g.column("lang"),
            "n_docs": g.column("n_docs_sum").cast(pa.int64()),
            "n_match": g.column("n_match_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "documents", ["lang", "text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(2, keys=["lang"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_transcript_role_paths(sf_dir: str):
    """Per-conversation ordered role sequence — ``string_agg(role, '>'
    ORDER BY turn_idx)`` over the transcript table (the sequence
    operator applied to the input_hint's role column with a STRING
    partition key). One conv-key shuffle; the concatenation is
    zero-loop: sorted roles wrapped in a ListArray whose offsets are
    the conversation boundaries, joined natively with binary_join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role"])

    def fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
                "role_path": pa.array([], type=pa.string()),
            })
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        _, codes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, codes))
        c = codes[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        offsets = np.append(starts, len(c)).astype(np.int32)
        roles = as_array(b.column("role")).cast(pa.string()).take(
            pa.array(order, type=pa.int64()))
        lists = pa.ListArray.from_arrays(pa.array(offsets), roles)
        return pa.table({
            "conv_id": pa.array(conv[order][starts]),
            "n_turns": pa.array(np.diff(offsets), type=pa.int64()),
            "role_path": pc.binary_join(lists, ">"),
        })

    return (ds.select_columns(["conv_id", "turn_idx", "role"])
            .repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_transcript_tool_usage(sf_dir: str):
    """Per-tool usage profile over the transcript table: call counts,
    distinct conversations and mean call-text length per tool name —
    direct coverage of the input_hint's tool column. Pre-distinct
    (tool, conv) combiner + tool-key fold."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["tool", "conv_id", "text"])

    def partial(b):
        sel = pc.not_equal(b.column("tool"), "")
        t = pa.table({
            "tool": b.column("tool").filter(sel),
            "conv_id": b.column("conv_id").filter(sel),
            "tlen": pc.utf8_length(b.column("text").filter(sel))
                .cast(pa.int64()),
        })
        g = t.group_by(["tool", "conv_id"]).aggregate(
            [("tlen", "sum"), ("tlen", "count")])
        return pa.table({
            "tool": g.column("tool"),
            "conv_id": g.column("conv_id"),
            "sum_len": g.column("tlen_sum").cast(pa.int64()),
            "n_calls": g.column("tlen_count").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "tool": pa.array([], type=pa.string()),
                "n_calls": pa.array([], type=pa.int64()),
                "n_convs": pa.array([], type=pa.int64()),
                "mean_call_len": pa.array([], type=pa.float64()),
            })
        d0 = b.group_by(["tool", "conv_id"]).aggregate(
            [("sum_len", "sum"), ("n_calls", "sum")])
        d = pa.table({
            "tool": d0.column("tool"),
            "conv_id": d0.column("conv_id"),
            "sum_len": d0.column("sum_len_sum"),
            "n_calls": d0.column("n_calls_sum"),
        })
        g = d.group_by("tool").aggregate(
            [("n_calls", "sum"), ("sum_len", "sum"),
             ("conv_id", "count")])
        calls = g.column("n_calls_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lens = g.column("sum_len_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "tool": g.column("tool"),
            "n_calls": g.column("n_calls_sum").cast(pa.int64()),
            "n_convs": g.column("conv_id_count").cast(pa.int64()),
            "mean_call_len": pa.array(
                np.floor(lens / np.maximum(calls, 1) * 1000.0 + 0.5)
                / 1000.0, type=pa.float64()),
        })

    return (ds.select_columns(["tool", "conv_id", "text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["tool"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_tfidf_top_terms(sf_dir: str):
    """Exact TF-IDF: global df via one token-keyed shuffle, broadcast
    lookup, block-local per-doc top-3."""
    from apache_datasketches_go_ray.stages.corpusops import tfidf_top_terms

    return tfidf_top_terms(_read(sf_dir, "documents", ["doc_id", "text"]),
                           top_n=3, num_partitions=16)


def _q_dup_span_stats(sf_dir: str):
    """Span-level dup detection (Lee et al. 2022 shape): per-doc share
    of 13-token grams that also occur in another doc."""
    from apache_datasketches_go_ray.stages.corpusops import dup_span_stats

    return dup_span_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                          k=13, num_partitions=16)


def _q_token_entropy(sf_dir: str):
    """Per-doc unigram Shannon entropy (nats, r4) — map-only block op."""
    from apache_datasketches_go_ray.stages.textops import token_entropy_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        token_entropy_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_max_token_run(sf_dir: str):
    """Per-doc longest identical-consecutive-token run — map-only."""
    from apache_datasketches_go_ray.stages.textops import max_token_run_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        max_token_run_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_oov_rate(sf_dir: str):
    """Per-doc OOV rate vs the corpus's own top-10 vocabulary (count
    desc, token asc at the cut): token-keyed count fold → per-block
    partial top-N → driver merge → ray.put broadcast → one vectorized
    pc.is_in membership pass."""
    from apache_datasketches_go_ray.stages.corpusops import oov_rate

    return oov_rate(_read(sf_dir, "documents", ["doc_id", "text"]),
                    vocab_size=10, num_partitions=16)


def _q_zipf_slope(sf_dir: str):
    """Per-source Zipf rank-frequency slope over the top-20 tokens
    (OLS of ln(count) on ln(rank); regr_slope parity)."""
    from apache_datasketches_go_ray.stages.corpusops import zipf_slope

    return zipf_slope(_read(sf_dir, "documents", ["source", "text"]),
                      group_col="source", top_r=20, num_partitions=16)


def _q_embedding_label_centroids(sf_dir: str):
    """Exact per-label centroid vectors, long format: block-local
    per-label sum partials → label-keyed fold; floats DOUBLE-cast on
    both engines and rounded half-up at 1e-4."""
    from apache_datasketches_go_ray.stages.embops import label_centroids

    return label_centroids(
        _read(sf_dir, "embeddings", ["embedding", "label"]),
        num_partitions=8)


def _q_embedding_centroid_confusion(sf_dir: str):
    """Nearest-centroid assignment by cosine (ties → smallest label):
    tiny centroid matrix driver-folded once and ray.put-broadcast to
    the scan; only integer counts cross engines."""
    from apache_datasketches_go_ray.stages.embops import centroid_confusion

    return centroid_confusion(
        _read(sf_dir, "embeddings", ["embedding", "label"]),
        num_partitions=8)


def _q_embedding_norm_stats(sf_dir: str):
    """Per-label L2-norm n/mean/min/max (un-normalized batch detector)."""
    from apache_datasketches_go_ray.stages.embops import norm_stats_by_label

    return norm_stats_by_label(
        _read(sf_dir, "embeddings", ["embedding", "label"]),
        num_partitions=8)


def _q_dup_span_rewrite(sf_dir: str):
    """Exact substring dedup with document rewrite (Lee et al. 2022):
    every 5-token gram occurrence after the corpus-wide first is
    removed from its doc; docs reassembled from surviving tokens.
    Three keyed shuffles, zero-loop folds; value-exact vs the
    window-function + anti-range-join SQL oracle."""
    from apache_datasketches_go_ray.stages.corpusops import dup_span_rewrite

    return dup_span_rewrite(_read(sf_dir, "documents", ["doc_id", "text"]),
                            k=5, num_partitions=16)


def _q_dsir_importance(sf_dir: str):
    """DSIR-style unigram log-likelihood-ratio importance weights
    toward the lang='en' slice (vocabulary-exact feature space)."""
    from apache_datasketches_go_ray.stages.corpusops import dsir_importance

    return dsir_importance(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        target_col="lang", target_value="en", num_partitions=16)


def _q_turn_dedup_rewrite(sf_dir: str):
    """C4-style corpus-level turn dedup with conversation rewrite: a
    turn whose exact text occurs elsewhere in the corpus survives only
    at its first occurrence (min (conv_id, turn_idx)); conversations
    are rewritten from their surviving turns. Two keyed shuffles
    (turn-text hash, then conv_id), vectorized folds; value-exact vs
    the window-function SQL oracle."""
    import ray.data
    from apache_datasketches_go_ray.stages.dedup_extras import (
        line_dedup_rewrite)

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    return line_dedup_rewrite(ds, num_partitions=16)


def _q_collocation_stats(sf_dir: str):
    """Adjacent-bigram collocation counts (PMI components) over the
    document corpus: exact global n_xy / marginal n_x, n_y / n_total,
    integer-exact so the SQL oracle hashes identically; PMI is a pure
    function of the row."""
    from apache_datasketches_go_ray.stages.corpusops import (
        collocation_stats)

    return collocation_stats(_read(sf_dir, "documents", ["text"]),
                             min_count=5, num_partitions=16)


def _q_role_alternation(sf_dir: str):
    """Transcript QA: per-conversation role-alternation profile —
    n_turns, count of adjacent same-role turn pairs (a structure
    violation for chat-format training data) and the opening role.
    One conv-key shuffle + vectorized in-block fold."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role"])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
                "n_repeats": pa.array([], type=pa.int64()),
                "first_role": pa.array([], type=pa.string()),
            })
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(zero_copy_only=False)
        role = as_array(b.column("role"))
        _, ccodes = np.unique(conv, return_inverse=True)
        _, rcodes = np.unique(
            role.to_numpy(zero_copy_only=False), return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        c, r = ccodes[order], rcodes[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        same = np.concatenate([[False], (r[1:] == r[:-1]) & ~first[1:]])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c))
        rep = np.concatenate([[0], np.cumsum(same)])
        return pa.table({
            "conv_id": pa.array(conv[order][starts]),
            "n_turns": pa.array(ends - starts, type=pa.int64()),
            "n_repeats": pa.array(rep[ends] - rep[starts],
                                  type=pa.int64()),
            "first_role": role.take(pa.array(order[starts])),
        })

    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_vocab_stats_by_source(sf_dir: str):
    """Corpus analytics: per-source document / token / distinct-token
    counts (the Heaps-law inputs). Distinct counting never co-locates a
    whole source: pre-distinct per block, shuffle on (source, token).
    Result is source-cardinality-sized, finished as a driver-side
    left join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.corpusops import _tokens_of
    from apache_datasketches_go_ray.stages.relational import (
        distinct_count_by)

    docs = _read(sf_dir, "documents", ["source", "text"])

    _empty = pa.table({"source": pa.array([], type=pa.string()),
                       "n_docs": pa.array([], type=pa.int64()),
                       "n_tokens": pa.array([], type=pa.int64())})

    def count_partial(b):
        if len(b) == 0:
            return _empty
        flat, offsets = _tokens_of(b.column("text"))
        ntok = np.diff(offsets)
        t = pa.table({"source": b.column("source"),
                      "n_tokens": pa.array(ntok, type=pa.int64())})
        g = t.group_by("source").aggregate(
            [("n_tokens", "sum"), ("n_tokens", "count")])
        return pa.table({
            "source": g.column("source"),
            "n_docs": g.column("n_tokens_count").cast(pa.int64()),
            "n_tokens": g.column("n_tokens_sum").cast(pa.int64()),
        })

    counts = gather_table(
        docs.map_batches(count_partial, batch_format="pyarrow",
                         zero_copy_batch=True), schema=_empty.schema)
    counts = counts.group_by("source").aggregate(
        [("n_docs", "sum"), ("n_tokens", "sum")])

    _empty_tok = pa.table({"source": pa.array([], type=pa.string()),
                           "token": pa.array([], type=pa.string())})

    def explode(b):
        if len(b) == 0:
            return _empty_tok
        flat, offsets = _tokens_of(b.column("text"))
        doc_of = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                           np.diff(offsets))
        # block-local pre-distinct before the token stream ships
        t = pa.table({
            "source": as_array(b.column("source")).take(pa.array(doc_of)),
            "token": flat.cast(pa.string()),
        })
        return t.group_by(["source", "token"]).aggregate([])

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    tok_ds = docs.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
    dist = gather_table(
        distinct_count_by(tok_ds, "source", "token", num_partitions=16),
        schema=pa.schema([("source", pa.string()),
                          ("n_distinct", pa.int64())]))

    joined = counts.join(dist, keys="source", join_type="left outer")
    nd = pc.coalesce(joined.column("n_distinct"), pa.scalar(0, pa.int64()))
    return pa.table({
        "source": joined.column("source").cast(pa.string()),
        "n_docs": joined.column("n_docs_sum").cast(pa.int64()),
        "n_tokens": joined.column("n_tokens_sum").cast(pa.int64()),
        "n_distinct_tokens": nd.cast(pa.int64()),
    })


def _q_source_token_overlap(sf_dir: str):
    """Pairwise distinct-token vocabulary overlap between sources (the
    mirrored-feed detector): exact |A|, |B|, |A∩B| per source pair plus
    Jaccard, via a token-keyed shuffle folding per-block incidence
    matmuls — never co-locates a source's vocabulary, never all-pairs."""
    from apache_datasketches_go_ray.stages.corpusops import (
        source_vocab_overlap)

    return source_vocab_overlap(_read(sf_dir, "documents",
                                      ["source", "text"]),
                                num_partitions=16)


def _q_conv_turn_repeats(sf_dir: str):
    """Agent-loop QA: per conversation, how many turns repeat an
    identical earlier turn text — n_turns, distinct turn texts, and the
    largest identical-text repeat run. A stuck tool loop shows up as
    max_text_repeats >> 1. One conv-key shuffle, two in-block arrow
    group_bys."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "text"])

    _empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "n_turns": pa.array([], type=pa.int64()),
        "n_distinct_texts": pa.array([], type=pa.int64()),
        "max_text_repeats": pa.array([], type=pa.int64()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        g = b.group_by(["conv_id", "text"]).aggregate([("text", "count")])
        g2 = g.group_by("conv_id").aggregate([
            ("text_count", "sum"), ("text_count", "count"),
            ("text_count", "max")])
        return pa.table({
            "conv_id": g2.column("conv_id"),
            "n_turns": g2.column("text_count_sum").cast(pa.int64()),
            "n_distinct_texts":
                g2.column("text_count_count").cast(pa.int64()),
            "max_text_repeats":
                g2.column("text_count_max").cast(pa.int64()),
        })

    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_tokenizer_fertility(sf_dir: str):
    """Tokenizer fertility per language: BPE-ish pretokens per
    whitespace word (the multilingual cost signal — a language whose
    fertility is 2x pays 2x the context window). Integer sums from one
    vectorized RE2 + split pass; single-division fertility rounded
    half-up to 6 so the SQL oracle hashes identically."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.corpusops import _tokens_of
    from apache_datasketches_go_ray.stages.textops import (
        bpe_token_count_batch)

    docs = _read(sf_dir, "documents", ["lang", "text"])

    _empty = pa.table({
        "lang": pa.array([], type=pa.string()),
        "n_docs": pa.array([], type=pa.int64()),
        "n_ws_tokens": pa.array([], type=pa.int64()),
        "n_bpe_tokens": pa.array([], type=pa.int64()),
    })

    def partial(b):
        if len(b) == 0:
            return _empty
        _, offsets = _tokens_of(b.column("text"))
        nws = np.diff(offsets)
        nbpe = bpe_token_count_batch(b).column("n_bpe_tokens")
        t = pa.table({"lang": b.column("lang"),
                      "n_ws_tokens": pa.array(nws, type=pa.int64()),
                      "n_bpe_tokens": nbpe})
        g = t.group_by("lang").aggregate([
            ("n_ws_tokens", "sum"), ("n_bpe_tokens", "sum"),
            ("n_ws_tokens", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "n_docs": g.column("n_ws_tokens_count").cast(pa.int64()),
            "n_ws_tokens": g.column("n_ws_tokens_sum").cast(pa.int64()),
            "n_bpe_tokens": g.column("n_bpe_tokens_sum").cast(pa.int64()),
        })

    tbl = gather_table(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        schema=_empty.schema)
    g = tbl.group_by("lang").aggregate([
        ("n_docs", "sum"), ("n_ws_tokens", "sum"), ("n_bpe_tokens", "sum")])
    nws = g.column("n_ws_tokens_sum").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nbpe = g.column("n_bpe_tokens_sum").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    fert = np.where(nws > 0, np.floor(nbpe / np.maximum(nws, 1) * 1e6
                                      + 0.5) / 1e6, 0.0)
    return pa.table({
        "lang": g.column("lang").cast(pa.string()),
        "n_docs": g.column("n_docs_sum").cast(pa.int64()),
        "n_ws_tokens": pa.array(nws),
        "n_bpe_tokens": pa.array(nbpe),
        "fertility": pa.array(fert, type=pa.float64()),
    })


def _q_eval_ngram_coverage(sf_dir: str):
    """Benchmark-novelty metric: for each eval-split document (same
    deterministic Knuth-hash split as train_eval_split), the fraction of
    its distinct token bigrams that appear anywhere in the train split.
    High coverage = the eval doc is paraphrasable from training data;
    the aggregate curve is the standard memorization-risk report.
    One bigram-keyed shuffle; the train side ships as pre-distinct
    block-local bigrams (never a text), eval side as (bigram, doc_id)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.corpusops import _tokens_of

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    _empty_bg = pa.table({
        "bigram": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.int64()),
    })

    def pre(b):
        if len(b) == 0:
            return _empty_bg
        import pyarrow.compute as pc
        flat, offsets = _tokens_of(b.column("text"))
        if len(flat) < 2:
            return _empty_bg
        doc_idx = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                            np.diff(offsets))
        mask = doc_idx[1:] == doc_idx[:-1]
        if not mask.any():
            return _empty_bg
        pos = np.flatnonzero(mask)
        grams = pc.binary_join_element_wise(
            flat.take(pa.array(pos)), flat.take(pa.array(pos + 1)), " ")
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[doc_idx[pos]]
        is_eval = ((ids * 2654435761) % 4294967296) % 100 < 10
        # train rows collapse to doc_id = -1 (set semantics): only the
        # distinct bigram matters, so the shuffle payload shrinks to
        # one row per (block, train bigram)
        t = pa.table({"bigram": grams.cast(pa.string()),
                      "doc_id": pa.array(np.where(is_eval, ids, -1))})
        return t.group_by(["bigram", "doc_id"]).aggregate([])

    _empty_cov = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_bigrams": pa.array([], type=pa.int64()),
        "n_covered": pa.array([], type=pa.int64()),
    })

    def cover(b):
        if len(b) == 0:
            return _empty_cov
        d = b.group_by(["bigram", "doc_id"]).aggregate([])
        ids = d.column("doc_id").to_numpy(zero_copy_only=False)
        bg = pc.dictionary_encode(
            d.column("bigram").combine_chunks()
            if isinstance(d.column("bigram"), pa.ChunkedArray)
            else d.column("bigram"))
        codes = bg.indices.to_numpy(zero_copy_only=False)
        in_train = np.zeros(len(bg.dictionary), dtype=bool)
        in_train[codes[ids == -1]] = True
        ev = ids >= 0
        if not ev.any():
            return _empty_cov
        eids = ids[ev]
        covered = in_train[codes[ev]]
        t = pa.table({"doc_id": pa.array(eids),
                      "n_bigrams": pa.array(
                          np.ones(len(eids), dtype=np.int64)),
                      "n_covered": pa.array(covered.astype(np.int64))})
        g = t.group_by("doc_id").aggregate(
            [("n_bigrams", "sum"), ("n_covered", "sum")])
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_bigrams": g.column("n_bigrams_sum").cast(pa.int64()),
            "n_covered": g.column("n_covered_sum").cast(pa.int64()),
        })

    import pyarrow.compute as pc

    parts = (docs.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)
             .repartition(16, keys=["bigram"])
             .map_batches(cover, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True))
    tbl = gather_table(parts, schema=_empty_cov.schema)
    g = tbl.group_by("doc_id").aggregate(
        [("n_bigrams", "sum"), ("n_covered", "sum")])
    nb = g.column("n_bigrams_sum").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nc = g.column("n_covered_sum").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cov = np.floor(nc / nb * 1e6 + 0.5) / 1e6
    return pa.table({
        "doc_id": g.column("doc_id").cast(pa.int64()),
        "n_bigrams": pa.array(nb),
        "n_covered": pa.array(nc),
        "coverage": pa.array(cov, type=pa.float64()),
    })


def _q_reply_length_by_depth(sf_dir: str):
    """SFT shape analytics: reply length by conversation depth — per
    (role, turn-depth bucket 0-3/4-7/8-15/16+) turn counts and exact
    char sums, the drift signal for assistant verbosity over long
    conversations. Pure map-side partials + one tiny grouped fold."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.context import gather_table

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["turn_idx", "role", "text"])

    _empty = pa.table({
        "role": pa.array([], type=pa.string()),
        "depth_bucket": pa.array([], type=pa.string()),
        "n_turns": pa.array([], type=pa.int64()),
        "sum_chars": pa.array([], type=pa.int64()),
    })

    def partial(b):
        if len(b) == 0:
            return _empty
        ti = b.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = np.select(
            [ti <= 3, ti <= 7, ti <= 15],
            ["00-03", "04-07", "08-15"], default="16+")
        t = pa.table({
            "role": b.column("role"),
            "depth_bucket": pa.array(bucket, type=pa.string()),
            "n_chars": pc.utf8_length(b.column("text").combine_chunks()
                                      if isinstance(b.column("text"),
                                                    pa.ChunkedArray)
                                      else b.column("text"))
            .cast(pa.int64()),
        })
        g = t.group_by(["role", "depth_bucket"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return pa.table({
            "role": g.column("role"),
            "depth_bucket": g.column("depth_bucket"),
            "n_turns": g.column("n_chars_count").cast(pa.int64()),
            "sum_chars": g.column("n_chars_sum").cast(pa.int64()),
        })

    tbl = gather_table(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        schema=_empty.schema)
    g = tbl.group_by(["role", "depth_bucket"]).aggregate(
        [("n_turns", "sum"), ("sum_chars", "sum")])
    return pa.table({
        "role": g.column("role").cast(pa.string()),
        "depth_bucket": g.column("depth_bucket").cast(pa.string()),
        "n_turns": g.column("n_turns_sum").cast(pa.int64()),
        "sum_chars": g.column("sum_chars_sum").cast(pa.int64()),
    })


def _q_sft_context_windows(sf_dir: str):
    """SFT training-example construction: for every assistant turn with
    at least one preceding turn, emit (context = up to 4 immediately
    preceding turn texts newline-joined in turn order, target = the
    assistant text). The standard bounded-context example extractor —
    a distributed ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING window. One
    conv-key shuffle; per block an in-block lexsort, vectorized ragged
    window gather (repeat/arange index arithmetic — no per-row Python),
    and one LargeListArray + binary_join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    K = 4
    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role",
                                        "text"])
    _empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "turn_idx": pa.array([], type=pa.int32()),
        "context": pa.array([], type=pa.large_string()),
        "n_ctx": pa.array([], type=pa.int64()),
        "target": pa.array([], type=pa.large_string()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        texts = as_array(b.column("text")).cast(pa.large_string()).take(
            pa.array(order, type=pa.int64()))
        roles = as_array(b.column("role")).to_numpy(
            zero_copy_only=False)[order]
        c = ccodes[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        seg_start = np.maximum.accumulate(
            np.where(first, np.arange(len(c)), 0))
        rows = np.arange(len(c))
        lo = np.maximum(seg_start, rows - K)
        is_tgt = (roles == "assistant") & (rows > lo)
        ti, tlo = rows[is_tgt], lo[is_tgt]
        if not len(ti):
            return _empty
        L = (ti - tlo).astype(np.int64)
        total = int(L.sum())
        base = np.repeat(tlo, L)
        within = np.arange(total) - np.repeat(np.cumsum(L) - L, L)
        flat = texts.take(pa.array(base + within, type=pa.int64()))
        offsets = np.concatenate(([0], np.cumsum(L)))
        ctx = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets), flat),
            pa.scalar("\n", type=pa.large_string()))
        take_t = pa.array(ti, type=pa.int64())
        return pa.table({
            "conv_id": as_array(b.column("conv_id")).take(
                pa.array(order, type=pa.int64())).take(take_t),
            "turn_idx": pa.array(tidx[order][ti], type=pa.int32()),
            "context": ctx,
            "n_ctx": pa.array(L),
            "target": texts.take(take_t),
        })

    return (ds.repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_chatml_format(sf_dir: str):
    """SFT serialization: each conversation rendered to a single
    chat-format training string ('<|role|>text' per turn, newline
    joined, stable turn order). Same shape as conversation assembly
    (stages/assemble.py): one conv-key shuffle, in-block lexsort, and a
    zero-loop ListArray + binary_join concatenation."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role",
                                        "text"])

    _empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "n_turns": pa.array([], type=pa.int64()),
        "chatml": pa.array([], type=pa.large_string()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        role = as_array(b.column("role")).take(
            pa.array(order, type=pa.int64()))
        text = as_array(b.column("text")).cast(pa.large_string()).take(
            pa.array(order, type=pa.int64()))
        tagged = pc.binary_join_element_wise(
            pa.scalar("<|", type=pa.large_string()),
            role.cast(pa.large_string()),
            pa.scalar("|>", type=pa.large_string()),
            text,
            pa.scalar("", type=pa.large_string()))
        c = ccodes[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        offsets = np.append(starts, len(c)).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets), tagged)
        return pa.table({
            "conv_id": pa.array(conv[order][starts]),
            "n_turns": pa.array(np.diff(offsets), type=pa.int64()),
            "chatml": pc.binary_join(
                lists, pa.scalar("\n", type=pa.large_string())),
        })

    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_sft_pairs(sf_dir: str):
    """SFT pair extraction: every (user turn -> immediately following
    assistant turn) within a conversation becomes one (prompt, response)
    training example. One conv-key shuffle + in-block lexsort and an
    adjacent-row mask — the distributed form of the lead() window the
    oracle uses."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role",
                                        "text"])

    _empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "turn_idx": pa.array([], type=pa.int32()),
        "prompt": pa.array([], type=pa.large_string()),
        "response": pa.array([], type=pa.large_string()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        role = as_array(b.column("role")).take(
            pa.array(order, type=pa.int64()))
        is_user = pc.equal(role, "user").to_numpy(zero_copy_only=False)
        is_asst = pc.equal(role, "assistant") \
            .to_numpy(zero_copy_only=False)
        c = ccodes[order]
        same_conv = np.concatenate([c[1:] == c[:-1], [False]])
        nxt_asst = np.concatenate([is_asst[1:], [False]])
        take = np.flatnonzero(is_user & same_conv & nxt_asst)
        text = as_array(b.column("text")).cast(pa.large_string())
        o = np.asarray(order)
        return pa.table({
            "conv_id": pa.array(conv[o[take]]),
            "turn_idx": pa.array(tidx[o[take]], type=pa.int32()),
            "prompt": text.take(pa.array(o[take], type=pa.int64())),
            "response": text.take(pa.array(o[take + 1], type=pa.int64())),
        })

    import pyarrow.compute as pc

    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_prompt_collisions(sf_dir: str):
    """Prompt-collision response mining: user prompts (>= 16 chars)
    asked in 2..20 distinct conversations, with how many distinct
    assistant responses they drew and the response-length spread —
    the raw material for preference pairs and consistency QA. Stage 1
    is the sft_pairs adjacency fold emitting (prompt, conv_id,
    response-hash, response-length) — the response text itself never
    ships through the prompt shuffle, so the wide step carries ~24
    bytes + prompt per row; distinct-by-hash equals distinct-by-text
    absent a 64-bit murmur collision (same argument as turnblock)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role",
                                        "text"])

    _MID = pa.schema([("prompt", pa.large_string()),
                      ("conv_id", pa.string()),
                      ("rhash", pa.uint64()),
                      ("rlen", pa.int64())])
    _OUT = pa.schema([("prompt", pa.large_string()),
                      ("n_convs", pa.int64()),
                      ("n_responses", pa.int64()),
                      ("len_spread", pa.int64())])

    def extract(b):
        if len(b) == 0:
            return _MID.empty_table()
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        role = as_array(b.column("role")).take(
            pa.array(order, type=pa.int64()))
        is_user = pc.equal(role, "user").to_numpy(zero_copy_only=False)
        is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
        c = ccodes[order]
        same_conv = np.concatenate([c[1:] == c[:-1], [False]])
        nxt_asst = np.concatenate([is_asst[1:], [False]])
        take = np.flatnonzero(is_user & same_conv & nxt_asst)
        text = as_array(b.column("text"))
        o = np.asarray(order)
        prompts = text.take(pa.array(o[take], type=pa.int64()))
        keep = pc.greater_equal(pc.utf8_length(prompts), 16) \
            .to_numpy(zero_copy_only=False)
        take = take[keep]
        prompts = text.take(pa.array(o[take], type=pa.int64()))
        responses = text.take(pa.array(o[take + 1], type=pa.int64()))
        rh, _ = hash_strings(responses)
        return pa.table({
            "prompt": prompts.cast(pa.large_string()),
            "conv_id": pa.array(conv[o[take]], type=pa.string()),
            "rhash": pa.array(rh, type=pa.uint64()),
            "rlen": pc.utf8_length(responses).cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return _OUT.empty_table()
        d = b.group_by(["prompt", "conv_id", "rhash", "rlen"]).aggregate([])
        g = d.group_by("prompt").aggregate([
            ("conv_id", "count_distinct"),
            ("rhash", "count_distinct"),
            ("rlen", "max"), ("rlen", "min")])
        t = pa.table({
            "prompt": g.column("prompt"),
            "n_convs": g.column("conv_id_count_distinct").cast(pa.int64()),
            "n_responses": g.column("rhash_count_distinct")
            .cast(pa.int64()),
            "len_spread": pc.subtract(g.column("rlen_max"),
                                      g.column("rlen_min"))
            .cast(pa.int64()),
        })
        keep = pc.and_(pc.greater_equal(t.column("n_convs"), 2),
                       pc.less_equal(t.column("n_convs"), 20))
        return t.filter(keep)

    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(extract, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(16, keys=["prompt"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_compression_ratios(sf_dir: str):
    """Per-document zlib compression ratio (repetition / low-entropy
    quality proxy, the Gopher-style filter input). No SQL analogue for
    zlib, so rows-only; determinism + high/low-entropy behavior pinned
    by pytest."""
    from apache_datasketches_go_ray.stages.textops import (
        compression_ratio_batch)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        compression_ratio_batch, batch_format="pyarrow",
        zero_copy_batch=True)


def _q_context_truncate(sf_dir: str, budget: int = 512):
    """Context-window truncation stats: per conversation, how many
    trailing turns fit a fixed token budget (greedy suffix by
    whitespace-token count) and how many tokens they carry — the
    planning numbers for last-N-tokens context packing. One conv-key
    shuffle, segmented reverse cumsum in-block."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.corpusops import _tokens_of

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
                "n_kept_tail": pa.array([], type=pa.int64()),
                "tokens_kept": pa.array([], type=pa.int64()),
            })
        conv = as_array(b.column("conv_id")).to_numpy(zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, offsets = _tokens_of(b.column("text"))
        ntok = np.diff(offsets)
        _, codes = np.unique(conv, return_inverse=True)
        order = np.lexsort((-tidx, codes))  # per conv, last turn first
        c, nt = codes[order], ntok[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c))
        csum = np.cumsum(nt)
        base = np.repeat(csum[starts] - nt[starts], ends - starts)
        rcum = csum - base  # suffix token total down to each turn
        fit = rcum <= budget
        nfit = np.concatenate([[0], np.cumsum(fit)])
        n_kept = nfit[ends] - nfit[starts]
        # tokens in the kept suffix = rcum at the last fitting row
        tokens_kept = np.where(
            n_kept > 0, rcum[np.minimum(starts + n_kept - 1, len(c) - 1)],
            0).astype(np.int64)
        return pa.table({
            "conv_id": pa.array(conv[order][starts]),
            "n_turns": pa.array(ends - starts, type=pa.int64()),
            "n_kept_tail": pa.array(n_kept, type=pa.int64()),
            "tokens_kept": pa.array(tokens_kept),
        })

    return (ds.repartition(16, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_events_out_of_order(sf_dir: str):
    """Event-time disorder profile (the watermark-sizing numbers for a
    streaming ingest): per user, how many events arrive with a
    timestamp behind the running max of earlier arrivals (arrival order
    = event_id) and the worst regression in microseconds. One user-key
    shuffle; segmented running max via an offset-shifted cummax."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "n_out_of_order": pa.array([], type=pa.int64()),
                "max_regression_us": pa.array([], type=pa.int64()),
            })
        uid = as_array(b.column("user_id")).to_numpy(zero_copy_only=False)
        eid = as_array(b.column("event_id")).to_numpy(zero_copy_only=False)
        ts = as_array(b.column("ts")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        users, codes = np.unique(uid, return_inverse=True)
        order = np.lexsort((eid, codes))
        c, t = codes[order], ts[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        np.not_equal(c[1:], c[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c))
        # segmented cummax: shift each segment into its own disjoint
        # value band so accumulate never carries across segments
        t0 = t - t.min()
        K = int(t0.max()) + 1
        n_seg = len(starts)
        assert K * n_seg < (1 << 62), "offset-shift cummax would overflow"
        shifted = t0 + c.astype(np.int64) * K
        run = np.maximum.accumulate(shifted)
        # prior max within the segment (first row of a segment has none)
        prior = np.concatenate([[0], run[:-1]]) - c.astype(np.int64) * K
        late = (~first) & (t0 < prior)
        reg = np.where(late, prior - t0, 0)
        nl = np.concatenate([[0], np.cumsum(late)])
        n_late = nl[ends] - nl[starts]
        max_reg = np.maximum.reduceat(reg, starts)
        return pa.table({
            "user_id": pa.array(users, type=pa.int64()),
            "n_events": pa.array(ends - starts, type=pa.int64()),
            "n_out_of_order": pa.array(n_late, type=pa.int64()),
            "max_regression_us": pa.array(max_reg, type=pa.int64()),
        })

    return (ds.repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_exact_dedup_keep_best(sf_dir: str):
    """Exact dedup with winner-by-quality: per duplicate group keep the
    longest copy (ties: lowest doc_id) — the keep-best policy of a
    curation funnel, vs exact_dedup_docs' keep-first."""
    from apache_datasketches_go_ray.stages.dedup_extras import (
        exact_dedup_keep_best)

    return exact_dedup_keep_best(
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]),
        num_partitions=16)


def _q_lang_mad_outliers(sf_dir: str):
    """Robust length-outlier stats per language: exact interpolated
    median + MAD (median absolute deviation) of n_chars and the count
    of docs beyond 3 MAD — the robust filter bound a curation pass
    uses instead of mean/stddev. All intermediates are exact binary
    fractions (ints and quarter-integers), so the SQL oracle hashes
    identically. One lang-key shuffle, two in-block lexsorts."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def _seg_median(sorted_vals, starts, ends):
        n = ends - starts
        lo = starts + (n - 1) // 2
        hi = starts + n // 2
        return (sorted_vals[lo] + sorted_vals[hi]) / 2.0

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "lang": pa.array([], type=pa.string()),
                "median_nchars": pa.array([], type=pa.float64()),
                "mad_nchars": pa.array([], type=pa.float64()),
                "n_outliers": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
            })
        lang = as_array(b.column("lang")).to_numpy(zero_copy_only=False)
        x = as_array(b.column("n_chars")).to_numpy(
            zero_copy_only=False).astype(np.float64)
        langs, codes = np.unique(lang, return_inverse=True)
        order = np.lexsort((x, codes))
        c1 = codes[order]
        first = np.empty(len(c1), dtype=bool)
        first[0] = True
        np.not_equal(c1[1:], c1[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(c1))
        med = _seg_median(x[order], starts, ends)
        dev = np.abs(x - med[codes])
        order2 = np.lexsort((dev, codes))
        mad = _seg_median(dev[order2], starts, ends)
        out = dev > 3.0 * mad[codes]
        return pa.table({
            "lang": pa.array(langs),
            "median_nchars": pa.array(med),
            "mad_nchars": pa.array(mad),
            "n_outliers": pa.array(np.bincount(
                codes[out], minlength=len(langs)).astype(np.int64)),
            "n_docs": pa.array((ends - starts).astype(np.int64)),
        })

    return (ds.repartition(4, keys=["lang"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_events_profile(sf_dir: str):
    """Table profiler: per column of the events table — row count, null
    count, exact distinct count. The melt maps every value to a string
    key (doubles via shortest round-trip repr, timestamps via epoch
    micros — both injective, so distinct cardinality is preserved);
    per-block pre-distinct keeps the (column, value) shuffle bounded.
    The driver-side finish is column-cardinality-sized."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.relational import (
        distinct_count_by)

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ds = _read(sf_dir, "events", cols)

    def _sval(arr: pa.Array) -> pa.Array:
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        if arr.type != pa.string():
            arr = arr.cast(pa.string())
        return arr

    _empty_counts = pa.table({
        "col_name": pa.array([], type=pa.string()),
        "n_rows": pa.array([], type=pa.int64()),
        "n_null": pa.array([], type=pa.int64()),
    })
    _empty_melt = pa.table({
        "col_name": pa.array([], type=pa.string()),
        "sval": pa.array([], type=pa.string()),
    })

    def count_partial(b):
        if len(b) == 0:
            return _empty_counts
        return pa.table({
            "col_name": pa.array(cols, type=pa.string()),
            "n_rows": pa.array([len(b)] * len(cols), type=pa.int64()),
            "n_null": pa.array([b.column(c).null_count for c in cols],
                               type=pa.int64()),
        })

    def melt(b):
        if len(b) == 0:
            return _empty_melt
        parts = []
        for c in cols:
            sv = _sval(as_array(b.column(c))).drop_null()
            u = pc.unique(sv)  # block-local pre-distinct
            parts.append(pa.table({
                "col_name": pa.array([c] * len(u), type=pa.string()),
                "sval": u,
            }))
        return pa.concat_tables(parts)

    counts = gather_table(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True), schema=_empty_counts.schema)
    counts = counts.group_by("col_name").aggregate(
        [("n_rows", "sum"), ("n_null", "sum")])

    melted = ds.map_batches(melt, batch_format="pyarrow",
                            zero_copy_batch=True)
    dist = gather_table(
        distinct_count_by(melted, "col_name", "sval", num_partitions=16),
        schema=pa.schema([("col_name", pa.string()),
                          ("n_distinct", pa.int64())]))

    joined = counts.join(dist, keys="col_name", join_type="left outer")
    nd = pc.coalesce(joined.column("n_distinct"),
                     pa.scalar(0, pa.int64()))
    return pa.table({
        "col_name": joined.column("col_name").cast(pa.string()),
        "n_rows": joined.column("n_rows_sum").cast(pa.int64()),
        "n_null": joined.column("n_null_sum").cast(pa.int64()),
        "n_distinct": nd.cast(pa.int64()),
    })


def _q_tool_chains(sf_dir: str):
    """Agent-transcript analytics: corpus-wide counts of tool->tool
    transitions (consecutive tool-bearing turns within a conversation)
    — the edge list of the tool-usage graph. Conv-key shuffle +
    in-block adjacent-pair fold; the chain vocabulary is tool²-bounded
    so partials finish on the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.context import gather_table

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "tool"])

    _empty = pa.table({"chain": pa.array([], type=pa.string()),
                       "n": pa.array([], type=pa.int64())})

    def partial(b):
        b = b.filter(pc.not_equal(b.column("tool"), ""))
        if len(b) < 2:
            return _empty
        conv = as_array(b.column("conv_id")).to_numpy(
            zero_copy_only=False)
        tidx = as_array(b.column("turn_idx")).to_numpy(
            zero_copy_only=False)
        tool = as_array(b.column("tool"))
        tools, rcodes = np.unique(
            tool.to_numpy(zero_copy_only=False), return_inverse=True)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        c, r = ccodes[order], rcodes[order]
        same = c[1:] == c[:-1]
        a, bnext = r[:-1][same], r[1:][same]
        if len(a) == 0:
            return _empty
        key = a * len(tools) + bnext
        uk, cnt = np.unique(key, return_counts=True)
        ta = pa.array(tools[uk // len(tools)])
        tb = pa.array(tools[uk % len(tools)])
        return pa.table({
            "chain": pc.binary_join_element_wise(ta, tb, " -> "),
            "n": pa.array(cnt.astype(np.int64)),
        })

    # conv-key shuffle so every conversation's turn sequence is whole
    # in one block; the per-block chain counts are tool²-bounded
    part = (ds.repartition(16, keys=["conv_id"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))
    tbl = gather_table(part, schema=_empty.schema)
    g = tbl.group_by("chain").aggregate([("n", "sum")])
    return pa.table({"chain": g.column("chain").cast(pa.string()),
                     "n": g.column("n_sum").cast(pa.int64())})


def _q_gopher_flags(sf_dir: str):
    """Gopher-style rule filter (Rae et al. 2021, public paper): per-doc
    word count, mean word length and alphabetic-word fraction as
    integer 1e4-scaled floor ratios, stopword hits, one 0/1 flag per
    rule and the composite keep — all-integer outputs so the DuckDB
    oracle matches bit-for-bit. Map-only (no shuffle)."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.textops import (
        gopher_flags_batch,
    )

    def fn(b):
        t = gopher_flags_batch(b, min_words=30)
        cols = {}
        for c in t.column_names:
            col = t.column(c)
            cols[c] = col.cast(pa.int64()) if col.type == pa.bool_() \
                else col
        return pa.table(cols)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_doc_chunks(sf_dir: str):
    """Fixed-window chunking (RAG / context prep): explode each doc
    into 120-char windows every 90 chars (overlapping), last window
    short. Vectorized ragged gather off the Arrow string buffer —
    map-only flat emit, no shuffle."""
    from apache_datasketches_go_ray.stages.textops import chunk_text_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: chunk_text_batch(b, size=120, stride=90),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_markup_strip(sf_dir: str):
    """HTML boilerplate removal (trafilatura-lite): plant deterministic
    markup around each doc (both engines run the identical plant), then
    strip tags + collapse whitespace with RE2 kernels — the oracle
    reproduces the cleanup value-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.textops import (
        strip_markup_batch,
    )

    def plant_and_strip(b):
        ids = b.column("doc_id").cast(pa.string())
        planted = pc.binary_join_element_wise(
            pa.scalar('<div id="'), ids,
            pa.scalar('"><span>hdr</span> '),
            b.column("text").cast(pa.string()),
            pa.scalar(' <em>ftr</em></div>'), "")
        t = pa.table({"doc_id": b.column("doc_id"),
                      "text": planted})
        return strip_markup_batch(t).select(["doc_id", "clean_text"])

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        plant_and_strip, batch_format="pyarrow", zero_copy_batch=True)


def _q_winsorize_events(sf_dir: str):
    """Grouped winsorized mean: per event_type, clamp cents to the
    exact [p05, p95] discrete quantiles and average — robust-stats
    aggregation with integer-exact outputs. One keyed shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import (
        winsorize_mean_by,
    )

    def prep(b):
        cents = pc.round(pc.multiply(b.column("value"), 100)) \
            .cast(pa.int64())
        return pa.table({"event_type": b.column("event_type"),
                         "cents": cents})

    ds = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True)
    return winsorize_mean_by(ds, "event_type", "cents",
                             lo_q=0.05, hi_q=0.95)


def _q_shard_manifest(sf_dir: str):
    """Training-shard manifest: assign docs (global doc_id order) to
    fixed 50k-char shards via a distributed exact cumulative sum
    (per-bucket sums -> tiny driver prefix fold -> broadcast offsets ->
    one keyed shuffle). The manifest a resumable shard writer consumes."""
    from apache_datasketches_go_ray.stages.mixing import shard_manifest

    return shard_manifest(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        "doc_id", "n_chars", budget=50_000, bucket_size=64)


def _merge_upsert_pipeline(sf_dir: str):
    """(base, merged) datasets for the CDC merge + diff queries: the
    customer table with an integer-cents payload, and the result of
    applying a deterministic change batch (deletes %11=3, updates %7=2,
    inserts %13=5 at key+1e6)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.relational import merge_upsert

    def base_prep(b):
        return pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_name": b.column("c_name").cast(pa.string()),
            "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            "acctbal_cents": pc.round(
                pc.multiply(b.column("c_acctbal"), 100)).cast(pa.int64()),
            "c_mktsegment": b.column("c_mktsegment").cast(pa.string()),
        })

    def changes(b):
        t = base_prep(b)
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        del_m = (k % 11) == 3
        upd_m = ((k % 7) == 2) & ~del_m
        ins_m = (k % 13) == 5
        S = pa.string()
        dels = t.filter(pa.array(del_m)).append_column(
            "op", pa.array(["delete"] * int(del_m.sum()), type=S))
        u = t.filter(pa.array(upd_m))
        upds = pa.table({
            "c_custkey": u.column("c_custkey"),
            "c_name": u.column("c_name"),
            "c_nationkey": u.column("c_nationkey"),
            "acctbal_cents": pc.add(u.column("acctbal_cents"),
                                    pa.scalar(12345, type=pa.int64())),
            "c_mktsegment": pa.array(["UPDATED"] * len(u), type=S),
            "op": pa.array(["upsert"] * len(u), type=S),
        })
        i = t.filter(pa.array(ins_m))
        ins = pa.table({
            "c_custkey": pc.add(i.column("c_custkey"),
                                pa.scalar(1_000_000, type=pa.int64())),
            "c_name": pa.array(["NEW"] * len(i), type=S),
            "c_nationkey": pa.array(np.zeros(len(i), dtype=np.int64)),
            "acctbal_cents": pa.array(np.zeros(len(i), dtype=np.int64)),
            "c_mktsegment": pa.array(["NEW"] * len(i), type=S),
            "op": pa.array(["upsert"] * len(i), type=S),
        })
        return pa.concat_tables([dels, upds, ins])

    base = _read(sf_dir, "customer", None).map_batches(
        base_prep, batch_format="pyarrow", zero_copy_batch=True)
    chg = _read(sf_dir, "customer", None).map_batches(
        changes, batch_format="pyarrow", zero_copy_batch=True)
    return base, merge_upsert(base, chg, "c_custkey")


def _q_merge_upsert(sf_dir: str):
    """CDC MERGE INTO: apply a deterministic change batch (deletes,
    updates, inserts derived from key residues) to the customer table —
    the Delta/Iceberg merge shape as one tagged-union co-partitioning
    shuffle + vectorized per-block resolve."""
    return _merge_upsert_pipeline(sf_dir)[1]


def _q_dataset_diff(sf_dir: str):
    """Snapshot diff (dataset versioning): classify keys as added /
    removed / changed between the customer base and the merge-upsert
    result — composes diff_snapshots over the merge operator, so the
    diff must recover exactly the planted change recipe."""
    from apache_datasketches_go_ray.stages.relational import (
        diff_snapshots,
    )

    base, merged = _merge_upsert_pipeline(sf_dir)
    return diff_snapshots(base, merged, "c_custkey")


def _q_edit_distance_join(sf_dir: str):
    """Similarity self-join on byte edit distance <= 1 over customer
    names — FastSS deletion-neighborhood blocking (complete for ED<=1),
    keyed shuffle, exact vectorized Levenshtein verify."""
    from apache_datasketches_go_ray.stages.dedup_extras import (
        edit_distance_join,
    )

    return edit_distance_join(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_custkey", "c_name")


def _q_bm25_topk(sf_dir: str):
    """BM25 retrieval: top-20 documents for a fixed 3-token query,
    exact global df / N / avgdl, floor-1e-4 rounded scores."""
    from apache_datasketches_go_ray.stages.corpusops import bm25_topk

    return bm25_topk(_read(sf_dir, "documents", ["doc_id", "text"]),
                     ["merge", "join", "window"], k=20)


def _q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5-style multiway star join: lineitem ⋈ orders (1996) ⋈
    customer ⋈ supplier, keep rows where customer and supplier share an
    ASIA nation, sum revenue cents per nation name. Dims (region,
    nation) fold on the driver (tiny) and broadcast; the fact chain is
    three engine hash_joins (broadcast or co-partition by size)."""
    import datetime
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.join import hash_join

    nat = gather_table(_read(sf_dir, "nation", None))
    reg = gather_table(_read(sf_dir, "region", None))
    asia_rk = {int(k) for k, n in zip(
        reg.column("r_regionkey").to_pylist(),
        reg.column("r_name").to_pylist()) if n == "ASIA"}
    names = {int(k): n for k, n, rk in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if int(rk) in asia_rk}
    asia_nations = pa.array(sorted(names), type=pa.int64())

    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1997, 1, 1), type=pa.timestamp("us"))

    def prep_orders(b):
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        t = b.filter(m)
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64()),
        })

    def prep_line(b):
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(prep_orders, batch_format="pyarrow",
                     zero_copy_batch=True)
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"]) \
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda b: pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table({
            "s_suppkey": b.column("s_suppkey").cast(pa.int64()),
            "s_nationkey": b.column("s_nationkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(line, orders, on=("l_orderkey", "o_orderkey"))
    j = hash_join(j, cust, on=("o_custkey", "c_custkey"))
    j = hash_join(j, supp, on=("l_suppkey", "s_suppkey"))

    def local_asia(b):
        m = pc.and_(
            pc.equal(b.column("c_nationkey"), b.column("s_nationkey")),
            pc.is_in(b.column("s_nationkey"), value_set=asia_nations))
        t = b.filter(m)
        g = t.group_by("s_nationkey").aggregate([("cents", "sum")])
        return pa.table({
            "s_nationkey": g.column("s_nationkey"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "n_name": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by("s_nationkey").aggregate([("cents", "sum")])
        nk = g.column("s_nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([names[int(x)] for x in nk],
                               type=pa.string()),
            "revenue_cents": g.column("cents_sum").cast(pa.int64()),
        })

    return (j.map_batches(local_asia, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_retention_cohorts(sf_dir: str):
    """Week-over-week retention triangle over events: cohort = user's
    first-activity week, one row per (cohort_week, active_week) with
    distinct-user counts."""
    from apache_datasketches_go_ray.stages.windows import (
        retention_cohorts,
    )

    return retention_cohorts(_read(sf_dir, "events", ["user_id", "ts"]),
                             "user_id", "ts", epoch_day="2024-01-01")


def _q_events_resample_ffill(sf_dir: str):
    """Per-user hourly resample with forward-fill (time-series gap
    filling): the value at each grid hour is the cents of the latest
    event at-or-before it (event_id tie-break); grid hours before the
    first event emit nothing — SQL ASOF JOIN semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.windows import resample_ffill

    def prep(b):
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "ts": b.column("ts"),
            "event_id": b.column("event_id").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })

    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "value"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True)
    return resample_ffill(ds, "user_id", "ts", "cents",
                          tie_col="event_id")


def _q_user_churn(sf_dir: str):
    """Weekly lifecycle states over events (new / retained /
    resurrected / churned-at-gap) — the standard growth-accounting
    rollup, one keyed shuffle."""
    from apache_datasketches_go_ray.stages.windows import churn_by_week

    return churn_by_week(_read(sf_dir, "events", ["user_id", "ts"]),
                         "user_id", "ts", epoch_day="2024-01-01")


def _q_weighted_median(sf_dir: str):
    """Exact lower weighted median of doc length per source, weighted
    by token count — grouped weighted quantile, integer-exact."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.relational import (
        weighted_median_by,
    )
    from apache_datasketches_go_ray.stages.textops import (
        token_count_batch,
    )

    def prep(b):
        t = token_count_batch(b)
        return pa.table({
            "source": t.column("source"),
            "n_chars": t.column("n_chars").cast(pa.int64()),
            "w": t.column("n_tokens").cast(pa.int64()),
        })

    ds = _read(sf_dir, "documents",
               ["source", "n_chars", "text"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True)
    return weighted_median_by(ds, "source", "n_chars", "w")


def _q_partition_checksums(sf_dir: str):
    """Cross-engine integrity checksums: per doc_id bucket, row count
    plus order-independent sum/xor over a Knuth-hash (id, n_chars) mix
    — the migration-audit primitive."""
    from apache_datasketches_go_ray.stages.relational import (
        partition_checksums,
    )

    return partition_checksums(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        "doc_id", "n_chars", bucket_size=64)


def _q_vocab_drift(sf_dir: str):
    """Adjacent-week vocabulary Jaccard over transcript turns — corpus
    drift monitoring for a continuously ingested corpus."""
    import ray.data
    from apache_datasketches_go_ray.stages.corpusops import (
        vocab_drift_weekly,
    )

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["ts", "text"])
    return vocab_drift_weekly(ds, "ts", "text",
                              epoch_day="2023-11-13")


def _q_jaccard_cross(sf_dir: str):
    """Exact cross-dataset token-set Jaccard join (R-S PPJoin): pairs
    (A-doc, B-doc) with J >= 0.8 between the even- and odd-id halves of
    the documents table — the new-crawl-vs-existing-corpus near-dup
    audit, recall 1.0 by construction."""
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.dedup_extras import (
        jaccard_cross_join,
    )

    def half(par):
        def f(b):
            ids = b.column("doc_id").cast(pa.int64())
            import pyarrow as pa2
            return b.filter(pc.equal(
                pc.bit_wise_and(ids, pa2.scalar(1, type=pa2.int64())),
                pa2.scalar(par, type=pa2.int64())))
        return f

    import pyarrow as pa
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    a = docs.map_batches(half(0), batch_format="pyarrow",
                         zero_copy_batch=True)
    b = docs.map_batches(half(1), batch_format="pyarrow",
                         zero_copy_batch=True)
    return jaccard_cross_join(a, b, tau=0.8, num_partitions=16)


def _q_docs_above_source_p75(sf_dir: str):
    """Per-domain quality gate: keep docs at or above their source's
    exact 75th-percentile length — 'top quartile per domain' curation
    filtering, one keyed shuffle with the threshold computed in the
    same fold that filters."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.relational import (
        filter_above_group_quantile,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def cast(b):
        return pa.table({
            "source": b.column("source"),
            "n_chars": b.column("n_chars").cast(pa.int64()),
            "doc_id": b.column("doc_id").cast(pa.int64()),
        })

    ds = ds.map_batches(cast, batch_format="pyarrow",
                        zero_copy_batch=True)
    return filter_above_group_quantile(ds, "source", "n_chars", 0.75,
                                       carry_cols=["doc_id"])


def _q_rolling_median_cents(sf_dir: str):
    """Per-user rolling lower median of event value over the last 7
    rows (ts, event_id order) — the robust streaming smoother, exact
    and window-function-reproducible."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.windows import (
        rolling_quantile,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(b):
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "ts": b.column("ts"),
            "event_id": b.column("event_id").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })

    ds = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)
    return rolling_quantile(ds, "user_id", "ts", "cents", window=7,
                            q=0.5, tie_col="event_id")


def _q_events_cube(sf_dir: str):
    """Full CUBE(event_type, isodow): all four grouping sets — (type,
    dow), (type), (dow), () — folded from one fine-grid combiner pass;
    'ALL' marks the rolled-up dimension(s)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        t = pa.table({
            "event_type": b.column("event_type"),
            "dow": pc.day_of_week(b.column("ts"), count_from_zero=False,
                                  week_start=1).cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by(["event_type", "dow"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "dow": g.column("dow").cast(pa.string()),
            "sum_cents": g.column("cents_sum").cast(pa.int64()),
            "n": g.column("cents_count").cast(pa.int64()),
        })

    def expand(b):
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "dow": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "sum_cents": pa.array([], type=pa.int64()),
        })
        if len(b) == 0:
            return empty

        def agg(keys):
            if keys:
                g = b.group_by(keys).aggregate(
                    [("sum_cents", "sum"), ("n", "sum")])
            else:
                g = pa.table({
                    "sum_cents_sum": pa.array(
                        [pc.sum(b.column("sum_cents")).as_py() or 0],
                        type=pa.int64()),
                    "n_sum": pa.array(
                        [pc.sum(b.column("n")).as_py() or 0],
                        type=pa.int64()),
                })
            n = len(g)
            return pa.table({
                "event_type": (g.column("event_type")
                               if "event_type" in keys
                               else pa.array(["ALL"] * n,
                                             type=pa.string())),
                "dow": (g.column("dow").cast(pa.string())
                        if "dow" in keys
                        else pa.array(["ALL"] * n, type=pa.string())),
                "n": g.column("n_sum").cast(pa.int64()),
                "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
            })

        return pa.concat_tables([
            agg(["event_type", "dow"]), agg(["event_type"]),
            agg(["dow"]), agg([]),
        ])

    return (_read(sf_dir, "events", ["event_type", "ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(expand, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_cluster_representatives(sf_dir: str):
    """Keep-best curation over the flagship near-dup clusters: one
    representative conversation per cluster (most turns, conv_id
    tie-break) plus cluster size — what a training-data pipeline ships
    after dedup instead of dropping all members."""
    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup
    from apache_datasketches_go_ray.stages.cluster import (
        cluster_representatives,
    )

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    turns = ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id"])
    return cluster_representatives(res["clusters"], turns) \
        .sort(["cluster_id"])


def _q_user_session_bounds(sf_dir: str):
    """Sessionize the event stream per user at >12h inactivity gaps —
    the same split_conversations operator that breaks agent transcripts
    at real pauses, run generically over (user_id, ts). One keyed
    shuffle, vectorized segment diff; exact and window-function
    reproducible."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.assemble import (
        split_conversations,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b):
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "t_us": b.column("ts").cast(pa.timestamp("us"))
                .cast(pa.int64()),
            "ts": b.column("ts"),
        })

    ds = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)
    return split_conversations(ds, gap_us=43_200_000_000,
                               key_col="user_id", order_col="t_us",
                               ts_col="ts", num_partitions=8)


def _q_user_value_trend(sf_dir: str):
    """Per-user spend trend as an exact integer rational slope
    (num/den) over (hours since 2024-01-01, cents) — drift detection
    with no float in the pipeline, so it is value-exact across engines
    and partitionings. Distributive-moment fold: per-block 5-tuple
    partials, one keyed exchange, final algebra."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.relational import (
        grouped_linear_trend,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b):
        t_us = b.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        # hours since 2024-01-01 keeps every product comfortably int64
        x = t_us // 3_600_000_000 - 473352
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "x_hours": pa.array(x.astype(np.int64)),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
        })

    ds = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)
    return grouped_linear_trend(ds, "user_id", "x_hours", "cents",
                                num_partitions=8)


def _q_event_type_cooccurrence(sf_dir: str):
    """Unordered event-type pair co-engagement: for every pair (a < b),
    how many users emitted BOTH types — market-basket affinity. Exact:
    per-block distinct combiner, one user-keyed shuffle, per-key pair
    expansion bounded by the (small) type domain."""
    from apache_datasketches_go_ray.stages.relational import (
        cooccurrence_counts,
    )

    return cooccurrence_counts(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        "user_id", "event_type", num_partitions=8)


def _copurchase_edges(sf_dir: str):
    """Co-purchase graph: part pairs appearing together in >= 2 distinct
    orders (the >= 2 threshold prunes incidental one-order pairings the
    way a min-support rule does). Edge derivation reuses the
    market-basket co-occurrence combiner, so the only new shuffles are
    the graph operator's own."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.relational import (
        cooccurrence_counts,
    )

    pairs = cooccurrence_counts(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        "l_orderkey", "l_partkey", num_partitions=8)

    def to_edges(b):
        t = b.filter(pc.greater_equal(b.column("n_keys"), 2))
        return pa.table({"a": t.column("item_a").cast(pa.int64()),
                         "b": t.column("item_b").cast(pa.int64())})

    return pairs.map_batches(to_edges, batch_format="pyarrow",
                             zero_copy_batch=True)


def _q_part_copurchase_components(sf_dir: str):
    """Generic distributed connected components (the flagship's
    large/small-star union-find lifted to ANY edge table) over the
    co-purchase graph: which parts form connected substitution/bundle
    families. Label = minimum part key in the component; value-exact vs
    a recursive-CTE min-label-propagation oracle."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.graph import (
        connected_components,
    )

    comp = connected_components(_copurchase_edges(sf_dir), "a", "b",
                                num_partitions=8)
    return comp.map_batches(
        lambda b: pa.table({"part_key": b.column("node"),
                            "component": b.column("component")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_part_copurchase_triangles(sf_dir: str):
    """Exact per-node triangle participation counts over the co-purchase
    graph (compact-forward: degree-ordered orientation bounds wedge
    fan-out, closure is a keyed co-partition against the edge set —
    never a broadcast, never all-pairs). Value-exact vs a three-way
    self-join oracle."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.graph import triangle_counts

    tri = triangle_counts(_copurchase_edges(sf_dir), "a", "b",
                          num_partitions=8)
    return tri.map_batches(
        lambda b: pa.table({"part_key": b.column("node"),
                            "n_triangles": b.column("n_triangles")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_part_copurchase_pagerank(sf_dir: str):
    """Deterministic integer PageRank (ppb scale, damping 17/20, 3
    iterations) over the co-purchase graph — 'which parts anchor the
    bundle graph'. Every intermediate is int64 floor arithmetic, so the
    distributed run is bit-identical to a chained-CTE SQL oracle and
    partition-independent."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.graph import pagerank_ppb

    pr = pagerank_ppb(_copurchase_edges(sf_dir), "a", "b",
                      iterations=3, num_partitions=8)
    return pr.map_batches(
        lambda b: pa.table({"part_key": b.column("node"),
                            "rank_ppb": b.column("rank_ppb")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_part_copurchase_hops(sf_dir: str):
    """Exact BFS hop distances from the smallest part key in the
    co-purchase graph (<= 8 hops): frontier-expansion rounds, settled
    set maintained by keyed co-partition — a reachability/blast-radius
    primitive. Value-exact vs a recursive-CTE min-hop oracle."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.graph import bfs_hops

    d = bfs_hops(_copurchase_edges(sf_dir), "a", "b", max_hops=8,
                 num_partitions=8)
    return d.map_batches(
        lambda b: pa.table({"part_key": b.column("node"),
                            "hops": b.column("hops")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_part_copurchase_kcore(sf_dir: str):
    """2-core of the co-purchase graph (iterative peeling of degree-<2
    nodes): the cyclic backbone of the bundle graph, with each
    survivor's within-core degree. Rows-only at the gate (the peeling
    fixpoint is iterative, not SQL-expressible in plain CTEs); brute
    parity across partitionings is pinned by tests/test_graph.py."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.graph import kcore

    out = kcore(_copurchase_edges(sf_dir), "a", "b", k=2,
                num_partitions=8)
    return out.map_batches(
        lambda b: pa.table({"part_key": b.column("node"),
                            "core_deg": b.column("core_deg")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_leakage_safe_split(sf_dir: str):
    """Train/eval split that cannot leak near-duplicates: every member
    of a flagship near-dup cluster inherits its CLUSTER's murmur
    bucket, so clusters land wholly on one side; unclustered convs
    split by their own id hash. Rows-only at the driver gate (cluster
    labels come from the MinHash pipeline); whole-cluster cohesion and
    the bucket rule are pinned by pytest oracles."""
    import ray.data

    from apache_datasketches_go_ray.pipelines.dedup import run_dedup
    from apache_datasketches_go_ray.stages.cluster import (
        leakage_safe_split,
    )

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    turns = ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id"])
    return leakage_safe_split(res["clusters"], turns,
                              eval_permille=100, seed=9001)


def _q_weighted_sample_docs(sf_dir: str):
    """Deterministic weighted sample without replacement (priority /
    sequential-Poisson sampling, Duffield-Lund-Thorup): keep the k rows
    with the largest integer priority (w << 32) // h where h is a
    Knuth-multiplicative hash of the key and w = n_chars — long docs
    proportionally likelier, result exact and engine-independent.
    Mergeable top-k, so per-block partials + one tiny gather, no
    shuffle."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.relational import top_k

    def prep(b):
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        w = b.column("n_chars").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = (ids * 2654435761) % 4294967296 + 1
        # w*2^32 fits int64 for any n_chars < 2^31 — pure vector math
        pri = (w * 4294967296) // h
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_chars": pa.array(w, type=pa.int64()),
            "priority": pa.array(pri, type=pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return top_k(ds, [("priority", "descending"),
                      ("doc_id", "ascending")], k=100)


def _q_purchase_click_attribution(sf_dir: str):
    """Last-touch attribution: each purchase event matched to the same
    user's most recent click at or before it (tie-break greatest click
    id), kept only when the click is within a 7-day lookback — the
    standard marketing-attribution as-of self-join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def side(kind, id_name, ts_dup):
        def f(b):
            t = b.filter(pc.equal(b.column("event_type"), kind))
            cols = {
                id_name: t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
            }
            if ts_dup:
                cols[ts_dup] = t.column("ts").cast(pa.timestamp("us"))
            return pa.table(cols)
        return f

    purchases = ev.map_batches(side("purchase", "event_id", None),
                               batch_format="pyarrow",
                               zero_copy_batch=True)
    clicks = ev.map_batches(side("click", "click_id", "click_ts"),
                            batch_format="pyarrow", zero_copy_batch=True)
    j = asof_join(purchases, clicks, on=("user_id", "user_id"),
                  ts=("ts", "ts"), tie_break="click_id",
                  left_cols=["event_id"],
                  right_cols=["click_id", "click_ts"],
                  num_partitions=8)

    def window(b):
        if len(b) == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "click_id": pa.array([], type=pa.int64()),
                "click_ts": pa.array([], type=pa.timestamp("us")),
            })
        gap = pc.subtract(b.column("ts").cast(pa.timestamp("us"))
                          .cast(pa.int64()),
                          b.column("click_ts").cast(pa.int64()))
        t = b.filter(pc.less_equal(gap, 604_800_000_000))
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "user_id": t.column("user_id").cast(pa.int64()),
            "ts": t.column("ts").cast(pa.timestamp("us")),
            "click_id": t.column("click_id").cast(pa.int64()),
            "click_ts": t.column("click_ts").cast(pa.timestamp("us")),
        })

    return j.map_batches(window, batch_format="pyarrow",
                         zero_copy_batch=True)


def _q_nation_pair_volume(sf_dir: str):
    """TPC-H Q7-style cross-nation trade volume: revenue cents per
    (supplier nation, customer nation, ship year) over 1996-1997
    shipments between DIFFERENT nations. Fact chain is three engine
    hash_joins; the two nation dims fold on the driver and broadcast
    as lookup arrays."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.join import hash_join

    nat = gather_table(_read(sf_dir, "nation", None))
    names = {int(k): n for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}

    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1998, 1, 1), type=pa.timestamp("us"))

    def prep_line(b):
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi))
        t = b.filter(m)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
            "l_year": pc.year(t.column("l_shipdate")).cast(pa.int64()),
            "cents": pa.array(cents),
        })

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"]) \
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(lambda b: pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda b: pa.table({
            "s_suppkey": b.column("s_suppkey").cast(pa.int64()),
            "s_nationkey": b.column("s_nationkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(line, orders, on=("l_orderkey", "o_orderkey"))
    j = hash_join(j, cust, on=("o_custkey", "c_custkey"))
    j = hash_join(j, supp, on=("l_suppkey", "s_suppkey"))

    def partial(b):
        t = b.filter(pc.not_equal(b.column("s_nationkey"),
                                  b.column("c_nationkey")))
        g = t.group_by(["s_nationkey", "c_nationkey", "l_year"]) \
            .aggregate([("cents", "sum")])
        return pa.table({
            "s_nationkey": g.column("s_nationkey").cast(pa.int64()),
            "c_nationkey": g.column("c_nationkey").cast(pa.int64()),
            "l_year": g.column("l_year").cast(pa.int64()),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "supp_nation": pa.array([], type=pa.string()),
                "cust_nation": pa.array([], type=pa.string()),
                "l_year": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["s_nationkey", "c_nationkey", "l_year"]) \
            .aggregate([("cents", "sum")])
        sn = [names[int(x)] for x in
              g.column("s_nationkey").to_pylist()]
        cn = [names[int(x)] for x in
              g.column("c_nationkey").to_pylist()]
        return pa.table({
            "supp_nation": pa.array(sn, type=pa.string()),
            "cust_nation": pa.array(cn, type=pa.string()),
            "l_year": g.column("l_year").cast(pa.int64()),
            "revenue_cents": g.column("cents_sum").cast(pa.int64()),
        })

    return (j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13-style customer distribution: histogram of customers by
    their order count INCLUDING zero-order customers (left outer join
    semantics without the join — per-block order-count combiner, one
    customer-keyed fold, then the zero bucket from customer-count minus
    matched customers)."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.relational import (
        grouped_count_distribution,
    )

    n_cust = int(gather_table(
        _read(sf_dir, "customer", ["c_custkey"])).num_rows)
    orders = _read(sf_dir, "orders", ["o_custkey"]) \
        .map_batches(lambda b: pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count_distribution(orders, "o_custkey",
                                      total_keys=n_cust,
                                      num_partitions=8)


def _q_large_volume_customers(sf_dir: str):
    """TPC-H Q18-style large-volume orders: orders whose total lineitem
    quantity exceeds a threshold, with customer name and order facts —
    per-block quantity partials, one order-keyed fold + filter (the
    having-clause pushdown), then two small joins for the dims."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import auto_partitions
    from apache_datasketches_go_ray.stages.join import hash_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(b):
        q = pc.round(pc.multiply(b.column("l_quantity"), 100)) \
            .cast(pa.int64())
        t = pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "qc": q,
        })
        g = t.group_by("l_orderkey").aggregate([("qc", "sum")])
        return pa.table({
            "l_orderkey": g.column("l_orderkey"),
            "qc": g.column("qc_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "l_orderkey": pa.array([], type=pa.int64()),
                "total_qty_c": pa.array([], type=pa.int64()),
            })
        g = b.group_by("l_orderkey").aggregate([("qc", "sum")])
        t = pa.table({
            "l_orderkey": g.column("l_orderkey").cast(pa.int64()),
            "total_qty_c": g.column("qc_sum").cast(pa.int64()),
        })
        return t.filter(pc.greater(t.column("total_qty_c"), 21000))

    P = auto_partitions(line.count(), 2_000_000, 8)
    big = (line.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .repartition(P, keys=["l_orderkey"])
           .map_batches(fold, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderdate"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "o_totalprice_c": pc.round(pc.multiply(
                b.column("o_totalprice"), 100)).cast(pa.int64()),
            "o_orderdate": b.column("o_orderdate"),
        }), batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]) \
        .map_batches(lambda b: pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_name": b.column("c_name").cast(pa.string()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(big, orders, on=("l_orderkey", "o_orderkey"))
    j = hash_join(j, cust, on=("o_custkey", "c_custkey"))
    return j.map_batches(lambda b: pa.table({
        "o_orderkey": b.column("l_orderkey").cast(pa.int64()),
        "c_name": b.column("c_name").cast(pa.string()),
        "o_orderdate": b.column("o_orderdate"),
        "o_totalprice_c": b.column("o_totalprice_c").cast(pa.int64()),
        "total_qty_c": b.column("total_qty_c").cast(pa.int64()),
    }), batch_format="pyarrow", zero_copy_batch=True)


def _q_returned_item_revenue(sf_dir: str):
    """TPC-H Q10-style returned-item report: lost revenue cents per
    customer from 'R'-flagged lineitems on 1996-H2 orders, top 20
    customers with name and nation — two hash_joins, a per-block
    combiner, a customer-keyed fold, and a mergeable top-k."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.join import hash_join
    from apache_datasketches_go_ray.stages.relational import top_k

    nat = gather_table(_read(sf_dir, "nation", None))
    names = {int(k): n for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}

    lo = pa.scalar(datetime.datetime(1996, 7, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1997, 1, 1), type=pa.timestamp("us"))

    def prep_line(b):
        t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })

    def prep_orders(b):
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        t = b.filter(m)
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64()),
        })

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_extendedprice",
                  "l_discount"]) \
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(prep_orders, batch_format="pyarrow",
                     zero_copy_batch=True)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(lambda b: pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_name": b.column("c_name").cast(pa.string()),
            "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(line, orders, on=("l_orderkey", "o_orderkey"))
    j = hash_join(j, cust, on=("o_custkey", "c_custkey"))

    def partial(b):
        g = b.group_by(["o_custkey", "c_name", "c_nationkey"]) \
            .aggregate([("cents", "sum")])
        return pa.table({
            "c_custkey": g.column("o_custkey").cast(pa.int64()),
            "c_name": g.column("c_name").cast(pa.string()),
            "c_nationkey": g.column("c_nationkey").cast(pa.int64()),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "c_custkey": pa.array([], type=pa.int64()),
                "c_name": pa.array([], type=pa.string()),
                "n_name": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["c_custkey", "c_name", "c_nationkey"]) \
            .aggregate([("cents", "sum")])
        nn = [names[int(x)] for x in
              g.column("c_nationkey").to_pylist()]
        return pa.table({
            "c_custkey": g.column("c_custkey").cast(pa.int64()),
            "c_name": g.column("c_name").cast(pa.string()),
            "n_name": pa.array(nn, type=pa.string()),
            "revenue_cents": g.column("cents_sum").cast(pa.int64()),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
           .repartition(1)
           .map_batches(fold, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True))
    return top_k(agg, [("revenue_cents", "descending"),
                       ("c_custkey", "ascending")], k=20)


def _q_image_near_dups(sf_dir: str):
    """Perceptual image near-dup pairs: real BMP decode (actor pool)
    -> 64-bit dHash per image -> the SAME generic 4x16-bit Hamming
    banding the text SimHash path uses (exact recall at radius 3 by
    pigeonhole). Rows-only (hash outputs); engine-vs-brute parity and
    planted-dup recall pinned by pytest."""
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        image_dhash_near_dups, make_near_dup_image_batch,
    )

    # mixed crawl scenario: uncompressed BMPs + real JPEGs cycling
    # 4:4:4 / 4:2:0 / 4:2:2 chroma layouts through the same decode ->
    # dHash -> Hamming-banding path (functions/jpegcodec.py)
    bmp = make_near_dup_image_batch(64, 24, kind="image/bmp")
    jpg = make_near_dup_image_batch(32, 8, kind="image/jpeg", seed=19)
    import pyarrow as pa
    jpg = jpg.set_column(
        0, "media_id",
        pa.array([i + 1000 for i in
                  jpg.column("media_id").to_pylist()], type=pa.int64()))
    media = ray.data.from_arrow(bmp).union(ray.data.from_arrow(jpg))
    return image_dhash_near_dups(media, fake=False, max_hamming=3,
                                 num_partitions=8)


def _q_supplier_nation_rollup(sf_dir: str):
    """Supplier footprint per (region, nation): count and exact
    account-balance cents — the two dim tables fold on the driver and
    broadcast as lookup maps; one combiner + tiny fold on the fact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table

    nat = gather_table(_read(sf_dir, "nation", None))
    reg = gather_table(_read(sf_dir, "region", None))
    rname = dict(zip(reg.column("r_regionkey").to_pylist(),
                     reg.column("r_name").to_pylist()))
    nk2name = {int(k): n for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}
    nk2region = {int(k): rname[int(r)] for k, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_regionkey").to_pylist())}

    def partial(b):
        t = pa.table({
            "nk": b.column("s_nationkey").cast(pa.int64()),
            "bal_c": pc.round(pc.multiply(b.column("s_acctbal"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by("nk").aggregate(
            [([], "count_all"), ("bal_c", "sum")])
        return pa.table({
            "nk": g.column("nk"),
            "n": g.column("count_all").cast(pa.int64()),
            "bal_c": g.column("bal_c_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "r_name": pa.array([], type=pa.string()),
                "n_name": pa.array([], type=pa.string()),
                "n_suppliers": pa.array([], type=pa.int64()),
                "acctbal_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by("nk").aggregate([("n", "sum"), ("bal_c", "sum")])
        nk = [int(x) for x in g.column("nk").to_pylist()]
        return pa.table({
            "r_name": pa.array([nk2region[k] for k in nk],
                               type=pa.string()),
            "n_name": pa.array([nk2name[k] for k in nk],
                               type=pa.string()),
            "n_suppliers": g.column("n_sum").cast(pa.int64()),
            "acctbal_cents": g.column("bal_c_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_source_lang_crosstab(sf_dir: str):
    """Corpus composition crosstab: doc count and exact char mass per
    (source, lang) cell — the mixing-plan denominator table. Two-key
    combiner + tiny keyed fold."""
    import pyarrow as pa

    def partial(b):
        t = pa.table({
            "source": b.column("source").cast(pa.string()),
            "lang": b.column("lang").cast(pa.string()),
            "nc": b.column("n_chars").cast(pa.int64()),
        })
        g = t.group_by(["source", "lang"]).aggregate(
            [([], "count_all"), ("nc", "sum")])
        return pa.table({
            "source": g.column("source"),
            "lang": g.column("lang"),
            "n_docs": g.column("count_all").cast(pa.int64()),
            "total_chars": g.column("nc_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "total_chars": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["source", "lang"]).aggregate(
            [("n_docs", "sum"), ("total_chars", "sum")])
        return pa.table({
            "source": g.column("source").cast(pa.string()),
            "lang": g.column("lang").cast(pa.string()),
            "n_docs": g.column("n_docs_sum").cast(pa.int64()),
            "total_chars": g.column("total_chars_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "documents", ["source", "lang", "n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["source", "lang"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_monthly_revenue_growth(sf_dir: str):
    """Month-over-month order revenue with the exact cents delta vs the
    previous month — the KPI trend table. Per-block month partials fold
    to one tiny block where the lag is a shifted view."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        t = pa.table({
            "month": pc.strftime(b.column("o_orderdate"), format="%Y-%m"),
            "cents": pc.round(pc.multiply(b.column("o_totalprice"), 100))
                .cast(pa.int64()),
        })
        g = t.group_by("month").aggregate([("cents", "sum")])
        return pa.table({
            "month": g.column("month"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "month": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
                "delta_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by("month").aggregate([("cents", "sum")])
        m = g.column("month").to_numpy(zero_copy_only=False)
        c = g.column("cents_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(m)
        m, c = m[order], c[order]
        delta = np.zeros(len(c), dtype=np.int64)
        delta[1:] = c[1:] - c[:-1]
        return pa.table({
            "month": pa.array(m, type=pa.string()),
            "revenue_cents": pa.array(c),
            "delta_cents": pa.array(delta),
        })

    return (_read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_event_type_transitions(sf_dir: str):
    """Per-user event-type Markov edge list: counts of consecutive
    (type -> next type) transitions in (ts, event_id) order — the
    behavioral-flow graph. User-keyed shuffle + in-block adjacency
    fold (type²-bounded partials, tiny driver-side finish)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.context import auto_partitions

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    _empty = pa.table({"chain": pa.array([], type=pa.string()),
                       "n": pa.array([], type=pa.int64())})

    def partial(b):
        if len(b) < 2:
            return _empty
        u = b.column("user_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = b.column("event_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        types, rcodes = np.unique(
            as_array(b.column("event_type"))
            .to_numpy(zero_copy_only=False), return_inverse=True)
        order = np.lexsort((e, t, u))
        us, r = u[order], rcodes[order]
        same = us[1:] == us[:-1]
        a, nxt = r[:-1][same], r[1:][same]
        if len(a) == 0:
            return _empty
        key = a * len(types) + nxt
        uk, cnt = np.unique(key, return_counts=True)
        ta = pa.array(types[uk // len(types)])
        tb = pa.array(types[uk % len(types)])
        return pa.table({
            "chain": pc.binary_join_element_wise(ta, tb, " -> "),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def fold(b):
        if len(b) == 0:
            return _empty
        g = b.group_by("chain").aggregate([("n", "sum")])
        return pa.table({
            "chain": g.column("chain").cast(pa.string()),
            "n": g.column("n_sum").cast(pa.int64()),
        })

    P = auto_partitions(ds.count(), 2_000_000, 8)
    return (ds.repartition(P, keys=["user_id"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_event_type_lift(sf_dir: str):
    """Market-basket LIFT per unordered event-type pair: n_ab * N *
    1e4 // (n_a * n_b) in exact integer arithmetic — which behaviors
    co-occur beyond chance. Distributed: cooccurrence pair counts +
    per-type distinct-user marginals; only the type²-bounded finals
    reach the driver."""
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.relational import (
        cooccurrence_counts, distinct_count_by,
    )

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    pairs = gather_table(cooccurrence_counts(
        ev, "user_id", "event_type", num_partitions=8))
    marg = gather_table(distinct_count_by(
        ev, "event_type", "user_id", num_partitions=8))
    mcol = [c for c in marg.column_names if c != "event_type"][0]
    n_of = dict(zip(marg.column("event_type").to_pylist(),
                    marg.column(mcol).to_pylist()))
    # N = distinct users overall: exact distinct via one extra fold
    import pyarrow.compute as pc

    def du(b):
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
        }).group_by("user_id").aggregate([])

    users = gather_table(
        ev.map_batches(du, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(4, keys=["user_id"])
        .map_batches(du, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True))
    N = users.num_rows
    a = pairs.column("item_a").to_pylist()
    b_ = pairs.column("item_b").to_pylist()
    nk = pairs.column("n_keys").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    na = np.array([n_of[x] for x in a], dtype=np.int64)
    nb = np.array([n_of[x] for x in b_], dtype=np.int64)
    lift = nk * N * 10000 // (na * nb)
    return ray.data.from_arrow(pa.table({
        "item_a": pa.array(a, type=pa.string()),
        "item_b": pa.array(b_, type=pa.string()),
        "n_keys": pa.array(nk),
        "lift_e4": pa.array(lift),
    }))


def _q_dedup_lineage_report(sf_dir: str):
    """The flagship's lineage/metrics surface as a queryable table:
    one row per pipeline stage with its output row count and wall
    seconds (the north_rule's 'per-partition lineage + metrics'
    contract, exposed as data instead of a JSON sidecar). Rows-only —
    timings are nondeterministic; the row COUNT (one per stage) and
    stage names are stable."""
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.pipelines.dedup import run_dedup

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    stages = res["metrics"]["stages"]
    names = sorted(stages)
    return ray.data.from_arrow(pa.table({
        "stage": pa.array(names, type=pa.string()),
        "rows": pa.array([int(stages[s].get("rows") or -1)
                          for s in names], type=pa.int64()),
        "seconds": pa.array([float(stages[s].get("sec") or 0.0)
                             for s in names], type=pa.float64()),
    }))


def _q_decontamination_pairs(sf_dir: str):
    """Contamination provenance: (train_doc, eval_doc) pairs sharing
    >= 1 distinct 13-gram under the deterministic train/eval split,
    with the shared-gram count — not just the decontamination flag but
    WHICH eval doc leaked into WHICH train doc. Gram-keyed shuffle +
    in-block pair expansion + pair fold."""
    from apache_datasketches_go_ray.stages.decontaminate import (
        contamination_pairs,
    )

    return contamination_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        n=13, eval_pct=10, num_partitions=8)


def _q_video_near_dups(sf_dir: str):
    """Near-duplicate video clips: real ISO-BMFF frame sampling ->
    per-frame dHash -> majority-vote 64-bit clip fingerprint (one
    clip-keyed fold; frames never re-ship) -> the shared Hamming
    banding. Rows-only; engine-vs-brute parity + planted recall pinned
    by pytest."""
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        make_near_dup_video_batch, video_near_dups,
    )

    media = ray.data.from_arrow(make_near_dup_video_batch(48, 16))
    return video_near_dups(media, every_k=3, max_hamming=3,
                           num_partitions=8)


def _q_audio_near_dups(sf_dir: str):
    """Near-duplicate audio clips: real WAV decode -> 64-bit
    energy-envelope fingerprint -> the same generic Hamming banding as
    text SimHash and image dHash (one banding/shuffle plan across all
    three modalities). Rows-only; engine-vs-brute parity and planted
    recall pinned by pytest."""
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        audio_near_dups, make_near_dup_audio_batch,
    )

    media = ray.data.from_arrow(make_near_dup_audio_batch(96, 32))
    return audio_near_dups(media, fake=False, max_hamming=3,
                           num_partitions=8)


def _q_corpus_summary(sf_dir: str):
    """One-row dataset card: doc/source/lang counts, exact char and
    whitespace-token totals, min/max doc length — the header block of
    a corpus datasheet. Per-block partials (counts, sums, block-local
    distinct label sets) folded to one row; label domains are small so
    the distinct fold ships a few dozen strings, never rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        toks = pc.count_substring_regex(
            pc.utf8_trim_whitespace(b.column("text")), r"\S+") \
            .cast(pa.int64())
        nc = b.column("n_chars").cast(pa.int64())
        srcs = pc.unique(b.column("source").cast(pa.string()))
        langs = pc.unique(b.column("lang").cast(pa.string()))
        pad = max(len(srcs), len(langs), 1)

        def col(v, typ):
            return pa.array([v] + [None] * (pad - 1), type=typ)

        return pa.table({
            "n_docs": col(len(b), pa.int64()),
            "total_chars": col(pc.sum(nc).as_py() or 0, pa.int64()),
            "total_tokens": col(pc.sum(toks).as_py() or 0, pa.int64()),
            "min_chars": col(pc.min(nc).as_py(), pa.int64()),
            "max_chars": col(pc.max(nc).as_py(), pa.int64()),
            "src": pa.concat_arrays(
                [srcs.cast(pa.string()),
                 pa.nulls(pad - len(srcs), pa.string())]),
            "lng": pa.concat_arrays(
                [langs.cast(pa.string()),
                 pa.nulls(pad - len(langs), pa.string())]),
        })

    def fold(b):
        n = pc.sum(b.column("n_docs")).as_py() or 0
        return pa.table({
            "n_docs": pa.array([n], type=pa.int64()),
            "n_sources": pa.array(
                [len(pc.drop_null(pc.unique(b.column("src"))))],
                type=pa.int64()),
            "n_langs": pa.array(
                [len(pc.drop_null(pc.unique(b.column("lng"))))],
                type=pa.int64()),
            "total_chars": pa.array(
                [pc.sum(b.column("total_chars")).as_py() or 0],
                type=pa.int64()),
            "total_tokens": pa.array(
                [pc.sum(b.column("total_tokens")).as_py() or 0],
                type=pa.int64()),
            "min_chars": pa.array(
                [pc.min(b.column("min_chars")).as_py()],
                type=pa.int64()),
            "max_chars": pa.array(
                [pc.max(b.column("max_chars")).as_py()],
                type=pa.int64()),
        })

    return (_read(sf_dir, "documents",
                  ["text", "n_chars", "source", "lang"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_conv_role_char_ratio(sf_dir: str):
    """Per-conversation assistant/user character balance (who does the
    talking): exact char sums by role and the assistant:user ratio in
    basis points (integer, exact) — SFT-mix QA signal. Per-block
    (conv, role) partials, one conv-keyed fold with an in-block
    pivot."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "role", "text"])

    def partial(b):
        import pyarrow.compute as pc
        t = pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            "role": b.column("role").cast(pa.string()),
            "nc": pc.binary_length(b.column("text")).cast(pa.int64()),
        })
        g = t.group_by(["conv_id", "role"]).aggregate([("nc", "sum")])
        return pa.table({
            "conv_id": g.column("conv_id"),
            "role": g.column("role"),
            "nc": g.column("nc_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "user_chars": pa.array([], type=pa.int64()),
                "assistant_chars": pa.array([], type=pa.int64()),
                "ratio_bp": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["conv_id", "role"]).aggregate([("nc", "sum")])
        conv = g.column("conv_id").to_numpy(zero_copy_only=False)
        role = g.column("role").to_numpy(zero_copy_only=False)
        nc = g.column("nc_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(conv, return_inverse=True)
        uc = np.zeros(len(uniq), dtype=np.int64)
        ac = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(uc, inv[role == "user"], nc[role == "user"])
        np.add.at(ac, inv[role == "assistant"], nc[role == "assistant"])
        ratio = ac * 10000 // np.maximum(uc, 1)
        return pa.table({
            "conv_id": pa.array(uniq, type=pa.string()),
            "user_chars": pa.array(uc),
            "assistant_chars": pa.array(ac),
            "ratio_bp": pa.array(ratio),
        })

    from apache_datasketches_go_ray.stages.context import auto_partitions

    P = auto_partitions(ds.count(), 1_000_000, 8)
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(P, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_nchars_histogram_by_source(sf_dir: str):
    """Per-source fixed-width length histogram (the per-domain length
    profile a mixing plan is sanity-checked against): 200-char buckets
    with count and exact cumulative char mass per (source, bucket) —
    two-key in-block combiner + tiny keyed fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        n = b.column("n_chars").cast(pa.int64())
        t = pa.table({
            "source": b.column("source").cast(pa.string()),
            "bucket": pc.divide(n, 200),
            "n_chars": n,
        })
        g = t.group_by(["source", "bucket"]).aggregate(
            [("n_chars", "count"), ("n_chars", "sum")])
        return pa.table({
            "source": g.column("source"),
            "bucket": g.column("bucket"),
            "n": g.column("n_chars_count").cast(pa.int64()),
            "sum_chars": g.column("n_chars_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "bucket": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "sum_chars": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["source", "bucket"]).aggregate(
            [("n", "sum"), ("sum_chars", "sum")])
        return pa.table({
            "source": g.column("source").cast(pa.string()),
            "bucket": g.column("bucket").cast(pa.int64()),
            "n": g.column("n_sum").cast(pa.int64()),
            "sum_chars": g.column("sum_chars_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(4, keys=["source", "bucket"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_tool_cooccurrence(sf_dir: str):
    """Which tools get used TOGETHER in one conversation: unordered
    tool-pair counts over conversations (the cooccurrence_counts
    operator on the transcript axis, empty tool rows excluded)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from apache_datasketches_go_ray.stages.relational import (
        cooccurrence_counts,
    )

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "tool"])

    def prep(b):
        t = b.filter(pc.not_equal(b.column("tool"), ""))
        return pa.table({
            "conv_id": t.column("conv_id").cast(pa.string()),
            "tool": t.column("tool").cast(pa.string()),
        })

    ds = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)
    return cooccurrence_counts(ds, "conv_id", "tool",
                               num_partitions=8)


def _q_conv_length_by_depth(sf_dir: str):
    """Conversation length distribution by depth: for each turn count,
    how many conversations and the exact median assembled char length
    — the context-window planning table. Composition: the flagship
    assemble stats feed grouped_quantile_disc keyed on n_turns.
    Output: (n_turns, q50)."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
    )

    stats = _q_transcript_assemble(sf_dir)

    def prep(b):
        return pa.table({
            "n_turns": b.column("n_turns").cast(pa.int64()),
            "n_chars": b.column("n_chars").cast(pa.int64()),
        })

    ds = stats.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
    return grouped_quantile_disc(ds, "n_turns", "n_chars", (0.5,),
                                 num_partitions=4)


def _q_latest2_orders_per_customer(sf_dir: str):
    """Retention-compaction shape: the latest 2 orders per customer
    (order-date desc, orderkey desc) — grouped bottom-k on negated
    sort columns; per-block combiner caps shuffle volume at
    2 x customers x blocks rows."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.relational import (
        grouped_bottom_k,
    )

    def prep(b):
        return pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "od_us": b.column("o_orderdate").cast(pa.timestamp("us"))
                .cast(pa.int64()),
        })

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_bottom_k(ds, "o_custkey",
                            [("od_us", "descending"),
                             ("o_orderkey", "descending")],
                            k=2, num_partitions=8)


def _q_order_fulfillment_span(sf_dir: str):
    """Per-order fulfilment facts: line count, first/last ship date and
    the order-to-last-ship span in days — per-block min/max/count
    combiner, one order-keyed fold, one hash_join for the order date
    (exact day arithmetic on epoch-day integers)."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import auto_partitions
    from apache_datasketches_go_ray.stages.join import hash_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial(b):
        t = pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "sd": b.column("l_shipdate").cast(pa.timestamp("us")),
        })
        g = t.group_by("l_orderkey").aggregate(
            [("sd", "min"), ("sd", "max"), ([], "count_all")])
        return pa.table({
            "l_orderkey": g.column("l_orderkey"),
            "mn": g.column("sd_min"),
            "mx": g.column("sd_max"),
            "c": g.column("count_all").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "l_orderkey": pa.array([], type=pa.int64()),
                "n_lines": pa.array([], type=pa.int64()),
                "first_ship": pa.array([], type=pa.timestamp("us")),
                "last_ship": pa.array([], type=pa.timestamp("us")),
            })
        g = b.group_by("l_orderkey").aggregate(
            [("mn", "min"), ("mx", "max"), ("c", "sum")])
        return pa.table({
            "l_orderkey": g.column("l_orderkey").cast(pa.int64()),
            "n_lines": g.column("c_sum").cast(pa.int64()),
            "first_ship": g.column("mn_min").cast(pa.timestamp("us")),
            "last_ship": g.column("mx_max").cast(pa.timestamp("us")),
        })

    P = auto_partitions(line.count(), 2_000_000, 8)
    agg = (line.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .repartition(P, keys=["l_orderkey"])
           .map_batches(fold, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_orderdate": b.column("o_orderdate")
            .cast(pa.timestamp("us")),
        }), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(agg, orders, on=("l_orderkey", "o_orderkey"))

    def span(b):
        if len(b) == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "n_lines": pa.array([], type=pa.int64()),
                "first_ship": pa.array([], type=pa.timestamp("us")),
                "last_ship": pa.array([], type=pa.timestamp("us")),
                "span_days": pa.array([], type=pa.int64()),
            })
        last = b.column("last_ship").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        od = b.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = last // 86_400_000_000 - od // 86_400_000_000
        return pa.table({
            "o_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "n_lines": b.column("n_lines").cast(pa.int64()),
            "first_ship": b.column("first_ship"),
            "last_ship": b.column("last_ship"),
            "span_days": pa.array(days.astype(np.int64)),
        })

    return j.map_batches(span, batch_format="pyarrow",
                         zero_copy_batch=True)


def _q_signup_first_click(sf_dir: str):
    """First-touch attribution: each signup matched to the same user's
    EARLIEST click at or after it (forward as-of join, expressed as the
    engine's backward as-of over negated timestamps), kept when within
    7 days — onboarding-latency analysis."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def side(kind, id_name, keep_orig_ts):
        def f(b):
            t = b.filter(pc.equal(b.column("event_type"), kind))
            tneg = pc.multiply(
                t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                pa.scalar(-1, type=pa.int64()))
            cols = {
                id_name: t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "tneg": tneg,
            }
            cols[keep_orig_ts] = t.column("ts").cast(pa.timestamp("us"))
            return pa.table(cols)
        return f

    signups = ev.map_batches(side("signup", "event_id", "ts"),
                             batch_format="pyarrow",
                             zero_copy_batch=True)
    clicks = ev.map_batches(side("click", "click_id", "click_ts"),
                            batch_format="pyarrow", zero_copy_batch=True)
    j = asof_join(signups, clicks, on=("user_id", "user_id"),
                  ts=("tneg", "tneg"), tie_break="click_id",
                  left_cols=["event_id", "ts"],
                  right_cols=["click_id", "click_ts"],
                  num_partitions=8)

    def window(b):
        if len(b) == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "click_id": pa.array([], type=pa.int64()),
                "click_ts": pa.array([], type=pa.timestamp("us")),
            })
        gap = pc.subtract(b.column("click_ts").cast(pa.int64()),
                          b.column("ts").cast(pa.timestamp("us"))
                          .cast(pa.int64()))
        t = b.filter(pc.less_equal(gap, 604_800_000_000))
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "user_id": t.column("user_id").cast(pa.int64()),
            "ts": t.column("ts").cast(pa.timestamp("us")),
            "click_id": t.column("click_id").cast(pa.int64()),
            "click_ts": t.column("click_ts").cast(pa.timestamp("us")),
        })

    return j.map_batches(window, batch_format="pyarrow",
                         zero_copy_batch=True)


def _q_user_gap_quantiles(sf_dir: str):
    """Exact per-user quartiles of inter-event gaps (activity-rhythm
    profile): one user-keyed shuffle computes ordered gaps in-block
    (lexsort + diff), a second serves all three discrete quantiles from
    one lexsort (grouped_quantile_disc)."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import auto_partitions
    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
    )

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def gaps(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "gap_us": pa.array([], type=pa.int64()),
            })
        u = b.column("user_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = b.column("event_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        us, tss = u[order], t[order]
        same = us[1:] == us[:-1]
        gap = (tss[1:] - tss[:-1])[same]
        return pa.table({
            "user_id": pa.array(us[1:][same]),
            "gap_us": pa.array(gap.astype(np.int64)),
        })

    P = auto_partitions(ev.count(), 2_000_000, 8)
    g = (ev.repartition(P, keys=["user_id"])
         .map_batches(gaps, batch_format="pyarrow", batch_size=None,
                      zero_copy_batch=True))
    return grouped_quantile_disc(g, "user_id", "gap_us",
                                 (0.25, 0.5, 0.75), num_partitions=8)


def _q_events_user_outliers(sf_dir: str):
    """Per-user anomalous spend events: |x - mean| > 3 sigma decided in
    EXACT integer arithmetic ((n*x - Sx)^2 > 9*(n*Sxx - Sx^2)) — no
    float, no sqrt, so the flag is engine- and partition-independent.
    One user-keyed shuffle; moments and filter in the same fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.relational import (
        flag_group_outliers,
    )

    def prep(b):
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "cents": pc.round(pc.multiply(b.column("value"), 100))
                .cast(pa.int64()),
            "event_id": b.column("event_id").cast(pa.int64()),
        })

    ds = _read(sf_dir, "events", ["user_id", "value", "event_id"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return flag_group_outliers(ds, "user_id", "cents", z=3,
                               carry_cols=["event_id"])


def _q_frequent_ngrams(sf_dir: str):
    """Top-50 most frequent 5-token windows across the documents
    corpus with exact occurrence counts — the memorized-boilerplate /
    template detection report every pretraining-data audit runs.
    Count combiner -> gram-keyed fold -> mergeable top-k."""
    from apache_datasketches_go_ray.stages.corpusops import top_ngrams

    return top_ngrams(_read(sf_dir, "documents", ["text"]),
                      n=5, k=50, num_partitions=8)


def _q_mixture_weights(sf_dir: str):
    """Temperature-smoothed source mixing plan (alpha=0.5): per source
    its doc count and sqrt-scaled sampling weight in parts-per-million
    — how much each domain contributes to the training mix after
    up-weighting small sources. Per-block count combiner, one tiny
    single-partition fold that normalizes on the spot."""
    import pyarrow as pa

    def partial(b):
        g = pa.table({"source": b.column("source").cast(pa.string())}) \
            .group_by("source").aggregate([([], "count_all")])
        return pa.table({
            "source": g.column("source"),
            "c": g.column("count_all").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "weight_ppm": pa.array([], type=pa.int64()),
            })
        g = b.group_by("source").aggregate([("c", "sum")])
        n = g.column("c_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = np.sqrt(n.astype(np.float64))
        ppm = np.floor(w / w.sum() * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({
            "source": g.column("source").cast(pa.string()),
            "n_docs": pa.array(n),
            "weight_ppm": pa.array(ppm),
        })

    return (_read(sf_dir, "documents", ["source"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_new_docs_unmatched(sf_dir: str):
    """New-crawl novelty filter: odd-id documents (the incoming batch)
    with NO >=0.8 token-Jaccard match in the even-id half (the
    existing corpus) — what actually gets ingested after cross-corpus
    near-dup screening. PPJoin cross join for the matched set (recall
    1.0), then a left-anti hash_join to keep the unmatched."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.dedup_extras import (
        jaccard_cross_join,
    )
    from apache_datasketches_go_ray.stages.join import hash_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(par):
        def f(b):
            ids = b.column("doc_id").cast(pa.int64())
            return b.filter(pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, type=pa.int64())),
                pa.scalar(par, type=pa.int64())))
        return f

    a = docs.map_batches(half(0), batch_format="pyarrow",
                         zero_copy_batch=True)
    b_new = docs.map_batches(half(1), batch_format="pyarrow",
                             zero_copy_batch=True)
    pairs = jaccard_cross_join(a, b_new, tau=0.8, num_partitions=16)

    def matched_ids(t):
        if len(t) == 0:
            return pa.table({"m_id": pa.array([], type=pa.int64())})
        return pa.table({
            "m_id": t.column("doc_b").cast(pa.int64()),
        }).group_by("m_id").aggregate([])

    matched = pairs.map_batches(matched_ids, batch_format="pyarrow",
                                zero_copy_batch=True)
    new_ids = b_new.map_batches(lambda t: pa.table({
        "doc_id": t.column("doc_id").cast(pa.int64()),
    }), batch_format="pyarrow", zero_copy_batch=True)
    return hash_join(new_ids, matched, on=("doc_id", "m_id"),
                     join_type="left anti", num_partitions=8)


def _q_sample_docs_per_source(sf_dir: str):
    """Fixed-size uniform sample per stratum: 5 docs per source by
    Knuth-hash order (grouped bottom-k / KMV per group) — the 'pull k
    examples per domain for inspection' curation primitive. Per-block
    combiner bounds the shuffle at k x groups x blocks rows."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.relational import (
        grouped_bottom_k,
    )

    def prep(b):
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = (ids * 2654435761) % 4294967296
        return pa.table({
            "source": b.column("source").cast(pa.string()),
            "doc_id": pa.array(ids, type=pa.int64()),
            "h": pa.array(h.astype(np.int64)),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_bottom_k(ds, "source",
                            [("h", "ascending"), ("doc_id", "ascending")],
                            k=5, num_partitions=8)


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (k=8, 6
    iterations): broadcast centroids into an actor-pool map_batches,
    exact int64 partial sums folded on the driver — assignments are
    partition-independent by construction (pinned by the exact-replica
    pytest). The semantic-clustering primitive IVF training and
    cluster-balanced mixing build on."""
    from apache_datasketches_go_ray.stages.embops import kmeans_fit

    assign, _C = kmeans_fit(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=8, n_iter=6, num_partitions=8)
    return assign




def _q_events_cohort_retention(sf_dir: str):
    """Weekly cohort retention: cohort = ISO week of a user's first
    event; n_users = distinct users from that cohort active in week
    cohort+weeks_since. Two keyed shuffles: distinct (user, week) pairs
    hash to the user's partition (so each user's history folds in one
    block, no global sort), then tiny (cohort, delta) count partials
    fold on a second shuffle. Exact integers throughout."""
    import pyarrow as pa
    import pyarrow.compute as pc

    DAY_US = np.int64(86_400_000_000)

    _empty_pairs = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "wk_day": pa.array([], type=pa.int64())})
    _empty_counts = pa.table({
        "cw_day": pa.array([], type=pa.int64()),
        "weeks_since": pa.array([], type=pa.int64()),
        "n": pa.array([], type=pa.int64())})

    def partial(b):
        if len(b) == 0:
            return _empty_pairs
        wk = pc.floor_temporal(b.column("ts"), unit="week",
                               week_starts_monday=True)
        days = pc.divide(wk.cast(pa.int64()), pa.scalar(DAY_US))
        t = pa.table({"user_id": b.column("user_id").cast(pa.int64()),
                      "wk_day": days})
        return t.group_by(["user_id", "wk_day"]).aggregate([])

    def fold(b):
        if len(b) == 0:
            return _empty_counts
        # re-distinct across the blocks that hashed here, then per-user
        # cohort (min week) + deltas — users are co-located, so block-
        # local results are globally exact.
        t = b.group_by(["user_id", "wk_day"]).aggregate([])
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        w = t.column("wk_day").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        new_u = np.empty(len(us), dtype=bool)
        new_u[0] = True
        np.not_equal(us[1:], us[:-1], out=new_u[1:])
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.append(starts, len(us)))
        cohort = np.repeat(ws[starts], counts)
        delta = (ws - cohort) // 7
        g = pa.table({"cw_day": pa.array(cohort, type=pa.int64()),
                      "weeks_since": pa.array(delta, type=pa.int64())}) \
            .group_by(["cw_day", "weeks_since"]).aggregate([([], "count_all")])
        return pa.table({"cw_day": g.column("cw_day"),
                         "weeks_since": g.column("weeks_since"),
                         "n": g.column("count_all").cast(pa.int64())})

    def finish(b):
        if len(b) == 0:
            return pa.table({
                "cohort_week": pa.array([], type=pa.string()),
                "weeks_since": pa.array([], type=pa.int64()),
                "n_users": pa.array([], type=pa.int64())})
        g = b.group_by(["cw_day", "weeks_since"]).aggregate([("n", "sum")])
        ts = pc.multiply(g.column("cw_day"), pa.scalar(DAY_US)) \
            .cast(pa.timestamp("us"))
        return pa.table({
            "cohort_week": pc.strftime(ts, format="%Y-%m-%d"),
            "weeks_since": g.column("weeks_since"),
            "n_users": g.column("n_sum").cast(pa.int64())})

    return (_read(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(2, keys=["cw_day"])
            .map_batches(finish, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_brand_size_suppliers(sf_dir: str):
    """Q16-flavored: distinct suppliers shipping each (brand, size),
    one excluded brand. Per-block distinct (part, supp) pairs shrink
    the broadcast-join input; suppkey-keyed shuffle makes the triple
    distinct block-local; (brand,size) counts sum across disjoint
    supplier sets."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    def pairs(b):
        t = pa.table({"l_partkey": b.column("l_partkey").cast(pa.int64()),
                      "l_suppkey": b.column("l_suppkey").cast(pa.int64())})
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    li = (_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
          .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True))

    def prep_part(b):
        t = b.filter(pc.not_equal(b.column("p_brand"),
                                  pa.scalar("Brand#45")))
        return pa.table({"p_partkey": t.column("p_partkey").cast(pa.int64()),
                         "p_brand": t.column("p_brand"),
                         "p_size": t.column("p_size").cast(pa.int64())})

    part = (_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
            .map_batches(prep_part, batch_format="pyarrow",
                         zero_copy_batch=True))
    joined = hash_join(li, part, on=("l_partkey", "p_partkey"))

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "p_brand": pa.array([], type=pa.string()),
                "p_size": pa.array([], type=pa.int64()),
                "n_supp": pa.array([], type=pa.int64())})
        t = b.select(["p_brand", "p_size", "l_suppkey"]) \
            .group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([])
        g = t.group_by(["p_brand", "p_size"]).aggregate([([], "count_all")])
        return pa.table({"p_brand": g.column("p_brand"),
                         "p_size": g.column("p_size"),
                         "n_supp": g.column("count_all").cast(pa.int64())})

    def final(b):
        if len(b) == 0:
            return pa.table({
                "p_brand": pa.array([], type=pa.string()),
                "p_size": pa.array([], type=pa.int64()),
                "n_supp": pa.array([], type=pa.int64())})
        g = b.group_by(["p_brand", "p_size"]).aggregate([("n_supp", "sum")])
        return pa.table({"p_brand": g.column("p_brand"),
                         "p_size": g.column("p_size"),
                         "n_supp": g.column("n_supp_sum").cast(pa.int64())})

    return (joined.repartition(8, keys=["l_suppkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(4, keys=["p_brand"])
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_part_band_revenue(sf_dir: str):
    """Q19-flavored: exact-cents revenue over an OR of (brand, size
    range, quantity range) bands — the filtered small side (3 brands of
    part) broadcasts; the band predicate evaluates vectorized after the
    join."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from apache_datasketches_go_ray.stages.join import hash_join

    BANDS = [("Brand#12", 1, 5, 1.0, 11.0),
             ("Brand#23", 1, 10, 10.0, 20.0),
             ("Brand#34", 1, 15, 20.0, 30.0)]

    def prep_li(b):
        rev = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - b.column("l_discount").to_numpy(zero_copy_only=False))
            * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_partkey": b.column("l_partkey").cast(pa.int64()),
            "l_quantity": b.column("l_quantity"),
            "rev_c": pa.array(rev, type=pa.int64())})

    def prep_part(b):
        m = pc.is_in(b.column("p_brand"),
                     value_set=pa.array([x[0] for x in BANDS]))
        t = b.filter(m)
        return pa.table({"p_partkey": t.column("p_partkey").cast(pa.int64()),
                         "p_brand": t.column("p_brand"),
                         "p_size": t.column("p_size").cast(pa.int64())})

    li = (_read(sf_dir, "lineitem",
                ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
          .map_batches(prep_li, batch_format="pyarrow", zero_copy_batch=True))
    part = (_read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
            .map_batches(prep_part, batch_format="pyarrow",
                         zero_copy_batch=True))
    joined = hash_join(li, part, on=("l_partkey", "p_partkey"))

    def partial(b):
        if len(b) == 0:
            return pa.table({"revenue_c": pa.array([], type=pa.int64()),
                             "n_items": pa.array([], type=pa.int64())})
        keep = None
        for brand, slo, shi, qlo, qhi in BANDS:
            m = pc.and_(
                pc.and_(pc.equal(b.column("p_brand"), pa.scalar(brand)),
                        pc.and_(pc.greater_equal(b.column("p_size"),
                                                 pa.scalar(slo, pa.int64())),
                                pc.less_equal(b.column("p_size"),
                                              pa.scalar(shi, pa.int64())))),
                pc.and_(pc.greater_equal(b.column("l_quantity"),
                                         pa.scalar(qlo)),
                        pc.less_equal(b.column("l_quantity"),
                                      pa.scalar(qhi))))
            keep = m if keep is None else pc.or_(keep, m)
        t = b.filter(keep)
        s = pc.sum(t.column("rev_c"))
        return pa.table({
            "revenue_c": pa.array([s.as_py() or 0], type=pa.int64()),
            "n_items": pa.array([len(t)], type=pa.int64())})

    def fold(b):
        return pa.table({
            "revenue_c": pa.array(
                [pc.sum(b.column("revenue_c")).as_py() or 0],
                type=pa.int64()),
            "n_items": pa.array(
                [pc.sum(b.column("n_items")).as_py() or 0],
                type=pa.int64())})

    return (joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_customers_above_global_avg(sf_dir: str):
    """Q22-flavored dormant-customer report: customers with balance
    above the global average of positive balances AND no orders since
    2001-01-01, counted per nation. The average never materializes as a
    float — the filter cross-multiplies exact cents (bal_c * n_pos >
    sum_pos_c), so there is no float-tie risk. Tiny global aggregate
    computed driver-side from KB partials; the anti-join is a keyed
    tag-union shuffle presence fold (never a driver loop)."""
    import datetime
    import pyarrow as pa
    import pyarrow.compute as pc

    CUTOFF = pa.scalar(datetime.datetime(2001, 1, 1), type=pa.timestamp("us"))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])

    def cents(b):
        c = np.floor(b.column("c_acctbal").to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
        return pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "nationkey": b.column("c_nationkey").cast(pa.int64()),
            "bal_c": pa.array(c, type=pa.int64())})

    cust_c = cust.map_batches(cents, batch_format="pyarrow",
                              zero_copy_batch=True)
    cust_c = cust_c.materialize()

    # tiny global aggregate: sum + count of positive balances
    def pos_partial(b):
        m = pc.greater(b.column("bal_c"), pa.scalar(0, pa.int64()))
        t = b.filter(m)
        return pa.table({
            "s": pa.array([pc.sum(t.column("bal_c")).as_py() or 0],
                          type=pa.int64()),
            "n": pa.array([len(t)], type=pa.int64())})

    import ray
    parts = cust_c.map_batches(pos_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    sum_pos = sum(r["s"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    # tag-union anti join on custkey: keep customers with no orders
    def order_keys(b):
        t = b.filter(pc.greater_equal(b.column("o_orderdate"), CUTOFF))
        t = pa.table({"c_custkey": t.column("o_custkey").cast(pa.int64())})
        t = t.group_by(["c_custkey"]).aggregate([])
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "nationkey": pa.nulls(len(t), pa.int64()),
                         "bal_c": pa.nulls(len(t), pa.int64()),
                         "is_order": pa.array([True] * len(t))})

    def cust_tag(b):
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "nationkey": b.column("nationkey"),
                         "bal_c": b.column("bal_c"),
                         "is_order": pa.array([False] * len(b))})

    orders = (_read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
              .map_batches(order_keys, batch_format="pyarrow",
                           zero_copy_batch=True))
    tagged = (cust_c.map_batches(cust_tag, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .union(orders)
              .repartition(8, keys=["c_custkey"]))

    sum_pos_s = pa.scalar(int(sum_pos), pa.int64())
    n_pos_s = pa.scalar(int(n_pos), pa.int64())

    def anti_fold(b):
        if len(b) == 0:
            return pa.table({"nationkey": pa.array([], type=pa.int64()),
                             "n_cust": pa.array([], type=pa.int64()),
                             "bal_cents": pa.array([], type=pa.int64())})
        k = b.column("c_custkey").to_numpy(zero_copy_only=False)
        is_o = b.column("is_order").to_numpy(zero_copy_only=False)
        keep_rows = ~is_o & ~np.isin(k, k[is_o])
        t = b.filter(pa.array(keep_rows))
        m = pc.greater(pc.multiply(t.column("bal_c"), n_pos_s), sum_pos_s)
        t = t.filter(m)
        g = t.group_by(["nationkey"]).aggregate(
            [("bal_c", "count"), ("bal_c", "sum")])
        return pa.table({
            "nationkey": g.column("nationkey"),
            "n_cust": g.column("bal_c_count").cast(pa.int64()),
            "bal_cents": g.column("bal_c_sum").cast(pa.int64())})

    def final(b):
        if len(b) == 0:
            return pa.table({"nationkey": pa.array([], type=pa.int64()),
                             "n_cust": pa.array([], type=pa.int64()),
                             "bal_cents": pa.array([], type=pa.int64())})
        g = b.group_by(["nationkey"]).aggregate(
            [("n_cust", "sum"), ("bal_cents", "sum")])
        return pa.table({
            "nationkey": g.column("nationkey"),
            "n_cust": g.column("n_cust_sum").cast(pa.int64()),
            "bal_cents": g.column("bal_cents_sum").cast(pa.int64())})

    return (tagged.map_batches(anti_fold, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
            .repartition(2, keys=["nationkey"])
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_ks_drift_nchars(sf_dir: str):
    """Distribution-drift detector: exact two-sample KS statistic
    between the doc-length distributions of two halves of the corpus
    (doc_id parity stands in for old/new snapshots). D = ks_num /
    (n_left*n_right) as an exact integer rational — the per-value count
    table is tiny (bounded by the length domain), so the CDF scan runs
    in one final block while the counting is fully distributed."""
    import pyarrow as pa

    _empty = pa.table({"n_chars": pa.array([], type=pa.int64()),
                       "a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64())})

    def partial(b):
        if len(b) == 0:
            return _empty
        side = b.column("doc_id").to_numpy(zero_copy_only=False) % 2
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        t = pa.table({"n_chars": pa.array(nc, type=pa.int64()),
                      "a": pa.array((side == 0).astype(np.int64)),
                      "b": pa.array((side == 1).astype(np.int64))})
        g = t.group_by(["n_chars"]).aggregate([("a", "sum"), ("b", "sum")])
        return pa.table({"n_chars": g.column("n_chars"),
                         "a": g.column("a_sum").cast(pa.int64()),
                         "b": g.column("b_sum").cast(pa.int64())})

    def finish(b):
        if len(b) == 0:
            return pa.table({
                "at_nchars": pa.array([], type=pa.int64()),
                "ks_num": pa.array([], type=pa.int64()),
                "n_left": pa.array([], type=pa.int64()),
                "n_right": pa.array([], type=pa.int64())})
        g = b.group_by(["n_chars"]).aggregate([("a", "sum"), ("b", "sum")])
        nc = g.column("n_chars").to_numpy(zero_copy_only=False)
        a = g.column("a_sum").to_numpy(zero_copy_only=False)
        bb = g.column("b_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(nc)
        nc, a, bb = nc[order], a[order], bb[order]
        ca, cb = np.cumsum(a), np.cumsum(bb)
        n0, n1 = int(ca[-1]), int(cb[-1])
        num = np.abs(ca * n1 - cb * n0)
        mx = int(num.max())
        at = int(nc[np.flatnonzero(num == mx).min()])
        return pa.table({
            "at_nchars": pa.array([at], type=pa.int64()),
            "ks_num": pa.array([mx], type=pa.int64()),
            "n_left": pa.array([n0], type=pa.int64()),
            "n_right": pa.array([n1], type=pa.int64())})

    return (_read(sf_dir, "documents", ["doc_id", "n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_events_time_funnel(sf_dir: str):
    """Time-bounded funnel: users who 'click' and then 'purchase'
    within one hour. One user-keyed shuffle; inside each block a
    grouped prefix-cummax of click timestamps (ties order clicks before
    purchases) turns 'exists A within [ts-1h, ts]' into one vectorized
    comparison per purchase row."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    W_US = np.int64(3_600_000_000)

    def keep(b):
        return b.filter(pc.is_in(b.column("event_type"),
                                 value_set=pa.array(["click", "purchase"])))

    def conv_partial(b):
        if len(b) == 0:
            return pa.table({"n_users_a": pa.array([], type=pa.int64()),
                             "n_converted": pa.array([], type=pa.int64())})
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        isb = pc.equal(b.column("event_type"),
                       pa.scalar("purchase")).to_numpy(zero_copy_only=False)
        order = np.lexsort((isb, ts, u))
        us, tss, isbs = u[order], ts[order], isb[order]
        a_ts = np.where(~isbs, tss, np.int64(-(1 << 62)))
        s = pd.Series(a_ts)
        a_prev = s.groupby(pd.Series(us), sort=False).cummax().to_numpy()
        conv_row = isbs & (a_prev >= tss - W_US)
        n_users_a = int(len(np.unique(us[~isbs])))
        n_conv = int(len(np.unique(us[conv_row])))
        return pa.table({
            "n_users_a": pa.array([n_users_a], type=pa.int64()),
            "n_converted": pa.array([n_conv], type=pa.int64())})

    def fold(b):
        return pa.table({
            "n_users_a": pa.array(
                [pc.sum(b.column("n_users_a")).as_py() or 0],
                type=pa.int64()),
            "n_converted": pa.array(
                [pc.sum(b.column("n_converted")).as_py() or 0],
                type=pa.int64())})

    return (_read(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(8, keys=["user_id"])
            .map_batches(conv_partial, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_source_tfidf_terms(sf_dir: str):
    """Characteristic terms per source: integer tf-over-df score
    (tf * 1e6 // df, df = #sources containing the token) — a
    log-free TF-IDF surrogate both engines rank identically. Token-
    keyed shuffle computes tf and df together (token co-located);
    source-keyed shuffle takes the top-5 per source."""
    import pyarrow as pa
    import pyarrow.compute as pc

    _empty_tf = pa.table({"source": pa.array([], type=pa.large_string()),
                          "token": pa.array([], type=pa.large_string()),
                          "tf": pa.array([], type=pa.int64())})

    def explode(b):
        if len(b) == 0:
            return _empty_tf
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                b.column("text").cast(pa.large_string())), r"\s+")
        src = b.column("source").cast(pa.large_string())
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        srcs = src.take(pa.array(np.repeat(np.arange(len(b)), counts),
                                 type=pa.int64()))
        t = pa.table({"source": srcs, "token": flat})
        t = t.filter(pc.not_equal(t.column("token"),
                                  pa.scalar("", pa.large_string())))
        g = t.group_by(["source", "token"]).aggregate([([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "token": g.column("token"),
                         "tf": g.column("count_all").cast(pa.int64())})

    def score(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.large_string()),
                "token": pa.array([], type=pa.large_string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
                "score_ppm": pa.array([], type=pa.int64())})
        g = b.group_by(["source", "token"]).aggregate([("tf", "sum")])
        d = g.group_by(["token"]).aggregate([([], "count_all")])
        # token co-located: every (source, token) row for a token is in
        # this block, so count_all over distinct sources == global df.
        tok = g.column("token")
        dmap = pa.table({"token": d.column("token"),
                         "df": d.column("count_all").cast(pa.int64())})
        idx = pc.index_in(tok, value_set=dmap.column("token"))
        df = dmap.column("df").take(idx)
        tf = g.column("tf_sum").cast(pa.int64())
        score = pc.divide(pc.multiply(tf, pa.scalar(1_000_000, pa.int64())),
                          df)
        return pa.table({"source": g.column("source"), "token": tok,
                         "tf": tf, "df": df, "score_ppm": score})

    def topk(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.large_string()),
                "token": pa.array([], type=pa.large_string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
                "score_ppm": pa.array([], type=pa.int64()),
                "rk": pa.array([], type=pa.int64())})
        idx = pc.sort_indices(b, sort_keys=[("source", "ascending"),
                                            ("score_ppm", "descending"),
                                            ("token", "ascending")])
        t = b.take(idx)
        src = t.column("source").to_numpy(zero_copy_only=False)
        new_s = np.empty(len(src), dtype=bool)
        if len(src):
            new_s[0] = True
            new_s[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new_s)
        counts = np.diff(np.append(starts, len(src)))
        rk = np.arange(len(src), dtype=np.int64) - np.repeat(starts, counts) \
            + 1
        t = t.append_column("rk", pa.array(rk, type=pa.int64()))
        return t.filter(pa.array(rk <= 5))

    return (_read(sf_dir, "documents", ["source", "text"])
            .map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["token"])
            .map_batches(score, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(8, keys=["source"])
            .map_batches(topk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_dedup_cluster_survivors(sf_dir: str):
    """Keep-best retention policy over the flagship's near-dup clusters:
    the longest member survives (ties: min conv_id) — what curation
    applies when duplicate copies differ in completeness. Slim
    (conv, n_chars) join + one cluster-keyed argmax fold
    (stages/dedup_extras.cluster_survivors); rows-only (clusters come
    from MinHash/LSH), determinism pinned by the pipeline-parity
    pytests plus a pandas-exact survivors test."""
    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup
    from apache_datasketches_go_ray.stages.dedup_extras import (
        cluster_survivors,
    )

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    return cluster_survivors(res["clusters"], res["assembled"],
                             num_partitions=8).sort(["cluster_id"])


def _q_dup_pair_jaccard_histogram(sf_dir: str):
    """Duplicate-severity profile: 5%-wide histogram of exact Jaccard
    over the flagship's verified duplicate pairs — verbatim mirrors
    pile into the top bucket, containment dups land low. Rows-only
    (pairs are MinHash/LSH candidates); the binning is a pure function
    of the verified table, itself partition-independent."""
    import ray.data
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup
    from apache_datasketches_go_ray.stages.dedup_extras import (
        pair_jaccard_histogram,
    )

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    res = run_dedup(ds, _dedup_config())
    return pair_jaccard_histogram(res["verified"]).sort(["bin_lo_pct"])


def _q_bpe_encode_counts(sf_dir: str):
    """Tokenizer application at corpus scale: learn 40 BPE merges
    (the existing distributed trainer), then encode every document
    with them — per-doc word and BPE-token counts, the fertility /
    sequence-length planning numbers every tokenizer change re-runs.
    Merge table broadcast once; per-actor distinct-word encode cache
    (stages/corpusops.BpeEncodeStage); rows-only (iterative BPE has no
    SQL equivalent), parity vs a direct single-process encode pinned
    by pytest."""
    from apache_datasketches_go_ray.stages.corpusops import (
        bpe_encode_stats, bpe_learn_merges,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_learn_merges(docs, n_merges=40, vocab_size=20000)
    return bpe_encode_stats(docs, merges)



def _q_transcript_decontaminate(sf_dir: str):
    """Eval-set decontamination applied to CONVERSATIONS: assembled
    transcripts whose text shares a verbatim 13-gram with the held-out
    eval split (numeric conv suffix % 5 == 0) — the cross-axis
    composition (assembly -> gram hashing -> broadcast probe) a
    transcript-corpus user runs before training on agent logs. The
    eval gram-hash set ships once via ray.put; the train side is a
    pure map, no corpus shuffle. Planted near-dup conversations that
    straddle the split are exactly what it catches."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.assemble import assemble
    from apache_datasketches_go_ray.stages.decontaminate import (
        eval_ngram_hashes, flag_contaminated)

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "text"])
    conv = assemble(ds, num_partitions=8).materialize()

    def _split(b, want_eval):
        import pyarrow.compute as pc
        cid = pc.cast(pc.utf8_slice_codeunits(
            b.column("conv_id").cast(pa.string()), 5, 99), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = (cid % 5) == 0
        return b.filter(pa.array(m if want_eval else ~m))

    ev_ds = conv.map_batches(lambda b: _split(b, True),
                             batch_format="pyarrow", zero_copy_batch=True)
    tr_ds = conv.map_batches(lambda b: _split(b, False),
                             batch_format="pyarrow", zero_copy_batch=True)
    ev = eval_ngram_hashes(ev_ds, n=13)
    flagged = flag_contaminated(tr_ds, ev, n=13, id_col="conv_id")
    return flagged.select_columns(["conv_id", "n_grams", "n_hits"]) \
        .sort("conv_id")


def _q_nation_market_share(sf_dir: str):
    """TPC-H Q8-style market share: per order-year revenue (exact
    cents) of each supplier nation within ASIA customers' PROMO-part
    market, plus each nation's share of the year total in ppm. Plan:
    broadcast the three dimension lookups (part keys of the type,
    supplier->nation name, nation->region membership — all bounded
    dimension tables), hash_join lineitem->orders->customer on the two
    fact keys, then a per-block partial (year, nation) fold and a tiny
    final fold that computes the year totals."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.join import hash_join

    part = gather_table(_read(sf_dir, "part", ["p_partkey", "p_type"]))
    promo_keys = np.sort(np.asarray(
        part.filter(pc.equal(part.column("p_type"), "PROMO"))
        .column("p_partkey").to_numpy(zero_copy_only=False),
        dtype=np.int64))

    sup = gather_table(_read(sf_dir, "supplier",
                             ["s_suppkey", "s_nationkey"]))
    nat = gather_table(_read(sf_dir, "nation",
                             ["n_nationkey", "n_name", "n_regionkey"]))
    reg = gather_table(_read(sf_dir, "region",
                             ["r_regionkey", "r_name"]))
    asia_key = {int(k) for k, n in zip(
        reg.column("r_regionkey").to_pylist(),
        reg.column("r_name").to_pylist()) if n == "ASIA"}
    nat_name = {int(k): n for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}
    asia_nations = np.sort(np.array(
        [int(k) for k, r in zip(nat.column("n_nationkey").to_pylist(),
                                nat.column("n_regionkey").to_pylist())
         if int(r) in asia_key], dtype=np.int64))
    # supplier -> nation name, as a dense array indexed by suppkey rank
    sup_keys = np.asarray(sup.column("s_suppkey")
                          .to_numpy(zero_copy_only=False), dtype=np.int64)
    sup_order = np.argsort(sup_keys)
    sup_keys_sorted = sup_keys[sup_order]
    sup_nat_sorted = np.asarray(sup.column("s_nationkey")
                                .to_numpy(zero_copy_only=False),
                                dtype=np.int64)[sup_order]

    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1998, 1, 1), type=pa.timestamp("us"))

    def prep_line(b):
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = np.searchsorted(promo_keys, pk)
        i[i == len(promo_keys)] = 0
        m = len(promo_keys) > 0 and promo_keys[i] == pk
        t = b.filter(pa.array(m if isinstance(m, np.ndarray)
                              else np.zeros(len(b), dtype=bool)))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        snk = sup_nat_sorted[np.searchsorted(sup_keys_sorted, sk)]
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "supp_nation": pa.array(snk, type=pa.int64()),
            "cents": pa.array(cents),
        })

    def prep_orders(b):
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        t = b.filter(m)
        yr = pc.year(t.column("o_orderdate")).cast(pa.int64())
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64()),
            "o_year": yr,
        })

    def prep_cust(b):
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = np.searchsorted(asia_nations, nk)
        i[i == len(asia_nations)] = 0
        m = asia_nations[i] == nk if len(asia_nations) else \
            np.zeros(len(b), dtype=bool)
        t = b.filter(pa.array(m))
        return pa.table({"c_custkey": t.column("c_custkey")
                         .cast(pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount"]) \
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(prep_orders, batch_format="pyarrow",
                     zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(prep_cust, batch_format="pyarrow",
                     zero_copy_batch=True)

    j = hash_join(line, orders, on=("l_orderkey", "o_orderkey"))
    j = hash_join(j, cust, on=("o_custkey", "c_custkey"))

    def partial(b):
        g = b.group_by(["o_year", "supp_nation"]) \
            .aggregate([("cents", "sum")])
        return pa.table({
            "o_year": g.column("o_year").cast(pa.int64()),
            "supp_nation": g.column("supp_nation").cast(pa.int64()),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "o_year": pa.array([], type=pa.int64()),
                "n_name": pa.array([], type=pa.string()),
                "revenue_cents": pa.array([], type=pa.int64()),
                "share_ppm": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["o_year", "supp_nation"]) \
            .aggregate([("cents", "sum")])
        yr = g.column("o_year").to_numpy(zero_copy_only=False)
        cents = g.column("cents_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uy, inv = np.unique(yr, return_inverse=True)
        tot = np.zeros(len(uy), dtype=np.int64)
        np.add.at(tot, inv, cents)
        ppm = np.floor(cents.astype(np.float64) * 1_000_000.0
                       / tot[inv].astype(np.float64) + 0.5) \
            .astype(np.int64)
        nn = [nat_name[int(x)] for x in
              g.column("supp_nation").to_pylist()]
        return pa.table({
            "o_year": pa.array(yr, type=pa.int64()),
            "n_name": pa.array(nn, type=pa.string()),
            "revenue_cents": pa.array(cents),
            "share_ppm": pa.array(ppm),
        })

    return (j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["o_year", "n_name"]))


def _q_top_supplier_quarter(sf_dir: str):
    """TPC-H Q15-style top supplier: per-supplier revenue (exact cents)
    over 1996-Q1 shipments, returning the supplier(s) achieving the
    global maximum — per-block partial sums keyed by suppkey, a
    bounded-cardinality final fold (one row per supplier), a driver-side
    max over that small table, and a broadcast name lookup."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table

    sup = gather_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    names = {int(k): n for k, n in zip(
        sup.column("s_suppkey").to_pylist(),
        sup.column("s_name").to_pylist())}

    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1996, 4, 1), type=pa.timestamp("us"))

    def partial(b):
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi))
        t = b.filter(m)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        tt = pa.table({
            "s_suppkey": t.column("l_suppkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })
        g = tt.group_by(["s_suppkey"]).aggregate([("cents", "sum")])
        return pa.table({
            "s_suppkey": g.column("s_suppkey"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "total_revenue_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["s_suppkey"]).aggregate([("cents", "sum")])
        cents = g.column("cents_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = cents == cents.max()
        sk = g.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({
            "s_suppkey": pa.array(sk),
            "s_name": pa.array([names[int(k)] for k in sk],
                               type=pa.string()),
            "total_revenue_cents": pa.array(cents[keep]),
        })

    return (_read(sf_dir, "lineitem",
                  ["l_suppkey", "l_shipdate", "l_extendedprice",
                   "l_discount"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("s_suppkey"))


def _q_brand_low_qty_revenue(sf_dir: str):
    """TPC-H Q17-style small-quantity-order revenue for Brand#19 parts:
    lineitems whose quantity is below 20% of their part's average
    quantity, summed as exact cents with the yearly average derived by
    integer floor(total/7 + 0.5). Two passes over the pruned fact
    columns: pass 1 folds per-part (sum_qty, cnt) — bounded by the
    brand's part count, broadcast back — and the threshold test is the
    integer cross-multiplication 5*qty*cnt < sum_qty, so no float
    division can diverge between engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table

    part = gather_table(_read(sf_dir, "part", ["p_partkey", "p_brand"]))
    keys = np.sort(np.asarray(
        part.filter(pc.equal(part.column("p_brand"), "Brand#19"))
        .column("p_partkey").to_numpy(zero_copy_only=False),
        dtype=np.int64))

    def _brand_filter(b):
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(keys) == 0:
            return b.filter(pa.array(np.zeros(len(b), dtype=bool)))
        i = np.searchsorted(keys, pk)
        i[i == len(keys)] = 0
        return b.filter(pa.array(keys[i] == pk))

    def qty_partial(b):
        t = _brand_filter(b)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tt = pa.table({
            "l_partkey": t.column("l_partkey").cast(pa.int64()),
            "q": pa.array(qty),
            "one": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        g = tt.group_by(["l_partkey"]).aggregate(
            [("q", "sum"), ("one", "sum")])
        return pa.table({
            "l_partkey": g.column("l_partkey"),
            "sum_qty": g.column("q_sum").cast(pa.int64()),
            "cnt": g.column("one_sum").cast(pa.int64()),
        })

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = (_read(sf_dir, "lineitem", cols[:2])
             .map_batches(qty_partial, batch_format="pyarrow",
                          zero_copy_batch=True))
    stats_tbl = gather_table(stats)
    if stats_tbl.num_rows:
        g = stats_tbl.group_by(["l_partkey"]).aggregate(
            [("sum_qty", "sum"), ("cnt", "sum")])
        pkeys = np.asarray(g.column("l_partkey")
                           .to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(pkeys)
        pkeys = pkeys[order]
        sum_q = np.asarray(g.column("sum_qty_sum")
                           .to_numpy(zero_copy_only=False),
                           dtype=np.int64)[order]
        cnt = np.asarray(g.column("cnt_sum")
                         .to_numpy(zero_copy_only=False),
                         dtype=np.int64)[order]
    else:
        pkeys = np.empty(0, dtype=np.int64)
        sum_q = cnt = pkeys

    def low_qty_partial(b):
        t = _brand_filter(b)
        if len(t) == 0 or len(pkeys) == 0:
            return pa.table({"cents": pa.array([], type=pa.int64()),
                             "one": pa.array([], type=pa.int64())})
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = np.searchsorted(pkeys, pk)
        low = 5 * qty * cnt[i] < sum_q[i]
        ep = t.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)[low]
        cents = np.floor(ep * 100 + 0.5).astype(np.int64)
        return pa.table({
            "cents": pa.array([int(cents.sum())], type=pa.int64()),
            "one": pa.array([int(low.sum())], type=pa.int64()),
        })

    def fold(b):
        tot = int(pc.sum(b.column("cents")).as_py() or 0) \
            if b.num_rows else 0
        n = int(pc.sum(b.column("one")).as_py() or 0) if b.num_rows else 0
        yearly = int(np.floor(tot / 7.0 + 0.5))
        return pa.table({
            "total_cents": pa.array([tot], type=pa.int64()),
            "yearly_cents": pa.array([yearly], type=pa.int64()),
            "n_lineitems": pa.array([n], type=pa.int64()),
        })

    return (_read(sf_dir, "lineitem", cols)
            .map_batches(low_qty_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_preference_pairs(sf_dir: str):
    """Preference-pair mining for RLHF-style training: user prompts
    that drew >= 2 distinct assistant responses across the corpus emit
    one (prompt, chosen, rejected) row — chosen = the longest response
    (ties to lexicographically greatest), rejected = the shortest (ties
    to least). Stage 1 is the sft adjacency fold inside each conv-keyed
    block; stage 2 shuffles by prompt so each group folds locally."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    ds = ray.data.read_parquet(_transcripts_dir(sf_dir),
                               columns=["conv_id", "turn_idx", "role",
                                        "text"])

    def pair_fold(b):
        if len(b) == 0:
            return pa.table({
                "prompt": pa.array([], type=pa.large_string()),
                "response": pa.array([], type=pa.large_string()),
            })
        conv = as_array(b.column("conv_id")) \
            .to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        _, ccodes = np.unique(conv, return_inverse=True)
        order = np.lexsort((tidx, ccodes))
        role = as_array(b.column("role")).take(
            pa.array(order, type=pa.int64()))
        is_user = pc.equal(role, "user").to_numpy(zero_copy_only=False)
        is_asst = pc.equal(role, "assistant") \
            .to_numpy(zero_copy_only=False)
        c = ccodes[order]
        same_conv = np.concatenate([c[1:] == c[:-1], [False]])
        nxt_asst = np.concatenate([is_asst[1:], [False]])
        take = np.flatnonzero(is_user & same_conv & nxt_asst)
        text = as_array(b.column("text")).cast(pa.large_string())
        o = np.asarray(order)
        return pa.table({
            "prompt": text.take(pa.array(o[take], type=pa.int64())),
            "response": text.take(pa.array(o[take + 1],
                                           type=pa.int64())),
        })

    _empty = pa.table({
        "prompt": pa.array([], type=pa.large_string()),
        "n_candidates": pa.array([], type=pa.int64()),
        "chosen": pa.array([], type=pa.large_string()),
        "rejected": pa.array([], type=pa.large_string()),
    })

    def group_fold(b):
        if len(b) == 0:
            return _empty
        # distinct (prompt, response) then rank responses per prompt by
        # (len, response) — all vectorized over dictionary codes
        p = as_array(b.column("prompt"))
        r = as_array(b.column("response"))
        pn = p.to_numpy(zero_copy_only=False)
        rn = r.to_numpy(zero_copy_only=False)
        uniq = {}
        pair_seen = set()
        for i in range(len(pn)):
            key = (pn[i], rn[i])
            if key not in pair_seen:
                pair_seen.add(key)
                uniq.setdefault(pn[i], []).append(rn[i])
        prompts, ncand, chosen, rejected = [], [], [], []
        for prompt in sorted(uniq):
            resp = uniq[prompt]
            if len(resp) < 2:
                continue
            ranked = sorted(resp, key=lambda s: (len(s), s))
            prompts.append(prompt)
            ncand.append(len(resp))
            chosen.append(ranked[-1])
            rejected.append(ranked[0])
        return pa.table({
            "prompt": pa.array(prompts, type=pa.large_string()),
            "n_candidates": pa.array(ncand, type=pa.int64()),
            "chosen": pa.array(chosen, type=pa.large_string()),
            "rejected": pa.array(rejected, type=pa.large_string()),
        })

    pairs = (ds.repartition(16, keys=["conv_id"])
             .map_batches(pair_fold, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True))
    return (pairs.repartition(16, keys=["prompt"])
            .map_batches(group_fold, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def _q_user_state_scd2(sf_dir: str):
    """SCD2 dimension build from an event stream: collapse each user's
    consecutive runs of equal event_type (ordered by ts, event_id) into
    versioned validity intervals (valid_from, valid_to; -1 = open).
    One user-keyed shuffle + in-block lexsort + run-boundary masks —
    the standard change-data-capture compaction, fully vectorized."""
    import pyarrow as pa
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    _empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "version": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "valid_from_us": pa.array([], type=pa.int64()),
        "valid_to_us": pa.array([], type=pa.int64()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        uid = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = b.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = as_array(b.column("event_type"))
        d = et.dictionary_encode()
        codes = np.asarray(d.indices.to_numpy(zero_copy_only=False),
                           dtype=np.int64)
        order = np.lexsort((eid, ts, uid))
        u, t, c = uid[order], ts[order], codes[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        start = new_user | np.concatenate([[True], c[1:] != c[:-1]])
        s_idx = np.flatnonzero(start)
        # version = run ordinal within its user
        run_user = u[s_idx]
        run_new_user = np.concatenate([[True],
                                       run_user[1:] != run_user[:-1]])
        grp_start = np.zeros(len(s_idx), dtype=np.int64)
        grp_start[run_new_user] = np.arange(len(s_idx))[run_new_user]
        np.maximum.accumulate(grp_start, out=grp_start)
        version = np.arange(len(s_idx)) - grp_start + 1
        valid_from = t[s_idx]
        nxt_from = np.concatenate([valid_from[1:], [np.int64(-1)]])
        valid_to = np.where(np.concatenate([run_new_user[1:], [True]]),
                            np.int64(-1), nxt_from)
        et_vals = d.dictionary.cast(pa.string()).take(
            pa.array(c[s_idx], type=pa.int64()))
        return pa.table({
            "user_id": pa.array(run_user),
            "version": pa.array(version),
            "event_type": et_vals,
            "valid_from_us": pa.array(valid_from),
            "valid_to_us": pa.array(valid_to),
        })

    return (_read(sf_dir, "events",
                  ["user_id", "ts", "event_id", "event_type"])
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_order_skyline(sf_dir: str):
    """Pareto skyline of orders under (maximize total price, minimize
    order date): the orders no other order beats on both axes. Exact,
    shuffle-free — the skyline admits a perfect combiner (skyline of a
    union = skyline of the partial skylines), so each block folds to a
    handful of rows and one tiny final fold finishes."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.relational import (
        pareto_skyline_2d)

    def prep(b):
        ep = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * 100 + 0.5).astype(np.int64)
        d = b.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64())
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "price_cents": pa.array(cents),
            "orderdate_us": d,
        })

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderdate"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return pareto_skyline_2d(ds, "price_cents", "orderdate_us",
                             carry=["o_orderkey"]).sort("o_orderkey")


def _q_global_median_value(sf_dir: str):
    """Exact global median (lower median, rank (n+1)//2) of event value
    cents WITHOUT a global sort: iterative bucketed selection — each
    round one streaming histogram pass narrows the candidate range
    ~256x, then the bounded survivor set is gathered and selected
    exactly. The rank-error-free counterpart of the KLL quantile
    queries, usable at 10^12 rows in a handful of passes."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.relational import (
        exact_global_kth)

    def prep(b):
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array(cents)})

    ds = _read(sf_dir, "events", ["value"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    n = ds.count()
    k = (n + 1) // 2
    res = exact_global_kth(ds, "cents", k, num_buckets=256,
                           gather_threshold=1000)
    return pa.table({
        "n_rows": pa.array([res["n"]], type=pa.int64()),
        "k": pa.array([k], type=pa.int64()),
        "median_cents": pa.array([res["value"]], type=pa.int64()),
    })


def _q_user_active_time(sf_dir: str):
    """Interval-union coverage (gaps-and-islands): each event opens a
    10-minute activity window; per user, merge overlapping/touching
    windows into islands and report the island count and total covered
    microseconds. One user-keyed shuffle, then a fully segmented
    in-block kernel (lexsort + grouped running max) — the classic
    'total active time from overlapping sessions' operator."""
    import pandas as pd
    import pyarrow as pa

    SPAN_US = 600_000_000  # 10 min

    _empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "n_islands": pa.array([], type=pa.int64()),
        "active_us": pa.array([], type=pa.int64()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = s + SPAN_US
        order = np.lexsort((e, s, u))
        u, s, e = u[order], s[order], e[order]
        df = pd.DataFrame({"u": u, "e": e})
        cme = df.groupby("u", sort=False)["e"].cummax()
        pmax = cme.groupby(df["u"], sort=False).shift(1).to_numpy()
        start = np.isnan(pmax) | (s > np.nan_to_num(pmax,
                                                    nan=-np.inf))
        island = np.cumsum(start) - 1
        # per-island bounds: first row is the island's min s (sorted),
        # island end is the max e = cummax at the island's last row
        isl_start_s = s[start]
        last_of_island = np.concatenate([start[1:], [True]])
        isl_end_e = cme.to_numpy()[last_of_island]
        isl_user = u[start]
        cover = isl_end_e - isl_start_s
        uu, inv = np.unique(isl_user, return_inverse=True)
        tot = np.zeros(len(uu), dtype=np.int64)
        np.add.at(tot, inv, cover.astype(np.int64))
        cnt = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uu),
            "n_islands": pa.array(cnt),
            "active_us": pa.array(tot),
        })

    return (_read(sf_dir, "events", ["user_id", "ts"])
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_lang_length_gini(sf_dir: str):
    """Inequality statistics: per-language Gini coefficient of document
    lengths, exactly, via the sorted-prefix-sum identity
    G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x)) — the numerator
    and denominator are exact int64, the ppm ratio is one deterministic
    double division. One lang-keyed shuffle + in-block sort; the rank
    weights make this a genuinely order-dependent grouped statistic
    (unlike sums/moments) yet it still folds per group locally."""
    import pyarrow as pa

    _empty = pa.table({
        "lang": pa.array([], type=pa.string()),
        "n_docs": pa.array([], type=pa.int64()),
        "gini_ppm": pa.array([], type=pa.int64()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        lang = b.column("lang").to_pylist()
        x = b.column("n_chars").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uk, inv = np.unique(np.asarray(lang), return_inverse=True)
        order = np.lexsort((x, inv))
        xi, gi = x[order], inv[order]
        # per-group 1-based rank of the sorted values
        first = np.concatenate([[True], gi[1:] != gi[:-1]])
        idx = np.arange(len(gi), dtype=np.int64)
        gstart = np.zeros(len(gi), dtype=np.int64)
        gstart[first] = idx[first]
        np.maximum.accumulate(gstart, out=gstart)
        rank = idx - gstart + 1
        n = np.bincount(gi, minlength=len(uk)).astype(np.int64)
        sx = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sx, gi, xi)
        srx = np.zeros(len(uk), dtype=np.int64)
        np.add.at(srx, gi, rank * xi)
        num = 2 * srx - (n + 1) * sx
        den = n * sx
        ppm = np.floor(num.astype(np.float64) * 1_000_000.0
                       / den.astype(np.float64) + 0.5).astype(np.int64)
        return pa.table({
            "lang": pa.array([str(k) for k in uk], type=pa.string()),
            "n_docs": pa.array(n),
            "gini_ppm": pa.array(ppm),
        })

    return (_read(sf_dir, "documents", ["lang", "n_chars"])
            .repartition(8, keys=["lang"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_totalprice_first_digit(sf_dir: str):
    """Benford screen: distribution of the leading digit of order total
    prices (in cents), with each digit's observed share in ppm — the
    standard fraud/synthetic-data smoke test. Digit extraction is an
    exact integer loop on magnitudes (no float log), combined per block
    and folded once."""
    import pyarrow as pa

    def partial(b):
        ep = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        v = np.floor(ep * 100 + 0.5).astype(np.int64)
        v = np.abs(v)
        # strip trailing magnitudes: at most 19 halvings of magnitude
        while True:
            big = v >= 10
            if not big.any():
                break
            v[big] //= 10
        counts = np.bincount(v, minlength=10).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()],
                                            type=pa.large_binary())})

    def fold(b):
        tot = np.zeros(10, dtype=np.int64)
        for row in b.column("counts").to_pylist():
            tot += np.frombuffer(row, dtype=np.int64)[:10]
        digits = np.arange(1, 10, dtype=np.int64)
        n = tot.sum()
        share = np.floor(tot[1:].astype(np.float64) * 1_000_000.0
                         / float(n) + 0.5).astype(np.int64)
        keep = tot[1:] > 0  # mirror SQL GROUP BY: absent digits absent
        return pa.table({
            "digit": pa.array(digits[keep]),
            "n_orders": pa.array(tot[1:][keep]),
            "share_ppm": pa.array(share[keep]),
        })

    return (_read(sf_dir, "orders", ["o_totalprice"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_supplier_abc_classes(sf_dir: str):
    """ABC (Pareto 80/20) inventory analysis: rank suppliers by exact
    revenue cents, take cumulative share of the grand total, and class
    them A (first 70%), B (to 90%), C (rest) — ties broken by suppkey
    so the classing is deterministic. Per-block suppkey partials fold
    to one bounded row-per-supplier table; the cumulative pass is a
    sort + cumsum over that small fold, never over the fact table."""
    import pyarrow as pa

    def partial(b):
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        t = pa.table({
            "s_suppkey": b.column("l_suppkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })
        g = t.group_by(["s_suppkey"]).aggregate([("cents", "sum")])
        return pa.table({
            "s_suppkey": g.column("s_suppkey"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    _empty = pa.table({
        "s_suppkey": pa.array([], type=pa.int64()),
        "revenue_cents": pa.array([], type=pa.int64()),
        "cum_share_ppm": pa.array([], type=pa.int64()),
        "abc_class": pa.array([], type=pa.string()),
    })

    def fold(b):
        if len(b) == 0:
            return _empty
        g = b.group_by(["s_suppkey"]).aggregate([("cents", "sum")])
        sk = g.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = g.column("cents_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((sk, -cents))
        sk, cents = sk[order], cents[order]
        tot = cents.sum()
        cum = np.cumsum(cents)
        ppm = np.floor(cum.astype(np.float64) * 1_000_000.0
                       / float(tot) + 0.5).astype(np.int64)
        cls = np.where(ppm <= 700_000, "A",
                       np.where(ppm <= 900_000, "B", "C"))
        return pa.table({
            "s_suppkey": pa.array(sk),
            "revenue_cents": pa.array(cents),
            "cum_share_ppm": pa.array(ppm),
            "abc_class": pa.array(cls.tolist(), type=pa.string()),
        })

    return (_read(sf_dir, "lineitem",
                  ["l_suppkey", "l_extendedprice", "l_discount"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_source_simpson_diversity(sf_dir: str):
    """Diversity indices: per-source Simpson concentration of the token
    distribution, exactly — D = sum n_i(n_i-1) / (N(N-1)) in ppm, all
    integer until one deterministic double division. Two keyed folds:
    per-(source, token) counts (combiner first), then a per-source
    reduction of the squared-count mass. Complements the Gini operator
    with the other classic inequality/diversity family."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        src = b.column("source").cast(pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b.column("text").cast(pa.string())),
            r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        src_rep = src.take(pa.array(
            np.repeat(np.arange(len(b), dtype=np.int64), n_per)))
        t = pa.table({"source": src_rep, "token": flat})
        t = t.filter(pc.not_equal(t.column("token"), ""))
        g = t.group_by(["source", "token"]).aggregate([([], "count_all")])
        return pa.table({
            "source": g.column("source"),
            "token": g.column("token"),
            "cnt": g.column("count_all").cast(pa.int64()),
        })

    def token_fold(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "sq": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["source", "token"]).aggregate([("cnt", "sum")])
        c = g.column("cnt_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = g.column("source").to_pylist()
        uk, inv = np.unique(np.asarray(src), return_inverse=True)
        sq = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sq, inv, c * (c - 1))
        n = np.zeros(len(uk), dtype=np.int64)
        np.add.at(n, inv, c)
        return pa.table({
            "source": pa.array([str(k) for k in uk], type=pa.string()),
            "sq": pa.array(sq),
            "n": pa.array(n),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
                "simpson_ppm": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["source"]).aggregate([("sq", "sum"),
                                              ("n", "sum")])
        sq = g.column("sq_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = g.column("n_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ppm = np.floor(sq.astype(np.float64) * 1_000_000.0
                       / (n.astype(np.float64) * (n - 1).astype(
                           np.float64)) + 0.5).astype(np.int64)
        return pa.table({
            "source": g.column("source").cast(pa.string()),
            "n_tokens": pa.array(n),
            "simpson_ppm": pa.array(ppm),
        })

    return (_read(sf_dir, "documents", ["source", "text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["source", "token"])
            .map_batches(token_fold, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_part_min_cost_supplier(sf_dir: str):
    """TPC-H Q2-shaped min-cost supplier per part (no partsupp table in
    the driver schema, so "cost" is the supplier's account balance and
    eligibility is "has shipped the part"): for every part with
    p_size >= 45, pick the supplier with the minimum s_acctbal (ties:
    min s_suppkey) among suppliers appearing on the part's lineitems.
    Distributed shape: broadcast the filtered part dim, distinct
    (partkey, suppkey) per block, partkey-keyed shuffle, per-part argmin
    fold against the broadcast supplier dim."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import (auto_partitions,
                                                           gather_table)

    part = gather_table(_read(sf_dir, "part",
                              ["p_partkey", "p_name", "p_size"]))
    part = part.filter(pc.greater_equal(part.column("p_size"), 45))
    pnames = {int(k): n for k, n in zip(
        part.column("p_partkey").to_pylist(),
        part.column("p_name").to_pylist())}

    sup = gather_table(_read(sf_dir, "supplier",
                             ["s_suppkey", "s_name", "s_acctbal"]))
    skeys = sup.column("s_suppkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    sbal = np.floor(sup.column("s_acctbal").to_numpy(zero_copy_only=False)
                    * 100 + 0.5).astype(np.int64)
    smax = int(skeys.max()) + 1 if len(skeys) else 1
    bal_lut = np.zeros(smax, dtype=np.int64)
    bal_lut[skeys] = sbal
    name_lut = {int(k): n for k, n in zip(
        skeys, sup.column("s_name").to_pylist())}
    keep_arr = pa.array(sorted(pnames), type=pa.int64())

    def pairs(b):
        pk = b.column("l_partkey").cast(pa.int64())
        sk = b.column("l_suppkey").cast(pa.int64())
        t = pa.table({"p_partkey": pk, "s_suppkey": sk})
        t = t.filter(pc.is_in(pk, value_set=keep_arr))
        # in-block distinct kills the fan-in before the shuffle
        return t.group_by(["p_partkey", "s_suppkey"]).aggregate([])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "p_partkey": pa.array([], type=pa.int64()),
                "p_name": pa.array([], type=pa.string()),
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "acctbal_cents": pa.array([], type=pa.int64()),
            })
        t = b.group_by(["p_partkey", "s_suppkey"]).aggregate([])
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = t.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bal = bal_lut[sk]
        # argmin per part on (acctbal_cents, s_suppkey)
        order = np.lexsort((sk, bal, pk))
        pk, sk, bal = pk[order], sk[order], bal[order]
        first = np.ones(len(pk), dtype=bool)
        first[1:] = pk[1:] != pk[:-1]
        pk, sk, bal = pk[first], sk[first], bal[first]
        return pa.table({
            "p_partkey": pa.array(pk),
            "p_name": pa.array([pnames[int(k)] for k in pk],
                               type=pa.string()),
            "s_suppkey": pa.array(sk),
            "s_name": pa.array([name_lut[int(k)] for k in sk],
                               type=pa.string()),
            "acctbal_cents": pa.array(bal),
        })

    line = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    P = auto_partitions(len(pnames), 10_000, 16)
    return (line.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True)
            .repartition(P, keys=["p_partkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("p_partkey"))


def _q_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9-shaped profit report (no partsupp/supplycost in the
    driver schema, so profit is plain discounted revenue): exact cents
    of sum(l_extendedprice*(1-l_discount)) for parts whose name
    contains 'gear', grouped by the supplier's nation and the ORDER
    year. Part + supplier + nation dims broadcast; the one genuinely
    wide step (attaching o_orderdate) is the engine hash_join on
    orderkey."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.join import hash_join

    part = gather_table(_read(sf_dir, "part", ["p_partkey", "p_name"]))
    gear = part.filter(pc.match_substring(part.column("p_name"), "gear"))
    gkeys = pa.array(sorted(gear.column("p_partkey").to_pylist()),
                     type=pa.int64())

    sup = gather_table(_read(sf_dir, "supplier",
                             ["s_suppkey", "s_nationkey"]))
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    snat = sup.column("s_nationkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nat_lut = np.zeros(int(sk.max()) + 1 if len(sk) else 1, dtype=np.int64)
    nat_lut[sk] = snat
    nat = gather_table(_read(sf_dir, "nation", None))
    nnames = {int(k): n for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}

    def prep_line(b):
        m = pc.is_in(b.column("l_partkey").cast(pa.int64()),
                     value_set=gkeys)
        t = b.filter(m)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        skey = t.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "nationkey": pa.array(nat_lut[skey]),
            "cents": pa.array(cents),
        })

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount"]) \
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_year": pc.year(b.column("o_orderdate")).cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(line, orders, on=("l_orderkey", "o_orderkey"))

    def partial(b):
        g = b.group_by(["nationkey", "o_year"]).aggregate([("cents",
                                                            "sum")])
        return pa.table({
            "nationkey": g.column("nationkey").cast(pa.int64()),
            "o_year": g.column("o_year").cast(pa.int64()),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "nation": pa.array([], type=pa.string()),
                "o_year": pa.array([], type=pa.int64()),
                "profit_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["nationkey", "o_year"]).aggregate([("cents",
                                                            "sum")])
        nk = g.column("nationkey").to_pylist()
        return pa.table({
            "nation": pa.array([nnames[int(k)] for k in nk],
                               type=pa.string()),
            "o_year": g.column("o_year").cast(pa.int64()),
            "profit_cents": g.column("cents_sum").cast(pa.int64()),
        })

    return (j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["nation", "o_year"]))


def _q_important_parts(sf_dir: str):
    """TPC-H Q11-shaped "important stock" scan (value = shipped
    extended price instead of partsupp supplycost*availqty): per-part
    revenue cents, keeping parts whose value exceeds 150% of the mean
    per-part value — the HAVING threshold applied as the exact integer
    cross-multiplication 2 * value_cents * n_parts > 3 * total_cents
    (scale-free, unlike an absolute share cutoff), so no float
    division can diverge between engines. Per-block partials bound the
    shuffle to #parts rows; the final fold sees the (bounded) per-part
    table in one block and applies the global threshold there."""
    import pyarrow as pa

    def partial(b):
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * 100 + 0.5).astype(np.int64)
        t = pa.table({
            "p_partkey": b.column("l_partkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })
        g = t.group_by(["p_partkey"]).aggregate([("cents", "sum")])
        return pa.table({
            "p_partkey": g.column("p_partkey"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "p_partkey": pa.array([], type=pa.int64()),
                "value_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["p_partkey"]).aggregate([("cents", "sum")])
        v = g.column("cents_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        total = int(v.sum())
        keep = 2 * v * len(v) > 3 * total
        return pa.table({
            "p_partkey": pa.array(
                g.column("p_partkey").to_numpy(zero_copy_only=False)
                .astype(np.int64)[keep]),
            "value_cents": pa.array(v[keep]),
        })

    return (_read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("p_partkey"))


def _q_priority_by_quantity_band(sf_dir: str):
    """TPC-H Q12-shaped priority split (no l_shipmode in the driver
    schema, so the banding column is a quantity band): lineitems
    shipped in 1996-1997 are banded HIGH-QTY (>= 25) / LOW-QTY, and per
    band we count lines whose order priority is urgent/high vs the
    rest. The order-priority flag rides the engine hash_join on
    orderkey; counts are exact int64."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.join import hash_join

    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1998, 1, 1), type=pa.timestamp("us"))

    def prep_line(b):
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi))
        t = b.filter(m)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        band = np.where(qty >= 25.0, "HIGH-QTY", "LOW-QTY")
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "band": pa.array(band, type=pa.string()),
        })

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_quantity", "l_shipdate"]) \
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "is_high": pc.is_in(
                b.column("o_orderpriority"),
                value_set=pa.array(["1-URGENT", "2-HIGH"])).cast(
                    pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(line, orders, on=("l_orderkey", "o_orderkey"))

    def partial(b):
        hi_ = b.column("is_high")
        lo_ = pc.subtract(pa.scalar(1, type=pa.int64()), hi_)
        t = pa.table({"band": b.column("band"), "h": hi_, "l": lo_})
        g = t.group_by(["band"]).aggregate([("h", "sum"), ("l", "sum")])
        return pa.table({
            "band": g.column("band"),
            "h": g.column("h_sum").cast(pa.int64()),
            "l": g.column("l_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "band": pa.array([], type=pa.string()),
                "high_line_count": pa.array([], type=pa.int64()),
                "low_line_count": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["band"]).aggregate([("h", "sum"), ("l", "sum")])
        return pa.table({
            "band": g.column("band"),
            "high_line_count": g.column("h_sum").cast(pa.int64()),
            "low_line_count": g.column("l_sum").cast(pa.int64()),
        })

    return (j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("band"))


def _q_brand_excess_suppliers(sf_dir: str):
    """TPC-H Q20-shaped excess-supplier scan (no partsupp availqty, so
    "excess" is shipped volume): suppliers whose 1996 shipped quantity
    of Brand#21 parts exceeds 150% of that brand-year's average
    per-supplier quantity. The threshold is the exact integer
    cross-multiplication 2 * qty_i * n_suppliers > 3 * total_qty.
    Brand part set broadcast; per-supplier partials bound the shuffle
    to #suppliers rows."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table

    part = gather_table(_read(sf_dir, "part", ["p_partkey", "p_brand"]))
    bk = part.filter(pc.equal(part.column("p_brand"), "Brand#21"))
    bkeys = pa.array(sorted(bk.column("p_partkey").to_pylist()),
                     type=pa.int64())
    sup = gather_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    names = {int(k): n for k, n in zip(
        sup.column("s_suppkey").to_pylist(),
        sup.column("s_name").to_pylist())}

    lo = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1997, 1, 1), type=pa.timestamp("us"))

    def partial(b):
        m = pc.and_(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi)),
            pc.is_in(b.column("l_partkey").cast(pa.int64()),
                     value_set=bkeys))
        t = b.filter(m)
        qty = np.floor(t.column("l_quantity")
                       .to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64)
        tt = pa.table({
            "s_suppkey": t.column("l_suppkey").cast(pa.int64()),
            "qty": pa.array(qty),
        })
        g = tt.group_by(["s_suppkey"]).aggregate([("qty", "sum")])
        return pa.table({
            "s_suppkey": g.column("s_suppkey"),
            "qty": g.column("qty_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "shipped_qty": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["s_suppkey"]).aggregate([("qty", "sum")])
        q = g.column("qty_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        total = int(q.sum())
        n = len(q)
        keep = 2 * q * n > 3 * total
        sk = g.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({
            "s_suppkey": pa.array(sk),
            "s_name": pa.array([names[int(k)] for k in sk],
                               type=pa.string()),
            "shipped_qty": pa.array(q[keep]),
        })

    return (_read(sf_dir, "lineitem",
                  ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("s_suppkey"))


def _q_late_sole_suppliers(sf_dir: str):
    """TPC-H Q21-shaped "sole late supplier" count (no commit/receipt
    dates in the driver schema, so lateness = being the unique last
    shipper): for every order with >= 2 distinct suppliers where
    exactly one supplier shipped on the order's max shipdate, charge
    that supplier one wait. Orderkey-keyed shuffle co-locates each
    order's lines; the per-block fold is pure vectorized numpy
    (lexsort + run boundaries); supplier names broadcast at the end."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import (auto_partitions,
                                                           gather_table)

    sup = gather_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    names = {int(k): n for k, n in zip(
        sup.column("s_suppkey").to_pylist(),
        sup.column("s_name").to_pylist())}

    def prep(b):
        return pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
            "ship_us": b.column("l_shipdate").cast(pa.int64()),
        })

    def per_order(b):
        if len(b) == 0:
            return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                             "waits": pa.array([], type=pa.int64())})
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        ts = b.column("ship_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ts, ok))
        ok, sk, ts = ok[order], sk[order], ts[order]
        n = len(ok)
        start = np.ones(n, dtype=bool)
        start[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(start)
        ends = np.append(starts[1:], n)
        # per order: max ts (last row of the sorted run), distinct
        # suppliers overall, distinct suppliers at the max ts
        mx = ts[ends - 1]
        # distinct suppliers per order: count supplier changes within runs
        supp_sorted = np.lexsort((ts, sk, ok))
        ok2, sk2 = ok[supp_sorted], sk[supp_sorted]
        new_pair = np.ones(n, dtype=bool)
        new_pair[1:] = (ok2[1:] != ok2[:-1]) | (sk2[1:] != sk2[:-1])
        nsupp = np.add.reduceat(new_pair.astype(np.int64), starts)
        # rows at the order max ts
        mx_per_row = np.repeat(mx, ends - starts)
        at_max = ts == mx_per_row
        okm, skm = ok[at_max], sk[at_max]
        # distinct suppliers among max rows, per order
        om = np.lexsort((skm, okm))
        okm, skm = okm[om], skm[om]
        newm = np.ones(len(okm), dtype=bool)
        newm[1:] = (okm[1:] != okm[:-1]) | (skm[1:] != skm[:-1])
        okm_d, skm_d = okm[newm], skm[newm]
        startm = np.ones(len(okm_d), dtype=bool)
        startm[1:] = okm_d[1:] != okm_d[:-1]
        startsm = np.flatnonzero(startm)
        endsm = np.append(startsm[1:], len(okm_d))
        nmax = endsm - startsm
        # orders qualifying: >=2 suppliers total, exactly 1 at the max
        qual = (nsupp >= 2) & (nmax == 1)
        winners = skm_d[startsm[qual]]
        if len(winners) == 0:
            return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                             "waits": pa.array([], type=pa.int64())})
        uk, cnt = np.unique(winners, return_counts=True)
        return pa.table({"s_suppkey": pa.array(uk.astype(np.int64)),
                         "waits": pa.array(cnt.astype(np.int64))})

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "numwait": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["s_suppkey"]).aggregate([("waits", "sum")])
        sk = g.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "s_suppkey": pa.array(sk),
            "s_name": pa.array([names[int(k)] for k in sk],
                               type=pa.string()),
            "numwait": g.column("waits_sum").cast(pa.int64()),
        })

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    n_rows = line.count()
    P = auto_partitions(n_rows, 200_000, 32)
    return (line.repartition(P, keys=["l_orderkey"])
            .map_batches(per_order, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("s_suppkey"))


def _q_skew_join_segment_value(sf_dir: str):
    """Skew-aware join showcase: events ⋈ customer on user_id, hot user
    keys detected by the distributed frequent-items pass and routed
    around the shuffle (broadcast of the matching customer rows), cold
    keys through the standard co-partition join — then per-mktsegment
    event counts and exact value cents. min_hot_frac is set low enough
    that the hot path genuinely engages on the driver tables (top users
    hold ~0.9% of events), so both routes are exercised and the result
    must still equal the plain SQL join."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.join import skew_join

    def prep_events(b):
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "cents": pa.array(cents),
        })

    ev = _read(sf_dir, "events", ["user_id", "value"]) \
        .map_batches(prep_events, batch_format="pyarrow",
                     zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_mktsegment": b.column("c_mktsegment"),
        }), batch_format="pyarrow", zero_copy_batch=True)

    j = skew_join(ev, cust, on=("user_id", "c_custkey"),
                  min_hot_frac=0.005)

    def partial(b):
        t = pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "cents": b.column("cents"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["c_mktsegment"]).aggregate(
            [("cents", "sum"), ("one", "sum")])
        return pa.table({
            "c_mktsegment": g.column("c_mktsegment"),
            "cents": g.column("cents_sum").cast(pa.int64()),
            "n": g.column("one_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "c_mktsegment": pa.array([], type=pa.string()),
                "n_events": pa.array([], type=pa.int64()),
                "value_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["c_mktsegment"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return pa.table({
            "c_mktsegment": g.column("c_mktsegment"),
            "n_events": g.column("n_sum").cast(pa.int64()),
            "value_cents": g.column("cents_sum").cast(pa.int64()),
        })

    return (j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("c_mktsegment"))


def _q_sketch_blob_langs_by_source(sf_dir: str):
    """Sketch-column persistence round-trip — the DataSketches
    data-mart pattern the reference's wire format exists for: per-source
    HLL sketches of the lang column are built distributed, serialized
    in the reference wire format (serde_compat.write_hll — bit-exact vs
    the Go/Java/C++ goldens), WRITTEN TO PARQUET, read back in a second
    pipeline, merged per key at the wire level, and finalized. Exact
    here because per-source language cardinality keeps every sketch in
    coupon (LIST/SET) mode; SQL-checked vs count(DISTINCT lang)."""
    import shutil

    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        hll_wire_estimate, hll_wire_sketch_column_by)

    tier = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/adgr_sketchcol/{tier}"
    shutil.rmtree(out_dir, ignore_errors=True)

    docs = _read(sf_dir, "documents", ["source", "lang"])
    col = hll_wire_sketch_column_by(docs, "source", "lang", lg_k=12)
    col.write_parquet(out_dir)

    back = ray.data.read_parquet(out_dir)
    est = hll_wire_estimate(back, "source", out_col="est")

    def fin(b):
        e = b.column("est").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b.column("source"),
            "n_langs": pa.array(np.floor(e + 0.5).astype(np.int64)),
        })

    return (est.map_batches(fin, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort("source"))


def _q_semantic_decontaminate(sf_dir: str):
    """Embedding-space eval-set decontamination: training vectors whose
    cosine similarity to any held-out eval vector (vec_id % 11 == 0)
    reaches 0.4, with the count of contaminating eval neighbors. The
    eval matrix broadcasts once; each training block is one matmul —
    no shuffle (stages/decontaminate.semantic_decontaminate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.decontaminate import (
        semantic_decontaminate,
    )

    def _split(b, keep_eval):
        vid = b.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        m = pa.array(vid % 11 == 0)
        t = b.filter(m if keep_eval else pc.invert(m))
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "embedding": t.column("embedding"),
        })

    import functools

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ev = emb.map_batches(functools.partial(_split, keep_eval=True),
                         batch_format="pyarrow", zero_copy_batch=True)
    tr = emb.map_batches(functools.partial(_split, keep_eval=False),
                         batch_format="pyarrow", zero_copy_batch=True)
    return semantic_decontaminate(tr, ev, threshold=0.4).sort("vec_id")


def _q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: per query vector
    (vec_id % 37 == 0), the 3 most cosine-similar corpus vectors with a
    DIFFERENT label — broadcast query matrix, masked matmul per block,
    driver fold of bounded partials (stages/embops.hard_negative_topk)."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import gather_table
    from apache_datasketches_go_ray.stages.embops import hard_negative_topk

    import pyarrow as pa

    emb = _read(sf_dir, "embeddings", None)

    def _only_queries(b):
        vid = b.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return b.filter(pa.array(vid % 37 == 0))

    # the query subset (1/37 of rows) is selected DISTRIBUTED; only it
    # ever reaches the driver
    qt = gather_table(emb.map_batches(_only_queries,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)).to_pandas()
    qids = qt["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.vstack(qt["embedding"].to_numpy())
    qlabels = qt["label"].to_numpy(dtype=np.int64)

    t = hard_negative_topk(emb, qids, qmat, qlabels, k=3)
    return t.select(["query_id", "vec_id", "rank"])


def _q_join_key_multiplicity(sf_dir: str):
    """Join-planner statistic: the multiplicity histogram of a join key
    (how many keys occur m times). sum(m^2) over this table is the
    EXACT self-join cardinality and sum(m_l*m_r) the join size — the
    pre-join explosion guard a planner runs before committing to a
    shuffle. Per-block (key, count) partials bound the shuffle to
    distinct keys; the histogram fold is KB-sized."""
    import pyarrow as pa

    def partial(b):
        t = pa.table({
            "k": b.column("l_partkey").cast(pa.int64()),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["k"]).aggregate([("one", "sum")])
        return pa.table({
            "k": g.column("k"),
            "c": g.column("one_sum").cast(pa.int64()),
        })

    def key_fold(b):
        if len(b) == 0:
            return pa.table({"m": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        g = b.group_by(["k"]).aggregate([("c", "sum")])
        m = g.column("c_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        um, cnt = np.unique(m, return_counts=True)
        return pa.table({"m": pa.array(um),
                         "n": pa.array(cnt.astype(np.int64))})

    def final(b):
        if len(b) == 0:
            return pa.table({
                "multiplicity": pa.array([], type=pa.int64()),
                "n_keys": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["m"]).aggregate([("n", "sum")])
        return pa.table({
            "multiplicity": g.column("m").cast(pa.int64()),
            "n_keys": g.column("n_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "lineitem", ["l_partkey"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["k"])
            .map_batches(key_fold, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("multiplicity"))


def _q_length_bucket_plan(sf_dir: str):
    """Sequence-length bucketing plan for padded-batch training: quartile
    bucket caps (percentile_disc semantics) over doc lengths plus the
    EXACT padding waste each bucket would incur (sum of cap - len).
    One pass of per-block (n_chars, count) partials — the full plan
    derives from the tiny value histogram, no second data pass."""
    import pyarrow as pa

    def partial(b):
        v = b.column("n_chars").cast(pa.int64())
        t = pa.table({"v": v,
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        g = t.group_by(["v"]).aggregate([("one", "sum")])
        return pa.table({"v": g.column("v"),
                         "n": g.column("one_sum").cast(pa.int64())})

    def final(b):
        if len(b) == 0:
            return pa.table({
                "bucket": pa.array([], type=pa.int64()),
                "cap": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "waste_chars": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["v"]).aggregate([("n", "sum")])
        v = g.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        n = g.column("n_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(v)
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        # percentile_disc: smallest value whose cdf reaches p
        caps = [int(v[np.searchsorted(cum, int(np.ceil(p * total)))])
                for p in (0.25, 0.5, 0.75)] + [int(v[-1])]
        lo = [np.iinfo(np.int64).min] + caps[:-1]
        buckets, out_caps, nd, waste = [], [], [], []
        for i, (a, c) in enumerate(zip(lo, caps)):
            m = (v > a) & (v <= c)
            cnt = int(n[m].sum())
            if cnt == 0:
                # quartile ties empty a bucket; the SQL GROUP BY emits
                # no row for it, so neither do we
                continue
            buckets.append(i + 1)
            out_caps.append(c)
            nd.append(cnt)
            waste.append(int(((c - v[m]) * n[m]).sum()))
        return pa.table({
            "bucket": pa.array(buckets, type=pa.int64()),
            "cap": pa.array(out_caps, type=pa.int64()),
            "n_docs": pa.array(nd, type=pa.int64()),
            "waste_chars": pa.array(waste, type=pa.int64()),
        })

    return (_read(sf_dir, "documents", ["n_chars"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("bucket"))


def _q_freq_blob_top_tokens_by_lang(sf_dir: str):
    """Frequent-items sketch-column persistence round-trip (the sibling
    of sketch_blob_langs_by_source for the second sketch family):
    per-lang token sketches serialized in the reference
    ItemsSketch[string] wire format, written to parquet, read back,
    merged per key at the wire level (longs_sketch.go:451-466 Merge
    semantics) and finalized to top-5 tokens. Map capacity exceeds the
    per-lang vocab at oracle scale, so offset stays 0 and estimates are
    exact counts — SQL-checked."""
    import shutil

    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        freq_wire_sketch_column_by, freq_wire_top_items)

    tier = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/adgr_freqcol/{tier}"
    shutil.rmtree(out_dir, ignore_errors=True)

    docs = _read(sf_dir, "documents", ["lang", "text"])
    col = freq_wire_sketch_column_by(docs, "lang", "text",
                                     max_map_size=1 << 16, tokenize=True,
                                     num_partitions=8)
    col.write_parquet(out_dir)
    back = ray.data.read_parquet(out_dir)
    return freq_wire_top_items(back, "lang", k=5).sort(["lang", "rank"])


def _q_char_budget_subset(sf_dir: str):
    """Budget-capped corpus subsetting — "take the longest documents
    until 20% of the corpus's characters are spent" (the token-budget
    data-mixing primitive, char-weighted so both engines share an exact
    integer weight). NO global sort: doc lengths have bounded value
    cardinality, so one per-value (count, char-sum) histogram fold
    yields the exact cut value; only the boundary-value docs (usually a
    handful) are fetched and tie-broken by doc_id. Same selection as
    the SQL cumulative-window oracle, at any corpus size."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.context import gather_table

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"]) \
        .map_batches(lambda b: pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "nc": b.column("n_chars").cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True).materialize()

    def hist_partial(b):
        g = b.group_by(["nc"]).aggregate([("doc_id", "count"),
                                          ("nc", "sum")])
        return pa.table({
            "nc": g.column("nc"),
            "cnt": g.column("doc_id_count").cast(pa.int64()),
            "chars": g.column("nc_sum").cast(pa.int64()),
        })

    hist = gather_table(docs.map_batches(hist_partial,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))
    g = hist.group_by(["nc"]).aggregate([("cnt", "sum"), ("chars", "sum")])
    v = g.column("nc").to_numpy(zero_copy_only=False).astype(np.int64)
    chars = g.column("chars_sum").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.argsort(-v)
    v, chars = v[order], chars[order]
    budget = int(chars.sum()) // 5
    cum = np.cumsum(chars)
    # values fully inside the budget
    full = cum <= budget
    n_full = int(full.sum())
    spent = int(cum[n_full - 1]) if n_full else 0
    cut = int(v[n_full - 1]) if n_full else None
    boundary_val = int(v[n_full]) if n_full < len(v) else None

    sel = docs.filter(expr=f"nc >= {cut}") if cut is not None else None

    if boundary_val is not None and spent < budget:
        # docs at the boundary value enter by doc_id until the budget
        bt = gather_table(docs.filter(expr=f"nc == {boundary_val}"))
        bid = np.sort(bt.column("doc_id").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        k = (budget - spent) // boundary_val
        take = bid[:k]
        if len(take):
            btbl = pa.table({
                "doc_id": pa.array(take),
                "nc": pa.array(np.full(len(take), boundary_val,
                                       dtype=np.int64)),
            })
            import ray.data as rd

            extra = rd.from_arrow(btbl)
            sel = extra if sel is None else sel.union(extra)

    if sel is None:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "n_chars": pa.array([], type=pa.int64())})

    def fin(b):
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_chars": b.column("nc")})

    return (sel.map_batches(fin, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort("doc_id"))


def _q_exact_dup_size_histogram(sf_dir: str):
    """Exact-duplicate group-size histogram over transcript TURN texts
    (the SQL-oracled sibling of the flagship's rows-only
    cluster_size_histogram — boilerplate system prompts and tool
    acknowledgements repeat heavily): group turns by verbatim text,
    count group sizes, histogram the sizes. Text never shuffles —
    per-block (text-hash, count) partials, hash-keyed fold, tiny
    histogram fold."""
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def partial(b):
        h1, _ = hash_strings(as_array(b.column("text")))
        t = pa.table({"h": pa.array(h1.astype(np.int64)),
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        g = t.group_by(["h"]).aggregate([("one", "sum")])
        return pa.table({"h": g.column("h"),
                         "c": g.column("one_sum").cast(pa.int64())})

    def key_fold(b):
        if len(b) == 0:
            return pa.table({"size": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        g = b.group_by(["h"]).aggregate([("c", "sum")])
        sz = g.column("c_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        u, cnt = np.unique(sz, return_counts=True)
        return pa.table({"size": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    def final(b):
        if len(b) == 0:
            return pa.table({
                "group_size": pa.array([], type=pa.int64()),
                "n_groups": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["size"]).aggregate([("n", "sum")])
        return pa.table({
            "group_size": g.column("size").cast(pa.int64()),
            "n_groups": g.column("n_sum").cast(pa.int64()),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["h"])
            .map_batches(key_fold, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("group_size"))


def _q_kll_blob_quantiles_by_source(sf_dir: str):
    """KLL sketch-column persistence round-trip — the THIRD persisted
    family: per-source KLL string-item sketches of doc length (values
    fixed-width-encoded so lexicographic == numeric, the reference's
    own int_to_fixed_length_string trick), serialized with the
    golden-tested ItemsSketch[string].ToSlice() writer, WRITTEN TO
    PARQUET, read back, merged per key with the reference's Merge
    algorithm (kll/items_sketch.go:555-693 replicated at
    serde_compat.kll_string_merge), finalized to percentile_disc
    quartiles. k=8192 > per-source corpus at oracle tiers keeps every
    sketch un-compacted, so the result is exact — SQL-checked."""
    import shutil

    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        kll_wire_quantiles, kll_wire_sketch_column_by)

    tier = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/adgr_kllcol/{tier}"
    shutil.rmtree(out_dir, ignore_errors=True)

    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    col = kll_wire_sketch_column_by(docs, "source", "n_chars", k=8192,
                                    num_partitions=8)
    col.write_parquet(out_dir)
    back = ray.data.read_parquet(out_dir)
    return kll_wire_quantiles(back, "source").sort("source")


def _q_conv_lang_switches(sf_dir: str):
    """Code-switching profile per conversation (multilingual curation
    signal): per-turn language ID (the same vectorized stopword argmax
    the langid query pins value-exact), then per conv the number of
    adjacent-turn language changes and distinct languages. One conv
    keyed shuffle; the fold is a lexsort + two run-boundary masks."""
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.arrow_util import as_array
    from apache_datasketches_go_ray.stages.textops import langid_batch

    def pred(b):
        out = langid_batch(b)
        return pa.table({
            "conv_id": out.column("conv_id"),
            "turn_idx": out.column("turn_idx").cast(pa.int64()),
            "lang_pred": out.column("lang_pred"),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
                "n_langs": pa.array([], type=pa.int64()),
                "n_switches": pa.array([], type=pa.int64()),
            })
        import pyarrow.compute as pc

        conv = as_array(b.column("conv_id"))
        d = as_array(pc.dictionary_encode(conv))
        codes = d.indices.to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        lang = np.asarray(as_array(b.column("lang_pred")).to_pylist(),
                          dtype=object)
        order = np.lexsort((tidx, codes))
        c, lg = codes[order], lang[order]
        n_convs = len(d.dictionary)
        n_turns = np.bincount(c, minlength=n_convs).astype(np.int64)
        same = np.zeros(len(c), dtype=bool)
        same[1:] = c[1:] == c[:-1]
        switch = same & (lg != np.roll(lg, 1))
        n_sw = np.zeros(n_convs, dtype=np.int64)
        np.add.at(n_sw, c[switch], 1)
        # distinct langs per conv
        o2 = np.lexsort((lg, c))
        c2, l2 = c[o2], lg[o2]
        newpair = np.ones(len(c2), dtype=bool)
        newpair[1:] = (c2[1:] != c2[:-1]) | (l2[1:] != l2[:-1])
        n_lang = np.zeros(n_convs, dtype=np.int64)
        np.add.at(n_lang, c2[newpair], 1)
        return pa.table({
            "conv_id": d.dictionary.cast(pa.string()),
            "n_turns": pa.array(n_turns),
            "n_langs": pa.array(n_lang),
            "n_switches": pa.array(n_sw),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id", "turn_idx", "text"])
            .map_batches(pred, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("conv_id"))


def _q_daily_value_quantiles(sf_dir: str):
    """Operational percentile dashboard: per-day p50/p90 of event value
    in exact cents (ANSI percentile_disc) — the existing exact grouped
    quantile operator applied on a calendar key."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
    )

    def prep(b):
        day = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({"day": day, "cents": pa.array(cents)})

    ds = _read(sf_dir, "events", ["ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_quantile_disc(ds, "day", "cents", (0.5, 0.9),
                                 num_partitions=8).sort("day")


def _q_ri_audit(sf_dir: str):
    """Referential-integrity audit between the fact tables (the
    data-quality gate every warehouse load runs): lineitems whose
    orderkey has no order, and orders with no lineitems. Both directions
    are one tagged-union presence fold — no join materializes."""
    import pyarrow as pa

    def tag(b, col, side):
        return pa.table({
            "k": b.column(col).cast(pa.int64()),
            "side": pa.array(np.full(len(b), side, dtype=np.int8)),
        })

    import functools

    line = _read(sf_dir, "lineitem", ["l_orderkey"]) \
        .map_batches(functools.partial(tag, col="l_orderkey", side=0),
                     batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey"]) \
        .map_batches(functools.partial(tag, col="o_orderkey", side=1),
                     batch_format="pyarrow", zero_copy_batch=True)

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "orphan_lineitems": pa.array([], type=pa.int64()),
                "childless_orders": pa.array([], type=pa.int64()),
            })
        k = b.column("k").to_numpy(zero_copy_only=False)
        s = b.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        k, s = k[order], s[order]
        start = np.ones(len(k), dtype=bool)
        start[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(start)
        ends = np.append(starts[1:], len(k))
        has_line = s[starts] == 0
        has_order = s[ends - 1] == 1
        orphan_rows = 0
        # orphan lineitem ROWS: keys with lines but no order
        bad = has_line & ~has_order
        if bad.any():
            counts = ends - starts
            orphan_rows = int(counts[bad].sum())
        childless = int((~has_line & has_order).sum())
        return pa.table({
            "orphan_lineitems": pa.array([orphan_rows], type=pa.int64()),
            "childless_orders": pa.array([childless], type=pa.int64()),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "orphan_lineitems": pa.array([0], type=pa.int64()),
                "childless_orders": pa.array([0], type=pa.int64()),
            })
        return pa.table({
            "orphan_lineitems": pa.array(
                [int(b.column("orphan_lineitems").to_numpy(
                    zero_copy_only=False).sum())], type=pa.int64()),
            "childless_orders": pa.array(
                [int(b.column("childless_orders").to_numpy(
                    zero_copy_only=False).sum())], type=pa.int64()),
        })

    return (line.union(orders)
            .repartition(16, keys=["k"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_ann_pq_topk(sf_dir: str):
    """Product-quantization approximate top-k (the memory-compression
    ANN scale path — uint8 codes instead of float rows, ADC shortlist
    reranked by exact cosine in-block): same 5 queries as ann_topk.
    Rows-only here; recall and partition-independence pinned by
    tests/test_pq_ann.py."""
    import pyarrow.parquet as pq

    from apache_datasketches_go_ray.stages.ann import pq_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(emb_path).slice(0, 5)
    q_ids = head.column("vec_id").to_pylist()
    qm = np.array(head.column("embedding").to_pylist(), dtype=np.float32)
    out = pq_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                  q_ids, qm, k=10, n_subq=8, round_to=4)
    return out.select(["query_id", "vec_id", "rank"])


def _q_events_anomaly_days(sf_dir: str):
    """Volume-anomaly screen: days whose event count deviates from the
    across-days mean by more than 2 population standard deviations,
    tested as the exact integer cross-multiplication
    (N·cnt − total)² > 4·(N·sumsq − total²) — no float mean/σ can
    diverge between engines. Per-block day-count partials shrink to the
    tiny day table before the single-block screen."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        day = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        t = pa.table({"day": day,
                      "one": pa.array(np.ones(len(b), dtype=np.int64))})
        g = t.group_by(["day"]).aggregate([("one", "sum")])
        return pa.table({"day": g.column("day"),
                         "c": g.column("one_sum").cast(pa.int64())})

    def screen(b):
        if len(b) == 0:
            return pa.table({
                "day": pa.array([], type=pa.string()),
                "n_events": pa.array([], type=pa.int64()),
                "dev_sign": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["day"]).aggregate([("c", "sum")])
        days = g.column("day").to_pylist()
        counts = [int(x) for x in g.column("c_sum").to_pylist()]
        # the day table is tiny — arbitrary-precision Python ints keep
        # the 2-sigma test unconditionally exact (the oracle is HUGEINT)
        N = len(counts)
        total = sum(counts)
        sumsq = sum(x * x for x in counts)
        rhs = 4 * (N * sumsq - total * total)
        out_d, out_c, out_s = [], [], []
        for i in np.argsort(np.asarray(days, dtype=object)):
            dev = N * counts[i] - total
            if dev * dev > rhs:
                out_d.append(days[i])
                out_c.append(counts[i])
                out_s.append(1 if dev > 0 else (-1 if dev < 0 else 0))
        return pa.table({
            "day": pa.array(out_d, type=pa.string()),
            "n_events": pa.array(out_c, type=pa.int64()),
            "dev_sign": pa.array(out_s, type=pa.int64()),
        })

    return (_read(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(screen, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_role_transitions(sf_dir: str):
    """Corpus-wide role-transition Markov edges over conversations:
    counts of adjacent (role → next role) pairs in turn order — the
    dialogue-structure QA table (user→assistant should dominate;
    assistant→assistant flags malformed transcripts). Conv-keyed
    shuffle + in-block adjacency fold; role²-bounded partials."""
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "role_from": pa.array([], type=pa.string()),
                "role_to": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        import pyarrow.compute as pc

        conv = as_array(b.column("conv_id"))
        d = as_array(pc.dictionary_encode(conv))
        codes = d.indices.to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(as_array(b.column("role")).to_pylist(),
                          dtype=object)
        order = np.lexsort((tidx, codes))
        c, r = codes[order], role[order]
        same = np.zeros(len(c), dtype=bool)
        same[1:] = c[1:] == c[:-1]
        prev = np.flatnonzero(same) - 1
        cur = np.flatnonzero(same)
        t = pa.table({
            "role_from": pa.array(r[prev], type=pa.string()),
            "role_to": pa.array(r[cur], type=pa.string()),
            "one": pa.array(np.ones(len(cur), dtype=np.int64)),
        })
        g = t.group_by(["role_from", "role_to"]).aggregate([("one",
                                                            "sum")])
        return pa.table({
            "role_from": g.column("role_from"),
            "role_to": g.column("role_to"),
            "n": g.column("one_sum").cast(pa.int64()),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "role_from": pa.array([], type=pa.string()),
                "role_to": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["role_from", "role_to"]).aggregate([("n", "sum")])
        return pa.table({
            "role_from": g.column("role_from"),
            "role_to": g.column("role_to"),
            "n": g.column("n_sum").cast(pa.int64()),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id", "turn_idx", "role"])
            .repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["role_from", "role_to"]))


def _q_user_gap_fano(sf_dir: str):
    """Burstiness (Fano factor) of each user's inter-event gaps —
    variance-to-mean as the EXACT integer rational
    (n·Σg² − (Σg)²) / (n·Σg) over whole-second gaps, so engines can't
    diverge on float variance. Users with fewer than 2 gaps are
    excluded. One user-keyed shuffle; the per-user moments fold is
    vectorized; the rational is finalized in arbitrary-precision ints
    over the tiny per-user table."""
    import pyarrow as pa

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "n_gaps": pa.array([], type=pa.int64()),
                "fano_num": pa.array([], type=pa.int64()),
                "fano_den": pa.array([], type=pa.int64()),
            })
        uid = b.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = b.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps_s = (t - np.roll(t, 1)) // 1_000_000
        idx = np.flatnonzero(same)
        gu, g = u[idx], gaps_s[idx]
        # per-user moments
        out_u, out_n, out_num, out_den = [], [], [], []
        if len(gu):
            o2 = np.argsort(gu, kind="stable")
            gu, g = gu[o2], g[o2]
            new = np.ones(len(gu), dtype=bool)
            new[1:] = gu[1:] != gu[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(gu))
            for s, e in zip(starts, ends):
                n = int(e - s)
                if n < 2:
                    continue
                sg = int(g[s:e].sum())
                sg2 = int(sum(int(x) * int(x) for x in g[s:e]))
                num = n * sg2 - sg * sg
                den = n * sg
                out_u.append(int(gu[s]))
                out_n.append(n)
                out_num.append(num)
                out_den.append(den)
        return pa.table({
            "user_id": pa.array(out_u, type=pa.int64()),
            "n_gaps": pa.array(out_n, type=pa.int64()),
            "fano_num": pa.array(out_num, type=pa.int64()),
            "fano_den": pa.array(out_den, type=pa.int64()),
        })

    return (_read(sf_dir, "events", ["user_id", "ts", "event_id"])
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("user_id"))


def _q_reply_length_slope(sf_dir: str):
    """Corpus-level least-squares slope of assistant reply length
    against the preceding user turn length, as the exact integer
    rational (N·Σxy − Σx·Σy) / (N·Σx² − (Σx)²) — does a longer prompt
    buy a longer answer? Conv-keyed adjacency fold emits per-block
    moment partials; one tiny final fold."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def partial(b):
        if len(b) == 0:
            return pa.table({k: pa.array([], type=pa.int64())
                             for k in ("n", "sx", "sy", "sxy", "sx2")})
        conv = as_array(b.column("conv_id"))
        d = as_array(pc.dictionary_encode(conv))
        codes = d.indices.to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(as_array(b.column("role")).to_pylist(),
                          dtype=object)
        ln = pc.utf8_length(as_array(b.column("text")).cast(
            pa.string())).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tidx, codes))
        c, r, L = codes[order], role[order], ln[order]
        same = np.zeros(len(c), dtype=bool)
        same[1:] = c[1:] == c[:-1]
        cur = np.flatnonzero(same)
        prev = cur - 1
        m = (r[prev] == "user") & (r[cur] == "assistant")
        x = L[prev][m].astype(object)
        y = L[cur][m].astype(object)
        return pa.table({
            "n": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(sum(x))], type=pa.int64()),
            "sy": pa.array([int(sum(y))], type=pa.int64()),
            "sxy": pa.array([int(sum(a * b_ for a, b_ in zip(x, y)))],
                            type=pa.int64()),
            "sx2": pa.array([int(sum(a * a for a in x))],
                            type=pa.int64()),
        })

    def final(b):
        cols = {k: int(b.column(k).to_numpy(
            zero_copy_only=False).sum()) if len(b) else 0
            for k in ("n", "sx", "sy", "sxy", "sx2")}
        n = cols["n"]
        num = n * cols["sxy"] - cols["sx"] * cols["sy"]
        den = n * cols["sx2"] - cols["sx"] * cols["sx"]
        return pa.table({
            "n_pairs": pa.array([n], type=pa.int64()),
            "slope_num": pa.array([num], type=pa.int64()),
            "slope_den": pa.array([den], type=pa.int64()),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id", "turn_idx",
                                           "role", "text"])
            .repartition(8, keys=["conv_id"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_top_events_with_ties(sf_dir: str):
    """Per-user top-2 events by value WITH TIES (rank() <= 2, the
    QUALIFY-with-ties semantics row_number-based top-n can't express):
    user-keyed shuffle, in-block lexsort, vectorized dense run ranking —
    every row tied with the 2nd-highest value survives."""
    import pyarrow as pa

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "value_cents": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64()),
            })
        uid = b.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = b.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        order = np.lexsort((eid, -cents, uid))
        u, e, c = uid[order], eid[order], cents[order]
        newu = np.ones(len(u), dtype=bool)
        newu[1:] = u[1:] != u[:-1]
        # rank(): 1 + count of STRICTLY greater values in the group =
        # first-row-of-value-run offset within the group
        newval = newu | (np.concatenate([[True], c[1:] != c[:-1]]))
        # rank of each row = position of the first row of its value run
        first_of_run = np.maximum.accumulate(
            np.where(newval, np.arange(len(u)), 0))
        rnk = (first_of_run
               - np.maximum.accumulate(
                   np.where(newu, np.arange(len(u)), 0)) + 1)
        keep = rnk <= 2
        return pa.table({
            "user_id": pa.array(u[keep]),
            "event_id": pa.array(e[keep]),
            "value_cents": pa.array(c[keep]),
            "rnk": pa.array(rnk[keep].astype(np.int64)),
        })

    return (_read(sf_dir, "events", ["user_id", "event_id", "value"])
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["user_id", "event_id"]))


def _q_doc_longest_repeat(sf_dir: str):
    """Per-doc longest repeated substring (suffix array + Kasai LCP) —
    catches degenerate generation loops of ANY period. Rows-only (no
    SQL can express it); brute parity pinned by pytest."""
    from apache_datasketches_go_ray.stages.textops import (
        longest_repeat_batch,
    )

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(longest_repeat_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort("doc_id"))


def _q_session_running_value(sf_dir: str):
    """Running value total that RESETS at session boundaries (30-min
    inactivity gap) — the conditional-cumulative-sum window a naive
    per-user running sum can't express. One user-keyed shuffle;
    in-block: lexsort, gap mask → session ids, segmented cumsum via the
    subtract-offset trick. Exact cents."""
    import pyarrow as pa

    GAP = 30 * 60 * 1_000_000

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "session_no": pa.array([], type=pa.int64()),
                "running_cents": pa.array([], type=pa.int64()),
            })
        uid = b.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = b.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, e, t, c = uid[order], eid[order], ts[order], cents[order]
        newu = np.ones(len(u), dtype=bool)
        newu[1:] = u[1:] != u[:-1]
        gap = np.zeros(len(u), dtype=bool)
        gap[1:] = (t[1:] - t[:-1]) > GAP
        news = newu | gap
        # segment machinery via np.repeat over run lengths — correct
        # for ANY sign of cents (a max-accumulate offset trick would
        # silently break on refunds/negative values)
        seg_starts = np.flatnonzero(news)
        seg_lens = np.diff(np.append(seg_starts, len(u)))
        user_starts = np.flatnonzero(newu)
        user_lens = np.diff(np.append(user_starts, len(u)))
        sno_raw = np.cumsum(news)
        sno = (sno_raw - np.repeat(sno_raw[user_starts], user_lens)
               + 1).astype(np.int64)
        cs = np.cumsum(c)
        running = (cs - np.repeat(cs[seg_starts] - c[seg_starts],
                                  seg_lens)).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "event_id": pa.array(e),
            "session_no": pa.array(sno),
            "running_cents": pa.array(running),
        })

    return (_read(sf_dir, "events", ["user_id", "event_id", "ts",
                                     "value"])
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["user_id", "event_id"]))


def _q_truncated_convs(sf_dir: str):
    """Dangling-prompt QA: conversations whose LAST turn is a user
    turn (the assistant never replied — truncated capture, an SFT
    exclusion list). Conv-keyed fold takes the max-turn row per conv."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "n_turns": pa.array([], type=pa.int64()),
            })
        conv = as_array(b.column("conv_id"))
        d = as_array(pc.dictionary_encode(conv))
        codes = d.indices.to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        role = np.asarray(as_array(b.column("role")).to_pylist(),
                          dtype=object)
        order = np.lexsort((tidx, codes))
        c, t, r = codes[order], tidx[order], role[order]
        last = np.ones(len(c), dtype=bool)
        last[:-1] = c[1:] != c[:-1]
        keep = last & (r == "user")
        n_turns = np.bincount(c, minlength=len(d.dictionary))
        sel = c[keep]
        return pa.table({
            "conv_id": d.dictionary.take(pa.array(sel)).cast(
                pa.string()),
            "n_turns": pa.array(n_turns[sel].astype(np.int64)),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id", "turn_idx",
                                           "role"])
            .repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("conv_id"))


def _q_blocked_near_dups(sf_dir: str):
    """Classical record-linkage blocking dedup (the ER-textbook member
    of the dedup family, fully SQL-oracled unlike MinHash): block key =
    (lang, length band); candidate pairs form only INSIDE a block;
    exact distinct-token Jaccard >= 0.5 decided by the integer
    cross-multiplication 2*|A∩B| >= |A∪B|. One (lang, band)-keyed
    shuffle; pair volume is bounded by the block-size distribution (at
    corpus scale a block cap + band salting would bound the worst
    block, same discipline as the flagship's LSH buckets)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def prep(b):
        # NOTE: DuckDB's trim() strips ASCII spaces only — match it
        # exactly (utf8_trim_whitespace would also strip \n/\t/U+00A0
        # and break oracle parity on texts with trailing newlines)
        toks = pc.split_pattern_regex(
            pc.utf8_trim(as_array(b.column("text")).cast(pa.string()),
                         characters=" "), r"\s+")
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "lang": b.column("lang"),
            "band": pa.array(
                (b.column("n_chars").cast(pa.int64())
                 .to_numpy(zero_copy_only=False) // 50)),
            "toks": toks,
        })

    def pairs(b):
        if len(b) == 0:
            return pa.table({
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
                "union_": pa.array([], type=pa.int64()),
            })
        lang = np.asarray(as_array(b.column("lang")).to_pylist(),
                          dtype=object)
        band = b.column("band").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks = as_array(b.column("toks")).to_pylist()
        sets = [frozenset(t) for t in toks]
        keys = np.asarray([f"{lg}\x00{bd}" for lg, bd in zip(lang, band)],
                          dtype=object)
        out_a, out_b, out_i, out_u = [], [], [], []
        order = np.argsort(keys, kind="stable")
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and keys[order[j + 1]] == \
                    keys[order[i]]:
                j += 1
            members = sorted(order[i:j + 1], key=lambda x: did[x])
            for x in range(len(members)):
                sx = sets[members[x]]
                for y in range(x + 1, len(members)):
                    sy = sets[members[y]]
                    inter = len(sx & sy)
                    u = len(sx) + len(sy) - inter
                    if 2 * inter >= u:
                        out_a.append(int(did[members[x]]))
                        out_b.append(int(did[members[y]]))
                        out_i.append(inter)
                        out_u.append(u)
            i = j + 1
        return pa.table({
            "a": pa.array(out_a, type=pa.int64()),
            "b": pa.array(out_b, type=pa.int64()),
            "inter": pa.array(out_i, type=pa.int64()),
            "union_": pa.array(out_u, type=pa.int64()),
        })

    return (_read(sf_dir, "documents", ["doc_id", "lang", "n_chars",
                                        "text"])
            .map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["lang", "band"])
            .map_batches(pairs, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["a", "b"]))


def _q_copurchase_bridges(sf_dir: str):
    """Bridge edges of the co-purchase graph (edges whose removal
    splits their component) — the over-merge risk detector: a cluster
    held together by one bridge is one false positive away from being
    two. Per-component iterative Tarjan after a component-keyed
    co-partition; rows-only (no SQL can express low-links), brute
    connectivity parity pinned by tests/test_graph.py."""
    from apache_datasketches_go_ray.stages.graph import bridge_edges

    return (bridge_edges(_copurchase_edges(sf_dir), "a", "b",
                         num_partitions=8)
            .sort(["component", "u", "v"]))


def _q_lsh_sensitivity_curve(sf_dir: str):
    """Planner telemetry for the flagship's LSH config: the s-curve
    P(candidate | J) = 1 - (1 - J^r)^b at a Jaccard grid, for the
    configured (bands, rows) — the table an operator reads to pick
    thresholds before a 100 TB run (where is the 50% knee, what recall
    does J=0.5 get from banding alone, what the turn-collision branch
    must recover). Pure closed form from the live DedupConfig, so the
    table always reflects the shipped parameters."""
    import pyarrow as pa

    cfg = _dedup_config()
    b, r = cfg.num_bands, cfg.rows_per_band
    grid = np.round(np.arange(0.05, 1.0, 0.05), 2)
    p = 1.0 - (1.0 - grid ** r) ** b
    return pa.table({
        "jaccard": pa.array(grid),
        "p_candidate": pa.array(np.round(p, 6)),
        "bands": pa.array(np.full(len(grid), b, dtype=np.int64)),
        "rows_per_band": pa.array(np.full(len(grid), r,
                                          dtype=np.int64)),
    })


def _q_second_order_latency(sf_dir: str):
    """Repeat-purchase latency: for customers with >= 2 orders, whole
    days between their first and second order (ties broken by orderkey),
    summarized as exact percentile_disc quartiles. Custkey-keyed fold
    takes each customer's first two orders; the day-diff value table is
    tiny, so the quartiles finalize in one block."""
    import pyarrow as pa

    DAY = 86_400_000_000

    def per_cust(b):
        if len(b) == 0:
            return pa.table({"d": pa.array([], type=pa.int64())})
        ck = b.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ok = b.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = b.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((ok, ts, ck))
        c, t = ck[order], ts[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(c))
        m = ends - starts >= 2
        first = t[starts[m]]
        second = t[starts[m] + 1]
        return pa.table({"d": pa.array(((second - first) // DAY)
                                       .astype(np.int64))})

    def final(b):
        if len(b) == 0:
            return pa.table({
                "n_customers": pa.array([0], type=pa.int64()),
                "q25": pa.array([0], type=pa.int64()),
                "q50": pa.array([0], type=pa.int64()),
                "q75": pa.array([0], type=pa.int64()),
            })
        d = np.sort(b.column("d").to_numpy(zero_copy_only=False))
        n = len(d)
        q = {p: int(d[int(np.ceil(p * n)) - 1])
             for p in (0.25, 0.5, 0.75)}
        return pa.table({
            "n_customers": pa.array([n], type=pa.int64()),
            "q25": pa.array([q[0.25]], type=pa.int64()),
            "q50": pa.array([q[0.5]], type=pa.int64()),
            "q75": pa.array([q[0.75]], type=pa.int64()),
        })

    return (_read(sf_dir, "orders",
                  ["o_custkey", "o_orderkey", "o_orderdate"])
            .repartition(16, keys=["o_custkey"])
            .map_batches(per_cust, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_first_response_latency(sf_dir: str):
    """Time from a conversation's first turn to its first ASSISTANT
    turn (the user-facing first-response latency; conversations with no
    assistant turn are excluded) — exact integer microseconds per conv.
    One conv-keyed shuffle + vectorized first-of-run masks."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "latency_us": pa.array([], type=pa.int64()),
            })
        conv = as_array(b.column("conv_id"))
        d = as_array(pc.dictionary_encode(conv))
        codes = d.indices.to_numpy(zero_copy_only=False)
        tidx = b.column("turn_idx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        role = np.asarray(as_array(b.column("role")).to_pylist(),
                          dtype=object)
        order = np.lexsort((tidx, codes))
        c, t, r = codes[order], ts[order], role[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        n_convs = len(d.dictionary)
        first_ts = t[starts]
        # first assistant row per conv: mask + first-occurrence fold
        is_a = r == "assistant"
        big = np.iinfo(np.int64).max
        first_a = np.full(n_convs, big, dtype=np.int64)
        pos = np.arange(len(c))
        np.minimum.at(first_a, c[is_a], pos[is_a])
        has = first_a != big
        sel = np.flatnonzero(has)
        lat = t[first_a[has]] - first_ts[np.searchsorted(
            c[starts], sel)]
        return pa.table({
            "conv_id": d.dictionary.take(pa.array(sel)).cast(
                pa.string()),
            "latency_us": pa.array(lat.astype(np.int64)),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id", "turn_idx",
                                           "role", "ts"])
            .repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("conv_id"))


def _q_customer_rfm(sf_dir: str):
    """Classic RFM segmentation: per customer, Recency (days since last
    order vs corpus max date), Frequency (order count) and Monetary
    (total cents) are each quartile-coded 1-4 by exact deterministic
    ranking (row_number over (metric, custkey), bucket =
    (4*(rn-1))//n + 1 — identical arithmetic in the SQL oracle, so no
    ntile tie ambiguity). Per-customer aggregates bound the shuffle;
    the coding pass runs on the small per-customer table."""
    import pyarrow as pa

    DAY = 86_400_000_000

    def partial(b):
        ck = b.column("o_custkey").cast(pa.int64())
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100 + 0.5).astype(np.int64)
        t = pa.table({
            "c": ck,
            "cents": pa.array(cents),
            "ts": b.column("o_orderdate").cast(pa.int64()),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["c"]).aggregate([("cents", "sum"),
                                         ("ts", "max"), ("one", "sum")])
        return pa.table({
            "c": g.column("c"),
            "m": g.column("cents_sum").cast(pa.int64()),
            "last_ts": g.column("ts_max").cast(pa.int64()),
            "f": g.column("one_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "o_custkey": pa.array([], type=pa.int64()),
                "r_days": pa.array([], type=pa.int64()),
                "frequency": pa.array([], type=pa.int64()),
                "monetary_cents": pa.array([], type=pa.int64()),
                "rfm_code": pa.array([], type=pa.string()),
            })
        g = b.group_by(["c"]).aggregate([("m", "sum"), ("last_ts", "max"),
                                         ("f", "sum")])
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        m = g.column("m_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lt = g.column("last_ts_max").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f = g.column("f_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(c)
        rdays = (lt.max() - lt) // DAY

        def code(metric, asc):
            # rank by (metric, custkey); bucket = (4*(rn-1))//n + 1
            order = np.lexsort((c, metric if asc else -metric))
            rn = np.empty(n, dtype=np.int64)
            rn[order] = np.arange(1, n + 1)
            return (4 * (rn - 1)) // n + 1

        # R: fewer days = better = 4; F/M: higher = 4
        rq = 5 - code(rdays, asc=True)
        fq = code(f, asc=True)
        mq = code(m, asc=True)
        codes = [f"{a}{b_}{d}" for a, b_, d in zip(rq, fq, mq)]
        order = np.argsort(c)
        return pa.table({
            "o_custkey": pa.array(c[order]),
            "r_days": pa.array(rdays[order]),
            "frequency": pa.array(f[order]),
            "monetary_cents": pa.array(m[order]),
            "rfm_code": pa.array(np.asarray(codes, dtype=object)[order],
                                 type=pa.string()),
        })

    return (_read(sf_dir, "orders",
                  ["o_custkey", "o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_weekly_new_vs_repeat_revenue(sf_dir: str):
    """Weekly revenue split between first-time and returning customers
    (the acquisition-vs-retention dashboard): a customer's first ISO
    week marks every order in that week 'new', later weeks 'repeat'.
    Custkey-keyed fold computes the split per customer in-block and
    emits tiny (week, new, repeat) partials — one shuffle on customer,
    one KB-sized week fold, exact cents."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_cust(b):
        if len(b) == 0:
            return pa.table({
                "week": pa.array([], type=pa.string()),
                "new_cents": pa.array([], type=pa.int64()),
                "repeat_cents": pa.array([], type=pa.int64()),
            })
        ck = b.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = np.asarray(pc.strftime(b.column("o_orderdate"),
                                    format="%G-W%V").to_pylist(),
                        dtype=object)
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100 + 0.5).astype(np.int64)
        order = np.lexsort((wk, ck))
        c, w, v = ck[order], wk[order], cents[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        first_w = np.repeat(
            w[np.flatnonzero(new)],
            np.diff(np.append(np.flatnonzero(new), len(c))))
        is_new = w == first_w
        t = pa.table({
            "week": pa.array(w, type=pa.string()),
            "new_c": pa.array(np.where(is_new, v, 0)),
            "rep_c": pa.array(np.where(is_new, 0, v)),
        })
        g = t.group_by(["week"]).aggregate([("new_c", "sum"),
                                            ("rep_c", "sum")])
        return pa.table({
            "week": g.column("week"),
            "new_cents": g.column("new_c_sum").cast(pa.int64()),
            "repeat_cents": g.column("rep_c_sum").cast(pa.int64()),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "week": pa.array([], type=pa.string()),
                "new_cents": pa.array([], type=pa.int64()),
                "repeat_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["week"]).aggregate([("new_cents", "sum"),
                                            ("repeat_cents", "sum")])
        return pa.table({
            "week": g.column("week"),
            "new_cents": g.column("new_cents_sum").cast(pa.int64()),
            "repeat_cents": g.column("repeat_cents_sum").cast(
                pa.int64()),
        })

    return (_read(sf_dir, "orders",
                  ["o_custkey", "o_orderdate", "o_totalprice"])
            .repartition(16, keys=["o_custkey"])
            .map_batches(per_cust, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("week"))


def _q_source_charclass_profile(sf_dir: str):
    """Per-source character-class composition (ASCII letters / digits /
    whitespace / other, exact counts + ppm of total chars) — the
    corpus-QA fingerprint that flags OCR noise, log spam or
    markup-heavy sources at a glance. One vectorized bytes-histogram
    pass per block (np.bincount over the UTF-8 code units of the
    concatenated block text), KB-sized partials."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    LET = np.zeros(256, dtype=bool)
    for a, b in ((65, 91), (97, 123)):
        LET[a:b] = True
    DIG = np.zeros(256, dtype=bool)
    DIG[48:58] = True
    WS = np.zeros(256, dtype=bool)
    for w in (9, 10, 11, 12, 13, 32):
        WS[w] = True

    def partial(b):
        src = np.asarray(as_array(b.column("source")).to_pylist(),
                         dtype=object)
        texts = as_array(b.column("text")).to_pylist()
        out = {}
        for s, t in zip(src, texts):
            raw = np.frombuffer((t or "").encode("utf-8"),
                                dtype=np.uint8)
            h = np.bincount(raw, minlength=256)
            # multi-byte UTF-8 continuation/lead bytes land in 'other'
            letters = int(h[LET].sum())
            digits = int(h[DIG].sum())
            ws = int(h[WS].sum())
            tot = int(h.sum())
            cur = out.setdefault(s, [0, 0, 0, 0])
            cur[0] += letters
            cur[1] += digits
            cur[2] += ws
            cur[3] += tot
        ks = sorted(out)
        return pa.table({
            "source": pa.array(ks, type=pa.string()),
            "letters": pa.array([out[k][0] for k in ks],
                                type=pa.int64()),
            "digits": pa.array([out[k][1] for k in ks],
                               type=pa.int64()),
            "whitespace": pa.array([out[k][2] for k in ks],
                                   type=pa.int64()),
            "total": pa.array([out[k][3] for k in ks],
                              type=pa.int64()),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "letters": pa.array([], type=pa.int64()),
                "digits": pa.array([], type=pa.int64()),
                "whitespace": pa.array([], type=pa.int64()),
                "other": pa.array([], type=pa.int64()),
                "letters_ppm": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["source"]).aggregate(
            [("letters", "sum"), ("digits", "sum"),
             ("whitespace", "sum"), ("total", "sum")])
        let = g.column("letters_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dig = g.column("digits_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ws = g.column("whitespace_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tot = g.column("total_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        other = tot - let - dig - ws
        ppm = (let * 1_000_000) // np.maximum(tot, 1)
        return pa.table({
            "source": g.column("source"),
            "letters": pa.array(let),
            "digits": pa.array(dig),
            "whitespace": pa.array(ws),
            "other": pa.array(other),
            "letters_ppm": pa.array(ppm),
        })

    return (_read(sf_dir, "documents", ["source", "text"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("source"))


def _q_nation_supplier_hhi(sf_dir: str):
    """Supplier revenue concentration per nation as the exact
    Herfindahl–Hirschman index in ppm: HHI = Σ share_i² where share_i
    is each supplier's fraction of the nation's lineitem revenue —
    computed as the integer cross-multiplication
    (Σ cents_i²)·10⁶ // (Σ cents)², no float shares. Per-supplier cent
    partials bound the shuffle to #suppliers rows; nation dims
    broadcast."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import gather_table

    sup = gather_table(_read(sf_dir, "supplier",
                             ["s_suppkey", "s_nationkey"]))
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    snat = sup.column("s_nationkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nat_lut = np.zeros(int(sk.max()) + 1 if len(sk) else 1,
                       dtype=np.int64)
    nat_lut[sk] = snat
    nat = gather_table(_read(sf_dir, "nation", None))
    nnames = {int(k): n for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}

    def partial(b):
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        t = pa.table({
            "s_suppkey": b.column("l_suppkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })
        g = t.group_by(["s_suppkey"]).aggregate([("cents", "sum")])
        return pa.table({
            "s_suppkey": g.column("s_suppkey"),
            "cents": g.column("cents_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "nation": pa.array([], type=pa.string()),
                "n_suppliers": pa.array([], type=pa.int64()),
                "hhi_ppm": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["s_suppkey"]).aggregate([("cents", "sum")])
        skey = g.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = g.column("cents_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nk = nat_lut[skey]
        out_n, out_c, out_h = [], [], []
        for n in np.unique(nk):
            m = nk == n
            c = [int(x) for x in cents[m]]
            tot = sum(c)
            hhi = (sum(x * x for x in c) * 1_000_000) // (tot * tot) \
                if tot else 0
            out_n.append(nnames[int(n)])
            out_c.append(int(m.sum()))
            out_h.append(hhi)
        order = np.argsort(np.asarray(out_n, dtype=object))
        return pa.table({
            "nation": pa.array(np.asarray(out_n, dtype=object)[order],
                               type=pa.string()),
            "n_suppliers": pa.array(
                np.asarray(out_c, dtype=np.int64)[order]),
            "hhi_ppm": pa.array(np.asarray(out_h,
                                           dtype=np.int64)[order]),
        })

    return (_read(sf_dir, "lineitem",
                  ["l_suppkey", "l_extendedprice", "l_discount"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_conv_question_stats(sf_dir: str):
    """Engagement QA per conversation: user turns total, user turns
    that END with a question mark, and the qshare in ppm — flags
    corpora of rhetorical/log-like 'users' that never ask anything.
    One conv-keyed count fold, vectorized ends_with."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "conv_id": pa.array([], type=pa.string()),
                "user_turns": pa.array([], type=pa.int64()),
                "question_turns": pa.array([], type=pa.int64()),
                "qshare_ppm": pa.array([], type=pa.int64()),
            })
        conv = as_array(b.column("conv_id"))
        d = as_array(pc.dictionary_encode(conv))
        codes = d.indices.to_numpy(zero_copy_only=False)
        role = np.asarray(as_array(b.column("role")).to_pylist(),
                          dtype=object)
        endsq = pc.ends_with(as_array(b.column("text")).cast(
            pa.string()), pattern="?").to_numpy(zero_copy_only=False)
        is_u = role == "user"
        n_convs = len(d.dictionary)
        ut = np.bincount(codes[is_u], minlength=n_convs) \
            .astype(np.int64)
        qt = np.bincount(codes[is_u & endsq], minlength=n_convs) \
            .astype(np.int64)
        keep = ut > 0
        sel = np.flatnonzero(keep)
        ppm = (qt[sel] * 1_000_000) // ut[sel]
        return pa.table({
            "conv_id": d.dictionary.take(pa.array(sel)).cast(
                pa.string()),
            "user_turns": pa.array(ut[sel]),
            "question_turns": pa.array(qt[sel]),
            "qshare_ppm": pa.array(ppm),
        })

    return (ray.data.read_parquet(_transcripts_dir(sf_dir),
                                  columns=["conv_id", "role", "text"])
            .repartition(8, keys=["conv_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("conv_id"))


def _q_doc_sentence_stats(sf_dir: str):
    """Per-document sentence statistics (readability QA): sentence
    count = runs of [.!?] terminators, and average sentence length in
    whole chars (length // max(count,1)). Vectorized regex count per
    block, exact ints."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from apache_datasketches_go_ray.stages.arrow_util import as_array

    def fn(b):
        txt = as_array(b.column("text")).cast(pa.string())
        n_sent = pc.count_substring_regex(txt, pattern=r"[.!?]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ln = pc.utf8_length(txt).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        avg = ln // np.maximum(n_sent, 1)
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "n_sentences": pa.array(n_sent),
            "avg_sentence_chars": pa.array(avg.astype(np.int64)),
        })

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(fn, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort("doc_id"))


def _q_user_weekend_share(sf_dir: str):
    """Weekend-activity share per user in exact ppm (behavioral
    segmentation signal). Per-block (user, weekend) count partials,
    keyed fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        # ISO dow: 6=Sat, 7=Sun
        dow = pc.day_of_week(b.column("ts"), count_from_zero=False,
                             week_start=1).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        we = (dow >= 6).astype(np.int64)
        t = pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "we": pa.array(we),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["user_id"]).aggregate([("we", "sum"),
                                               ("one", "sum")])
        return pa.table({
            "user_id": g.column("user_id"),
            "we": g.column("we_sum").cast(pa.int64()),
            "n": g.column("one_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "weekend_events": pa.array([], type=pa.int64()),
                "weekend_ppm": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["user_id"]).aggregate([("we", "sum"),
                                               ("n", "sum")])
        we = g.column("we_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = g.column("n_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "user_id": g.column("user_id").cast(pa.int64()),
            "n_events": pa.array(n),
            "weekend_events": pa.array(we),
            "weekend_ppm": pa.array((we * 1_000_000) // n),
        })

    return (_read(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("user_id"))


def _q_brand_qty_price_corr(sf_dir: str):
    """Per-brand Pearson correlation COMPONENTS between lineitem
    quantity and discounted whole-dollar price, as exact integers (n
    and the corr numerator NΣxy−ΣxΣy plus both variance terms) — the
    correlation analysis with zero float drift; callers divide at
    presentation time. Fully vectorized: per-row products, grouped
    sums; brand dim broadcast."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.context import gather_table

    part = gather_table(_read(sf_dir, "part", ["p_partkey", "p_brand"]))
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    brands = np.asarray(part.column("p_brand").to_pylist(),
                        dtype=object)
    lut = {}
    for k, bmark in zip(pk, brands):
        lut[int(k)] = bmark

    def partial(b):
        key = b.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        q = np.floor(b.column("l_quantity").to_numpy(
            zero_copy_only=False) + 0.5).astype(np.int64)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        # whole DOLLARS, not cents: keeps N·Σy² − (Σy)² inside int64
        # through the bench tiers (documented scale bound)
        y = np.floor(ep * (1.0 - disc) + 0.5).astype(np.int64)
        br = np.asarray([lut[int(k)] for k in key], dtype=object)
        t = pa.table({
            "brand": pa.array(br, type=pa.string()),
            "x": pa.array(q),
            "y": pa.array(y),
            "xy": pa.array(q * y),
            "x2": pa.array(q * q),
            "y2": pa.array(y * y),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["brand"]).aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("x2", "sum"),
             ("y2", "sum"), ("one", "sum")])
        return pa.table({
            "brand": g.column("brand"),
            "sx": g.column("x_sum").cast(pa.int64()),
            "sy": g.column("y_sum").cast(pa.int64()),
            "sxy": g.column("xy_sum").cast(pa.int64()),
            "sx2": g.column("x2_sum").cast(pa.int64()),
            "sy2": g.column("y2_sum").cast(pa.int64()),
            "n": g.column("one_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "brand": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "corr_num": pa.array([], type=pa.int64()),
                "varx_term": pa.array([], type=pa.int64()),
                "vary_term": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["brand"]).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
             ("sx2", "sum"), ("sy2", "sum"), ("n", "sum")])
        sx = [int(v) for v in g.column("sx_sum").to_pylist()]
        sy = [int(v) for v in g.column("sy_sum").to_pylist()]
        sxy = [int(v) for v in g.column("sxy_sum").to_pylist()]
        sx2 = [int(v) for v in g.column("sx2_sum").to_pylist()]
        sy2 = [int(v) for v in g.column("sy2_sum").to_pylist()]
        n = [int(v) for v in g.column("n_sum").to_pylist()]
        return pa.table({
            "brand": g.column("brand"),
            "n": pa.array(n, type=pa.int64()),
            "corr_num": pa.array(
                [a * c - d * e for a, c, d, e in zip(n, sxy, sx, sy)],
                type=pa.int64()),
            "varx_term": pa.array(
                [a * c - d * d for a, c, d in zip(n, sx2, sx)],
                type=pa.int64()),
            "vary_term": pa.array(
                [a * c - d * d for a, c, d in zip(n, sy2, sy)],
                type=pa.int64()),
        })

    return (_read(sf_dir, "lineitem",
                  ["l_partkey", "l_quantity", "l_extendedprice",
                   "l_discount"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("brand"))


def _q_user_event_entropy(sf_dir: str):
    """Behavioral-diversity score: per-user Shannon entropy (nats,
    rounded at 1e-4 like token_entropy_docs) of the event-type
    distribution — 0 for single-habit users, ln(k) for uniform
    explorers. (user, type) count partials → per-user fold over the
    tiny type table."""
    import math

    import pyarrow as pa

    def partial(b):
        t = pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "event_type": b.column("event_type"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["user_id", "event_type"]).aggregate([("one",
                                                             "sum")])
        return pa.table({
            "user_id": g.column("user_id"),
            "event_type": g.column("event_type"),
            "c": g.column("one_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "entropy": pa.array([], type=pa.float64()),
            })
        g = b.group_by(["user_id", "event_type"]).aggregate([("c",
                                                             "sum")])
        u = g.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = g.column("c_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(u, kind="stable")
        u, c = u[order], c[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u))
        out_u, out_n, out_e = [], [], []
        for s, e in zip(starts, ends):
            n = int(c[s:e].sum())
            ent = -sum((ci / n) * math.log(ci / n)
                       for ci in c[s:e].tolist())
            out_u.append(int(u[s]))
            out_n.append(n)
            out_e.append(math.floor(ent * 10000 + 0.5) / 10000)
        return pa.table({
            "user_id": pa.array(out_u, type=pa.int64()),
            "n_events": pa.array(out_n, type=pa.int64()),
            "entropy": pa.array(out_e, type=pa.float64()),
        })

    return (_read(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("user_id"))


def _q_supplier_activity_span(sf_dir: str):
    """Supply-continuity profile per supplier: distinct shipping
    months, and the longest gap in months between consecutive active
    months (1 = perfectly continuous) — the vendor-reliability signal.
    Distinct (supplier, month-index) combiner shrinks the shuffle;
    per-supplier fold is a sorted diff."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        y = pc.year(b.column("l_shipdate")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = pc.month(b.column("l_shipdate")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({
            "s_suppkey": b.column("l_suppkey").cast(pa.int64()),
            "mi": pa.array(y * 12 + (m - 1)),
        })
        return t.group_by(["s_suppkey", "mi"]).aggregate([])

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "s_suppkey": pa.array([], type=pa.int64()),
                "active_months": pa.array([], type=pa.int64()),
                "max_gap_months": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["s_suppkey", "mi"]).aggregate([])
        sk = g.column("s_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mi = g.column("mi").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((mi, sk))
        s, m = sk[order], mi[order]
        new = np.ones(len(s), dtype=bool)
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(s))
        n = (ends - starts).astype(np.int64)
        diffs = np.diff(m)
        same = ~new[1:]
        gap = np.zeros(len(starts), dtype=np.int64)
        if same.any():
            seg_id = np.cumsum(new) - 1
            gd = np.where(same, diffs, 0)
            np.maximum.at(gap, seg_id[1:][same], gd[same])
        return pa.table({
            "s_suppkey": pa.array(s[starts]),
            "active_months": pa.array(n),
            "max_gap_months": pa.array(gap),
        })

    return (_read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(8, keys=["s_suppkey"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("s_suppkey"))


def _q_basket_size_value_curve(sf_dir: str):
    """Basket-size economics: per lines-per-order bucket, how many
    orders and their total revenue in exact cents — does a bigger
    basket buy proportionally more? Orderkey-keyed (count, cents) fold
    shrinks to one row per order, then a tiny bucket fold."""
    import pyarrow as pa

    def per_order(b):
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        t = pa.table({
            "o": b.column("l_orderkey").cast(pa.int64()),
            "cents": pa.array(cents),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["o"]).aggregate([("cents", "sum"),
                                         ("one", "sum")])
        return pa.table({
            "o": g.column("o"),
            "cents": g.column("cents_sum").cast(pa.int64()),
            "lines": g.column("one_sum").cast(pa.int64()),
        })

    def per_order_final(b):
        if len(b) == 0:
            return pa.table({
                "n_lines": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
                "one": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["o"]).aggregate([("cents", "sum"),
                                         ("lines", "sum")])
        return pa.table({
            "n_lines": g.column("lines_sum").cast(pa.int64()),
            "cents": g.column("cents_sum").cast(pa.int64()),
            "one": pa.array(np.ones(len(g), dtype=np.int64)),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "n_lines": pa.array([], type=pa.int64()),
                "n_orders": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["n_lines"]).aggregate([("one", "sum"),
                                               ("cents", "sum")])
        return pa.table({
            "n_lines": g.column("n_lines").cast(pa.int64()),
            "n_orders": g.column("one_sum").cast(pa.int64()),
            "revenue_cents": g.column("cents_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount"])
            .map_batches(per_order, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(16, keys=["o"])
            .map_batches(per_order_final, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("n_lines"))


def _q_langid_confusion(sf_dir: str):
    """Classifier-evaluation crosstab: the langid heuristic's predicted
    language against the documents table's TRUE lang column —
    (lang_true, lang_pred, n), the confusion matrix you read before
    trusting a filter built on the predictor. Pure map + KB count
    fold."""
    import pyarrow as pa

    from apache_datasketches_go_ray.stages.textops import langid_batch

    def pred(b):
        out = langid_batch(b)
        return pa.table({
            "lang_true": out.column("lang"),
            "lang_pred": out.column("lang_pred"),
            "one": pa.array(np.ones(len(out), dtype=np.int64)),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "lang_true": pa.array([], type=pa.string()),
                "lang_pred": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["lang_true", "lang_pred"]).aggregate([("one",
                                                              "sum")])
        return pa.table({
            "lang_true": g.column("lang_true"),
            "lang_pred": g.column("lang_pred"),
            "n": g.column("one_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "documents", ["lang", "text"])
            .map_batches(pred, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort(["lang_true", "lang_pred"]))


def _q_order_lorenz_deciles(sf_dir: str):
    """Lorenz-curve points for order revenue: orders ranked ascending
    by (totalprice cents, orderkey), split into 10 exact deciles
    (bucket = (10·(rn−1))//n + 1), each reporting its order count,
    revenue cents and cumulative revenue share in ppm — the inequality
    curve behind the Gini/ABC family. Per-order cents bound the data;
    the decile fold runs on the (bounded) per-order table."""
    import pyarrow as pa

    def prep(b):
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100 + 0.5).astype(np.int64)
        return pa.table({
            "o": b.column("o_orderkey").cast(pa.int64()),
            "cents": pa.array(cents),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "decile": pa.array([], type=pa.int64()),
                "n_orders": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64()),
                "cum_share_ppm": pa.array([], type=pa.int64()),
            })
        o = b.column("o").to_numpy(zero_copy_only=False)
        c = b.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, c))
        cs = c[order]
        n = len(cs)
        rn = np.arange(1, n + 1)
        dec = (10 * (rn - 1)) // n + 1
        total = int(cs.sum())
        out_d, out_n, out_r, out_p = [], [], [], []
        cum = 0
        for d in range(1, 11):
            m = dec == d
            if not m.any():
                continue
            rev = int(cs[m].sum())
            cum += rev
            out_d.append(d)
            out_n.append(int(m.sum()))
            out_r.append(rev)
            out_p.append((cum * 1_000_000) // total)
        return pa.table({
            "decile": pa.array(out_d, type=pa.int64()),
            "n_orders": pa.array(out_n, type=pa.int64()),
            "revenue_cents": pa.array(out_r, type=pa.int64()),
            "cum_share_ppm": pa.array(out_p, type=pa.int64()),
        })

    return (_read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
            .map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_gap_log2_histogram(sf_dir: str):
    """Workload characterization for watermark/session tuning: the
    log₂-bucketed histogram of per-user inter-event gaps (whole
    seconds; zero-second gaps get bucket -1). floor(log2(2^k)) is
    IEEE-exact on both engines, so the bucketing is deterministic.
    One user-keyed shuffle; diff + bincount."""
    import pyarrow as pa

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "bucket": pa.array([], type=pa.int64()),
                "n_gaps": pa.array([], type=pa.int64()),
            })
        uid = b.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = b.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        g = ((t - np.roll(t, 1)) // 1_000_000)[same]
        bucket = np.full(len(g), -1, dtype=np.int64)
        pos = g > 0
        bucket[pos] = np.floor(np.log2(g[pos].astype(np.float64))) \
            .astype(np.int64)
        ub, cnt = np.unique(bucket, return_counts=True)
        return pa.table({
            "bucket": pa.array(ub),
            "n_gaps": pa.array(cnt.astype(np.int64)),
        })

    def final(b):
        if len(b) == 0:
            return pa.table({
                "bucket": pa.array([], type=pa.int64()),
                "n_gaps": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["bucket"]).aggregate([("n_gaps", "sum")])
        return pa.table({
            "bucket": g.column("bucket").cast(pa.int64()),
            "n_gaps": g.column("n_gaps_sum").cast(pa.int64()),
        })

    return (_read(sf_dir, "events", ["user_id", "event_id", "ts"])
            .repartition(16, keys=["user_id"])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("bucket"))


def _q_event_type_peak_hour(sf_dir: str):
    """Peak activity hour per event type (deterministic argmax: highest
    count, lowest hour on ties) — the scheduling/capacity headline per
    stream. (type, hour) count partials → per-type argmax fold."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b):
        hr = pc.hour(b.column("ts")).cast(pa.int64())
        t = pa.table({
            "event_type": b.column("event_type"),
            "hour": hr,
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        g = t.group_by(["event_type", "hour"]).aggregate([("one",
                                                          "sum")])
        return pa.table({
            "event_type": g.column("event_type"),
            "hour": g.column("hour"),
            "c": g.column("one_sum").cast(pa.int64()),
        })

    def fold(b):
        if len(b) == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "peak_hour": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            })
        g = b.group_by(["event_type", "hour"]).aggregate([("c", "sum")])
        et = np.asarray(g.column("event_type").to_pylist(),
                        dtype=object)
        hr = g.column("hour").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = g.column("c_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((hr, -c, et))
        ets, hrs, cs = et[order], hr[order], c[order]
        first = np.ones(len(ets), dtype=bool)
        first[1:] = ets[1:] != ets[:-1]
        return pa.table({
            "event_type": pa.array(ets[first], type=pa.string()),
            "peak_hour": pa.array(hrs[first]),
            "n_events": pa.array(cs[first]),
        })

    return (_read(sf_dir, "events", ["event_type", "ts"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .sort("event_type"))


def queries() -> dict[str, Callable[[str], Any]]:
    # Registration order matters: the driver's correctness gate checks
    # the first 50 entries, so every SQL-oracled query registers before
    # the rows-only (approx/sketch/synthetic) ones.
    return {
        # SQL-oracled transcript operators (oracle reads the same
        # deterministic cache parquet the queries consume)
        "transcript_assemble_stats": _q_transcript_assemble,
        "transcript_turn_gaps": _q_transcript_turn_gaps,
        "transcript_role_stats": _q_transcript_role_stats,
        "boilerplate_turns": _q_boilerplate_turns,
        "transcript_reply_latency": _q_transcript_reply_latency,
        "transcript_tool_usage": _q_transcript_tool_usage,
        "transcript_role_paths": _q_transcript_role_paths,
        # flagship pipeline — inside the driver gate window on purpose:
        # no SQL oracle (rows-only row-count check here; value parity is
        # pinned by the exact single-process-oracle pytest), but the
        # external gate should at least see the flagship run
        "transcript_dedup_clusters": _q_transcript_dedup,
        # exact, SQL-oracled operators
        "exact_dedup_docs": _q_exact_dedup_docs,
        "eval_decontaminate": _q_eval_decontaminate,
        "token_counts": _q_token_counts,
        "doc_stats": _q_doc_stats,
        "top_tokens": _q_top_tokens,
        "lang_stats": _q_lang_stats,
        "consecutive_jaccard": _q_consecutive_jaccard,
        "jaccard_join_dups": _q_jaccard_join,
        "jaccard_join_bigram_dups": _q_jaccard_join_bigram,
        "dup_source_matrix": _q_dup_source_matrix,
        "session_path_dups": _q_session_path_dups,
        "events_hourly": _q_events_hourly,
        "ann_topk": _q_ann_topk,
        "customer_nation_revenue": _q_customer_nation_revenue,
        "lineitem_pricing": _q_lineitem_pricing,
        "events_sessionize": _q_events_sessionize,
        "events_running": _q_events_running,
        "top_orders": _q_top_orders,
        "order_priority": _q_order_priority,
        "customers_no_orders": _q_customers_no_orders,
        "region_revenue": _q_region_revenue,
        "distinct_users_daily": _q_distinct_users_daily,
        "asof_event_order": _q_asof_event_order,
        "revenue_filter": _q_revenue_filter,
        "kll_quantiles_by_lang": _q_kll_quantiles_by_lang,
        "events_sliding_window": _q_sliding_window,
        "largest_event_per_user": _q_largest_event_per_user,
        "event_type_pivot": _q_event_type_pivot,
        "kll_rank_annotate": _q_kll_rank_annotate,
        "sample_docs_bottomk": _q_sample_docs_bottomk,
        "varopt_sample_docs": _q_varopt_sample_docs,
        "varopt_sample_by_source": _q_varopt_sample_by_source,
        "partitioned_sink_roundtrip": _q_partitioned_sink_roundtrip,
        "kll_quantiles_nchars_exact": _q_kll_quantiles_nchars_exact,
        "kll_cdf_nchars_exact": _q_kll_cdf_nchars_exact,
        "freq_top_tokens_exact": _q_freq_top_tokens_exact,
        "bpe_token_counts": _q_bpe_token_counts,
        "doc_encoding_qa": _q_doc_encoding_qa,
        "train_eval_split": _q_train_eval_split,
        "brand_revenue": _q_brand_revenue,
        "supplier_balance": _q_supplier_balance,
        "shipping_priority": _q_shipping_priority,
        "event_followups": _q_event_followups,
        "props_extract": _q_props_extract,
        "consecutive_bigram_jaccard": _q_consecutive_bigram_jaccard,
        "events_lag_delta": _q_lag_delta,
        "events_lead_delta": _q_lead_delta,
        "events_time_window": _q_time_window,
        "order_rank_per_customer": _q_dense_rank_orders,
        "event_paths": _q_event_paths,
        "funnel_depth": _q_funnel_depth,
        "top3_events_per_user": _q_top3_events_per_user,
        "lang_quantiles_exact": _q_lang_quantiles_exact,
        "kll_source_quantiles_by_lang": _q_kll_source_quantiles,
        "kll_int64_quantiles_by_source": _q_kll_int64_quantiles,
        "ann_knn_join_topk": _q_ann_knn_join,
        "order_quartiles": _q_order_quartiles,
        "events_rollup": _q_events_rollup,
        "users_intersect_customers": _q_users_intersect_customers,
        "customers_except_users": _q_customers_except_users,
        "doc_token_positions": _q_doc_token_positions,
        "docs_normalized": _q_docs_normalized,
        "lang_quantiles_cont": _q_lang_quantiles_cont,
        "order_share_of_customer": _q_order_share_of_customer,
        "user_top_event_type": _q_user_top_event_type,
        "nchars_histogram": _q_nchars_histogram,
        "orders_bloom_semi": _q_orders_bloom_semi,
        "event_value_cume": _q_event_value_cume,
        "events_debounce": _q_events_debounce,
        "stratified_sample_docs": _q_stratified_sample_docs,
        "user_customer_full_outer": _q_user_customer_full_outer,
        "events_weekly": _q_events_weekly,
        "consecutive_edit_distance": _q_consecutive_edit_distance,
        "exact_dedup_normalized": _q_exact_dedup_normalized,
        "source_langs": _q_source_langs,
        "user_first_last_event": _q_user_first_last_event,
        "revenue_by_price_quartile": _q_revenue_by_price_quartile,
        "order_rank_gaps": _q_order_rank_gaps,
        "order_percent_rank": _q_order_percent_rank,
        "order_ntile": _q_order_ntile,
        "daily_top_event": _q_daily_top_event,
        "lang_nchars_stddev": _q_lang_nchars_stddev,
        "orders_above_customer_avg": _q_orders_above_customer_avg,
        "event_pivot_melt": _q_event_pivot_melt,
        "latest_event_per_user_type": _q_latest_event_per_user_type,
        "events_dow_hour": _q_events_dow_hour,
        "join_size_estimate": _q_join_size_estimate,
        "events_grouping_sets": _q_events_grouping_sets,
        "events_hopping_window": _q_events_hopping_window,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "user_spend_summary": _q_user_spend_summary,
        "docs_containing_pattern": _q_docs_containing_pattern,
        "repetition_stats": _q_repetition_stats,
        "pii_redact": _q_pii_redact,
        "domain_reweight_sample": _q_domain_reweight,
        "pack_sequences": _q_pack_sequences,
        "theta_user_overlap": _q_theta_user_overlap,
        "turn_dedup_rewrite": _q_turn_dedup_rewrite,
        "collocation_pmi_stats": _q_collocation_stats,
        "role_alternation": _q_role_alternation,
        "context_truncate_stats": _q_context_truncate,
        "events_out_of_order": _q_events_out_of_order,
        "exact_dedup_keep_best": _q_exact_dedup_keep_best,
        "lang_mad_outliers": _q_lang_mad_outliers,
        "events_profile": _q_events_profile,
        "tool_chains": _q_tool_chains,
        "vocab_stats_by_source": _q_vocab_stats_by_source,
        "source_token_overlap": _q_source_token_overlap,
        "conv_turn_repeats": _q_conv_turn_repeats,
        "tokenizer_fertility_by_lang": _q_tokenizer_fertility,
        "eval_ngram_coverage": _q_eval_ngram_coverage,
        "reply_length_by_depth": _q_reply_length_by_depth,
        "chatml_format": _q_chatml_format,
        "sft_context_windows": _q_sft_context_windows,
        "sft_pairs": _q_sft_pairs,
        "dup_rate_weekly": _q_dup_rate_weekly,
        "conv_prefix_dups": _q_conv_prefix_dups,
        "sft_pair_dups": _q_sft_pair_dups,
        "conv_shared_turns": _q_conv_shared_turns,
        "turn_collision_pairs": _q_turn_collision_pairs,
        "prompt_collisions": _q_prompt_collisions,
        "template_dups": _q_template_dups,
        "trailing_active_users": _q_trailing_active_users,
        "bigram_diversity_by_source": _q_bigram_diversity_by_source,
        "nb_lang_token_probs": _q_nb_lang_token_probs,
        "gopher_quality_flags": _q_gopher_flags,
        "doc_chunks": _q_doc_chunks,
        "markup_strip": _q_markup_strip,
        "winsorized_event_values": _q_winsorize_events,
        "shard_manifest": _q_shard_manifest,
        "merge_upsert_customers": _q_merge_upsert,
        "dataset_diff": _q_dataset_diff,
        "edit_distance_join": _q_edit_distance_join,
        "bm25_topk": _q_bm25_topk,
        "local_supplier_volume": _q_local_supplier_volume,
        "user_retention_cohorts": _q_retention_cohorts,
        "events_resample_ffill": _q_events_resample_ffill,
        "user_churn_by_week": _q_user_churn,
        "weighted_median_nchars": _q_weighted_median,
        "partition_checksums": _q_partition_checksums,
        "vocab_drift_weekly": _q_vocab_drift,
        "jaccard_cross_dups": _q_jaccard_cross,
        "docs_above_source_p75": _q_docs_above_source_p75,
        "rolling_median_cents": _q_rolling_median_cents,
        "events_cube": _q_events_cube,
        "user_session_bounds": _q_user_session_bounds,
        "user_value_trend": _q_user_value_trend,
        "event_type_cooccurrence": _q_event_type_cooccurrence,
        "part_copurchase_components": _q_part_copurchase_components,
        "part_copurchase_triangles": _q_part_copurchase_triangles,
        "part_copurchase_pagerank": _q_part_copurchase_pagerank,
        "part_copurchase_hops": _q_part_copurchase_hops,
        "part_copurchase_kcore": _q_part_copurchase_kcore,
        "weighted_sample_docs": _q_weighted_sample_docs,
        "purchase_click_attribution": _q_purchase_click_attribution,
        "nation_pair_volume": _q_nation_pair_volume,
        "customer_order_distribution": _q_customer_order_distribution,
        "large_volume_customers": _q_large_volume_customers,
        "returned_item_revenue": _q_returned_item_revenue,
        "sample_docs_per_source": _q_sample_docs_per_source,
        "frequent_ngrams": _q_frequent_ngrams,
        "mixture_weights": _q_mixture_weights,
        "new_docs_unmatched": _q_new_docs_unmatched,
        "events_user_outliers": _q_events_user_outliers,
        "order_fulfillment_span": _q_order_fulfillment_span,
        "signup_first_click": _q_signup_first_click,
        "user_gap_quantiles": _q_user_gap_quantiles,
        "latest2_orders_per_customer": _q_latest2_orders_per_customer,
        "tool_cooccurrence": _q_tool_cooccurrence,
        "conv_length_by_depth": _q_conv_length_by_depth,
        "nchars_histogram_by_source": _q_nchars_histogram_by_source,
        "conv_role_char_ratio": _q_conv_role_char_ratio,
        "corpus_summary": _q_corpus_summary,
        "decontamination_pairs": _q_decontamination_pairs,
        "event_type_transitions": _q_event_type_transitions,
        "event_type_lift": _q_event_type_lift,
        "source_lang_crosstab": _q_source_lang_crosstab,
        "supplier_nation_rollup": _q_supplier_nation_rollup,
        "monthly_revenue_growth": _q_monthly_revenue_growth,
        "nation_market_share": _q_nation_market_share,
        "top_supplier_quarter": _q_top_supplier_quarter,
        "brand_low_qty_revenue": _q_brand_low_qty_revenue,
        "preference_pairs": _q_preference_pairs,
        "user_state_scd2": _q_user_state_scd2,
        "order_skyline": _q_order_skyline,
        "global_median_value": _q_global_median_value,
        "user_active_time": _q_user_active_time,
        "lang_length_gini": _q_lang_length_gini,
        "totalprice_first_digit": _q_totalprice_first_digit,
        "supplier_abc_classes": _q_supplier_abc_classes,
        "source_simpson_diversity": _q_source_simpson_diversity,
        # rows-only operators: murmur-substrate / approximate /
        # synthetic-payload queries (no SQL equivalent); the flagship
        # transcript_dedup_clusters is registered up top inside the gate
        # window
        "compression_ratios": _q_compression_ratios,
        "incremental_dedup_clusters": _q_incremental_dedup,
        "deletion_dedup_clusters": _q_deletion_dedup,
        "windowed_near_dups": _q_windowed_near_dups,
        "assistant_run_lengths": _q_assistant_run_lengths,
        "doc_novelty_scores": _q_doc_novelty_scores,
        "tool_latency_quartiles": _q_tool_latency_quartiles,
        "cluster_representatives": _q_cluster_representatives,
        "leakage_safe_split": _q_leakage_safe_split,
        "kmeans_clusters": _q_kmeans_clusters,
        "fuzzy_boilerplate_turns": _q_fuzzy_boilerplate_turns,
        "cluster_size_histogram": _q_cluster_size_histogram,
        "minhash_doc_clusters": _q_minhash_doc_clusters,
        "simhash_groups": _q_simhash_groups,
        "simhash_near_dups": _q_simhash_near_dups,
        "hll_distinct_users": _q_hll_distinct_users,
        "kll_quantiles_nchars": _q_kll_quantiles_nchars,
        "freq_top_tokens": _q_freq_top_tokens,
        "kll_partition_bounds": _q_kll_partition_bounds,
        "cms_token_counts": _q_cms_token_counts,
        "kll_cdf_nchars": _q_kll_cdf_nchars,
        "hll_users_by_type": _q_hll_users_by_type,
        "top_tokens_by_lang": _q_top_tokens_by_lang,
        "langid": _q_langid,
        "quality_scores": _q_quality_scores,
        "doc_fingerprints": _q_fingerprints,
        "embedding_near_dups": _q_embedding_near_dups,
        "semantic_dedup": _q_semantic_dedup,
        "lm_quality_scores": _q_lm_quality_scores,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_ivf_kmeans_topk": _q_ann_ivf_kmeans_topk,
        "ann_lsh_knn_join_topk": _q_ann_lsh_knn_join,
        "multimodal_features": _q_multimodal_features,
        "image_near_dups": _q_image_near_dups,
        "audio_near_dups": _q_audio_near_dups,
        "video_near_dups": _q_video_near_dups,
        "dedup_lineage_report": _q_dedup_lineage_report,
        "audio_wav_features": _q_audio_wav_features,
        "video_frame_features": _q_video_frame_features,
        "curate_docs": _q_curate_docs,
        "curate_transcripts": _q_curate_transcripts,
        "containment_dups": _q_containment_dups,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "dup_span_stats": _q_dup_span_stats,
        "dup_span_rewrite": _q_dup_span_rewrite,
        "token_entropy_docs": _q_token_entropy,
        "max_token_run_docs": _q_max_token_run,
        "oov_rate_docs": _q_oov_rate,
        "zipf_slope_by_source": _q_zipf_slope,
        "embedding_label_centroids": _q_embedding_label_centroids,
        "embedding_centroid_confusion": _q_embedding_centroid_confusion,
        "embedding_norm_stats": _q_embedding_norm_stats,
        "dsir_importance": _q_dsir_importance,
        "bpe_merges": _q_bpe_merges,
        "logreg_quality_train": _q_logreg_quality,
        "logreg_quality_scores": _q_logreg_quality_scores,
        # round-3 continuation: analytics + drift + funnel tail (all
        # SQL-oracled MATCH; appended so the saturated first-50 gate
        # window stays byte-stable vs round 2)
        "events_cohort_retention": _q_events_cohort_retention,
        "brand_size_suppliers": _q_brand_size_suppliers,
        "part_band_revenue": _q_part_band_revenue,
        "customers_above_global_avg": _q_customers_above_global_avg,
        "ks_drift_nchars": _q_ks_drift_nchars,
        "events_time_funnel": _q_events_time_funnel,
        "source_tfidf_terms": _q_source_tfidf_terms,
        # rows-only continuation tail (flagship-derived analytics +
        # tokenizer application; each pinned by pytest)
        "dedup_cluster_survivors": _q_dedup_cluster_survivors,
        "dup_pair_jaccard_histogram": _q_dup_pair_jaccard_histogram,
        "bpe_encode_counts": _q_bpe_encode_counts,
        "transcript_decontaminate": _q_transcript_decontaminate,
        # round-4: the TPC-H shape completion tail (Q2/Q9/Q11/Q12/Q20/
        # Q21 variants over the driver's partsupp-less schema), all
        # SQL-oracled
        "part_min_cost_supplier": _q_part_min_cost_supplier,
        "profit_by_nation_year": _q_profit_by_nation_year,
        "important_parts": _q_important_parts,
        "priority_by_quantity_band": _q_priority_by_quantity_band,
        "brand_excess_suppliers": _q_brand_excess_suppliers,
        "late_sole_suppliers": _q_late_sole_suppliers,
        "skew_join_segment_value": _q_skew_join_segment_value,
        "sketch_blob_langs_by_source": _q_sketch_blob_langs_by_source,
        "semantic_decontaminate": _q_semantic_decontaminate,
        "hard_negatives_topk": _q_hard_negatives,
        "join_key_multiplicity": _q_join_key_multiplicity,
        "length_bucket_plan": _q_length_bucket_plan,
        "freq_blob_top_tokens_by_lang": _q_freq_blob_top_tokens_by_lang,
        "char_budget_subset": _q_char_budget_subset,
        "exact_dup_size_histogram": _q_exact_dup_size_histogram,
        "kll_blob_quantiles_by_source": _q_kll_blob_quantiles_by_source,
        "conv_lang_switches": _q_conv_lang_switches,
        "daily_value_quantiles": _q_daily_value_quantiles,
        "ri_audit_orders_lineitem": _q_ri_audit,
        "ann_pq_topk": _q_ann_pq_topk,
        "events_anomaly_days": _q_events_anomaly_days,
        "role_transitions": _q_role_transitions,
        "user_gap_fano": _q_user_gap_fano,
        "reply_length_slope": _q_reply_length_slope,
        "top_events_with_ties": _q_top_events_with_ties,
        "doc_longest_repeat": _q_doc_longest_repeat,
        "session_running_value": _q_session_running_value,
        "truncated_convs": _q_truncated_convs,
        "blocked_near_dups": _q_blocked_near_dups,
        "copurchase_bridges": _q_copurchase_bridges,
        "lsh_sensitivity_curve": _q_lsh_sensitivity_curve,
        "second_order_latency": _q_second_order_latency,
        "first_response_latency": _q_first_response_latency,
        "customer_rfm": _q_customer_rfm,
        "weekly_new_vs_repeat_revenue": _q_weekly_new_vs_repeat_revenue,
        "source_charclass_profile": _q_source_charclass_profile,
        "nation_supplier_hhi": _q_nation_supplier_hhi,
        "conv_question_stats": _q_conv_question_stats,
        "doc_sentence_stats": _q_doc_sentence_stats,
        "user_weekend_share": _q_user_weekend_share,
        "brand_qty_price_corr": _q_brand_qty_price_corr,
        "user_event_entropy": _q_user_event_entropy,
        "supplier_activity_span": _q_supplier_activity_span,
        "basket_size_value_curve": _q_basket_size_value_curve,
        "langid_confusion": _q_langid_confusion,
        "order_lorenz_deciles": _q_order_lorenz_deciles,
        "gap_log2_histogram": _q_gap_log2_histogram,
        "event_type_peak_hour": _q_event_type_peak_hour,
    }


def oracle_sql() -> dict[str, str]:
    # The transcript oracles read the deterministic synthetic transcript
    # parquet the queries themselves consume. The driver runs oracles at
    # sf0.01, so materialize that tier's cache up front (pure pyarrow,
    # no Ray) and embed its path; tools/check_oracle.py rewrites the
    # path when validating other tiers.
    try:
        tdir = _transcripts_dir("/root/testdata/sf0.01")
    except Exception:  # never let oracle registration fail
        tdir = "/tmp/adgr_entry_cache/sf0.01/transcripts"
    T = f"read_parquet('{tdir}/*.parquet')"
    return {
        "transcript_assemble_stats": f"""
            SELECT conv_id, count(*) AS n_turns,
                   CAST(sum(length(text)) + count(*) - 1 AS BIGINT)
                     AS n_chars
            FROM {T} GROUP BY conv_id
        """,
        "transcript_turn_gaps": f"""
            WITH o AS (
              SELECT conv_id, epoch_us(ts) AS t,
                     epoch_us(lead(ts) OVER (PARTITION BY conv_id
                                             ORDER BY turn_idx)) AS nt
              FROM {T}
            )
            SELECT conv_id, count(*) AS n_turns,
                   CAST(coalesce(sum(CASE WHEN nt - t > 300000000
                                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                     AS n_long_gaps,
                   coalesce(
                     floor(CAST(sum(nt - t) AS DOUBLE) / count(nt)
                           / 1000000.0 * 1000.0 + 0.5) / 1000.0,
                     0.0) AS mean_gap_s
            FROM o GROUP BY conv_id
        """,
        "transcript_role_stats": f"""
            SELECT conv_id,
                   CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_user,
                   CAST(sum(CASE WHEN role = 'assistant' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_assistant,
                   CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool,
                   CAST(sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool_calls,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars
            FROM {T} GROUP BY conv_id
        """,
        "transcript_reply_latency": f"""
            WITH o AS (
              SELECT conv_id, role, epoch_us(ts) AS t,
                     lead(role) OVER w AS nrole,
                     epoch_us(lead(ts) OVER w) AS nt
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ), r AS (
              SELECT conv_id,
                     CASE WHEN role = 'user' AND nrole = 'assistant'
                          THEN nt - t END AS lat_us
              FROM o
            )
            SELECT conv_id,
                   CAST(count(lat_us) AS BIGINT) AS n_replies,
                   coalesce(
                     floor(CAST(sum(lat_us) AS DOUBLE) / count(lat_us)
                           / 1000000.0 * 1000.0 + 0.5) / 1000.0,
                     0.0) AS mean_reply_s,
                   coalesce(
                     floor(CAST(max(lat_us) AS DOUBLE)
                           / 1000000.0 * 1000.0 + 0.5) / 1000.0,
                     0.0) AS max_reply_s
            FROM r GROUP BY conv_id
        """,
        "transcript_tool_usage": f"""
            SELECT tool, count(*) AS n_calls,
                   count(DISTINCT conv_id) AS n_convs,
                   floor(CAST(sum(length(text)) AS DOUBLE) / count(*)
                         * 1000.0 + 0.5) / 1000.0 AS mean_call_len
            FROM {T} WHERE tool <> '' GROUP BY tool
        """,
        "transcript_role_paths": f"""
            SELECT conv_id, count(*) AS n_turns,
                   string_agg(role, '>' ORDER BY turn_idx) AS role_path
            FROM {T} GROUP BY conv_id
        """,
        "boilerplate_turns": f"""
            WITH c AS (
              SELECT text, count(DISTINCT conv_id) AS n_convs
              FROM {T} GROUP BY text
            )
            SELECT text, n_convs FROM c WHERE n_convs >= 2
            ORDER BY n_convs DESC, text ASC LIMIT 20
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "eval_decontaminate": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, array_to_string(toks[i:i+12], ' ') AS gram
              FROM t, LATERAL (
                SELECT unnest(generate_series(1, len(toks) - 12)) AS i) s
              WHERE len(toks) >= 13
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0)
            SELECT g.doc_id AS doc_id,
                   CAST(count(DISTINCT g.gram) AS BIGINT) AS n_grams,
                   CAST(count(DISTINCT CASE WHEN ev.gram IS NOT NULL
                                            THEN g.gram END) AS BIGINT)
                     AS n_hits
            FROM g LEFT JOIN ev USING (gram)
            WHERE g.doc_id % 7 <> 0
            GROUP BY g.doc_id
            HAVING n_hits > 0
            ORDER BY doc_id
        """,
        "transcript_decontaminate": f'''
            WITH conv AS (
              SELECT conv_id,
                     string_agg(text, chr(10) ORDER BY turn_idx) AS text
              FROM {T} GROUP BY conv_id),
            t AS (SELECT conv_id,
                         CAST(substr(conv_id, 6) AS BIGINT) AS cid,
                         string_split_regex(trim(text), '\\s+') AS toks
                  FROM conv),
            g AS (SELECT conv_id, cid,
                         array_to_string(toks[i:i+12], ' ') AS gram
                  FROM t, LATERAL (
                    SELECT unnest(generate_series(1, len(toks) - 12)) AS i) s
                  WHERE len(toks) >= 13),
            ev AS (SELECT DISTINCT gram FROM g WHERE cid % 5 = 0)
            SELECT g.conv_id AS conv_id,
                   CAST(count(DISTINCT g.gram) AS BIGINT) AS n_grams,
                   CAST(count(DISTINCT CASE WHEN ev.gram IS NOT NULL
                                            THEN g.gram END) AS BIGINT)
                     AS n_hits
            FROM g LEFT JOIN ev USING (gram)
            WHERE g.cid % 5 <> 0
            GROUP BY g.conv_id
            HAVING n_hits > 0
            ORDER BY conv_id
        ''',
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "doc_stats": r"""
            WITH t AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            )
            SELECT doc_id, n_chars,
                   CASE WHEN len(toks) = 1 AND toks[1] = '' THEN 0
                        ELSE len(toks) END AS n_tokens,
                   floor(list_aggregate(list_transform(toks, x -> length(x)),
                                        'sum') * 1.0 /
                         (CASE WHEN len(toks) = 1 AND toks[1] = '' THEN 1
                               ELSE len(toks) END) * 10000) / 10000
                     AS mean_token_len
            FROM t
        """,
        "top_tokens": r"""
            SELECT tok AS token, count(*) AS cnt
            FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                  FROM documents)
            WHERE tok <> ''
            GROUP BY tok
            ORDER BY cnt DESC, token ASC
            LIMIT 20
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY lang
        """,
        "consecutive_jaccard": r"""
            WITH t AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(trim(text), '\s+'))
                       AS toks
              FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                         (len(a.toks) + len(b.toks)
                          - len(list_intersect(a.toks, b.toks))), 6) AS jacc
            FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
        """,
        "jaccard_join_dups": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_distinct(
                         string_split_regex(trim(text), '\s+'))) AS tk
              FROM documents
              WHERE trim(text) <> ''
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM tok GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM tok a JOIN tok b
                ON a.tk = b.tk AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT inter.doc_a, inter.doc_b,
                   round(i * 1.0 / (sa.s + sb.s - i), 6) AS jacc
            FROM inter
            JOIN sz sa ON sa.doc_id = inter.doc_a
            JOIN sz sb ON sb.doc_id = inter.doc_b
            WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.9
        """,
        "dup_source_matrix": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_distinct(
                         string_split_regex(trim(text), '\s+'))) AS tk
              FROM documents
              WHERE trim(text) <> ''
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM tok GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM tok a JOIN tok b
                ON a.tk = b.tk AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), dup_pairs AS (
              SELECT inter.doc_a, inter.doc_b
              FROM inter
              JOIN sz sa ON sa.doc_id = inter.doc_a
              JOIN sz sb ON sb.doc_id = inter.doc_b
              WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.9
            )
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM dup_pairs p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
            GROUP BY 1, 2
        """,
        "jaccard_join_bigram_dups": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS ts
              FROM documents
              WHERE trim(text) <> ''
            ), big AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, len(ts)),
                         i -> ts[i] || ' ' || ts[i + 1]))) AS tk
              FROM t
              WHERE len(ts) >= 2
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM big GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM big a JOIN big b
                ON a.tk = b.tk AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT inter.doc_a, inter.doc_b,
                   round(i * 1.0 / (sa.s + sb.s - i), 6) AS jacc
            FROM inter
            JOIN sz sa ON sa.doc_id = inter.doc_a
            JOIN sz sb ON sb.doc_id = inter.doc_b
            WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.75
        """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "customer_nation_revenue": """
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS sum_qty_c,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_c,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_tokens_by_lang": r"""
            WITH tok AS (
              SELECT lang,
                     unnest(string_split_regex(trim(text), '\s+')) AS item
              FROM documents
            ), c AS (
              SELECT lang, item, count(*) AS cnt
              FROM tok WHERE item <> '' GROUP BY lang, item
            ), r AS (
              SELECT lang, item, cnt,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY cnt DESC, item ASC)
                       AS rank
              FROM c
            )
            SELECT lang, item, cnt AS estimate, rank
            FROM r WHERE rank <= 10
        """,
        "quality_scores": r"""
            WITH t AS (
              SELECT doc_id, text,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+')
                     END AS toks
              FROM documents
            ), c AS (
              SELECT doc_id,
                     len(toks) AS nt,
                     CASE WHEN len(toks) = 0 THEN 0
                          ELSE list_aggregate(list_transform(
                                 toks, x -> length(x)), 'sum')
                     END AS total_chars,
                     CASE WHEN len(toks) = 0 THEN 0
                          ELSE list_aggregate(list_transform(
                                 toks, x -> length(regexp_replace(
                                   x, '[^0-9]', '', 'g'))), 'sum')
                     END AS digit_chars,
                     CASE WHEN len(toks) = 0 THEN 0
                          ELSE len(list_filter(toks, x -> lower(x) IN
                            ('the','a','an','and','or','of','to','in',
                             'is','it','that','for','on','with','as',
                             'was','at','by','be')))
                     END AS sw_hits
              FROM t
            ), r AS (
              SELECT doc_id,
                     CASE WHEN total_chars = 0 THEN 0.0
                          ELSE digit_chars * 1.0 / total_chars
                     END AS digit_ratio,
                     CASE WHEN nt = 0 THEN 0.0
                          ELSE sw_hits * 1.0 / nt END AS stopword_ratio,
                     CASE WHEN nt = 0 THEN 0.0
                          ELSE total_chars * 1.0 / nt END AS mean_tok,
                     nt
              FROM c
            )
            SELECT doc_id, stopword_ratio, digit_ratio,
                   least(nt / 50.0, 1.0) * 0.4
                   + greatest(least(1.0 - digit_ratio * 4, 1.0), 0.0) * 0.2
                   + least(stopword_ratio * 5, 1.0) * 0.2
                   + greatest(least(1.0 - abs(mean_tok - 5.0) / 10.0, 1.0),
                              0.0) * 0.2
                     AS quality_score
            FROM r
        """,
        "langid": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE list_transform(
                            string_split_regex(trim(text), '\s+'),
                            x -> trim(lower(x), '.,;:!?"''()'))
                     END AS toks
              FROM documents
            ), h AS (
              SELECT doc_id,
                len(list_filter(toks, x -> x IN
                  ('der','die','das','und','oder','von','zu','im','ist',
                   'es','dass','für','auf','mit','als','war','bei','ein')))
                  AS hde,
                len(list_filter(toks, x -> x IN
                  ('the','a','an','and','or','of','to','in','is','it',
                   'that','for','on','with','as','was','at','by','be')))
                  AS hen,
                len(list_filter(toks, x -> x IN
                  ('el','la','los','las','y','o','de','a','en','es','que',
                   'para','sobre','con','como','era','por','un'))) AS hes,
                len(list_filter(toks, x -> x IN
                  ('le','la','les','et','ou','de','à','en','est','il',
                   'que','pour','sur','avec','comme','était','par','un')))
                  AS hfr
              FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(hde, hen, hes, hfr) = 0
                          THEN 'unknown'
                        WHEN hde >= hen AND hde >= hes AND hde >= hfr
                          THEN 'de'
                        WHEN hen >= hes AND hen >= hfr THEN 'en'
                        WHEN hes >= hfr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM h
        """,
        "session_path_dups": """
            WITH w AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(ts) OVER win IS NULL
                               OR ts - lag(ts) OVER win
                                  > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, ts, event_id, event_type,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sno
              FROM w
            ), p AS (
              SELECT user_id, sno,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, sno
            )
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM p GROUP BY path HAVING count(*) >= 2
        """,
        "events_sessionize": """
            WITH w AS (
              SELECT user_id, ts, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                               OR ts - lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                                  > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
            ), s AS (
              SELECT user_id, ts, cents,
                     CAST(sum(new_s) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_no
              FROM w
            )
            SELECT user_id, session_no, count(*) AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM s GROUP BY user_id, session_no
        """,
        "events_running": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)
                        AS BIGINT) AS row_no,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS run_cents
            FROM events
        """,
        "top_orders": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
            FROM orders
            ORDER BY price_c DESC, o_orderkey ASC
            LIMIT 25
        """,
        "order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o.o_orderkey
                            AND l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        "customers_no_orders": """
            SELECT c_custkey, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01')
        """,
        "region_revenue": """
            SELECT r.r_name AS region, count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders o
            JOIN customer c ON o_custkey = c_custkey
            JOIN nation n ON c_nationkey = n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "distinct_users_daily": """
            SELECT date_trunc('day', ts) AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "asof_event_order": """
            WITH m AS (
              SELECT e.event_id, o.o_orderkey,
                     row_number() OVER (PARTITION BY e.event_id
                                        ORDER BY o.o_orderdate DESC,
                                                 o.o_orderkey DESC) AS rn
              FROM events e JOIN orders o
                ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            )
            SELECT event_id, o_orderkey AS matched_orderkey
            FROM m WHERE rn = 1
        """,
        "consecutive_bigram_jaccard": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents
            ), b AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS grams
              FROM t
            )
            SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                   coalesce(round(
                     len(list_intersect(a.grams, b2.grams)) * 1.0 /
                     nullif(len(a.grams) + len(b2.grams)
                            - len(list_intersect(a.grams, b2.grams)), 0),
                     6), 1.0) AS jacc
            FROM b a JOIN b b2 ON b2.doc_id = a.doc_id + 1
        """,
        "kll_quantiles_nchars_exact": """
            WITH r AS (
              SELECT CAST(n_chars AS DOUBLE) AS v,
                     row_number() OVER (ORDER BY n_chars) AS rn,
                     count(*) OVER () AS cnt
              FROM documents
            )
            SELECT CAST(max(cnt) AS BIGINT) AS n,
                   min(v) AS min, max(v) AS max,
                   min(CASE WHEN rn >= greatest(
                         CAST(ceil(0.25 * cnt) AS BIGINT), 1)
                       THEN v END) AS q25,
                   min(CASE WHEN rn >= greatest(
                         CAST(ceil(0.5 * cnt) AS BIGINT), 1)
                       THEN v END) AS q50,
                   min(CASE WHEN rn >= greatest(
                         CAST(ceil(0.75 * cnt) AS BIGINT), 1)
                       THEN v END) AS q75
            FROM r
        """,
        "kll_cdf_nchars_exact": """
            WITH s AS (
              SELECT unnest([200.0, 400.0, 800.0, 1600.0]) AS split
            ), c AS (
              SELECT s.split,
                     (SELECT count(*) FROM documents
                      WHERE n_chars < s.split) * 1.0
                       / (SELECT count(*) FROM documents) AS cd
              FROM s
            )
            SELECT split,
                   round(cd - coalesce(lag(cd) OVER (ORDER BY split),
                                       0.0), 6) AS pmf,
                   round(cd, 6) AS cdf
            FROM c
        """,
        "freq_top_tokens_exact": r"""
            WITH tok AS (
              SELECT unnest(string_split_regex(trim(text), '\s+')) AS item
              FROM documents
            ), c AS (
              SELECT item, CAST(count(*) AS BIGINT) AS cnt
              FROM tok WHERE item <> '' GROUP BY item
            )
            SELECT item, cnt AS estimate, cnt AS lower_bound,
                   cnt AS upper_bound
            FROM c ORDER BY cnt DESC, item ASC LIMIT 15
        """,
        "partitioned_sink_roundtrip": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "varopt_sample_by_source": """
            SELECT source, CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(n_chars AS DOUBLE) AS weight,
                   CAST(n_chars AS DOUBLE) AS adjusted_weight,
                   TRUE AS is_heavy
            FROM documents
        """,
        "varopt_sample_docs": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(n_chars AS DOUBLE) AS weight,
                   CAST(n_chars AS DOUBLE) AS adjusted_weight,
                   TRUE AS is_heavy
            FROM documents
        """,
        "doc_encoding_qa": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
                     AS n_replacement,
                   CAST(len(regexp_extract_all(text, 'Ã.|â€.|Â')) AS BIGINT)
                     AS n_mojibake,
                   CAST(len(regexp_extract_all(text,
                        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS BIGINT)
                     AS n_ctrl,
                   regexp_matches(text, '^[\\x00-\\x7f]*$') AS is_ascii
            FROM documents
        """,
        "sample_docs_bottomk": """
            SELECT doc_id,
                   CAST((doc_id * 2654435761) % 4294967296 AS BIGINT)
                     AS h
            FROM documents
            ORDER BY h ASC, doc_id ASC
            LIMIT 100
        """,
        "largest_event_per_user": """
            WITH r AS (
              SELECT user_id, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(round(value * 100) AS BIGINT) DESC,
                                event_id ASC) AS rn
              FROM events
            )
            SELECT user_id, event_id, cents FROM r WHERE rn = 1
        """,
        "event_type_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "kll_rank_annotate": """
            SELECT doc_id,
                   round(cume_dist() OVER (ORDER BY n_chars), 6)
                     AS chars_rank
            FROM documents
        """,
        "events_sliding_window": """
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS win_n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                          OVER w AS BIGINT) AS win_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "bpe_token_counts": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "train_eval_split": """
            SELECT doc_id,
                   CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100
                             < 10
                        THEN 'eval' ELSE 'train' END AS split
            FROM documents
        """,
        "kll_quantiles_by_lang": """
            WITH r AS (
              SELECT lang, CAST(n_chars AS DOUBLE) AS v,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS cnt
              FROM documents
            )
            SELECT lang, CAST(max(cnt) AS BIGINT) AS n,
                   min(CASE WHEN rn >= greatest(
                         CAST(ceil(0.25 * cnt) AS BIGINT), 1)
                       THEN v END) AS q25,
                   min(CASE WHEN rn >= greatest(
                         CAST(ceil(0.5 * cnt) AS BIGINT), 1)
                       THEN v END) AS q50,
                   min(CASE WHEN rn >= greatest(
                         CAST(ceil(0.75 * cnt) AS BIGINT), 1)
                       THEN v END) AS q75
            FROM r GROUP BY lang
        """,
        "revenue_filter": """
            SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100
                                       + 0.5) AS BIGINT)) AS BIGINT)
                     AS revenue_c,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "brand_revenue": """
            SELECT p_brand, count(*) AS n_items,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS revenue_c
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY p_brand
        """,
        "supplier_balance": """
            SELECT n_name, count(*) AS n_suppliers,
                   CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS sum_bal_c
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "shipping_priority": """
            WITH rev AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                         * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS revenue_c
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1997-06-01'
              GROUP BY l_orderkey
            )
            SELECT o.o_orderkey, rev.revenue_c, o.o_orderdate
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
                           AND c.c_mktsegment = 'BUILDING'
            JOIN rev ON rev.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate < TIMESTAMP '1997-06-01'
            ORDER BY rev.revenue_c DESC, o.o_orderkey ASC
            LIMIT 10
        """,
        "event_followups": """
            SELECT s.event_id,
                   CAST(count(e.user_id) AS BIGINT) AS n_follow,
                   CAST(coalesce(sum(CAST(round(e.value * 100)
                                          AS BIGINT)), 0) AS BIGINT)
                     AS sum_cents
            FROM events s LEFT JOIN events e
              ON e.user_id = s.user_id
             AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 6 HOUR
            WHERE s.event_type = 'signup'
            GROUP BY s.event_id
        """,
        "props_extract": r"""
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(min(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(max(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 5
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS score
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id ASC)
                       AS rank
              FROM scored
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10
        """,
        "events_lead_delta": """
            WITH t AS (
              SELECT event_id, user_id, ts,
                     cast(round(value * 100) AS bigint) AS cents
              FROM events
            ), o AS (
              SELECT event_id, user_id, cents,
                     lead(cents, 1, 0) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
              FROM t
            )
            SELECT event_id, user_id, nxt AS next_cents,
                   nxt - cents AS delta_cents
            FROM o
        """,
        "events_lag_delta": """
            WITH t AS (
              SELECT event_id, user_id, ts,
                     cast(round(value * 100) AS bigint) AS cents
              FROM events
            ), o AS (
              SELECT event_id, user_id, cents,
                     lag(cents, 1, 0) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
              FROM t
            )
            SELECT event_id, user_id, prev AS prev_cents,
                   cents - prev AS delta_cents
            FROM o
        """,
        "events_time_window": """
            SELECT event_id, user_id,
                   count(*) OVER w AS win_n,
                   CAST(sum(cast(round(value * 100) AS bigint)) OVER w
                        AS BIGINT) AS win_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW)
        """,
        "order_rank_per_customer": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   dense_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC) AS rnk
            FROM orders
        """,
        "event_paths": """
            SELECT user_id, count(*) AS n_events,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                     AS path
            FROM events GROUP BY user_id
        """,
        "funnel_depth": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts >= s1.t1
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
                   GROUP BY 1)
            SELECT u.user_id,
                   CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                             WHEN s2.t2 IS NOT NULL THEN 2
                             WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS depth,
                   s1.t1 AS t_first,
                   coalesce(s3.t3, s2.t2, s1.t1) AS t_deepest
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
        """,
        "top3_events_per_user": """
            SELECT user_id, event_id,
                   cast(round(value * 100) AS bigint) AS cents,
                   row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY cast(round(value * 100) AS bigint) DESC,
                              event_id) AS rnk
            FROM events
            QUALIFY rnk <= 3
        """,
        "ann_knn_join_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings WHERE vec_id % 37 = 0
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS score
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id ASC)
                       AS rank
              FROM scored
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5
        """,
        "kll_source_quantiles_by_lang": """
            SELECT lang, count(*) AS n,
                   quantile_disc(source, 0.25) AS q25,
                   quantile_disc(source, 0.50) AS q50,
                   quantile_disc(source, 0.75) AS q75
            FROM documents GROUP BY lang
        """,
        "kll_int64_quantiles_by_source": """
            SELECT source, count(*) AS n,
                   CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25,
                   CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q50,
                   CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q75
            FROM documents GROUP BY source
        """,
        "lang_quantiles_exact": """
            SELECT lang,
                   quantile_disc(n_chars, 0.25) AS q25,
                   quantile_disc(n_chars, 0.50) AS q50,
                   quantile_disc(n_chars, 0.75) AS q75
            FROM documents GROUP BY lang
        """,
        "order_quartiles": """
            SELECT o_orderkey, o_totalprice,
                   ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                     AS bucket
            FROM orders
        """,
        "events_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
                   count(*) AS n,
                   CAST(sum(cast(round(value * 100) AS bigint))
                       AS BIGINT) AS sum_cents
            FROM events
            GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
        """,
        "users_intersect_customers": """
            SELECT DISTINCT user_id FROM events
            INTERSECT
            SELECT DISTINCT c_custkey FROM customer
        """,
        "customers_except_users": """
            SELECT DISTINCT c_custkey FROM customer
            EXCEPT
            SELECT DISTINCT user_id FROM events
        """,
        "doc_token_positions": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            )
            SELECT doc_id, unnest(toks) AS tok,
                   unnest(generate_series(1, len(toks))) AS ord
            FROM t
        """,
        "docs_normalized": r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                       regexp_replace(lower(text), '\s+', ' ', 'g'),
                       '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
                     AS norm_text
            FROM documents
        """,
        "lang_quantiles_cont": """
            SELECT lang,
                   quantile_cont(cast(n_chars AS double), 0.5) AS q50,
                   quantile_cont(cast(n_chars AS double), 0.9) AS q90
            FROM documents GROUP BY lang
        """,
        "user_top_event_type": """
            SELECT user_id, event_type AS top_value, cnt
            FROM (
              SELECT user_id, event_type, count(*) AS cnt,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC,
                                                 event_type ASC) AS rn
              FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "nchars_histogram": """
            SELECT n_chars // 200 AS bucket, count(*) AS n,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents GROUP BY 1
        """,
        "orders_bloom_semi": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
        """,
        "event_value_cume": """
            SELECT event_id, user_id, value,
                   cume_dist() OVER (PARTITION BY user_id
                                     ORDER BY value) AS cume
            FROM events
        """,
        "stratified_sample_docs": """
            SELECT lang, doc_id, h FROM (
              SELECT lang, doc_id,
                     (doc_id * 2654435761) % 4294967296 AS h,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY (doc_id * 2654435761) % 4294967296,
                                doc_id) AS rn
              FROM documents
            ) WHERE rn <= 3
        """,
        "user_customer_full_outer": """
            WITH ec AS (
              SELECT user_id, count(*) AS n_events
              FROM events GROUP BY user_id
            )
            SELECT coalesce(ec.user_id, c.c_custkey) AS ukey,
                   coalesce(ec.n_events, 0) AS n_events,
                   coalesce(c.c_acctbal, -1.0) AS acctbal
            FROM ec FULL OUTER JOIN customer c
              ON ec.user_id = c.c_custkey
        """,
        "events_weekly": """
            SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                   count(*) AS n,
                   CAST(sum(cast(round(value * 100) AS bigint))
                       AS BIGINT) AS sum_cents
            FROM events GROUP BY 1
        """,
        "consecutive_edit_distance": """
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(substring(a.text, 1, 32),
                               substring(b.text, 1, 32)) AS dist
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        """,
        "exact_dedup_normalized": r"""
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(
                         regexp_replace(lower(text), '\s+', ' ', 'g'),
                         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
                       AS norm_text
              FROM documents
            )
            SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
            FROM n GROUP BY norm_text
        """,
        "source_langs": """
            SELECT source, count(DISTINCT lang) AS n_langs,
                   string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
            FROM documents GROUP BY source
        """,
        "user_first_last_event": """
            SELECT DISTINCT user_id,
                   first_value(event_type) OVER w AS first_type,
                   last_value(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING) AS last_type,
                   count(*) OVER (PARTITION BY user_id) AS n_events
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "revenue_by_price_quartile": """
            WITH q AS (
              SELECT o_totalprice,
                     ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS bucket
              FROM orders
            )
            SELECT bucket, count(*) AS n_orders,
                   CAST(sum(cast(round(o_totalprice * 100) AS bigint))
                        AS BIGINT) AS sum_cents
            FROM q GROUP BY bucket
        """,
        "order_percent_rank": """
            SELECT o_orderkey,
                   percent_rank() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC)
                     AS pct_rank
            FROM orders
        """,
        "order_ntile": """
            SELECT o_orderkey,
                   CAST(ntile(4) OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC,
                                                o_orderkey ASC)
                        AS BIGINT) AS bucket
            FROM orders
        """,
        "order_rank_gaps": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS rnk
            FROM orders
        """,
        "daily_top_event": """
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id,
                   cast(round(value * 100) AS bigint) AS cents
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                ORDER BY cast(round(value * 100) AS bigint) DESC,
                         event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "event_pivot_melt": """
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        """,
        "user_spend_summary": """
            WITH u AS (
              SELECT user_id,
                     CAST(sum(cast(round(value * 100) AS bigint))
                          AS BIGINT) AS cents
              FROM events GROUP BY user_id
            )
            SELECT count(*) AS n_users,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   min(cents) AS min_user_cents,
                   max(cents) AS max_user_cents
            FROM u
        """,
        "docs_containing_pattern": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(CASE WHEN text LIKE '%and%' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_match
            FROM documents GROUP BY lang
        """,
        "repetition_stats": r"""
            WITH l AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line
              FROM documents
            ), lc AS (
              SELECT doc_id, line, count(*) AS c, length(line) AS len
              FROM l GROUP BY doc_id, line
            ), lagg AS (
              SELECT doc_id,
                     sum(c) AS total_lines,
                     count(*) AS distinct_lines,
                     sum(c * len) AS total_line_chars,
                     coalesce(sum(CASE WHEN c > 1 THEN c * len END), 0)
                       AS dup_line_chars
              FROM lc GROUP BY doc_id
            ), t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE string_split_regex(trim(text), '\s+')
                     END AS toks
              FROM documents
            ), u AS (
              SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS i
              FROM t
            ), tc AS (
              SELECT doc_id, sum(length(w)) AS total_tok_chars
              FROM u GROUP BY doc_id
            ), bc AS (
              SELECT a.doc_id, a.w AS w1, b.w AS w2, count(*) AS c,
                     length(a.w) + length(b.w) AS len2
              FROM u a JOIN u b
                ON a.doc_id = b.doc_id AND b.i = a.i + 1
              GROUP BY a.doc_id, a.w, b.w, length(a.w) + length(b.w)
            ), bt AS (
              SELECT doc_id, max(c * len2) AS top_score
              FROM bc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(lagg.total_lines AS BIGINT) AS n_lines,
                   (lagg.total_lines - lagg.distinct_lines) * 1.0
                     / lagg.total_lines AS dup_line_frac,
                   CASE WHEN lagg.total_line_chars > 0
                        THEN lagg.dup_line_chars * 1.0
                             / lagg.total_line_chars
                        ELSE 0.0 END AS dup_line_char_frac,
                   CASE WHEN coalesce(tc.total_tok_chars, 0) > 0
                             AND bt.top_score IS NOT NULL
                        THEN bt.top_score * 1.0 / tc.total_tok_chars
                        ELSE 0.0 END AS top_bigram_char_frac
            FROM documents d
            LEFT JOIN lagg USING (doc_id)
            LEFT JOIN tc USING (doc_id)
            LEFT JOIN bt USING (doc_id)
        """,
        "pii_redact": r"""
            WITH a AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or call +1 (555) 010-'
                          || CAST(doc_id AS VARCHAR) AS t
              FROM documents
            ), e AS (
              SELECT doc_id,
                     len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'
                       )) AS n_emails,
                     regexp_replace(t,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM a
            )
            SELECT doc_id,
                   CAST(n_emails AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t1,
                     '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT)
                     AS n_phones,
                   regexp_replace(t1, '\+?[0-9][0-9()\- ]{6,}[0-9]',
                                  '<PHONE>', 'g') AS redacted_text
            FROM e
        """,
        "domain_reweight_sample": """
            WITH w(source, wt) AS (VALUES """ + ", ".join(
            f"('src{i}', {i + 1}.0)" for i in range(20)) + """),
            c AS (
              SELECT source, count(*) AS cnt FROM documents
              GROUP BY source
            ), j AS (
              SELECT c.source, c.cnt, w.wt / 210.0 AS p
              FROM c JOIN w USING (source)
            ), m AS (
              SELECT min(cnt / p) AS mx FROM j
            ), t AS (
              SELECT source,
                     floor(p * (SELECT mx FROM m) / cnt
                           * 4294967296.0) AS thr
              FROM j
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN t USING (source)
            WHERE ((d.doc_id * 2654435761) % 4294967296) < t.thr
        """,
        "theta_user_overlap": """
            WITH p AS (
              SELECT DISTINCT event_type, user_id FROM events
            ), c AS (
              SELECT event_type, count(*) AS n FROM p GROUP BY 1
            ), inter AS (
              SELECT x.event_type AS ta, y.event_type AS tb,
                     count(*) AS nc
              FROM p x JOIN p y
                ON x.user_id = y.user_id
               AND x.event_type < y.event_type
              GROUP BY 1, 2
            )
            SELECT ca.event_type AS type_a, cb.event_type AS type_b,
                   CAST(ca.n AS BIGINT) AS n_a,
                   CAST(cb.n AS BIGINT) AS n_b,
                   CAST(coalesce(i.nc, 0) AS BIGINT) AS n_common,
                   CAST(ca.n - coalesce(i.nc, 0) AS BIGINT) AS n_a_only
            FROM c ca
            JOIN c cb ON ca.event_type < cb.event_type
            LEFT JOIN inter i
              ON i.ta = ca.event_type AND i.tb = cb.event_type
        """,
        "turn_dedup_rewrite": f"""
            WITH r AS (
              SELECT conv_id, turn_idx, text,
                     row_number() OVER (PARTITION BY text
                                        ORDER BY conv_id, turn_idx) AS rn
              FROM {T}
            )
            SELECT conv_id,
                   CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT)
                     AS n_kept,
                   CAST(count(CASE WHEN rn > 1 THEN 1 END) AS BIGINT)
                     AS n_dropped,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN text END,
                                       chr(10) ORDER BY turn_idx), '')
                     AS text
            FROM r GROUP BY conv_id
        """,
        "tool_chains": f"""
            WITH t AS (
              SELECT conv_id, turn_idx, tool FROM {T} WHERE tool <> ''
            ),
            o AS (
              SELECT tool,
                     lead(tool) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS next_tool
              FROM t
            )
            SELECT tool || ' -> ' || next_tool AS chain,
                   CAST(count(*) AS BIGINT) AS n
            FROM o WHERE next_tool IS NOT NULL
            GROUP BY 1
        """,
        "events_profile": """
            SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT)
                     AS n_rows,
                   CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
            FROM events
            UNION ALL
            SELECT 'ts', count(*), count(*) - count(ts),
                   count(DISTINCT ts) FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   count(DISTINCT user_id) FROM events
            UNION ALL
            SELECT 'event_type', count(*), count(*) - count(event_type),
                   count(DISTINCT event_type) FROM events
            UNION ALL
            SELECT 'value', count(*), count(*) - count(value),
                   count(DISTINCT value) FROM events
            UNION ALL
            SELECT 'props', count(*), count(*) - count(props),
                   count(DISTINCT props) FROM events
        """,
        "lang_mad_outliers": """
            WITH m AS (
              SELECT lang, median(n_chars) AS med
              FROM documents GROUP BY lang
            ),
            s AS (
              SELECT d.lang, any_value(m.med) AS med,
                     median(abs(d.n_chars - m.med)) AS mad
              FROM documents d JOIN m USING (lang) GROUP BY d.lang
            )
            SELECT s.lang, s.med AS median_nchars, s.mad AS mad_nchars,
                   CAST(count(CASE WHEN abs(d2.n_chars - s.med)
                                        > 3.0 * s.mad THEN 1 END)
                        AS BIGINT) AS n_outliers,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d2 JOIN s ON d2.lang = s.lang
            GROUP BY s.lang, s.med, s.mad
        """,
        "exact_dedup_keep_best": """
            WITH r AS (
              SELECT doc_id, n_chars,
                     row_number() OVER (PARTITION BY text
                                        ORDER BY n_chars DESC,
                                                 doc_id ASC) AS rn,
                     count(*) OVER (PARTITION BY text) AS n_copies
              FROM documents
            )
            SELECT doc_id AS keeper_id,
                   CAST(n_copies AS BIGINT) AS n_copies,
                   CAST(n_chars AS BIGINT) AS keeper_score
            FROM r WHERE rn = 1
        """,
        "events_out_of_order": """
            WITH o AS (
              SELECT user_id, epoch_us(ts) AS t,
                     max(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prior_max
              FROM events
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(CASE WHEN t < prior_max THEN 1 END)
                        AS BIGINT) AS n_out_of_order,
                   CAST(coalesce(max(CASE WHEN t < prior_max
                                          THEN prior_max - t END), 0)
                        AS BIGINT) AS max_regression_us
            FROM o GROUP BY user_id
        """,
        "context_truncate_stats": f"""
            WITH t AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text),
                                                      '\\s+')) END AS ntok
              FROM {T}
            ),
            r AS (
              SELECT conv_id, turn_idx, ntok,
                     sum(ntok) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx DESC) AS rtot
              FROM t
            )
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(CASE WHEN rtot <= 512 THEN 1 END) AS BIGINT)
                     AS n_kept_tail,
                   CAST(coalesce(max(CASE WHEN rtot <= 512 THEN rtot END),
                                 0) AS BIGINT) AS tokens_kept
            FROM r GROUP BY conv_id
        """,
        "role_alternation": f"""
            WITH o AS (
              SELECT conv_id, turn_idx, role,
                     lag(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev
              FROM {T}
            )
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(CASE WHEN role = prev THEN 1 END) AS BIGINT)
                     AS n_repeats,
                   arg_min(role, turn_idx) AS first_role
            FROM o GROUP BY conv_id
        """,
        "vocab_stats_by_source": r"""
            WITH d AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY source
            ),
            t AS (
              SELECT source,
                     unnest(string_split_regex(trim(text), '\s+')) AS token
              FROM documents WHERE trim(text) <> ''
            ),
            a AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(count(DISTINCT token) AS BIGINT)
                       AS n_distinct_tokens
              FROM t GROUP BY source
            )
            SELECT d.source, d.n_docs,
                   coalesce(a.n_tokens, 0) AS n_tokens,
                   coalesce(a.n_distinct_tokens, 0) AS n_distinct_tokens
            FROM d LEFT JOIN a USING (source)
        """,
        "source_token_overlap": r"""
            WITH t AS (
              SELECT DISTINCT source, token FROM (
                SELECT source,
                       unnest(string_split_regex(trim(text), '\s+'))
                         AS token
                FROM documents WHERE trim(text) <> ''
              )
            ),
            c AS (SELECT source, count(*) AS n FROM t GROUP BY source),
            p AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     count(*) AS n_common
              FROM t a JOIN t b
                ON a.token = b.token AND a.source < b.source
              GROUP BY 1, 2
            )
            SELECT source_a, source_b,
                   CAST(ca.n AS BIGINT) AS n_a,
                   CAST(cb.n AS BIGINT) AS n_b,
                   CAST(n_common AS BIGINT) AS n_common,
                   floor(CAST(n_common AS DOUBLE)
                         / (ca.n + cb.n - n_common) * 1e6 + 0.5) / 1e6
                     AS jaccard
            FROM p
            JOIN c ca ON ca.source = p.source_a
            JOIN c cb ON cb.source = p.source_b
            WHERE n_common > 0
        """,
        "conv_turn_repeats": f"""
            WITH c AS (
              SELECT conv_id, text, count(*) AS n
              FROM {T} GROUP BY conv_id, text
            )
            SELECT conv_id,
                   CAST(sum(n) AS BIGINT) AS n_turns,
                   CAST(count(*) AS BIGINT) AS n_distinct_texts,
                   CAST(max(n) AS BIGINT) AS max_text_repeats
            FROM c GROUP BY conv_id
        """,
        "tokenizer_fertility_by_lang": r"""
            WITH d AS (
              SELECT lang,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS n_ws,
                     CAST(len(regexp_extract_all(text,
                          ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))
                          AS BIGINT) AS n_bpe
              FROM documents
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
                   CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
                   CASE WHEN sum(n_ws) > 0
                        THEN floor(CAST(sum(n_bpe) AS DOUBLE)
                                   / sum(n_ws) * 1e6 + 0.5) / 1e6
                        ELSE 0.0 END AS fertility
            FROM d GROUP BY lang
        """,
        "eval_ngram_coverage": r"""
            WITH s AS (
              SELECT doc_id,
                     CASE WHEN ((doc_id * 2654435761) % 4294967296) % 100
                               < 10
                          THEN 'eval' ELSE 'train' END AS split,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ),
            t AS (
              SELECT doc_id, split, toks[i] || ' ' || toks[i+1] AS bigram
              FROM s, LATERAL (
                SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
              WHERE len(toks) >= 2
            ),
            e AS (SELECT DISTINCT doc_id, bigram FROM t
                  WHERE split = 'eval'),
            tr AS (SELECT DISTINCT bigram FROM t WHERE split = 'train')
            SELECT e.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(count(tr.bigram) AS BIGINT) AS n_covered,
                   floor(CAST(count(tr.bigram) AS DOUBLE) / count(*)
                         * 1e6 + 0.5) / 1e6 AS coverage
            FROM e LEFT JOIN tr USING (bigram)
            GROUP BY e.doc_id
        """,
        "chatml_format": f"""
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   string_agg('<|' || role || '|>' || text, chr(10)
                              ORDER BY turn_idx) AS chatml
            FROM {T} GROUP BY conv_id
        """,
        "doc_novelty_scores": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS ts
              FROM documents WHERE trim(text) <> ''
            ), g AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, len(ts) - 1),
                         i -> ts[i] || ' ' || ts[i + 1] || ' '
                              || ts[i + 2]))) AS gm
              FROM t WHERE len(ts) >= 3
            ), f AS (
              SELECT gm, min(doc_id) AS first_doc FROM g GROUP BY gm
            ), pd AS (
              SELECT doc_id, count(*) AS n_total FROM g GROUP BY doc_id
            ), nn AS (
              SELECT g.doc_id, count(*) AS n_new
              FROM g JOIN f ON f.gm = g.gm AND f.first_doc = g.doc_id
              GROUP BY g.doc_id
            )
            SELECT pd.doc_id,
                   CAST(pd.n_total AS BIGINT) AS n_total,
                   CAST(coalesce(nn.n_new, 0) AS BIGINT) AS n_new,
                   CAST(coalesce(nn.n_new, 0) * 1000000 // pd.n_total
                        AS BIGINT) AS novelty_ppm
            FROM pd LEFT JOIN nn ON nn.doc_id = pd.doc_id
        """,
        "assistant_run_lengths": f"""
            WITH t AS (
              SELECT conv_id, role,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx)
                   - row_number() OVER (PARTITION BY conv_id, role
                                        ORDER BY turn_idx) AS grp
              FROM {T}
            ), runs AS (
              SELECT conv_id, role, grp, count(*) AS run_len
              FROM t GROUP BY 1, 2, 3
            )
            SELECT conv_id,
                   CAST(max(run_len) AS BIGINT) AS max_assistant_run
            FROM runs WHERE role = 'assistant' GROUP BY conv_id
        """,
        "tool_latency_quartiles": f"""
            WITH o AS (
              SELECT conv_id, tool, ts,
                     lead(ts) OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS next_ts
              FROM {T}
            )
            SELECT tool,
                   quantile_disc(epoch_us(next_ts) - epoch_us(ts), 0.25)
                     AS q25,
                   quantile_disc(epoch_us(next_ts) - epoch_us(ts), 0.50)
                     AS q50,
                   quantile_disc(epoch_us(next_ts) - epoch_us(ts), 0.75)
                     AS q75
            FROM o
            WHERE next_ts IS NOT NULL AND tool IS NOT NULL
              AND tool <> ''
            GROUP BY tool
        """,
        "sft_context_windows": f"""
            WITH w AS (
              SELECT conv_id, turn_idx, role, text,
                     array_to_string(list(text) OVER win, chr(10))
                       AS context,
                     count(*) OVER win AS n_ctx
              FROM {T}
              WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
            )
            SELECT conv_id, turn_idx, context,
                   CAST(n_ctx AS BIGINT) AS n_ctx, text AS target
            FROM w WHERE role = 'assistant' AND n_ctx > 0
        """,
        "sft_pairs": f"""
            WITH o AS (
              SELECT conv_id, turn_idx, role, text,
                     lead(role) OVER w AS next_role,
                     lead(text) OVER w AS next_text
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            SELECT conv_id, turn_idx,
                   text AS prompt, next_text AS response
            FROM o WHERE role = 'user' AND next_role = 'assistant'
        """,
        "reply_length_by_depth": f"""
            SELECT role,
                   CASE WHEN turn_idx <= 3 THEN '00-03'
                        WHEN turn_idx <= 7 THEN '04-07'
                        WHEN turn_idx <= 15 THEN '08-15'
                        ELSE '16+' END AS depth_bucket,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM {T} GROUP BY 1, 2
        """,
        "collocation_pmi_stats": r"""
            WITH t AS (
              SELECT string_split_regex(trim(text), '\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ),
            p AS (
              SELECT toks[i] AS x, toks[i+1] AS y
              FROM t, LATERAL (
                SELECT unnest(generate_series(1, len(toks) - 1)) AS i) s
              WHERE len(toks) >= 2
            ),
            n AS (SELECT count(*) AS n_total FROM p),
            bx AS (SELECT x, count(*) AS n_x FROM p GROUP BY x),
            by_ AS (SELECT y, count(*) AS n_y FROM p GROUP BY y),
            b AS (SELECT x, y, count(*) AS n_xy FROM p GROUP BY x, y)
            SELECT b.x || ' ' || b.y AS bigram,
                   CAST(n_xy AS BIGINT) AS n_xy,
                   CAST(n_x AS BIGINT) AS n_x,
                   CAST(n_y AS BIGINT) AS n_y,
                   CAST(n_total AS BIGINT) AS n_total
            FROM b JOIN bx USING (x) JOIN by_ ON b.y = by_.y CROSS JOIN n
            WHERE n_xy >= 5
        """,
        "pack_sequences": r"""
            WITH RECURSIVE tok AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                          END AS BIGINT) AS n_tokens,
                     doc_id % 4 AS part,
                     row_number() OVER (PARTITION BY doc_id % 4
                                        ORDER BY doc_id) AS rn
              FROM documents
            ), s AS (
              SELECT part, rn, doc_id, n_tokens,
                     CAST(0 AS BIGINT) AS pack, n_tokens AS filled
              FROM tok WHERE rn = 1
              UNION ALL
              SELECT t.part, t.rn, t.doc_id, t.n_tokens,
                     CASE WHEN s.filled + t.n_tokens > 256
                          THEN s.pack + 1 ELSE s.pack END,
                     CASE WHEN s.filled + t.n_tokens > 256
                          THEN t.n_tokens
                          ELSE s.filled + t.n_tokens END
              FROM s JOIN tok t
                ON t.part = s.part AND t.rn = s.rn + 1
            )
            SELECT doc_id, n_tokens,
                   part * 4294967296 + pack AS pack_id,
                   CAST(row_number() OVER (PARTITION BY part, pack
                                           ORDER BY rn) - 1 AS BIGINT)
                     AS pack_pos
            FROM s
        """,
        "dup_rate_by_source": """
            WITH d AS (
              SELECT text, count(*) AS c FROM documents GROUP BY text
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN d.c > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_docs
            FROM documents JOIN d USING (text)
            GROUP BY source
        """,
        "dup_rate_weekly": f"""
            WITH c AS (
              SELECT conv_id,
                     string_agg(text, chr(10) ORDER BY turn_idx)
                       AS text,
                     strftime(date_trunc('week', min(ts)), '%Y-%m-%d')
                       AS week
              FROM {T} GROUP BY conv_id
            ), d AS (
              SELECT text, count(*) AS cnt FROM c GROUP BY text
            )
            SELECT week, count(*) AS n_convs,
                   CAST(sum(CASE WHEN d.cnt > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_convs
            FROM c JOIN d USING (text)
            GROUP BY week
        """,
        "conv_prefix_dups": f"""
            WITH p AS (
              SELECT conv_id,
                     string_agg(text, chr(10) ORDER BY turn_idx)
                       AS prefix
              FROM {T} WHERE turn_idx < 3 GROUP BY conv_id
            )
            SELECT min(conv_id) AS keeper_conv, count(*) AS n_convs,
                   CAST(length(prefix) AS BIGINT) AS prefix_chars
            FROM p GROUP BY prefix HAVING count(*) >= 2
        """,
        "sft_pair_dups": f"""
            WITH o AS (
              SELECT conv_id, role, text,
                     lag(role) OVER w AS prole,
                     lag(text) OVER w AS ptext
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            SELECT ptext AS prompt, text AS response,
                   count(*) AS n_copies
            FROM o WHERE role = 'assistant' AND prole = 'user'
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "conv_shared_turns": f"""
            WITH d AS (SELECT DISTINCT conv_id, text FROM {T}),
            c AS (
              SELECT text FROM d GROUP BY text
              HAVING count(*) BETWEEN 2 AND 20
            )
            SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
                   count(*) AS n_shared
            FROM d a JOIN d b ON a.text = b.text
                             AND a.conv_id < b.conv_id
            JOIN c ON a.text = c.text
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "turn_collision_pairs": f"""
            WITH t AS (
              SELECT DISTINCT conv_id, text FROM {T}
              WHERE length(text) >= 16
            ),
            hot AS (
              SELECT text FROM t GROUP BY text
              HAVING count(*) BETWEEN 2 AND 20
            )
            SELECT DISTINCT t1.conv_id AS a, t2.conv_id AS b
            FROM t t1 JOIN t t2 ON t1.text = t2.text
                              AND t1.conv_id < t2.conv_id
            JOIN hot ON t1.text = hot.text
        """,
        "prompt_collisions": f"""
            WITH o AS (
              SELECT conv_id, role, text,
                     lead(role) OVER w AS next_role,
                     lead(text) OVER w AS next_text
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            p AS (
              SELECT DISTINCT conv_id, text AS prompt,
                              next_text AS response
              FROM o
              WHERE role = 'user' AND next_role = 'assistant'
                AND length(text) >= 16
            )
            SELECT prompt,
                   CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
                   CAST(count(DISTINCT response) AS BIGINT)
                     AS n_responses,
                   CAST(max(length(response)) - min(length(response))
                        AS BIGINT) AS len_spread
            FROM p GROUP BY prompt
            HAVING count(DISTINCT conv_id) BETWEEN 2 AND 20
        """,
        "template_dups": f"""
            WITH m AS (
              SELECT conv_id,
                     lower(regexp_replace(text, '[0-9]+', '0', 'g'))
                       AS mtext
              FROM {T}
            )
            SELECT min(conv_id) AS keeper_conv,
                   count(*) AS n_turns,
                   count(DISTINCT conv_id) AS n_convs,
                   CAST(length(mtext) AS BIGINT) AS mtext_chars
            FROM m GROUP BY mtext HAVING count(*) >= 2
        """,
        "trailing_active_users": """
            WITH du AS (
              SELECT DISTINCT date_trunc('day', ts) AS day, user_id
              FROM events
            ), days AS (SELECT DISTINCT day FROM du)
            SELECT d.day,
                   CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users
            FROM days d JOIN du u
              ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
            GROUP BY d.day
        """,
        "bigram_diversity_by_source": r"""
            WITH t AS (
              SELECT source, list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '') AS toks
              FROM documents
            ), bg AS (
              SELECT source, toks[i] || ' ' || toks[i+1] AS bigram
              FROM t, LATERAL (
                SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
              WHERE len(toks) >= 2
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(count(DISTINCT bigram) AS BIGINT) AS n_distinct,
                   count(DISTINCT bigram) * 1.0 / count(*) AS diversity
            FROM bg GROUP BY source
        """,
        "nb_lang_token_probs": r"""
            WITH tok AS (
              SELECT lang, unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS token
              FROM documents
            ), cnt AS (
              SELECT lang, token, count(*) AS c
              FROM tok GROUP BY 1, 2
            ), tot AS (
              SELECT lang, sum(c) AS t FROM cnt GROUP BY 1
            ), v AS (
              SELECT count(DISTINCT token) AS v FROM tok
            ), rk AS (
              SELECT lang, token, c,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY c DESC, token) AS rn
              FROM cnt
            )
            SELECT r.lang, r.token, CAST(r.c AS BIGINT) AS c,
                   (r.c + 1) * 1.0 / (t.t + v.v) AS p
            FROM rk r JOIN tot t ON r.lang = t.lang CROSS JOIN v
            WHERE r.rn <= 10
        """,
        "events_hopping_window": """
            WITH w AS (
              SELECT unnest(generate_series(
                       time_bucket(INTERVAL 15 MINUTES, ts)
                         - INTERVAL 45 MINUTES,
                       time_bucket(INTERVAL 15 MINUTES, ts),
                       INTERVAL 15 MINUTES)) AS ws,
                     value
              FROM events
            )
            SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
                   count(*) AS n,
                   CAST(sum(cast(round(value * 100) AS bigint))
                       AS BIGINT) AS sum_cents
            FROM w GROUP BY 1
        """,
        "events_grouping_sets": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
                   count(*) AS n,
                   CAST(sum(cast(round(value * 100) AS bigint))
                       AS BIGINT) AS sum_cents
            FROM events
            GROUP BY GROUPING SETS ((event_type),
                                    (strftime(ts, '%Y-%m-%d')))
        """,
        "events_dow_hour": """
            SELECT isodow(ts) AS dow, hour(ts) AS hour,
                   count(*) AS n,
                   CAST(sum(cast(round(value * 100) AS bigint))
                       AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2
        """,
        "latest_event_per_user_type": """
            SELECT user_id, event_type, event_id, ts FROM (
              SELECT user_id, event_type, event_id, ts,
                     row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "orders_above_customer_avg": """
            WITH t AS (
              SELECT o_orderkey, o_custkey,
                     cast(round(o_totalprice * 100) AS bigint) AS cents
              FROM t0
            ), t0 AS (SELECT * FROM orders), w AS (
              SELECT o_orderkey, o_custkey, cents,
                     count(*) OVER (PARTITION BY o_custkey) AS n,
                     sum(cents) OVER (PARTITION BY o_custkey) AS s
              FROM t
            )
            SELECT o_orderkey, o_custkey, cents
            FROM w WHERE cents * n > s
        """,
        "lang_nchars_stddev": """
            WITH m AS (
              SELECT lang, count(*) AS n,
                     sum(n_chars) AS sx,
                     sum(n_chars * n_chars) AS sxx
              FROM documents GROUP BY lang
            )
            SELECT lang, n AS n_docs,
                   sqrt(cast(sxx AS double) / cast(n AS double)
                        - (cast(sx AS double) / cast(n AS double))
                        * (cast(sx AS double) / cast(n AS double)))
                     AS sd_pop
            FROM m
        """,
        "events_debounce": """
            WITH RECURSIVE k AS (
              (SELECT user_id, event_type, ts, event_id
               FROM (SELECT user_id, event_type, ts, event_id,
                            row_number() OVER (
                              PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rn
                     FROM events) WHERE rn = 1)
              UNION ALL
              SELECT n.user_id, n.event_type, n.ts, n.event_id
              FROM k, LATERAL (
                SELECT e.user_id, e.event_type, e.ts, e.event_id
                FROM events e
                WHERE e.user_id = k.user_id
                  AND e.event_type = k.event_type
                  AND e.ts >= k.ts + INTERVAL 300 SECONDS
                ORDER BY e.ts, e.event_id LIMIT 1) n
            )
            SELECT user_id, event_type, event_id, ts FROM k
        """,
        "order_share_of_customer": """
            WITH t AS (
              SELECT o_orderkey, o_custkey,
                     cast(round(o_totalprice * 100) AS bigint) AS cents
              FROM orders
            )
            SELECT o_orderkey, o_custkey, cents,
                   CAST(sum(cents) OVER (PARTITION BY o_custkey)
                        AS BIGINT) AS group_cents,
                   CAST((cents * 1000000) //
                        sum(cents) OVER (PARTITION BY o_custkey)
                        AS BIGINT) AS share_ppm
            FROM t
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf
              FROM toks WHERE token <> '' GROUP BY doc_id, token
            ), df AS (
              SELECT token, count(*) AS df FROM tf GROUP BY token
            ), n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.token,
                     floor(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0)
                           * 10000 + 0.5) / 10000 AS score
              FROM tf JOIN df USING (token) CROSS JOIN n
            ), ranked AS (
              SELECT doc_id, token, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, token ASC)
                       AS term_rank
              FROM scored
            )
            SELECT doc_id, CAST(term_rank AS BIGINT) AS rank, token, score
            FROM ranked WHERE term_rank <= 3
        """,
        "dup_span_stats": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), idx AS (
              SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 12)) AS i
              FROM t WHERE len(toks) >= 13
            ), g AS (
              SELECT doc_id,
                     array_to_string(list_slice(toks, i, i + 12), ' ')
                       AS gram
              FROM idx
            ), gd AS (
              SELECT DISTINCT doc_id, gram FROM g
            ), dupg AS (
              SELECT gram FROM gd GROUP BY gram HAVING count(*) >= 2
            ), dup_per_doc AS (
              SELECT gd.doc_id, count(*) AS n_dup_grams
              FROM gd JOIN dupg USING (gram) GROUP BY gd.doc_id
            ), per_doc AS (
              SELECT doc_id, count(*) AS n_grams FROM gd GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_grams, 0) AS n_grams,
                   COALESCE(x.n_dup_grams, 0) AS n_dup_grams,
                   floor(COALESCE(x.n_dup_grams, 0) * 1.0 /
                         greatest(COALESCE(p.n_grams, 0), 1)
                         * 10000 + 0.5) / 10000 AS dup_ratio
            FROM documents d
            LEFT JOIN per_doc p USING (doc_id)
            LEFT JOIN dup_per_doc x USING (doc_id)
        """,
        "token_entropy_docs": r"""
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS token
              FROM documents
            ), c AS (
              SELECT doc_id, token, count(*) AS c
              FROM tok GROUP BY doc_id, token
            ), n AS (
              SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id
            ), e AS (
              SELECT c.doc_id,
                     -sum((c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n))
                       AS ent,
                     any_value(n.n) AS n
              FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(e.n, 0) AS BIGINT) AS n_tokens,
                   floor(COALESCE(e.ent, 0.0) * 10000 + 0.5) / 10000
                     AS entropy
            FROM documents d LEFT JOIN e USING (doc_id)
        """,
        "max_token_run_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), tok AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(toks))) AS i,
                     unnest(toks) AS tokval
              FROM t WHERE len(toks) >= 1
            ), fl AS (
              SELECT doc_id, i, tokval,
                     CASE WHEN lag(tokval) OVER (PARTITION BY doc_id
                                                 ORDER BY i) = tokval
                          THEN 0 ELSE 1 END AS brk
              FROM tok
            ), grp AS (
              SELECT doc_id, i, tokval,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS g
              FROM fl
            ), runs AS (
              SELECT doc_id, count(*) AS rl
              FROM grp GROUP BY doc_id, g
            ), mx AS (
              SELECT doc_id, max(rl) AS max_run FROM runs GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(m.max_run, 0) AS BIGINT) AS max_run
            FROM documents d LEFT JOIN mx m USING (doc_id)
        """,
        "oov_rate_docs": r"""
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS token
              FROM documents
            ), cnt AS (
              SELECT token, count(*) AS c FROM tok GROUP BY token
            ), vocab AS (
              SELECT token FROM cnt ORDER BY c DESC, token ASC LIMIT 10
            ), per AS (
              SELECT doc_id, count(*) AS n_tokens,
                     count(*) FILTER (WHERE token NOT IN
                       (SELECT token FROM vocab)) AS n_oov
              FROM tok GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
                   floor(COALESCE(p.n_oov, 0) * 1.0 /
                         greatest(COALESCE(p.n_tokens, 0), 1)
                         * 10000 + 0.5) / 10000 AS oov_rate
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "zipf_slope_by_source": r"""
            WITH tok AS (
              SELECT source, unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS token
              FROM documents
            ), cnt AS (
              SELECT source, token, count(*) AS c
              FROM tok GROUP BY source, token
            ), rk AS (
              SELECT source, c,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY c DESC, token ASC) AS r
              FROM cnt
            ), top AS (
              SELECT * FROM rk WHERE r <= 20
            )
            SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                   floor(regr_slope(ln(c), ln(r)) * 10000 + 0.5) / 10000
                     AS zipf_slope
            FROM top GROUP BY source HAVING count(*) >= 2
        """,
        "embedding_label_centroids": """
            WITH u AS (
              SELECT CAST(label AS BIGINT) AS label,
                     unnest(CAST(embedding AS DOUBLE[])) AS x,
                     unnest(range(1, len(embedding) + 1)) AS dim
              FROM embeddings
            )
            SELECT label, CAST(dim AS BIGINT) AS dim,
                   floor(sum(x) / count(*) * 10000 + 0.5) / 10000
                     AS centroid
            FROM u GROUP BY label, dim
        """,
        "embedding_centroid_confusion": """
            WITH e AS (
              SELECT vec_id, CAST(label AS BIGINT) AS label,
                     CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings
            ), cent AS (
              SELECT label, dim, sum(x) / count(*) AS c
              FROM (SELECT label, unnest(emb) AS x,
                           unnest(range(1, len(emb) + 1)) AS dim
                    FROM e)
              GROUP BY label, dim
            ), cvec AS (
              SELECT label, list(c ORDER BY dim) AS cv
              FROM cent GROUP BY label
            ), scored AS (
              SELECT e.vec_id, e.label, cv.label AS cand,
                     list_cosine_similarity(e.emb, cv.cv) AS score
              FROM e CROSS JOIN cvec cv
            ), pick AS (
              SELECT vec_id, label, cand,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY score DESC, cand ASC)
                       AS rn
              FROM scored
            )
            SELECT label, cand AS assigned, CAST(count(*) AS BIGINT) AS n
            FROM pick WHERE rn = 1 GROUP BY label, cand
        """,
        "embedding_norm_stats": """
            WITH e AS (
              SELECT CAST(label AS BIGINT) AS label,
                     sqrt(list_inner_product(
                       CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[]))) AS nr
              FROM embeddings
            )
            SELECT label, CAST(count(*) AS BIGINT) AS n,
                   floor(avg(nr) * 10000 + 0.5) / 10000 AS mean_norm,
                   floor(min(nr) * 10000 + 0.5) / 10000 AS min_norm,
                   floor(max(nr) * 10000 + 0.5) / 10000 AS max_norm
            FROM e GROUP BY label
        """,
        "dup_span_rewrite": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), occ AS (
              SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 4)) AS pos
              FROM t WHERE len(toks) >= 5
            ), g AS (
              SELECT doc_id, pos,
                     array_to_string(list_slice(toks, pos, pos + 4), ' ')
                       AS gram
              FROM occ
            ), rm AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY gram
                                          ORDER BY doc_id, pos) AS rn
                FROM g
              ) WHERE rn > 1
            ), tok AS (
              SELECT doc_id,
                     unnest(generate_series(1, len(toks))) AS i,
                     unnest(toks) AS tokval
              FROM t WHERE len(toks) >= 1
            ), kept AS (
              SELECT tk.doc_id, tk.i, tk.tokval
              FROM tok tk
              WHERE NOT EXISTS (
                SELECT 1 FROM rm
                WHERE rm.doc_id = tk.doc_id
                  AND tk.i >= rm.pos AND tk.i < rm.pos + 5)
            ), agg AS (
              SELECT doc_id,
                     string_agg(tokval, ' ' ORDER BY i) AS new_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id,
                   COALESCE(a.new_text, '') AS new_text,
                   CAST(len(t.toks) AS BIGINT) AS n_tokens,
                   CAST(len(t.toks) - COALESCE(a.n_kept, 0) AS BIGINT)
                     AS n_removed
            FROM t LEFT JOIN agg a USING (doc_id)
        """,
        "dsir_importance": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     unnest(string_split_regex(trim(text), '\s+')) AS token
              FROM documents
            ), toks2 AS (
              SELECT * FROM toks WHERE token <> ''
            ), cnt AS (
              SELECT token, count(*) AS c_all,
                     count(*) FILTER (WHERE lang = 'en') AS c_tgt
              FROM toks2 GROUP BY token
            ), tot AS (
              SELECT sum(c_all) * 1.0 AS r, sum(c_tgt) * 1.0 AS t,
                     count(*) * 1.0 AS v
              FROM cnt
            )
            SELECT t2.doc_id,
                   floor(avg(ln((cnt.c_tgt + 1.0) / (tot.t + tot.v))
                             - ln((cnt.c_all + 1.0) / (tot.r + tot.v)))
                         * 10000 + 0.5) / 10000 AS llr
            FROM toks2 t2 JOIN cnt USING (token) CROSS JOIN tot
            GROUP BY t2.doc_id
        """,
        "gopher_quality_flags": r"""
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS token
              FROM documents
            ), agg AS (
              SELECT doc_id, count(*) AS n_words,
                     sum(length(token)) AS total_len,
                     sum(CASE WHEN regexp_matches(token, '[A-Za-z]')
                         THEN 1 ELSE 0 END) AS alpha_words,
                     sum(CASE WHEN lower(token) IN
                         ('the','a','an','and','or','of','to','in','is',
                          'it','that','for','on','with','as','was','at',
                          'by','be') THEN 1 ELSE 0 END) AS stop_hits
              FROM tok GROUP BY doc_id
            ), f AS (
              SELECT d.doc_id,
                     CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
                     CAST(COALESCE(a.total_len, 0) * 10000
                          // GREATEST(COALESCE(a.n_words, 0), 1)
                          AS BIGINT) AS mean_wlen_e4,
                     CAST(COALESCE(a.alpha_words, 0) * 10000
                          // GREATEST(COALESCE(a.n_words, 0), 1)
                          AS BIGINT) AS alpha_frac_e4,
                     CAST(COALESCE(a.stop_hits, 0) AS BIGINT) AS stop_hits
              FROM documents d LEFT JOIN agg a USING (doc_id)
            )
            SELECT doc_id, n_words, mean_wlen_e4, alpha_frac_e4,
                   stop_hits,
                   CAST(CASE WHEN n_words BETWEEN 30 AND 100000
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_wordcount,
                   CAST(CASE WHEN mean_wlen_e4 BETWEEN 30000 AND 100000
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_meanlen,
                   CAST(CASE WHEN alpha_frac_e4 >= 8000
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_alpha,
                   CAST(CASE WHEN stop_hits >= 2
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_stopwords,
                   CAST(CASE WHEN n_words BETWEEN 30 AND 100000
                         AND mean_wlen_e4 BETWEEN 30000 AND 100000
                         AND alpha_frac_e4 >= 8000 AND stop_hits >= 2
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM f
        """,
        "doc_chunks": r"""
            WITH k AS (
              SELECT doc_id, text,
                     CASE WHEN length(text) = 0 THEN 0
                          ELSE 1 + (GREATEST(length(text) - 120, 0) + 89)
                               // 90 END AS n_chunks
              FROM documents
            ), g AS (
              SELECT doc_id, text,
                     unnest(generate_series(
                       0, CAST(n_chunks AS BIGINT) - 1)) AS chunk_idx
              FROM k
            )
            SELECT doc_id, chunk_idx,
                   substring(text, CAST(chunk_idx * 90 + 1 AS INT), 120)
                     AS chunk_text,
                   CAST(length(substring(
                     text, CAST(chunk_idx * 90 + 1 AS INT), 120))
                     AS BIGINT) AS chunk_len
            FROM g
        """,
        "markup_strip": r"""
            WITH planted AS (
              SELECT doc_id,
                     '<div id="' || CAST(doc_id AS VARCHAR)
                     || '"><span>hdr</span> ' || text
                     || ' <em>ftr</em></div>' AS t
              FROM documents
            ), s AS (
              SELECT doc_id,
                     regexp_replace(t, '<[^>]*>', ' ', 'g') AS t
              FROM planted
            ), e AS (
              SELECT doc_id,
                     replace(replace(replace(replace(replace(t,
                       '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
                       '&quot;', '"'), '&#39;', chr(39)) AS t
              FROM s
            )
            SELECT doc_id,
                   trim(regexp_replace(t, '\s+', ' ', 'g')) AS clean_text
            FROM e
        """,
        "winsorized_event_values": r"""
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events
            ), q AS (
              SELECT event_type,
                     quantile_disc(cents, 0.05) AS lo,
                     quantile_disc(cents, 0.95) AS hi,
                     count(*) AS n
              FROM c GROUP BY event_type
            ), w AS (
              SELECT c.event_type,
                     sum(LEAST(GREATEST(c.cents, q.lo), q.hi)) AS ws,
                     any_value(q.n) AS n, any_value(q.lo) AS lo,
                     any_value(q.hi) AS hi
              FROM c JOIN q USING (event_type)
              GROUP BY c.event_type
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
                   CAST(ws AS BIGINT) AS winsorized_sum,
                   CAST(ws * 10000 // n AS BIGINT)
                     AS winsorized_mean_e4
            FROM w
        """,
        "shard_manifest": r"""
            SELECT doc_id, n_chars,
                   CAST(sum(n_chars) OVER (ORDER BY doc_id)
                     AS BIGINT) AS cum_size,
                   CAST((sum(n_chars) OVER (ORDER BY doc_id) - n_chars)
                     // 50000 AS BIGINT) AS shard_id
            FROM documents
        """,
        "merge_upsert_customers": r"""
            WITH base AS (
              SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
                     CAST(c_nationkey AS BIGINT) AS c_nationkey,
                     CAST(round(c_acctbal * 100) AS BIGINT)
                       AS acctbal_cents,
                     c_mktsegment
              FROM customer
            ), changes AS (
              SELECT c_custkey, 'delete' AS op, c_name, c_nationkey,
                     acctbal_cents, c_mktsegment
              FROM base WHERE c_custkey % 11 = 3
              UNION ALL
              SELECT c_custkey, 'upsert', c_name, c_nationkey,
                     acctbal_cents + 12345, 'UPDATED'
              FROM base WHERE c_custkey % 7 = 2 AND c_custkey % 11 <> 3
              UNION ALL
              SELECT c_custkey + 1000000, 'upsert', 'NEW',
                     CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'NEW'
              FROM base WHERE c_custkey % 13 = 5
            )
            SELECT COALESCE(c.c_custkey, b.c_custkey) AS c_custkey,
                   CASE WHEN c.op IS NOT NULL THEN c.c_name
                        ELSE b.c_name END AS c_name,
                   CASE WHEN c.op IS NOT NULL THEN c.c_nationkey
                        ELSE b.c_nationkey END AS c_nationkey,
                   CASE WHEN c.op IS NOT NULL THEN c.acctbal_cents
                        ELSE b.acctbal_cents END AS acctbal_cents,
                   CASE WHEN c.op IS NOT NULL THEN c.c_mktsegment
                        ELSE b.c_mktsegment END AS c_mktsegment
            FROM base b FULL OUTER JOIN changes c
              ON b.c_custkey = c.c_custkey
            WHERE COALESCE(c.op, '') <> 'delete'
        """,
        "dataset_diff": r"""
            WITH base AS (
              SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
            )
            SELECT c_custkey + 1000000 AS c_custkey, 'added' AS status
            FROM base WHERE c_custkey % 13 = 5
            UNION ALL
            SELECT c_custkey, 'removed' FROM base
            WHERE c_custkey % 11 = 3
            UNION ALL
            SELECT c_custkey, 'changed' FROM base
            WHERE c_custkey % 7 = 2 AND c_custkey % 11 <> 3
        """,
        "edit_distance_join": r"""
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS ed
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
        "bm25_topk": r"""
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(
                string_split_regex(trim(text), '\s+'),
                x -> x <> '')) AS token
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
            ), stats AS (
              SELECT (SELECT count(*) FROM documents) AS nn,
                     (SELECT sum(dl) FROM dl) AS s
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf FROM tok
              WHERE token IN ('merge', 'join', 'window')
              GROUP BY doc_id, token
            ), df AS (
              SELECT token, count(*) AS df FROM tf GROUP BY token
            ), sc AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + (stats.nn - df.df + 0.5)
                                  / (df.df + 0.5))
                         * tf.tf * 2.2
                         / (tf.tf + 1.2 * (0.25 + 0.75
                            * ((dl.dl * stats.nn) / stats.s)))) AS sc
              FROM tf
              JOIN df USING (token)
              JOIN dl USING (doc_id)
              CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id,
                   floor(sc * 10000 + 0.5) / 10000 AS bm25
            FROM sc
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT 20
        """,
        "local_supplier_volume": r"""
            SELECT n.n_name AS n_name,
                   CAST(sum(CAST(floor(l.l_extendedprice
                        * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND c.c_nationkey = s.s_nationkey
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
        """,
        "user_retention_cohorts": r"""
            WITH w AS (
              SELECT user_id,
                     CAST(date_diff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) // 7 AS BIGINT)
                       AS week
              FROM events
            ), c AS (
              SELECT user_id, min(week) AS cohort_week FROM w
              GROUP BY user_id
            ), a AS (
              SELECT DISTINCT user_id, week FROM w
            )
            SELECT c.cohort_week, a.week,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM a JOIN c USING (user_id)
            GROUP BY c.cohort_week, a.week
        """,
        "events_resample_ffill": r"""
            WITH e AS (
              SELECT user_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     row_number() OVER (PARTITION BY user_id, ts
                                        ORDER BY event_id DESC) AS rn
              FROM events
            ), e1 AS (
              SELECT user_id, ts, cents FROM e WHERE rn = 1
            ), b AS (
              SELECT user_id, date_trunc('hour', min(ts)) AS h0,
                     date_trunc('hour', max(ts)) AS h1
              FROM events GROUP BY user_id
            ), g AS (
              SELECT user_id,
                     unnest(generate_series(h0, h1,
                                            INTERVAL 1 HOUR)) AS hour
              FROM b
            )
            SELECT g.user_id, g.hour, e1.cents AS last_cents
            FROM g ASOF JOIN e1
              ON g.user_id = e1.user_id AND g.hour >= e1.ts
        """,
        "user_churn_by_week": r"""
            WITH w AS (
              SELECT DISTINCT user_id,
                     CAST(date_diff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) // 7 AS BIGINT)
                       AS week
              FROM events
            ), s AS (
              SELECT user_id, week,
                     lag(week) OVER (PARTITION BY user_id
                                     ORDER BY week) AS pw
              FROM w
            ), rows_ AS (
              SELECT week,
                     CASE WHEN pw IS NULL THEN 'new'
                          WHEN pw = week - 1 THEN 'retained'
                          ELSE 'resurrected' END AS status
              FROM s
              UNION ALL
              SELECT pw + 1 AS week, 'churned' AS status
              FROM s WHERE pw IS NOT NULL AND pw < week - 1
            )
            SELECT week, status, CAST(count(*) AS BIGINT) AS n_users
            FROM rows_ GROUP BY week, status
        """,
        "weighted_median_nchars": r"""
            WITH t AS (
              SELECT source, CAST(n_chars AS BIGINT) AS v,
                     CAST(len(list_filter(
                       string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS BIGINT) AS w
              FROM documents
            ), c AS (
              SELECT source, v, w,
                     sum(w) OVER (PARTITION BY source ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cw,
                     sum(w) OVER (PARTITION BY source) AS tot
              FROM t
            )
            SELECT source,
                   CAST(min(v) AS BIGINT) AS weighted_median,
                   CAST(any_value(tot) AS BIGINT) AS total_weight
            FROM c WHERE 2 * cw >= tot
            GROUP BY source
        """,
        "partition_checksums": r"""
            WITH m AS (
              SELECT doc_id // 64 AS bucket,
                     ((doc_id * 2654435761) % 4294967296) * 31
                       + n_chars AS mix
              FROM documents
            )
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(mix) AS BIGINT) AS sum_mix,
                   CAST(bit_xor(mix) AS BIGINT) AS xor_mix
            FROM m GROUP BY bucket
        """,
        "jaccard_cross_dups": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_distinct(
                         string_split_regex(trim(text), '\s+'))) AS tk
              FROM documents
              WHERE trim(text) <> ''
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM tok GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM tok a JOIN tok b
                ON a.tk = b.tk AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
              GROUP BY 1, 2
            )
            SELECT inter.doc_a, inter.doc_b,
                   round(i * 1.0 / (sa.s + sb.s - i), 6) AS jacc
            FROM inter
            JOIN sz sa ON sa.doc_id = inter.doc_a
            JOIN sz sb ON sb.doc_id = inter.doc_b
            WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.8
        """,
        "docs_above_source_p75": r"""
            WITH t AS (
              SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
                     CAST(doc_id AS BIGINT) AS doc_id,
                     quantile_disc(n_chars, 0.75)
                       OVER (PARTITION BY source) AS thr
              FROM documents
            )
            SELECT source, n_chars, doc_id FROM t WHERE n_chars >= thr
        """,
        "rolling_median_cents": r"""
            WITH t AS (
              SELECT CAST(user_id AS BIGINT) AS user_id, ts,
                     CAST(event_id AS BIGINT) AS event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events
            )
            SELECT user_id, ts, event_id,
                   quantile_disc(cents, 0.5) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                     AS rolling_q
            FROM t
        """,
        "events_cube": r"""
            WITH t AS (
              SELECT event_type,
                     CAST(isodow(ts) AS BIGINT) AS dow_i,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events
            )
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   CASE WHEN GROUPING(dow_i) = 1 THEN 'ALL'
                        ELSE CAST(dow_i AS VARCHAR) END AS dow,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM t
            GROUP BY CUBE (event_type, dow_i)
        """,
        "vocab_drift_weekly": f"""
            WITH tok AS (
              SELECT DISTINCT week, token FROM (
                SELECT CAST(date_diff('day', DATE '2023-11-13',
                            CAST(ts AS DATE)) // 7 AS BIGINT) AS week,
                       unnest(list_filter(string_split_regex(
                         trim(text), '\\s+'), x -> x <> '')) AS token
                FROM {T}
              )
            ), n AS (
              SELECT week, CAST(count(*) AS BIGINT) AS n
              FROM tok GROUP BY week
            ), i AS (
              SELECT a.week AS week_a, CAST(count(*) AS BIGINT) AS nc
              FROM tok a JOIN tok b
                ON a.token = b.token AND b.week = a.week + 1
              GROUP BY a.week
            )
            SELECT na.week AS week_a, nb.week AS week_b,
                   na.n AS n_a, nb.n AS n_b,
                   CAST(coalesce(i.nc, 0) AS BIGINT) AS n_common,
                   CAST(coalesce(i.nc, 0) * 10000
                        // (na.n + nb.n - coalesce(i.nc, 0))
                        AS BIGINT) AS jaccard_e4
            FROM n na JOIN n nb ON nb.week = na.week + 1
            LEFT JOIN i ON i.week_a = na.week
        """,
        "user_session_bounds": """
            WITH o AS (
              SELECT user_id, ts,
                     epoch_us(ts) - epoch_us(
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts)) AS gap
              FROM events
            ), s AS (
              SELECT user_id, ts,
                     sum(CASE WHEN gap IS NULL
                              OR gap > 43200000000
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) - 1 AS sub
              FROM o
            )
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   CAST(sub AS BIGINT) AS sub_id,
                   count(*) AS n_turns,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM s GROUP BY user_id, sub
        """,
        "user_value_trend": """
            WITH r AS (
              SELECT user_id,
                     CAST(floor(epoch_us(ts) / 3600000000.0)
                          AS BIGINT) - 473352 AS x,
                     CAST(round(value * 100) AS BIGINT) AS y
              FROM events
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   count(*) AS n,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y)
                        AS BIGINT) AS slope_num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x)
                        AS BIGINT) AS slope_den
            FROM r GROUP BY user_id
        """,
        "event_type_cooccurrence": """
            WITH d AS (
              SELECT DISTINCT user_id, event_type FROM events
              WHERE event_type IS NOT NULL
            )
            SELECT a.event_type AS item_a, b.event_type AS item_b,
                   count(*) AS n_keys
            FROM d a JOIN d b
              ON a.user_id = b.user_id
             AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        """,
        "part_copurchase_components": """
            WITH RECURSIVE dl AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            pairs AS (
              SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM dl a JOIN dl b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            und AS (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ),
            walk(node, lab) AS (
              SELECT a, a FROM und
              UNION
              SELECT und.b, walk.lab
              FROM walk JOIN und ON und.a = walk.node
            )
            SELECT node AS part_key, min(lab) AS component
            FROM walk GROUP BY node
        """,
        "part_copurchase_triangles": """
            WITH dl AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            pairs AS (
              SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM dl a JOIN dl b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM pairs e1
              JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b
            )
            SELECT part_key, count(*)::BIGINT AS n_triangles FROM (
              SELECT x AS part_key FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri
            ) GROUP BY part_key
        """,
        "part_copurchase_pagerank": """
            WITH dl AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            pairs AS (
              SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM dl a JOIN dl b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            und AS (
              SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
            ),
            deg AS (
              SELECT a AS node, count(*)::BIGINT AS deg
              FROM und GROUP BY a
            ),
            r0 AS (
              SELECT node, 1000000000::BIGINT AS r FROM deg
            ),
            r1 AS (
              SELECT u.b AS node,
                     CAST(150000000 + (17 * sum(r0.r // d.deg)) // 20
                          AS BIGINT) AS r
              FROM und u
              JOIN r0 ON r0.node = u.a
              JOIN deg d ON d.node = u.a
              GROUP BY u.b
            ),
            r2 AS (
              SELECT u.b AS node,
                     CAST(150000000 + (17 * sum(r1.r // d.deg)) // 20
                          AS BIGINT) AS r
              FROM und u
              JOIN r1 ON r1.node = u.a
              JOIN deg d ON d.node = u.a
              GROUP BY u.b
            ),
            r3 AS (
              SELECT u.b AS node,
                     CAST(150000000 + (17 * sum(r2.r // d.deg)) // 20
                          AS BIGINT) AS r
              FROM und u
              JOIN r2 ON r2.node = u.a
              JOIN deg d ON d.node = u.a
              GROUP BY u.b
            )
            SELECT node AS part_key, r AS rank_ppb FROM r3
        """,
        "part_copurchase_hops": """
            WITH RECURSIVE dl AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ),
            pairs AS (
              SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM dl a JOIN dl b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            und AS (
              SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
            ),
            src AS (SELECT min(a) AS s FROM und),
            walk(node, d) AS (
              SELECT s, 0::BIGINT FROM src
              UNION
              SELECT u.b, walk.d + 1
              FROM walk JOIN und u ON u.a = walk.node
              WHERE walk.d < 8
            )
            SELECT node AS part_key, min(d)::BIGINT AS hops
            FROM walk GROUP BY node
        """,
        "weighted_sample_docs": """
            SELECT doc_id, n_chars,
                   CAST(n_chars * 4294967296
                        // ((doc_id * 2654435761) % 4294967296 + 1)
                        AS BIGINT) AS priority
            FROM documents
            ORDER BY priority DESC, doc_id ASC
            LIMIT 100
        """,
        "purchase_click_attribution": """
            WITH p AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), c AS (
              SELECT event_id AS click_id, user_id,
                     ts AS click_ts
              FROM events WHERE event_type = 'click'
            ), j AS (
              SELECT p.event_id, p.user_id, p.ts,
                     c.click_id, c.click_ts,
                     row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.click_ts DESC, c.click_id DESC
                     ) AS rn
              FROM p JOIN c
                ON c.user_id = p.user_id AND c.click_ts <= p.ts
            )
            SELECT event_id, user_id, ts, click_id, click_ts
            FROM j
            WHERE rn = 1
              AND epoch_us(ts) - epoch_us(click_ts) <= 604800000000
        """,
        "nation_pair_volume": """
            SELECT ns.n_name AS supp_nation,
                   nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(floor(
                     l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer cu ON cu.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation ns ON ns.n_nationkey = s.s_nationkey
            JOIN nation nc ON nc.n_nationkey = cu.c_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND s.s_nationkey <> cu.c_nationkey
            GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
        """,
        "customer_order_distribution": """
            WITH pc AS (
              SELECT c.c_custkey, count(o.o_custkey) AS cnt
              FROM customer c LEFT JOIN orders o
                ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey
            )
            SELECT CAST(cnt AS BIGINT) AS cnt,
                   count(*) AS n_keys
            FROM pc GROUP BY cnt
        """,
        "large_volume_customers": """
            WITH big AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                          AS BIGINT) AS total_qty_c
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity * 100) AS BIGINT))
                     > 21000
            )
            SELECT big.l_orderkey AS o_orderkey, c.c_name,
                   o.o_orderdate,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                     AS o_totalprice_c,
                   big.total_qty_c
            FROM big
            JOIN orders o ON o.o_orderkey = big.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "supplier_nation_rollup": """
            SELECT r.r_name, n.n_name,
                   count(*) AS n_suppliers,
                   CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS acctbal_cents
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name, n.n_name
        """,
        "source_lang_crosstab": """
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY source, lang
        """,
        "monthly_revenue_growth": """
            WITH m AS (
              SELECT strftime(o_orderdate, '%Y-%m') AS month,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS revenue_cents
              FROM orders GROUP BY 1
            )
            SELECT month, revenue_cents,
                   CAST(coalesce(revenue_cents
                                 - lag(revenue_cents)
                                   OVER (ORDER BY month), 0)
                        AS BIGINT) AS delta_cents
            FROM m
        """,
        "event_type_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
              FROM events
            )
            SELECT event_type || ' -> ' || nxt AS chain,
                   count(*) AS n
            FROM o WHERE nxt IS NOT NULL
            GROUP BY event_type || ' -> ' || nxt
        """,
        "event_type_lift": """
            WITH d AS (
              SELECT DISTINCT user_id, event_type FROM events
            ), m AS (
              SELECT event_type, count(*) AS c FROM d GROUP BY 1
            ), tot AS (
              SELECT count(DISTINCT user_id) AS nu FROM events
            ), p AS (
              SELECT a.event_type AS item_a, b.event_type AS item_b,
                     count(*) AS n_keys
              FROM d a JOIN d b
                ON a.user_id = b.user_id
               AND a.event_type < b.event_type
              GROUP BY 1, 2
            )
            SELECT p.item_a, p.item_b, p.n_keys,
                   CAST(p.n_keys * tot.nu * 10000
                        // (ma.c * mb.c) AS BIGINT) AS lift_e4
            FROM p
            CROSS JOIN tot
            JOIN m ma ON ma.event_type = p.item_a
            JOIN m mb ON mb.event_type = p.item_b
        """,
        "decontamination_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ), g AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, len(toks) - 11),
                       i -> array_to_string(toks[i:i+12], ' '))))
                       AS gram
              FROM t WHERE len(toks) >= 13
            ), e AS (
              SELECT * FROM g
              WHERE ((doc_id * 2654435761) % 4294967296) % 100 < 10
            ), tr AS (
              SELECT * FROM g
              WHERE ((doc_id * 2654435761) % 4294967296) % 100 >= 10
            )
            SELECT tr.doc_id AS train_doc, e.doc_id AS eval_doc,
                   count(*) AS n_shared
            FROM tr JOIN e ON e.gram = tr.gram
            GROUP BY tr.doc_id, e.doc_id
        """,
        "corpus_summary": r"""
            SELECT count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources,
                   count(DISTINCT lang) AS n_langs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(len(list_filter(string_split_regex(
                     trim(text), '\s+'), x -> x <> ''))) AS BIGINT)
                     AS total_tokens,
                   CAST(min(n_chars) AS BIGINT) AS min_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents
        """,
        "conv_role_char_ratio": f"""
            WITH r AS (
              SELECT conv_id,
                     CAST(sum(CASE WHEN role = 'user'
                              THEN length(text) ELSE 0 END)
                          AS BIGINT) AS user_chars,
                     CAST(sum(CASE WHEN role = 'assistant'
                              THEN length(text) ELSE 0 END)
                          AS BIGINT) AS assistant_chars
              FROM {T} GROUP BY conv_id
            )
            SELECT conv_id, user_chars, assistant_chars,
                   CAST(assistant_chars * 10000
                        // greatest(user_chars, 1) AS BIGINT)
                     AS ratio_bp
            FROM r
        """,
        "nchars_histogram_by_source": """
            SELECT source,
                   CAST(n_chars // 200 AS BIGINT) AS bucket,
                   count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY source, n_chars // 200
        """,
        "tool_cooccurrence": f"""
            WITH d AS (
              SELECT DISTINCT conv_id, tool FROM {T}
              WHERE tool <> ''
            )
            SELECT a.tool AS item_a, b.tool AS item_b,
                   count(*) AS n_keys
            FROM d a JOIN d b
              ON a.conv_id = b.conv_id AND a.tool < b.tool
            GROUP BY a.tool, b.tool
        """,
        "conv_length_by_depth": f"""
            WITH a AS (
              SELECT conv_id, count(*) AS n_turns,
                     CAST(sum(length(text)) + count(*) - 1 AS BIGINT)
                       AS n_chars
              FROM {T} GROUP BY conv_id
            )
            SELECT CAST(n_turns AS BIGINT) AS n_turns,
                   CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS q50
            FROM a GROUP BY n_turns
        """,
        "latest2_orders_per_customer": """
            WITH r AS (
              SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
                     CAST(o_orderkey AS BIGINT) AS o_orderkey,
                     epoch_us(o_orderdate) AS od_us,
                     row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                     ) AS rn
              FROM orders
            )
            SELECT o_custkey, o_orderkey, od_us
            FROM r WHERE rn <= 2
        """,
        "order_fulfillment_span": """
            SELECT l.l_orderkey AS o_orderkey,
                   count(*) AS n_lines,
                   min(l.l_shipdate) AS first_ship,
                   max(l.l_shipdate) AS last_ship,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(max(l.l_shipdate) AS DATE))
                        AS BIGINT) AS span_days
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY l.l_orderkey, o.o_orderdate
        """,
        "signup_first_click": """
            WITH s AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'signup'
            ), c AS (
              SELECT event_id AS click_id, user_id,
                     ts AS click_ts
              FROM events WHERE event_type = 'click'
            ), j AS (
              SELECT s.event_id, s.user_id, s.ts,
                     c.click_id, c.click_ts,
                     row_number() OVER (
                       PARTITION BY s.event_id
                       ORDER BY c.click_ts ASC, c.click_id DESC
                     ) AS rn
              FROM s JOIN c
                ON c.user_id = s.user_id AND c.click_ts >= s.ts
            )
            SELECT event_id, user_id, ts, click_id, click_ts
            FROM j
            WHERE rn = 1
              AND epoch_us(click_ts) - epoch_us(ts) <= 604800000000
        """,
        "user_gap_quantiles": """
            WITH o AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     epoch_us(ts) - epoch_us(
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS gap_us
              FROM events
            )
            SELECT user_id,
                   CAST(quantile_disc(gap_us, 0.25) AS BIGINT) AS q25,
                   CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS q50,
                   CAST(quantile_disc(gap_us, 0.75) AS BIGINT) AS q75
            FROM o WHERE gap_us IS NOT NULL
            GROUP BY user_id
        """,
        "events_user_outliers": """
            WITH t AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     CAST(event_id AS BIGINT) AS event_id,
                     count(*) OVER w AS n,
                     sum(CAST(round(value * 100) AS BIGINT)) OVER w
                       AS sx,
                     sum(CAST(round(value * 100) AS BIGINT)
                         * CAST(round(value * 100) AS BIGINT)) OVER w
                       AS sxx
              FROM events
              WINDOW w AS (PARTITION BY user_id)
            )
            SELECT user_id, cents, event_id
            FROM t
            WHERE n >= 2
              AND (n * cents - sx) * (n * cents - sx)
                  > 9 * (n * sxx - sx * sx)
        """,
        "frequent_ngrams": r"""
            WITH t AS (
              SELECT string_split_regex(trim(text), '\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ), g AS (
              SELECT unnest(list_transform(
                       range(1, len(toks) - 3),
                       i -> toks[i] || ' ' || toks[i+1] || ' '
                            || toks[i+2] || ' ' || toks[i+3] || ' '
                            || toks[i+4])) AS ngram
              FROM t WHERE len(toks) >= 5
            )
            SELECT ngram, count(*) AS n_occurrences
            FROM g GROUP BY ngram
            ORDER BY n_occurrences DESC, ngram ASC
            LIMIT 50
        """,
        "mixture_weights": """
            WITH c AS (
              SELECT source, count(*) AS n_docs
              FROM documents GROUP BY source
            )
            SELECT source, n_docs,
                   CAST(floor(sqrt(n_docs) / sum(sqrt(n_docs)) OVER ()
                              * 1000000 + 0.5) AS BIGINT) AS weight_ppm
            FROM c
        """,
        "new_docs_unmatched": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_distinct(
                         string_split_regex(trim(text), '\s+'))) AS tk
              FROM documents
              WHERE trim(text) <> ''
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM tok GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS i
              FROM tok a JOIN tok b
                ON a.tk = b.tk AND a.doc_id % 2 = 0
               AND b.doc_id % 2 = 1
              GROUP BY 1, 2
            ), matched AS (
              SELECT DISTINCT inter.doc_b
              FROM inter
              JOIN sz sa ON sa.doc_id = inter.doc_a
              JOIN sz sb ON sb.doc_id = inter.doc_b
              WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.8
            )
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id % 2 = 1
              AND d.doc_id NOT IN (SELECT doc_b FROM matched)
        """,
        "sample_docs_per_source": """
            WITH r AS (
              SELECT source, doc_id,
                     CAST((doc_id * 2654435761) % 4294967296
                          AS BIGINT) AS h,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id * 2654435761) % 4294967296,
                                doc_id) AS rn
              FROM documents
            )
            SELECT source, doc_id, h FROM r WHERE rn <= 5
        """,
        "returned_item_revenue": """
            WITH agg AS (
              SELECT cu.c_custkey, cu.c_name, n.n_name,
                     CAST(sum(CAST(floor(
                       l.l_extendedprice * (1 - l.l_discount) * 100
                       + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              JOIN customer cu ON cu.c_custkey = o.o_custkey
              JOIN nation n ON n.n_nationkey = cu.c_nationkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1996-07-01'
                AND o.o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY cu.c_custkey, cu.c_name, n.n_name
            )
            SELECT c_custkey, c_name, n_name, revenue_cents
            FROM agg
            ORDER BY revenue_cents DESC, c_custkey ASC
            LIMIT 20
        """,
        "events_cohort_retention": """
            WITH uw AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
            c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
            SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', c.cw, uw.wk) // 7 AS BIGINT) AS weeks_since,
                   count(*) AS n_users
            FROM uw JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "brand_size_suppliers": """
            SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
                   count(DISTINCT l_suppkey) AS n_supp
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#45'
            GROUP BY 1, 2
        """,
        "part_band_revenue": """
            SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                                * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
                     AS revenue_c,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "customers_above_global_avg": """
            WITH s AS (
              SELECT CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS tot,
                     count(*) AS n
              FROM customer WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) > 0)
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_cust,
                   CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT)
                     AS bal_cents
            FROM customer, s
            WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) * s.n > s.tot
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY 1
        """,
        "ks_drift_nchars": """
            WITH d AS (SELECT n_chars, CAST(doc_id % 2 AS INT) AS side FROM documents),
            g AS (SELECT n_chars,
                         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS a,
                         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS b
                  FROM d GROUP BY 1),
            c AS (SELECT n_chars,
                         CAST(sum(a) OVER (ORDER BY n_chars) AS BIGINT) AS ca,
                         CAST(sum(b) OVER (ORDER BY n_chars) AS BIGINT) AS cb
                  FROM g),
            t AS (SELECT CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n0,
                         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n1
                  FROM d),
            m AS (SELECT c.n_chars, abs(c.ca * t.n1 - c.cb * t.n0) AS num FROM c, t)
            SELECT CAST((SELECT min(n_chars) FROM m
                         WHERE num = (SELECT max(num) FROM m)) AS BIGINT) AS at_nchars,
                   CAST((SELECT max(num) FROM m) AS BIGINT) AS ks_num,
                   t.n0 AS n_left, t.n1 AS n_right
            FROM t
        """,
        "events_time_funnel": """
            WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
            b AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
            SELECT (SELECT count(DISTINCT user_id) FROM a) AS n_users_a,
                   (SELECT count(DISTINCT b.user_id)
                    FROM b JOIN a ON a.user_id = b.user_id
                     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
                     AS n_converted
        """,
        "source_tfidf_terms": r"""
            WITH tok AS (
              SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
              FROM documents),
            tf AS (SELECT source, token, count(*) AS tf FROM tok
                   WHERE token <> '' GROUP BY 1, 2),
            df AS (SELECT token, count(DISTINCT source) AS df FROM tf GROUP BY 1),
            s AS (SELECT tf.source, tf.token, tf.tf, df.df,
                         tf.tf * 1000000 // df.df AS score_ppm,
                         row_number() OVER (
                           PARTITION BY tf.source
                           ORDER BY tf.tf * 1000000 // df.df DESC, tf.token ASC)
                           AS rk
                  FROM tf JOIN df USING (token))
            SELECT source, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
                   CAST(score_ppm AS BIGINT) AS score_ppm, CAST(rk AS BIGINT) AS rk
            FROM s WHERE rk <= 5
        """,
        "nation_market_share": """
            WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
            asia AS (SELECT n_nationkey FROM nation
                     JOIN region ON n_regionkey = r_regionkey
                     WHERE r_name = 'ASIA'),
            f AS (
              SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                     n.n_name,
                     CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                          * 100 + 0.5) AS BIGINT) AS cents
              FROM lineitem l
              JOIN promo p ON p.p_partkey = l.l_partkey
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              JOIN customer cu ON cu.c_custkey = o.o_custkey
              JOIN asia a ON a.n_nationkey = cu.c_nationkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey
              WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
                AND o.o_orderdate < TIMESTAMP '1998-01-01'),
            g AS (SELECT o_year, n_name, sum(cents) AS revenue_cents
                  FROM f GROUP BY 1, 2)
            SELECT o_year, n_name,
                   CAST(revenue_cents AS BIGINT) AS revenue_cents,
                   CAST(floor(CAST(revenue_cents AS DOUBLE) * 1000000.0
                        / CAST(sum(revenue_cents) OVER
                               (PARTITION BY o_year) AS DOUBLE)
                        + 0.5) AS BIGINT) AS share_ppm
            FROM g
        """,
        "top_supplier_quarter": """
            WITH r AS (
              SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
                     sum(CAST(floor(l_extendedprice * (1 - l_discount)
                         * 100 + 0.5) AS BIGINT)) AS total_revenue_cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY 1)
            SELECT r.s_suppkey, s.s_name,
                   CAST(r.total_revenue_cents AS BIGINT)
                     AS total_revenue_cents
            FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
            WHERE r.total_revenue_cents =
              (SELECT max(total_revenue_cents) FROM r)
        """,
        "brand_low_qty_revenue": """
            WITH bl AS (
              SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                     l_extendedprice
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_brand = 'Brand#19'),
            a AS (SELECT l_partkey, sum(q) AS sum_qty, count(*) AS cnt
                  FROM bl GROUP BY 1),
            low AS (
              SELECT CAST(floor(bl.l_extendedprice * 100 + 0.5)
                     AS BIGINT) AS cents
              FROM bl JOIN a USING (l_partkey)
              WHERE 5 * bl.q * a.cnt < a.sum_qty)
            SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents,
                   CAST(floor(CAST(coalesce(sum(cents), 0) AS DOUBLE)
                        / 7.0 + 0.5) AS BIGINT) AS yearly_cents,
                   count(*) AS n_lineitems
            FROM low
        """,
        "preference_pairs": f"""
            WITH o AS (
              SELECT conv_id, role, text,
                     lead(role) OVER w AS nrole,
                     lead(text) OVER w AS ntext
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
            p AS (SELECT text AS prompt, ntext AS response FROM o
                  WHERE role = 'user' AND nrole = 'assistant'),
            d AS (SELECT DISTINCT prompt, response FROM p),
            rk AS (SELECT prompt, response,
                     row_number() OVER (PARTITION BY prompt
                       ORDER BY length(response) DESC, response DESC)
                       AS rd,
                     row_number() OVER (PARTITION BY prompt
                       ORDER BY length(response) ASC, response ASC)
                       AS ra,
                     count(*) OVER (PARTITION BY prompt)
                       AS n_candidates
                   FROM d)
            SELECT prompt,
                   CAST(max(n_candidates) AS BIGINT) AS n_candidates,
                   max(CASE WHEN rd = 1 THEN response END) AS chosen,
                   max(CASE WHEN ra = 1 THEN response END) AS rejected
            FROM rk GROUP BY prompt
            HAVING max(n_candidates) >= 2
        """,
        "user_state_scd2": """
            WITH o AS (
              SELECT user_id, event_type, epoch_us(ts) AS t,
                     row_number() OVER w AS rn,
                     lag(event_type) OVER w AS pt
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            c AS (SELECT *, CASE WHEN pt IS NULL OR pt <> event_type
                            THEN 1 ELSE 0 END AS chg FROM o),
            r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
                                           ORDER BY rn) AS version
                  FROM c),
            runs AS (SELECT user_id, CAST(version AS BIGINT) AS version,
                            min(event_type) AS event_type,
                            min(t) AS valid_from_us
                     FROM r GROUP BY user_id, version)
            SELECT CAST(user_id AS BIGINT) AS user_id, version,
                   event_type,
                   CAST(valid_from_us AS BIGINT) AS valid_from_us,
                   CAST(coalesce(lead(valid_from_us) OVER
                        (PARTITION BY user_id ORDER BY version), -1)
                        AS BIGINT) AS valid_to_us
            FROM runs
        """,
        "order_skyline": """
            WITH o AS (
              SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS price_cents,
                     epoch_us(o_orderdate) AS orderdate_us
              FROM orders)
            SELECT o_orderkey, price_cents,
                   CAST(orderdate_us AS BIGINT) AS orderdate_us
            FROM o
            WHERE NOT EXISTS (
              SELECT 1 FROM o x
              WHERE x.price_cents >= o.price_cents
                AND x.orderdate_us <= o.orderdate_us
                AND (x.price_cents > o.price_cents
                     OR x.orderdate_us < o.orderdate_us))
        """,
        "global_median_value": """
            WITH c AS (
              SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events),
            n AS (SELECT count(*) AS n_rows FROM c)
            SELECT n.n_rows,
                   CAST((n.n_rows + 1) // 2 AS BIGINT) AS k,
                   (SELECT cents FROM c ORDER BY cents
                    LIMIT 1 OFFSET ((SELECT n_rows FROM n) + 1) // 2 - 1)
                     AS median_cents
            FROM n
        """,
        "user_active_time": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + 600000000 AS e
              FROM events),
            o AS (
              SELECT user_id, s, e,
                     max(e) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pmax
              FROM iv),
            f AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
                            THEN 1 ELSE 0 END AS st FROM o),
            g AS (SELECT *, sum(st) OVER (PARTITION BY user_id
                    ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
                  FROM f),
            isl AS (SELECT user_id, island, min(s) AS st_s,
                           max(e) AS en_e
                    FROM g GROUP BY 1, 2)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   count(*) AS n_islands,
                   CAST(sum(en_e - st_s) AS BIGINT) AS active_us
            FROM isl GROUP BY 1
        """,
        "lang_length_gini": """
            WITH r AS (
              SELECT lang, CAST(n_chars AS BIGINT) AS x,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rk
              FROM documents),
            g AS (SELECT lang, count(*) AS n_docs, sum(x) AS sx,
                         sum(rk * x) AS srx
                  FROM r GROUP BY lang)
            SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(floor(CAST(2 * srx - (n_docs + 1) * sx AS DOUBLE)
                        * 1000000.0 / CAST(n_docs * sx AS DOUBLE) + 0.5)
                        AS BIGINT) AS gini_ppm
            FROM g
        """,
        "totalprice_first_digit": """
            WITH d AS (
              SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100
                       + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit
              FROM orders),
            n AS (SELECT count(*) AS n_total FROM d)
            SELECT digit, count(*) AS n_orders,
                   CAST(floor(CAST(count(*) AS DOUBLE) * 1000000.0
                        / (SELECT CAST(n_total AS DOUBLE) FROM n) + 0.5)
                        AS BIGINT) AS share_ppm
            FROM d GROUP BY digit
        """,
        "supplier_abc_classes": """
            WITH r AS (
              SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
                     sum(CAST(floor(l_extendedprice * (1 - l_discount)
                         * 100 + 0.5) AS BIGINT)) AS revenue_cents
              FROM lineitem GROUP BY 1),
            c AS (
              SELECT s_suppkey, revenue_cents,
                     sum(revenue_cents) OVER (
                       ORDER BY revenue_cents DESC, s_suppkey
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(revenue_cents) OVER () AS tot
              FROM r)
            SELECT s_suppkey, CAST(revenue_cents AS BIGINT)
                     AS revenue_cents,
                   CAST(floor(CAST(cum AS DOUBLE) * 1000000.0
                        / CAST(tot AS DOUBLE) + 0.5) AS BIGINT)
                     AS cum_share_ppm,
                   CASE WHEN floor(CAST(cum AS DOUBLE) * 1000000.0
                          / CAST(tot AS DOUBLE) + 0.5) <= 700000
                        THEN 'A'
                        WHEN floor(CAST(cum AS DOUBLE) * 1000000.0
                          / CAST(tot AS DOUBLE) + 0.5) <= 900000
                        THEN 'B' ELSE 'C' END AS abc_class
            FROM c
        """,
        "source_simpson_diversity": r"""
            WITH tok AS (
              SELECT source,
                     unnest(string_split_regex(trim(text), '\s+'))
                       AS token
              FROM documents),
            tf AS (SELECT source, token, count(*) AS c FROM tok
                   WHERE token <> '' GROUP BY 1, 2),
            s AS (SELECT source, sum(c * (c - 1)) AS sq, sum(c) AS n
                  FROM tf GROUP BY source)
            SELECT source, CAST(n AS BIGINT) AS n_tokens,
                   CAST(floor(CAST(sq AS DOUBLE) * 1000000.0
                        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                        + 0.5) AS BIGINT) AS simpson_ppm
            FROM s
        """,
        "part_min_cost_supplier": """
            WITH p AS (SELECT p_partkey, p_name FROM part
                       WHERE p_size >= 45),
            ps AS (SELECT DISTINCT l_partkey AS p_partkey,
                          CAST(l_suppkey AS BIGINT) AS s_suppkey
                   FROM lineitem JOIN p ON p_partkey = l_partkey),
            j AS (SELECT ps.p_partkey, ps.s_suppkey, s.s_name,
                         CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)
                           AS acctbal_cents
                  FROM ps JOIN supplier s ON s.s_suppkey = ps.s_suppkey),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY p_partkey
                    ORDER BY acctbal_cents, s_suppkey) AS rn FROM j)
            SELECT CAST(r.p_partkey AS BIGINT) AS p_partkey, p.p_name,
                   r.s_suppkey, r.s_name, r.acctbal_cents
            FROM r JOIN p USING (p_partkey) WHERE rn = 1
        """,
        "profit_by_nation_year": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                       * 100 + 0.5) AS BIGINT)) AS BIGINT) AS profit_cents
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2
        """,
        "important_parts": """
            WITH v AS (
              SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
                     sum(CAST(floor(l_extendedprice * 100 + 0.5)
                         AS BIGINT)) AS value_cents
              FROM lineitem GROUP BY 1)
            SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents
            FROM v
            WHERE 2 * value_cents * (SELECT count(*) FROM v)
                  > 3 * (SELECT CAST(sum(value_cents) AS BIGINT) FROM v)
        """,
        "priority_by_quantity_band": """
            SELECT CASE WHEN l_quantity >= 25 THEN 'HIGH-QTY'
                        ELSE 'LOW-QTY' END AS band,
                   CAST(sum(CASE WHEN o_orderpriority IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                       AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN
                       ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                       AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        "brand_excess_suppliers": """
            WITH q AS (
              SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
                     CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                          AS BIGINT) AS qty
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_brand = 'Brand#21'
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1),
            tot AS (SELECT sum(qty) AS total, count(*) AS n FROM q)
            SELECT q.s_suppkey, s.s_name, q.qty AS shipped_qty
            FROM q JOIN supplier s ON s.s_suppkey = q.s_suppkey, tot
            WHERE 2 * q.qty * tot.n > 3 * tot.total
        """,
        "late_sole_suppliers": """
            WITH l AS (SELECT l_orderkey,
                              CAST(l_suppkey AS BIGINT) AS s_suppkey,
                              l_shipdate
                       FROM lineitem),
            o AS (SELECT l_orderkey, max(l_shipdate) AS mx,
                         count(DISTINCT s_suppkey) AS ns
                  FROM l GROUP BY 1),
            m AS (SELECT DISTINCT l.l_orderkey, l.s_suppkey
                  FROM l JOIN o USING (l_orderkey)
                  WHERE l.l_shipdate = o.mx AND o.ns >= 2),
            sole AS (SELECT l_orderkey, min(s_suppkey) AS s_suppkey
                     FROM m GROUP BY 1 HAVING count(*) = 1)
            SELECT sole.s_suppkey, s.s_name,
                   count(*) AS numwait
            FROM sole JOIN supplier s ON s.s_suppkey = sole.s_suppkey
            GROUP BY 1, 2
        """,
        "skew_join_segment_value": """
            SELECT c_mktsegment,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM events JOIN customer ON c_custkey = user_id
            GROUP BY 1
        """,
        "sketch_blob_langs_by_source": """
            SELECT source, count(DISTINCT lang) AS n_langs
            FROM documents GROUP BY 1
        """,
        "semantic_decontaminate": """
            WITH q AS (SELECT embedding FROM embeddings
                       WHERE vec_id % 11 = 0)
            SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
                   count(*) AS n_contaminating
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id % 11 <> 0
              AND list_cosine_similarity(q.embedding, e.embedding) >= 0.4
            GROUP BY 1
        """,
        "hard_negatives_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe, label AS ql
              FROM embeddings WHERE vec_id % 37 = 0),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding) AS score
              FROM q CROSS JOIN embeddings e WHERE e.label <> q.ql),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id ASC)
                       AS rank
              FROM scored)
            SELECT query_id, CAST(vec_id AS BIGINT) AS vec_id, rank
            FROM ranked WHERE rank <= 3
        """,
        "join_key_multiplicity": """
            WITH c AS (SELECT l_partkey, count(*) AS m FROM lineitem
                       GROUP BY 1)
            SELECT m AS multiplicity, count(*) AS n_keys
            FROM c GROUP BY 1
        """,
        "length_bucket_plan": """
            WITH b AS (
              SELECT CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q1,
                     CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q2,
                     CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q3,
                     CAST(max(n_chars) AS BIGINT) AS q4
              FROM documents),
            a AS (
              SELECT CASE WHEN n_chars <= q1 THEN 1
                          WHEN n_chars <= q2 THEN 2
                          WHEN n_chars <= q3 THEN 3 ELSE 4 END AS bucket,
                     CASE WHEN n_chars <= q1 THEN q1
                          WHEN n_chars <= q2 THEN q2
                          WHEN n_chars <= q3 THEN q3 ELSE q4 END AS cap,
                     CAST(n_chars AS BIGINT) AS len
              FROM documents, b)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(max(cap) AS BIGINT) AS cap,
                   count(*) AS n_docs,
                   CAST(sum(cap - len) AS BIGINT) AS waste_chars
            FROM a GROUP BY 1
        """,
        "freq_blob_top_tokens_by_lang": r"""
            WITH tok AS (
              SELECT lang,
                     unnest(string_split_regex(trim(text), '\s+')) AS item
              FROM documents
            ), c AS (
              SELECT lang, item, count(*) AS cnt
              FROM tok WHERE item <> '' GROUP BY lang, item
            ), r AS (
              SELECT lang, item, cnt,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY cnt DESC, item ASC)
                       AS rank
              FROM c
            )
            SELECT lang, item, cnt AS estimate, rank
            FROM r WHERE rank <= 5
        """,
        "char_budget_subset": """
            WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                              CAST(n_chars AS BIGINT) AS nc
                       FROM documents),
            w AS (SELECT doc_id, nc,
                         sum(nc) OVER (ORDER BY nc DESC, doc_id ASC
                                       ROWS UNBOUNDED PRECEDING) AS cum
                  FROM d)
            SELECT doc_id, nc AS n_chars
            FROM w WHERE cum <= (SELECT CAST(sum(nc) / 5 AS BIGINT)
                                 FROM d)
        """,
        "exact_dup_size_histogram": f"""
            WITH g AS (SELECT text, count(*) AS size FROM {T}
                       GROUP BY text)
            SELECT CAST(size AS BIGINT) AS group_size,
                   count(*) AS n_groups
            FROM g GROUP BY 1
        """,
        "kll_blob_quantiles_by_source": """
            SELECT source, count(*) AS n,
                   CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25,
                   CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q50,
                   CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q75
            FROM documents GROUP BY source
        """,
        "conv_lang_switches": rf"""
            WITH t AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE list_transform(
                            string_split_regex(trim(text), '\s+'),
                            x -> trim(lower(x), '.,;:!?"''()'))
                     END AS toks
              FROM {T}
            ), h AS (
              SELECT conv_id, turn_idx,
                len(list_filter(toks, x -> x IN
                  ('der','die','das','und','oder','von','zu','im','ist',
                   'es','dass','für','auf','mit','als','war','bei','ein')))
                  AS hde,
                len(list_filter(toks, x -> x IN
                  ('the','a','an','and','or','of','to','in','is','it',
                   'that','for','on','with','as','was','at','by','be')))
                  AS hen,
                len(list_filter(toks, x -> x IN
                  ('el','la','los','las','y','o','de','a','en','es','que',
                   'para','sobre','con','como','era','por','un'))) AS hes,
                len(list_filter(toks, x -> x IN
                  ('le','la','les','et','ou','de','à','en','est','il',
                   'que','pour','sur','avec','comme','était','par','un')))
                  AS hfr
              FROM t
            ), pred AS (
              SELECT conv_id, turn_idx,
                   CASE WHEN greatest(hde, hen, hes, hfr) = 0
                          THEN 'unknown'
                        WHEN hde >= hen AND hde >= hes AND hde >= hfr
                          THEN 'de'
                        WHEN hen >= hes AND hen >= hfr THEN 'en'
                        WHEN hes >= hfr THEN 'es'
                        ELSE 'fr' END AS lang_pred
              FROM h
            ), w AS (
              SELECT conv_id, lang_pred,
                     lag(lang_pred) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx) AS prev
              FROM pred
            )
            SELECT conv_id, count(*) AS n_turns,
                   count(DISTINCT lang_pred) AS n_langs,
                   CAST(sum(CASE WHEN prev IS NOT NULL
                                      AND prev <> lang_pred
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
            FROM w GROUP BY 1
        """,
        "daily_value_quantiles": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(quantile_disc(
                       CAST(floor(value * 100 + 0.5) AS BIGINT), 0.50)
                       AS BIGINT) AS q50,
                   CAST(quantile_disc(
                       CAST(floor(value * 100 + 0.5) AS BIGINT), 0.90)
                       AS BIGINT) AS q90
            FROM events GROUP BY 1
        """,
        "ri_audit_orders_lineitem": """
            SELECT (SELECT count(*) FROM lineitem
                    WHERE l_orderkey NOT IN
                          (SELECT o_orderkey FROM orders))
                     AS orphan_lineitems,
                   (SELECT count(*) FROM orders
                    WHERE o_orderkey NOT IN
                          (SELECT l_orderkey FROM lineitem))
                     AS childless_orders
        """,
        "events_anomaly_days": """
            WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                              count(*) AS c
                       FROM events GROUP BY 1),
            s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(c) AS HUGEINT) AS total,
                         CAST(sum(c * c) AS HUGEINT) AS sumsq
                  FROM d)
            SELECT day, CAST(c AS BIGINT) AS n_events,
                   CAST(sign(n * c - total) AS BIGINT) AS dev_sign
            FROM d, s
            WHERE (n * c - total) * (n * c - total)
                  > 4 * (n * sumsq - total * total)
        """,
        "role_transitions": f"""
            WITH w AS (
              SELECT conv_id, role,
                     lag(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev
              FROM {T}
            )
            SELECT prev AS role_from, role AS role_to,
                   count(*) AS n
            FROM w WHERE prev IS NOT NULL
            GROUP BY 1, 2
        """,
        "user_gap_fano": """
            WITH o AS (
              SELECT user_id, epoch_us(ts) AS t,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts),
                                                      event_id) AS pt
              FROM events
            ), g AS (
              SELECT user_id,
                     CAST((t - pt) // 1000000 AS HUGEINT) AS gap
              FROM o WHERE pt IS NOT NULL
            ), m AS (
              SELECT user_id, count(*) AS n, sum(gap) AS sg,
                     sum(gap * gap) AS sg2
              FROM g GROUP BY 1 HAVING count(*) >= 2
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(n AS BIGINT) AS n_gaps,
                   CAST(n * sg2 - sg * sg AS BIGINT) AS fano_num,
                   CAST(n * sg AS BIGINT) AS fano_den
            FROM m
        """,
        "reply_length_slope": f"""
            WITH w AS (
              SELECT role, CAST(length(text) AS HUGEINT) AS l,
                     lead(role) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS nrole,
                     lead(CAST(length(text) AS HUGEINT)) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx) AS nl
              FROM {T}
            ), p AS (
              SELECT l AS x, nl AS y FROM w
              WHERE role = 'user' AND nrole = 'assistant'
            ), m AS (
              SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x * y) AS sxy,
                     sum(x * x) AS sx2
              FROM p
            )
            SELECT CAST(n AS BIGINT) AS n_pairs,
                   CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
                   CAST(n * sx2 - sx * sx AS BIGINT) AS slope_den
            FROM m
        """,
        "top_events_with_ties": """
            WITH w AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CAST(event_id AS BIGINT) AS event_id,
                     CAST(floor(value * 100 + 0.5) AS BIGINT)
                       AS value_cents,
                     rank() OVER (PARTITION BY user_id
                                  ORDER BY CAST(floor(value * 100 + 0.5)
                                                AS BIGINT) DESC) AS rnk
              FROM events
            )
            SELECT user_id, event_id, value_cents, CAST(rnk AS BIGINT)
                     AS rnk
            FROM w WHERE rnk <= 2
        """,
        "session_running_value": """
            WITH w AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CAST(event_id AS BIGINT) AS event_id, ts,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                     CASE WHEN lag(ts) OVER win IS NULL
                               OR ts - lag(ts) OVER win
                                  > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW win AS (PARTITION BY user_id
                             ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, event_id, ts, cents,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                       AS session_no
              FROM w
            )
            SELECT user_id, event_id,
                   CAST(session_no AS BIGINT) AS session_no,
                   CAST(sum(cents) OVER (
                       PARTITION BY user_id, session_no
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS running_cents
            FROM s
        """,
        "truncated_convs": f"""
            WITH o AS (
              SELECT conv_id, role,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx DESC) AS rn,
                     count(*) OVER (PARTITION BY conv_id) AS n_turns
              FROM {T}
            )
            SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns
            FROM o WHERE rn = 1 AND role = 'user'
        """,
        "blocked_near_dups": r"""
            WITH t AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                     CAST(n_chars // 50 AS BIGINT) AS band,
                     list_distinct(string_split_regex(trim(text),
                                                      '\s+')) AS toks
              FROM documents
            ), p AS (
              SELECT a.doc_id AS a, b.doc_id AS b,
                     CAST(len(list_intersect(a.toks, b.toks))
                          AS BIGINT) AS inter,
                     CAST(len(a.toks) + len(b.toks)
                          - len(list_intersect(a.toks, b.toks))
                          AS BIGINT) AS union_
              FROM t a JOIN t b
                ON a.lang = b.lang AND a.band = b.band
                   AND a.doc_id < b.doc_id
            )
            SELECT a, b, inter, union_ FROM p
            WHERE 2 * inter >= union_
        """,
        "lsh_sensitivity_curve": f"""
            WITH g AS (
              SELECT round(0.05 * x, 2) AS jaccard
              FROM generate_series(1, 19) AS t(x)
            )
            SELECT jaccard,
                   round(1.0 - pow(1.0 - pow(jaccard,
                         {_dedup_config().rows_per_band}),
                         {_dedup_config().num_bands}), 6)
                     AS p_candidate,
                   CAST({_dedup_config().num_bands} AS BIGINT) AS bands,
                   CAST({_dedup_config().rows_per_band} AS BIGINT)
                     AS rows_per_band
            FROM g
        """,
        "second_order_latency": """
            WITH w AS (
              SELECT o_custkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate,
                                                 o_orderkey) AS rn
              FROM orders
            ), p AS (
              SELECT a.o_custkey,
                     CAST(date_diff('day',
                          CAST(a.o_orderdate AS DATE),
                          CAST(b.o_orderdate AS DATE)) AS BIGINT) AS d
              FROM w a JOIN w b
                ON a.o_custkey = b.o_custkey
                   AND a.rn = 1 AND b.rn = 2
            )
            SELECT count(*) AS n_customers,
                   CAST(quantile_disc(d, 0.25) AS BIGINT) AS q25,
                   CAST(quantile_disc(d, 0.50) AS BIGINT) AS q50,
                   CAST(quantile_disc(d, 0.75) AS BIGINT) AS q75
            FROM p
        """,
        "first_response_latency": f"""
            WITH f AS (
              SELECT conv_id, min(epoch_us(ts)) AS t0 FROM {T}
              GROUP BY 1
            ), a AS (
              SELECT conv_id, min(epoch_us(ts)) AS ta FROM {T}
              WHERE role = 'assistant' GROUP BY 1
            )
            SELECT f.conv_id,
                   CAST(a.ta - f.t0 AS BIGINT) AS latency_us
            FROM f JOIN a ON f.conv_id = a.conv_id
        """,
        "customer_rfm": """
            WITH a AS (
              SELECT CAST(o_custkey AS BIGINT) AS c,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                          AS BIGINT)) AS BIGINT) AS m,
                     max(o_orderdate) AS lastd,
                     count(*) AS f
              FROM orders GROUP BY 1
            ), x AS (
              SELECT *, CAST(date_diff('day', CAST(lastd AS DATE),
                        (SELECT CAST(max(lastd) AS DATE) FROM a))
                        AS BIGINT) AS rdays
              FROM a
            ), r AS (
              SELECT *,
                     row_number() OVER (ORDER BY rdays, c) AS rr,
                     row_number() OVER (ORDER BY f, c) AS rf,
                     row_number() OVER (ORDER BY m, c) AS rm,
                     (SELECT count(*) FROM a) AS n
              FROM x
            )
            SELECT c AS o_custkey, rdays AS r_days,
                   CAST(f AS BIGINT) AS frequency,
                   m AS monetary_cents,
                   CAST(5 - ((4 * (rr - 1)) // n + 1) AS VARCHAR)
                   || CAST((4 * (rf - 1)) // n + 1 AS VARCHAR)
                   || CAST((4 * (rm - 1)) // n + 1 AS VARCHAR)
                     AS rfm_code
            FROM r
        """,
        "weekly_new_vs_repeat_revenue": """
            WITH o AS (
              SELECT CAST(o_custkey AS BIGINT) AS c,
                     strftime(o_orderdate, '%G-W%V') AS week,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents
              FROM orders
            ), f AS (
              SELECT c, min(week) AS fw FROM o GROUP BY 1
            )
            SELECT week,
                   CAST(sum(CASE WHEN o.week = f.fw THEN cents
                            ELSE 0 END) AS BIGINT) AS new_cents,
                   CAST(sum(CASE WHEN o.week = f.fw THEN 0
                            ELSE cents END) AS BIGINT) AS repeat_cents
            FROM o JOIN f ON o.c = f.c
            GROUP BY 1
        """,
        "source_charclass_profile": r"""
            WITH t AS (
              SELECT source,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '',
                          'g')) AS BIGINT) AS letters,
                     CAST(length(regexp_replace(text, '[^0-9]', '',
                          'g')) AS BIGINT) AS digits,
                     CAST(length(regexp_replace(text,
                          '[^ \t\n\x0b\x0c\r]', '', 'g')) AS BIGINT)
                       AS ws,
                     CAST(length(text) AS BIGINT) AS tot
              FROM documents
            )
            SELECT source,
                   CAST(sum(letters) AS BIGINT) AS letters,
                   CAST(sum(digits) AS BIGINT) AS digits,
                   CAST(sum(ws) AS BIGINT) AS whitespace,
                   CAST(sum(tot) - sum(letters) - sum(digits) - sum(ws)
                        AS BIGINT) AS other,
                   CAST(sum(letters) * 1000000
                        // greatest(sum(tot), 1) AS BIGINT)
                     AS letters_ppm
            FROM t GROUP BY 1
        """,
        "nation_supplier_hhi": """
            WITH r AS (
              SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
                     CAST(sum(CAST(floor(l_extendedprice
                          * (1 - l_discount) * 100 + 0.5) AS BIGINT))
                          AS HUGEINT) AS cents
              FROM lineitem GROUP BY 1
            ), j AS (
              SELECT n_name AS nation, r.cents
              FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
              JOIN nation ON n_nationkey = s_nationkey
            )
            SELECT nation, count(*) AS n_suppliers,
                   CAST(sum(cents * cents) * 1000000
                        // (sum(cents) * sum(cents)) AS BIGINT)
                     AS hhi_ppm
            FROM j GROUP BY 1
        """,
        "conv_question_stats": f"""
            WITH u AS (
              SELECT conv_id,
                     count(*) AS ut,
                     CAST(sum(CASE WHEN text LIKE '%?' THEN 1 ELSE 0
                          END) AS BIGINT) AS qt
              FROM {T} WHERE role = 'user' GROUP BY 1
            )
            SELECT conv_id, CAST(ut AS BIGINT) AS user_turns,
                   qt AS question_turns,
                   CAST(qt * 1000000 // ut AS BIGINT) AS qshare_ppm
            FROM u
        """,
        "doc_sentence_stats": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(regexp_extract_all(text, '[.!?]+'))
                        AS BIGINT) AS n_sentences,
                   CAST(length(text)
                        // greatest(len(regexp_extract_all(text,
                                        '[.!?]+')), 1) AS BIGINT)
                     AS avg_sentence_chars
            FROM documents
        """,
        "user_weekend_share": """
            WITH t AS (
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS we
              FROM events
            )
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(we) AS BIGINT) AS weekend_events,
                   CAST(sum(we) * 1000000 // count(*) AS BIGINT)
                     AS weekend_ppm
            FROM t GROUP BY 1
        """,
        "brand_qty_price_corr": """
            WITH t AS (
              SELECT p_brand AS brand,
                     CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x,
                     CAST(floor(l_extendedprice * (1 - l_discount)
                          + 0.5) AS HUGEINT) AS y
              FROM lineitem JOIN part ON p_partkey = l_partkey
            ), m AS (
              SELECT brand, CAST(count(*) AS HUGEINT) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                     sum(x * x) AS sx2, sum(y * y) AS sy2
              FROM t GROUP BY 1
            )
            SELECT brand, CAST(n AS BIGINT) AS n,
                   CAST(n * sxy - sx * sy AS BIGINT) AS corr_num,
                   CAST(n * sx2 - sx * sx AS BIGINT) AS varx_term,
                   CAST(n * sy2 - sy * sy AS BIGINT) AS vary_term
            FROM m
        """,
        "user_event_entropy": """
            WITH c AS (
              SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
                     count(*) AS c
              FROM events GROUP BY 1, 2
            ), n AS (
              SELECT user_id, sum(c) AS n FROM c GROUP BY 1
            )
            SELECT c.user_id,
                   CAST(any_value(n.n) AS BIGINT) AS n_events,
                   floor(-sum((c.c * 1.0 / n.n)
                         * ln(c.c * 1.0 / n.n)) * 10000 + 0.5) / 10000
                     AS entropy
            FROM c JOIN n USING (user_id) GROUP BY c.user_id
        """,
        "supplier_activity_span": """
            WITH m AS (
              SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s_suppkey,
                     CAST(year(l_shipdate) * 12
                          + (month(l_shipdate) - 1) AS BIGINT) AS mi
              FROM lineitem
            ), w AS (
              SELECT s_suppkey, mi,
                     lag(mi) OVER (PARTITION BY s_suppkey
                                   ORDER BY mi) AS prev
              FROM m
            )
            SELECT s_suppkey,
                   count(*) AS active_months,
                   CAST(coalesce(max(mi - prev), 0) AS BIGINT)
                     AS max_gap_months
            FROM w GROUP BY 1
        """,
        "basket_size_value_curve": """
            WITH o AS (
              SELECT l_orderkey, count(*) AS n_lines,
                     CAST(sum(CAST(floor(l_extendedprice
                          * (1 - l_discount) * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS cents
              FROM lineitem GROUP BY 1
            )
            SELECT CAST(n_lines AS BIGINT) AS n_lines,
                   count(*) AS n_orders,
                   CAST(sum(cents) AS BIGINT) AS revenue_cents
            FROM o GROUP BY 1
        """,
        "langid_confusion": r"""
            WITH t AS (
              SELECT lang,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE list_transform(
                            string_split_regex(trim(text), '\s+'),
                            x -> trim(lower(x), '.,;:!?"''()'))
                     END AS toks
              FROM documents
            ), h AS (
              SELECT lang,
                len(list_filter(toks, x -> x IN
                  ('der','die','das','und','oder','von','zu','im','ist',
                   'es','dass','für','auf','mit','als','war','bei','ein')))
                  AS hde,
                len(list_filter(toks, x -> x IN
                  ('the','a','an','and','or','of','to','in','is','it',
                   'that','for','on','with','as','was','at','by','be')))
                  AS hen,
                len(list_filter(toks, x -> x IN
                  ('el','la','los','las','y','o','de','a','en','es','que',
                   'para','sobre','con','como','era','por','un'))) AS hes,
                len(list_filter(toks, x -> x IN
                  ('le','la','les','et','ou','de','à','en','est','il',
                   'que','pour','sur','avec','comme','était','par','un')))
                  AS hfr
              FROM t
            ), p AS (
              SELECT lang AS lang_true,
                   CASE WHEN greatest(hde, hen, hes, hfr) = 0
                          THEN 'unknown'
                        WHEN hde >= hen AND hde >= hes AND hde >= hfr
                          THEN 'de'
                        WHEN hen >= hes AND hen >= hfr THEN 'en'
                        WHEN hes >= hfr THEN 'es'
                        ELSE 'fr' END AS lang_pred
              FROM h
            )
            SELECT lang_true, lang_pred, count(*) AS n
            FROM p GROUP BY 1, 2
        """,
        "order_lorenz_deciles": """
            WITH o AS (
              SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                     row_number() OVER (ORDER BY
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                       o_orderkey) AS rn,
                     (SELECT count(*) FROM orders) AS n
              FROM orders
            ), d AS (
              SELECT (10 * (rn - 1)) // n + 1 AS decile, cents FROM o
            ), g AS (
              SELECT decile, count(*) AS n_orders,
                     CAST(sum(cents) AS BIGINT) AS revenue_cents
              FROM d GROUP BY 1
            )
            SELECT CAST(decile AS BIGINT) AS decile, n_orders,
                   revenue_cents,
                   CAST(sum(revenue_cents) OVER (ORDER BY decile
                        ROWS UNBOUNDED PRECEDING) * 1000000
                        // (SELECT sum(revenue_cents) FROM g)
                        AS BIGINT) AS cum_share_ppm
            FROM g
        """,
        "gap_log2_histogram": """
            WITH o AS (
              SELECT user_id, epoch_us(ts) AS t,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts),
                                                      event_id) AS pt
              FROM events
            ), g AS (
              SELECT (t - pt) // 1000000 AS gap
              FROM o WHERE pt IS NOT NULL
            )
            SELECT CASE WHEN gap > 0
                        THEN CAST(floor(log2(gap)) AS BIGINT)
                        ELSE -1 END AS bucket,
                   count(*) AS n_gaps
            FROM g GROUP BY 1
        """,
        "event_type_peak_hour": """
            WITH c AS (
              SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                     count(*) AS c
              FROM events GROUP BY 1, 2
            ), r AS (
              SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY c DESC, hour ASC) AS rn
              FROM c
            )
            SELECT event_type, hour AS peak_hour,
                   CAST(c AS BIGINT) AS n_events
            FROM r WHERE rn = 1
        """,
    }




