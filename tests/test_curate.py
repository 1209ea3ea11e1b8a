"""Curation pipeline: retention funnel correctness + checkpoint resume.

Planted inputs cover every drop reason: low-quality digit spam, short
docs, non-English, exact duplicates, near duplicates — each must be
dropped while clean English docs survive.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from apache_datasketches_go_ray.config import DedupConfig
from apache_datasketches_go_ray.pipelines.curate import (
    CurateConfig, run_curate,
)

WORDS = ("the quick brown fox jumps over a lazy dog and then it runs "
         "back to the forest with some other animals that live there "
         "in a big warm den near the old river bank").split()


def _clean_doc(rng, n=60):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(21)
    ids, texts = [], []
    for i in range(40):  # clean english docs
        ids.append(i)
        texts.append(_clean_doc(rng))
    ids.append(100)      # digit spam (low quality)
    texts.append(" ".join(str(rng.integers(0, 10**9)) for _ in range(60)))
    ids.append(101)      # too short
    texts.append("tiny doc")
    ids.append(102)      # German
    texts.append("der hund und die katze sind bei dem haus und das "
                 "ist für die familie ein gutes zeichen im winter "
                 "von oder zu allem was war bei ein der die das und")
    ids.append(200)      # exact dup of doc 0
    texts.append(texts[0])
    ids.append(201)      # near dup of doc 1 (one token changed)
    w = texts[1].split(" ")
    w[10] = "zzqx"
    texts.append(" ".join(w))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


@pytest.fixture(scope="module")
def curated_result(planted, ray_session):
    cfg = CurateConfig(min_quality=0.2, num_partitions=4,
                       dedup=DedupConfig(num_partitions=4))
    return run_curate(ray.data.from_arrow(planted).repartition(3), cfg)


def test_funnel_drops_each_kind(curated_result):
    out = set(curated_result["curated"].to_pandas()["doc_id"])
    # junk dropped
    assert 100 not in out          # digit spam
    assert 101 not in out          # too short
    assert 102 not in out          # wrong language
    assert 200 not in out          # exact dup (0 is the keeper)
    assert 201 not in out          # near dup (1 is the keeper)
    # clean docs survive, keepers included
    assert 0 in out and 1 in out
    assert len(out & set(range(40))) == 40


def test_funnel_metrics(curated_result):
    m = curated_result["metrics"]
    assert m["rows_in"] == 45
    assert m["rows_out"] == 40
    stages = m["stages"]
    assert stages["filtered"]["rows"] == 42      # 3 filter drops
    assert stages["exact_dedup"]["rows"] == 41   # 1 exact dup
    assert stages["curated"]["rows"] == 40       # 1 near dup


def test_curate_checkpoint_resume(planted, ray_session, tmp_path):
    cfg = CurateConfig(min_quality=0.2, num_partitions=4,
                       dedup=DedupConfig(num_partitions=4))
    ck = str(tmp_path / "ck")
    r1 = run_curate(ray.data.from_arrow(planted), cfg, checkpoint_dir=ck)
    out1 = sorted(r1["curated"].to_pandas()["doc_id"])
    r2 = run_curate(ray.data.from_arrow(planted), cfg, checkpoint_dir=ck)
    out2 = sorted(r2["curated"].to_pandas()["doc_id"])
    assert out1 == out2
    # every stage resumed from checkpoint on the second run
    assert all(v.get("resumed") for k, v in
               r2["metrics"]["stages"].items())


def test_curate_transcripts_dedups_planted_groups(ray_session):
    """Transcript curation funnel: exactly one representative of each
    planted duplicate group survives, and non-duplicated conversations
    all survive (lang gate passes 'unknown' synthetic text)."""
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["curate_transcripts"](
        "/root/testdata/sf0.001").to_pandas()
    curated = set(out["conv_id"])

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    groups_path = os.path.join(os.path.dirname(tdir), "dup_groups.parquet")
    g = pq.read_table(groups_path).to_pandas()
    all_convs = set(pq.read_table(tdir, columns=["conv_id"])
                    .column("conv_id").to_pylist())

    grouped = g.groupby("group_id")["conv_id"].apply(set)
    dup_members = set(g["conv_id"])
    for gid, members in grouped.items():
        # groups may include near-dups below threshold; at least one
        # member survives and exact copies collapse
        survivors = members & curated
        assert len(survivors) >= 1, gid
    # every non-duplicated conversation survives the funnel
    assert (all_convs - dup_members) <= curated


def test_curate_repetition_and_pii_gates(ray_session):
    """Round-3 gates: Gopher repetition thresholds drop repetitive docs
    and redact_pii scrubs emails BEFORE dedup hashes the text (two docs
    differing only in their email collapse to one)."""
    rng = np.random.default_rng(33)
    ids, texts = [], []
    for i in range(20):
        ids.append(i)
        texts.append(_clean_doc(rng))
    ids.append(300)      # duplicate-line spam
    line = _clean_doc(rng, n=8)
    texts.append("\n".join([line] * 12))
    ids.append(301)      # one bigram repeated everywhere
    texts.append("buy now " * 40)
    base = _clean_doc(rng)
    ids.append(302)      # same doc, different emails -> PII-collapsed
    texts.append(base + " contact alice@example.com")
    ids.append(303)
    texts.append(base + " contact bob@other.example.org")
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    cfg = CurateConfig(min_quality=0.2, num_partitions=4,
                       max_dup_line_frac=0.5,
                       max_top_bigram_char_frac=0.5,
                       redact_pii=True,
                       dedup=DedupConfig(num_partitions=4))
    res = run_curate(ray.data.from_arrow(tbl).repartition(3), cfg)
    out = res["curated"].to_pandas()
    kept = set(out["doc_id"])
    assert 300 not in kept           # dup-line gate
    assert 301 not in kept           # top-bigram gate
    assert 302 in kept and 303 not in kept   # redacted texts identical
    assert len(kept & set(range(20))) == 20
    # the surviving text is the REDACTED form
    t302 = out.set_index("doc_id").loc[302, "text"]
    assert "<EMAIL>" in t302 and "alice" not in t302
