"""Checkpoint deletion (right-to-be-forgotten): delete_convs over a
dedup checkpoint must equal a from-scratch dedup of the surviving
corpus, including across an incremental chain, and must SPLIT clusters
whose bridge conversation is removed."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.config import DedupConfig
from apache_datasketches_go_ray.sources.transcripts import write_transcripts

FIXTURE_DIR = "/tmp/adgr_delete_fixture"


@pytest.fixture(scope="module")
def fixture(ray_session):
    return write_transcripts(FIXTURE_DIR, 80, seed=23, shards=3)


def _labels(res):
    return {r["conv_id"]: r["cluster_id"]
            for r in res["clusters"].take_all()}


def _read(fixture):
    import ray.data

    return ray.data.read_parquet(fixture["dir"])


def _without(ds, removed):
    removed = set(removed)

    def drop(b):
        m = [c not in removed for c in b.column("conv_id").to_pylist()]
        return b.filter(pa.array(np.array(m)))

    return ds.map_batches(drop, batch_format="pyarrow")


@pytest.fixture(scope="module")
def full_ckpt(fixture, tmp_path_factory):
    """Full-corpus dedup checkpoint + labels, shared by the tests that
    only READ the checkpoint (delete_convs never mutates `against`)."""
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup

    cfg = DedupConfig(num_partitions=4)
    ck = str(tmp_path_factory.mktemp("delete_full") / "full")
    labels = _labels(run_dedup(_read(fixture), cfg, checkpoint_dir=ck))
    return ck, labels


def test_delete_equals_fresh_dedup(fixture, full_ckpt, tmp_path):
    from apache_datasketches_go_ray.pipelines.dedup import (
        delete_convs, run_dedup)

    cfg = DedupConfig(num_partitions=4)
    ck, labels = full_ckpt
    assert labels, "fixture produced no clusters"

    # remove one member from each of two clusters (non-label members so
    # the cluster remnant keeps its label where it survives)
    by_cluster = {}
    for cid, lab in labels.items():
        by_cluster.setdefault(lab, []).append(cid)
    multi = [sorted(v) for v in by_cluster.values() if len(v) >= 2]
    assert multi, "fixture has no multi-member cluster"
    removed = [grp[-1] for grp in multi[:2]]

    got = _labels(delete_convs(ck, removed, cfg))
    want = _labels(run_dedup(_without(_read(fixture), removed), cfg))
    assert got == want
    assert not set(removed) & set(got)


def test_delete_splits_bridge(ray_session, tmp_path):
    """A - B - C chain where B bridges: deleting B must split {A, C}."""
    import ray.data

    from apache_datasketches_go_ray.pipelines.dedup import (
        delete_convs, run_dedup)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 6
    tail_a = "unique ending one for the first conversation only " * 4
    tail_c = ("completely different closing for the third one here "
              "with many extra words to dominate the small overlap ") * 8
    # whole turns shared verbatim: A = B's first two turns, C = B's
    # last turn — containment(A in B) and (C in B) are ~1 (contiguous
    # turn ranges), while A and C share no turn at all
    turns = {"conv-a": [base, tail_a],
             "conv-b": [base, tail_a, tail_c],
             "conv-c": [tail_c]}
    rows = []
    for conv, texts in turns.items():
        for i, piece in enumerate(texts):
            rows.append({"conv_id": conv, "turn_idx": i,
                         "role": "user" if i % 2 == 0 else "assistant",
                         "text": piece, "tool": "",
                         "ts": 1_700_000_000_000_000 + i})
    tbl = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(tbl)

    cfg = DedupConfig(num_partitions=2)
    ck = str(tmp_path / "bridge")
    full = _labels(run_dedup(ds, cfg, checkpoint_dir=ck))
    if len({full.get("conv-a"), full.get("conv-b"), full.get("conv-c")}) != 1:
        pytest.skip("fixture texts did not form one bridged cluster")

    got = _labels(delete_convs(ck, ["conv-b"], cfg))
    # the bridge is gone: a and c must no longer share a cluster (they
    # may both drop out as singletons, which cluster_edges omits)
    assert "conv-b" not in got
    if "conv-a" in got or "conv-c" in got:
        assert got.get("conv-a") != got.get("conv-c")


def test_delete_across_incremental_chain(fixture, full_ckpt, tmp_path):
    from apache_datasketches_go_ray.pipelines.dedup import (
        IncrementalDedupPipeline, delete_convs, run_dedup)

    cfg = DedupConfig(num_partitions=4)

    def part(b, want_even):
        nums = np.array([int(c.rsplit("-", 1)[1]) for c in
                         b.column("conv_id").to_pylist()])
        m = nums % 2 == 0
        return b.filter(pa.array(m if want_even else ~m))

    ds_a = _read(fixture).map_batches(
        lambda b: part(b, True), batch_format="pyarrow")
    ds_b = _read(fixture).map_batches(
        lambda b: part(b, False), batch_format="pyarrow")

    ck_a = str(tmp_path / "a")
    run_dedup(ds_a, cfg, checkpoint_dir=ck_a)
    ck_b = str(tmp_path / "b")
    IncrementalDedupPipeline(cfg, ck_a, ck_b).run(ds_b)

    labels = full_ckpt[1]
    multi = {}
    for cid, lab in labels.items():
        multi.setdefault(lab, []).append(cid)
    groups = [sorted(v) for v in multi.values() if len(v) >= 2]
    assert groups
    removed = [groups[0][-1]]

    out_dir = str(tmp_path / "after_delete")
    got = _labels(delete_convs([ck_a, ck_b], removed, cfg,
                               checkpoint_dir=out_dir))
    want = _labels(run_dedup(_without(_read(fixture), removed), cfg))
    assert got == want

    # the consolidated checkpoint chains: a further increment over it
    # must behave like the full corpus minus the removed conv
    import os

    for name in ("assembled", "signatures", "verified", "clusters"):
        assert os.path.isdir(os.path.join(out_dir, name))
