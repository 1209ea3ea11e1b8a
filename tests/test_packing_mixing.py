"""Sequence packing + domain-mixture reweighting invariants (value
exactness vs DuckDB is pinned by tools/check_oracle.py at sf0.01)."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.packing import (
    _pack_group,
    pack_sequences,
)


def test_pack_group_greedy_semantics():
    # budget 10: [4,4,4] -> packs [0,0,1]; oversized doc own pack
    assert _pack_group(np.array([4, 4, 4]), 10).tolist() == [0, 0, 1]
    assert _pack_group(np.array([12]), 10).tolist() == [0]
    assert _pack_group(np.array([12, 3, 8, 25, 1]), 10).tolist() == \
        [0, 1, 2, 3, 4]
    assert _pack_group(np.array([3, 7, 25, 1]), 10).tolist() == \
        [0, 0, 1, 2]
    assert _pack_group(np.array([10, 10]), 10).tolist() == [0, 1]
    assert _pack_group(np.array([], dtype=np.int64), 10).tolist() == []


def test_pack_group_matches_sequential_reference():
    rng = np.random.default_rng(5)
    toks = rng.integers(1, 40, 500)
    got = _pack_group(toks, 64)
    pack, filled, ref = 0, 0, []
    for t in toks:
        if filled + t > 64 and filled > 0:
            pack += 1
            filled = 0
        filled += t
        ref.append(pack)
    assert got.tolist() == ref


def test_pack_sequences_partition_independent(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "n_tokens": pa.array(rng.integers(1, 60, n), type=pa.int64()),
    })
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = pack_sequences(ds, budget=128, n_parts=4,
                             tok_col="n_tokens", id_col="doc_id") \
            .to_pandas().sort_values("doc_id", ignore_index=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    # every pack respects the budget unless it is a single oversized doc
    g = outs[0].groupby("pack_id")["n_tokens"].agg(["sum", "count"])
    bad = g[(g["sum"] > 128) & (g["count"] > 1)]
    assert bad.empty
    # all docs packed exactly once
    assert len(outs[0]) == n


def test_reweight_sample_mixture(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.mixing import reweight_sample

    n = 30_000
    rng = np.random.default_rng(3)
    src = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "source": pa.array(src, type=pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = reweight_sample(ds, "source", {"a": 0.2, "b": 0.3, "c": 0.5},
                          "doc_id").to_pandas()
    shares = out["source"].value_counts(normalize=True)
    # c is the scarce domain: rate 1.0, so ~all of c survives and the
    # sample realizes the target mixture within binomial noise
    assert abs(shares["c"] - 0.5) < 0.03
    assert abs(shares["b"] - 0.3) < 0.03
    assert abs(shares["a"] - 0.2) < 0.03
    # deterministic across partitionings
    out2 = reweight_sample(ds.repartition(11), "source",
                           {"a": 0.2, "b": 0.3, "c": 0.5},
                           "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_reweight_sample_drops_unweighted_group(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.mixing import reweight_sample

    tbl = pa.table({
        "doc_id": pa.array(np.arange(100), type=pa.int64()),
        "source": pa.array(["keep"] * 50 + ["drop"] * 50),
    })
    out = reweight_sample(ray.data.from_arrow(tbl), "source",
                          {"keep": 1.0}, "doc_id").to_pandas()
    assert set(out["source"]) == {"keep"}
    assert len(out) == 50

    with pytest.raises(ValueError):
        reweight_sample(ray.data.from_arrow(tbl), "source",
                        {"absent": 1.0}, "doc_id")
