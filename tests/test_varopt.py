"""VarOpt-style weighted sampling sketch (state/varopt.py): exact
regime, merge parity across partitionings, heavy-item preservation,
estimator sanity, serde round-trip, distributed stage parity."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.state.varopt import VarOptSketch


def _fixture(n=500, seed=3):
    rng = np.random.RandomState(seed)
    items = [f"item-{i:05d}" for i in range(n)]
    weights = rng.pareto(1.5, size=n) * 10 + 0.5
    return items, weights


def test_exact_regime_keeps_everything():
    items, weights = _fixture(50)
    sk = VarOptSketch(64)
    sk.update_many(items, weights)
    rows = sk.result()
    assert sk.tau == 0.0
    assert len(rows) == 50
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    for it, w in zip(items, weights):
        assert got[it] == (pytest.approx(w), pytest.approx(w), True)


def test_merge_parity_across_partitionings():
    items, weights = _fixture(500)
    single = VarOptSketch(32)
    single.update_many(items, weights)
    for n_parts in (2, 5, 9):
        parts = []
        for i in range(n_parts):
            p = VarOptSketch(32)
            p.update_many(items[i::n_parts], weights[i::n_parts])
            parts.append(p)
        merged = parts[0]
        # merge in reverse order too — associativity/commutativity
        for p in parts[:0:-1]:
            merged.merge(p)
        assert merged.result() == single.result()
        assert merged.tau == single.tau
        assert merged.total_weight == pytest.approx(single.total_weight)


def test_heavy_item_always_retained_exact():
    items, weights = _fixture(500)
    weights = list(weights)
    items.append("whale")
    weights.append(1e9)
    sk = VarOptSketch(16)
    sk.update_many(items, weights)
    rows = {r[0]: r for r in sk.result()}
    assert "whale" in rows
    _, w, adj, heavy = rows["whale"]
    assert w == adj == 1e9 and heavy
    assert len(sk.result()) == 16


def test_subset_sum_estimator_reasonable():
    items, weights = _fixture(2000, seed=11)
    sk = VarOptSketch(256)
    sk.update_many(items, weights)
    truth = sum(w for it, w in zip(items, weights)
                if it.endswith(("0", "1", "2")))
    est = sk.estimate_subset_sum(
        lambda it: it.endswith(("0", "1", "2")))["estimate"]
    assert est == pytest.approx(truth, rel=0.35)
    # full-stream total is exact
    assert sk.estimate_subset_sum()["estimate"] == \
        pytest.approx(sum(weights))


def test_serde_round_trip():
    items, weights = _fixture(300)
    sk = VarOptSketch(32)
    sk.update_many(items, weights)
    rt = VarOptSketch.from_bytes(sk.to_bytes())
    assert rt.result() == sk.result()
    assert rt.tau == sk.tau
    assert rt.total_weight == pytest.approx(sk.total_weight)
    assert rt.n_stream == sk.n_stream
    rt.merge(sk)  # still mergeable after round-trip


def test_distributed_stage_matches_local(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import varopt_sample

    items, weights = _fixture(800, seed=7)
    tbl = pa.table({"item": pa.array(items, type=pa.string()),
                    "w": pa.array(weights, type=pa.float64())})
    local = VarOptSketch(48)
    local.update_many(items, weights)
    want = [(r[0], pytest.approx(r[1]), pytest.approx(r[2]), r[3])
            for r in local.result()]
    for nblocks in (3, 13):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = varopt_sample(ds, "item", "w", 48)
        got = list(zip(out.column("item").to_pylist(),
                       out.column("weight").to_pylist(),
                       out.column("adjusted_weight").to_pylist(),
                       out.column("is_heavy").to_pylist()))
        assert got == want


def test_grouped_varopt_matches_per_group_local(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        varopt_sample_by,
    )

    items, weights = _fixture(600, seed=13)
    groups = [f"g{i % 5}" for i in range(600)]
    tbl = pa.table({"src": pa.array(groups), "item": pa.array(items),
                    "w": pa.array(weights, type=pa.float64())})
    want = {}
    for g in sorted(set(groups)):
        sk = VarOptSketch(24)
        sel = [i for i, gg in enumerate(groups) if gg == g]
        sk.update_many([items[i] for i in sel],
                       [weights[i] for i in sel])
        want[g] = [(r[0], round(r[1], 9), round(r[2], 9), r[3])
                   for r in sk.result()]
    for nblocks in (2, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = varopt_sample_by(ds, "src", "item", "w", k=24,
                               num_partitions=3)
        got = {}
        for r in out.take_all():
            got.setdefault(r["src"], []).append(
                (r["item"], round(r["weight"], 9),
                 round(r["adjusted_weight"], 9), r["is_heavy"]))
        assert got == want, nblocks
