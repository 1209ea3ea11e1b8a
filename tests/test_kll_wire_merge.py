"""Wire-level KLL merge (serde_compat.kll_string_merge — the reference
Merge algorithm, kll/items_sketch.go:555-693) + the persisted KLL sketch
column. Gates: weight conservation through multi-level compaction, wire
round-trip byte identity, exact-regime equivalence to streaming, empty
edges, n/min/max/minK propagation, and rank error no worse than the
golden-validated single-stream update path."""

import os

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.state.serde_compat import (
    KllStringCompatSketch, int_to_fixed_length_string,
    kll_string_compat_from_view, kll_string_merge, read_kll_string,
    write_kll_string,
)


def _weight(sk):
    return sum((sk.levels[lvl + 1] - sk.levels[lvl]) << lvl
               for lvl in range(sk.num_levels))


def _mk(n, seed, k=64):
    rng = np.random.default_rng(seed)
    sk = KllStringCompatSketch(k)
    sk.update_many([int_to_fixed_length_string(int(x), 8)
                    for x in rng.integers(0, 10**6, n)])
    return sk


def _rank_err(sk, allv_sorted, n, p):
    items, w = [], []
    for lvl in range(sk.num_levels):
        seg = sk.items[sk.levels[lvl]:sk.levels[lvl + 1]]
        items += seg
        w += [1 << lvl] * len(seg)
    order = np.argsort(np.asarray(items, dtype=object))
    cw = np.cumsum(np.asarray(w, dtype=np.int64)[order])
    q = np.asarray(items, dtype=object)[order][np.searchsorted(cw, n * p)]
    return abs(np.searchsorted(allv_sorted, int(q)) / n - p)


@pytest.mark.parametrize("na,nb,seed", [(5000, 3000, 1), (200, 40000, 2),
                                        (64, 64, 3), (1, 9999, 4)])
def test_merge_weight_conservation_and_roundtrip(na, nb, seed):
    a, b = _mk(na, seed), _mk(nb, seed + 100)
    kll_string_merge(a, b)
    assert a.n == na + nb
    assert _weight(a) == a.n  # every item weight accounted for exactly
    buf = write_kll_string(a)
    again = write_kll_string(kll_string_compat_from_view(
        read_kll_string(buf)))
    assert again == buf  # wire round-trip is byte-stable


def test_merge_exact_regime_equals_streaming():
    rng1, rng2 = np.random.default_rng(3), np.random.default_rng(4)
    va = [int_to_fixed_length_string(int(x), 8)
          for x in rng1.integers(0, 10**6, 100)]
    vb = [int_to_fixed_length_string(int(x), 8)
          for x in rng2.integers(0, 10**6, 150)]
    a, b = KllStringCompatSketch(8192), KllStringCompatSketch(8192)
    a.update_many(va)
    b.update_many(vb)
    kll_string_merge(a, b)
    assert a.num_levels == 1 and a.n == 250
    assert sorted(a.items[a.levels[0]:a.levels[1]]) == sorted(va + vb)
    assert a.min_item == min(va + vb) and a.max_item == max(va + vb)


def test_merge_empty_edges_and_mink():
    a = _mk(5000, 7)   # estimation mode
    e = KllStringCompatSketch(64)
    kll_string_merge(e, a)  # into empty
    assert e.n == a.n and _weight(e) == e.n
    assert e.min_k == a.min_k
    e2 = KllStringCompatSketch(64)
    before = write_kll_string(a)
    kll_string_merge(a, e2)  # empty other is a no-op
    assert write_kll_string(a) == before


def test_merge_rank_error_no_worse_than_single_stream():
    errs_m, errs_s = [], []
    for seed in range(10):
        r1 = np.random.default_rng(100 + seed)
        r2 = np.random.default_rng(200 + seed)
        w1 = r1.integers(0, 10**6, 8000)
        w2 = r2.integers(0, 10**6, 12000)
        al = np.sort(np.concatenate([w1, w2]))
        x, y = KllStringCompatSketch(64), KllStringCompatSketch(64)
        x.update_many([int_to_fixed_length_string(int(v), 8) for v in w1])
        y.update_many([int_to_fixed_length_string(int(v), 8) for v in w2])
        kll_string_merge(x, y)
        errs_m.append(_rank_err(x, al, 20000, 0.5))
        s = KllStringCompatSketch(64)
        s.update_many([int_to_fixed_length_string(int(v), 8)
                       for v in np.concatenate([w1, w2])])
        errs_s.append(_rank_err(s, al, 20000, 0.5))
    # the deterministic offset=1 update path (reference's own choice)
    # carries systematic drift; merging must not add to it
    assert float(np.mean(errs_m)) <= float(np.mean(errs_s)) + 0.01
    assert max(errs_m) < 0.12


@pytest.mark.parametrize("blocks", [1, 5])
def test_kll_wire_column_roundtrip(ray_session, tmp_path, blocks):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        kll_wire_quantiles, kll_wire_sketch_column_by)

    rng = np.random.default_rng(6)
    n = 3000
    tbl = pa.table({
        "g": pa.array([f"g{int(x)}" for x in rng.integers(0, 4, n)],
                      type=pa.string()),
        "v": pa.array(rng.integers(0, 100_000, n).astype(np.int64)),
    })
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    col = kll_wire_sketch_column_by(ds, "g", "v", k=8192,
                                    num_partitions=3)
    out = os.path.join(str(tmp_path), f"kll{blocks}")
    col.write_parquet(out)
    got = kll_wire_quantiles(
        ray.data.read_parquet(out), "g").to_pandas().sort_values(
            "g", ignore_index=True)

    df = tbl.to_pandas()
    for _, row in got.iterrows():
        vals = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        assert row["n"] == len(vals)
        for p, cname in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            # percentile_disc: 1-based index ceil(p*n)
            assert row[cname] == vals[int(np.ceil(p * len(vals))) - 1]


def test_column_rejects_out_of_domain_values(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        kll_wire_sketch_column_by,
    )

    tbl = pa.table({
        "g": pa.array(["a", "a", "a"], type=pa.string()),
        "v": pa.array(np.array([-9, -5, 3], dtype=np.int64)),
    })
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="fixed-width"):
        kll_wire_sketch_column_by(ds, "g", "v", k=64).materialize()


def test_column_rejects_fractional_floats(ray_session):
    """A float value column with fractional values must reject loudly —
    silent .astype(int64) truncation (3.9 → 3) would corrupt quantiles
    while passing the range check."""
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        kll_wire_sketch_column_by,
    )

    tbl = pa.table({
        "g": pa.array(["a", "a", "a"], type=pa.string()),
        "v": pa.array(np.array([1.0, 3.9, 5.0], dtype=np.float64)),
    })
    with pytest.raises(Exception, match="non-integer"):
        kll_wire_sketch_column_by(
            ray.data.from_arrow(tbl), "g", "v", k=64).materialize()


def test_column_accepts_integral_floats(ray_session):
    """Lossless float→int casts (3.0 → 3) stay accepted."""
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        kll_wire_quantiles, kll_wire_sketch_column_by,
    )

    tbl = pa.table({
        "g": pa.array(["a"] * 5, type=pa.string()),
        "v": pa.array(np.array([1.0, 2.0, 3.0, 4.0, 5.0],
                               dtype=np.float64)),
    })
    col = kll_wire_sketch_column_by(
        ray.data.from_arrow(tbl), "g", "v", k=64)
    got = kll_wire_quantiles(col, "g").to_pandas()
    assert int(got.loc[0, "q50"]) == 3
