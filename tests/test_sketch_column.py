"""Wire-format HLL sketch column: parquet persistence round-trip,
partition-independence of the merged estimates, and bounds in the
approximate regime. (Bit-level wire parity vs the reference goldens is
pinned by tests/test_serde_compat.py; the SQL gate is
sketch_blob_langs_by_source.)"""

import os

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _tbl(n=3000, keys=6, card=40, seed=4):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n)
    v = rng.integers(0, card, n)
    return pa.table({
        "k": pa.array([f"k{int(x)}" for x in k], type=pa.string()),
        "v": pa.array(v.astype(np.int64)),
    })


@pytest.mark.parametrize("blocks", [1, 7])
def test_exact_regime_roundtrip(ray_session, tmp_path, blocks):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        hll_wire_estimate, hll_wire_sketch_column_by)

    tbl = _tbl()
    col = hll_wire_sketch_column_by(_ds(tbl, blocks), "k", "v", lg_k=12)
    out = os.path.join(str(tmp_path), f"blobs{blocks}")
    col.write_parquet(out)
    back = ray.data.read_parquet(out)
    got = hll_wire_estimate(back, "k").to_pandas()
    got["estimate"] = np.floor(got["estimate"] + 0.5).astype(np.int64)
    got = got.sort_values("k", ignore_index=True)

    df = tbl.to_pandas()
    exp = df.groupby("k")["v"].nunique().reset_index(name="estimate")
    assert list(got["k"]) == list(exp["k"])
    # card=40 per key keeps every sketch in coupon mode => exact
    assert list(got["estimate"]) == list(exp["estimate"])


def test_blobs_are_reference_wire_format(ray_session):
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        hll_wire_sketch_column_by)

    rows = hll_wire_sketch_column_by(_ds(_tbl(), 3), "k", "v",
                                     lg_k=12).take_all()
    for r in rows:
        buf = r["sketch"]
        assert buf[1] == 1    # HLL ser_ver
        assert buf[2] == 7    # Family.HLL id (hll preamble)
        assert buf[3] == 12   # lgK


def test_approx_regime_within_bounds(ray_session):
    from apache_datasketches_go_ray.state.serde_compat import read_hll
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        hll_wire_sketch_column_by)

    rng = np.random.default_rng(11)
    n = 60_000
    tbl = pa.table({
        "k": pa.array(["all"] * n, type=pa.string()),
        "v": pa.array(rng.integers(0, 1 << 62, n).astype(np.int64)),
    })
    rows = hll_wire_sketch_column_by(_ds(tbl, 5), "k", "v",
                                     lg_k=12).take_all()
    assert len(rows) == 1
    sk = read_hll(rows[0]["sketch"])
    true = len(np.unique(tbl.column("v").to_numpy()))
    assert sk.get_lower_bound(3) <= true <= sk.get_upper_bound(3)


@pytest.mark.parametrize("blocks", [1, 6])
def test_freq_wire_column_roundtrip(ray_session, tmp_path, blocks):
    """Frequent-items wire-format column: parquet round-trip + wire-level
    merge reproduce exact per-group top-k in the no-purge regime."""
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        freq_wire_sketch_column_by, freq_wire_top_items)

    rng = np.random.default_rng(8)
    n = 4000
    groups = [f"g{int(x)}" for x in rng.integers(0, 4, n)]
    items = [f"w{int(x)}" for x in rng.zipf(1.6, n) % 50]
    tbl = pa.table({"g": pa.array(groups, type=pa.string()),
                    "i": pa.array(items, type=pa.string())})
    col = freq_wire_sketch_column_by(_ds(tbl, blocks), "g", "i",
                                     max_map_size=1 << 10,
                                     num_partitions=3)
    out = os.path.join(str(tmp_path), f"freq{blocks}")
    col.write_parquet(out)
    got = freq_wire_top_items(
        ray.data.read_parquet(out), "g", k=5).to_pandas().sort_values(
            ["g", "rank"], ignore_index=True)

    df = tbl.to_pandas()
    exp_rows = []
    for g, sub in df.groupby("g"):
        vc = sub["i"].value_counts()
        rows = sorted(((it, int(c)) for it, c in vc.items()),
                      key=lambda t: (-t[1], t[0]))[:5]
        for rank, (it, c) in enumerate(rows):
            exp_rows.append((g, it, c, rank + 1))
    got_rows = [(r.g, r.item, int(r.estimate), int(r.rank))
                for r in got.itertuples()]
    assert got_rows == sorted(exp_rows)


def test_freq_wire_blob_is_reference_format(ray_session):
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        freq_wire_sketch_column_by)

    tbl = pa.table({"g": pa.array(["a"] * 50, type=pa.string()),
                    "i": pa.array([f"w{i % 7}" for i in range(50)],
                                  type=pa.string())})
    rows = freq_wire_sketch_column_by(_ds(tbl, 2), "g", "i",
                                      max_map_size=1 << 10).take_all()
    for r in rows:
        buf = r["sketch"]
        assert buf[1] == 1    # SER_VER
        assert buf[2] == 10   # Family.FREQUENCY id


@pytest.mark.parametrize("card", [30, 5000])
def test_incremental_column_update_equals_full_rebuild(ray_session,
                                                       tmp_path, card):
    """update(column(A), B) must be estimate-identical to column(A∪B) —
    the mergeability contract (hll/union.go:151-158) at column level,
    in both the coupon-exact (card=30) and HLL (card=5000) regimes."""
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        hll_wire_estimate, hll_wire_sketch_column_by,
        hll_wire_update_column)

    rng = np.random.default_rng(13)

    def tbl(n, seed):
        r = np.random.default_rng(seed)
        return pa.table({
            "k": pa.array([f"k{int(x)}" for x in r.integers(0, 5, n)],
                          type=pa.string()),
            "v": pa.array(r.integers(0, card, n).astype(np.int64)),
        })

    A, B = tbl(4000, 1), tbl(2500, 2)
    both = pa.concat_tables([A, B])

    col_a = hll_wire_sketch_column_by(
        ray.data.from_arrow(A).repartition(4), "k", "v", lg_k=12)
    old_dir = os.path.join(str(tmp_path), f"colA{card}")
    col_a.write_parquet(old_dir)

    updated = hll_wire_update_column(
        ray.data.read_parquet(old_dir),
        ray.data.from_arrow(B).repartition(3), "k", "v", lg_k=12)
    full = hll_wire_sketch_column_by(
        ray.data.from_arrow(both).repartition(5), "k", "v", lg_k=12)

    from apache_datasketches_go_ray.state.serde_compat import read_hll

    def state(col_ds):
        rows = {r["k"]: read_hll(r["sketch"]) for r in col_ds.take_all()}
        return rows

    su, sf = state(updated), state(full)
    assert sorted(su) == sorted(sf)
    for g in su:
        a, b = su[g], sf[g]
        if a.registers is not None or b.registers is not None:
            # HLL mode: slotwise-max registers are merge-order-invariant
            # (HIP estimates are path-dependent, in the reference too —
            # compare the canonical state, not the accumulator)
            assert a.registers is not None and b.registers is not None
            assert np.array_equal(a.registers, b.registers)
        else:
            # coupon mode: same coupon SET regardless of arrival order
            assert set(a.coupons) == set(b.coupons)

    got = hll_wire_estimate(updated, "k").to_pandas() \
        .sort_values("k", ignore_index=True)
    exp = hll_wire_estimate(full, "k").to_pandas() \
        .sort_values("k", ignore_index=True)
    assert list(got["k"]) == list(exp["k"])
    # estimates agree exactly in coupon regime; within the published
    # error envelope across different merge trees in HLL mode
    assert np.allclose(got["estimate"], exp["estimate"],
                       rtol=0.0 if card == 30 else 0.05)


def test_freq_incremental_update_equals_full(ray_session, tmp_path):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        freq_wire_sketch_column_by, freq_wire_top_items,
        freq_wire_update_column)

    def tbl(n, seed):
        r = np.random.default_rng(seed)
        return pa.table({
            "g": pa.array([f"g{int(x)}" for x in r.integers(0, 3, n)],
                          type=pa.string()),
            "i": pa.array([f"w{int(x)}" for x in r.zipf(1.7, n) % 40],
                          type=pa.string()),
        })

    A, B = tbl(2500, 3), tbl(1500, 4)
    col_a = freq_wire_sketch_column_by(
        ray.data.from_arrow(A).repartition(3), "g", "i",
        max_map_size=1 << 10)
    old = os.path.join(str(tmp_path), "freqA")
    col_a.write_parquet(old)
    updated = freq_wire_update_column(
        ray.data.read_parquet(old),
        ray.data.from_arrow(B).repartition(2), "g", "i",
        max_map_size=1 << 10)
    full = freq_wire_sketch_column_by(
        ray.data.from_arrow(pa.concat_tables([A, B])).repartition(4),
        "g", "i", max_map_size=1 << 10)
    got = freq_wire_top_items(updated, "g", k=5).to_pandas() \
        .sort_values(["g", "rank"], ignore_index=True)
    exp = freq_wire_top_items(full, "g", k=5).to_pandas() \
        .sort_values(["g", "rank"], ignore_index=True)
    # exact regime (no purge): identical top-k with identical counts
    assert got.values.tolist() == exp.values.tolist()


def test_kll_incremental_update_equals_full(ray_session, tmp_path):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        kll_wire_quantiles, kll_wire_sketch_column_by,
        kll_wire_update_column)

    def tbl(n, seed):
        r = np.random.default_rng(seed)
        return pa.table({
            "g": pa.array([f"g{int(x)}" for x in r.integers(0, 3, n)],
                          type=pa.string()),
            "v": pa.array(r.integers(0, 50_000, n).astype(np.int64)),
        })

    A, B = tbl(1500, 7), tbl(900, 8)
    col_a = kll_wire_sketch_column_by(
        ray.data.from_arrow(A).repartition(3), "g", "v", k=8192)
    old = os.path.join(str(tmp_path), "kllA")
    col_a.write_parquet(old)
    updated = kll_wire_update_column(
        ray.data.read_parquet(old),
        ray.data.from_arrow(B).repartition(2), "g", "v", k=8192)
    got = kll_wire_quantiles(updated, "g").to_pandas() \
        .sort_values("g", ignore_index=True)
    # un-compacted regime: quantiles over A∪B are exact order stats
    df = pa.concat_tables([A, B]).to_pandas()
    for _, row in got.iterrows():
        vals = np.sort(df.loc[df["g"] == row["g"], "v"].to_numpy())
        assert row["n"] == len(vals)
        for p, cname in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            assert row[cname] == vals[int(np.ceil(p * len(vals))) - 1]
