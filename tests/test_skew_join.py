"""skew_join: result-identity vs a pandas merge on synthetic skewed
inputs (one mega-key), with the hot path genuinely exercised, plus
hot-key detection bounds. The SQL gate is the skew_join_segment_value
oracle at sf0.01."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _tables(seed=9, n=4000, mega_frac=0.45, n_keys=50):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n).astype(np.int64)
    mega = rng.random(n) < mega_frac
    k[mega] = 7  # one mega-key ~ mega_frac of all rows
    left = pa.table({
        "k": pa.array(k),
        "lv": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })
    rk = np.arange(n_keys, dtype=np.int64)
    right = pa.table({
        "rk": pa.array(rk),
        "rv": pa.array(rng.integers(0, 100, n_keys).astype(np.int64)),
    })
    return left, right


def test_detect_hot_keys_finds_mega_key(ray_session):
    from apache_datasketches_go_ray.stages.join import detect_hot_keys

    left, _ = _tables()
    hot = detect_hot_keys(_ds(left, 6), "k", min_frac=0.1)
    assert 7 in hot
    # nothing even close to 10% besides the mega-key
    assert len(hot) == 1


@pytest.mark.parametrize("blocks", [1, 6])
def test_skew_join_matches_pandas(ray_session, blocks):
    from apache_datasketches_go_ray.stages.join import skew_join

    left, right = _tables()
    got = skew_join(_ds(left, blocks), _ds(right, 2), on=("k", "rk"),
                    min_hot_frac=0.05).to_pandas()
    exp = left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    got = got[key].sort_values(key, ignore_index=True)
    exp = exp[key].sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got, exp)


def test_skew_join_no_hot_keys_falls_back(ray_session):
    from apache_datasketches_go_ray.stages.join import skew_join

    rng = np.random.default_rng(2)
    n = 1000
    left = pa.table({
        "k": pa.array(rng.integers(0, 500, n).astype(np.int64)),
        "lv": pa.array(np.arange(n, dtype=np.int64)),
    })
    right = pa.table({
        "rk": pa.array(np.arange(500, dtype=np.int64)),
        "rv": pa.array(np.arange(500, dtype=np.int64) * 3),
    })
    got = skew_join(_ds(left, 4), _ds(right, 2), on=("k", "rk"),
                    min_hot_frac=0.5).to_pandas()
    exp = left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key, ignore_index=True),
        exp[key].sort_values(key, ignore_index=True))


@pytest.mark.parametrize("blocks", [1, 4])
def test_skew_join_string_keys(ray_session, blocks):
    """skew_join is a drop-in for hash_join: string join keys must work
    through the frequent-items pass and the hot/cold split."""
    from apache_datasketches_go_ray.stages.join import skew_join

    rng = np.random.default_rng(5)
    n = 2000
    k = np.array([f"user{int(x)}" for x in rng.integers(0, 40, n)],
                 dtype=object)
    k[rng.random(n) < 0.4] = "mega"  # hot string key
    left = pa.table({
        "k": pa.array(list(k), type=pa.string()),
        "lv": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })
    rk = [f"user{i}" for i in range(40)] + ["mega"]
    right = pa.table({
        "rk": pa.array(rk, type=pa.string()),
        "rv": pa.array(np.arange(len(rk), dtype=np.int64)),
    })
    got = skew_join(_ds(left, blocks), _ds(right, 2), on=("k", "rk"),
                    min_hot_frac=0.1).to_pandas()
    exp = left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key, ignore_index=True),
        exp[key].sort_values(key, ignore_index=True))
