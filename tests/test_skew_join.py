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


@pytest.mark.parametrize("ktype,null_tail", [
    (pa.int64(), [None, None]),
    (pa.string(), [None, None]),
])
def test_skew_join_nullable_keys(ray_session, ktype, null_tail):
    """Nulls in the join key column must not break the frequent-items
    detection pass (int64→float64 NaN via to_numpy; None breaking
    np.unique's string sort) — skew_join stays a drop-in for
    hash_join, which drops null-key rows like SQL inner join."""
    from apache_datasketches_go_ray.stages.join import skew_join

    rng = np.random.default_rng(17)
    n = 1200
    if ktype == pa.int64():
        k = list(rng.integers(0, 30, n).astype(np.int64))
        k[: n // 3] = [7] * (n // 3)  # hot key
        rk = list(range(30))
    else:
        k = [f"u{int(x)}" for x in rng.integers(0, 30, n)]
        k[: n // 3] = ["mega"] * (n // 3)
        rk = [f"u{i}" for i in range(30)] + ["mega"]
    k = k + null_tail
    left = pa.table({
        "k": pa.array(k, type=ktype),
        "lv": pa.array(np.arange(len(k), dtype=np.int64)),
    })
    right = pa.table({
        "rk": pa.array(rk, type=ktype),
        "rv": pa.array(np.arange(len(rk), dtype=np.int64) * 3),
    })
    got = skew_join(_ds(left, 4), _ds(right, 2), on=("k", "rk"),
                    min_hot_frac=0.1).to_pandas()
    exp = left.to_pandas().dropna(subset=["k"]).merge(
        right.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key, ignore_index=True).reset_index(drop=True),
        exp[key].sort_values(key, ignore_index=True).reset_index(drop=True),
        check_dtype=False)


def test_skew_join_right_side_hot_key(ray_session):
    """A key cold on the left but hot on the right must still be routed
    off the shuffle path (both-side detection), and the join result
    must stay identical to a plain merge."""
    from apache_datasketches_go_ray.stages.join import skew_join

    rng = np.random.default_rng(23)
    nl, nr = 300, 3000
    left = pa.table({
        "k": pa.array(np.arange(nl, dtype=np.int64) % 100),
        "lv": pa.array(np.arange(nl, dtype=np.int64)),
    })
    rk = rng.integers(0, 100, nr).astype(np.int64)
    rk[: nr // 2] = 42  # hot only on the right
    right = pa.table({
        "rk": pa.array(rk),
        "rv": pa.array(np.arange(nr, dtype=np.int64)),
    })
    got = skew_join(_ds(left, 4), _ds(right, 4), on=("k", "rk"),
                    min_hot_frac=0.2).to_pandas()
    exp = left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key, ignore_index=True).reset_index(drop=True),
        exp[key].sort_values(key, ignore_index=True).reset_index(drop=True))


def test_skew_join_broadcast_cap_falls_back(ray_session):
    """When the hot slice of the right side exceeds the broadcast cap,
    skew_join must fall back to the shuffle path and still return the
    exact join result."""
    from apache_datasketches_go_ray.stages.join import skew_join

    left, right = _tables()
    got = skew_join(_ds(left, 4), _ds(right, 2), on=("k", "rk"),
                    min_hot_frac=0.05,
                    broadcast_cap_bytes=1).to_pandas()
    exp = left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="rk").drop(columns=["rk"])
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key, ignore_index=True),
        exp[key].sort_values(key, ignore_index=True))
