"""Unit tests for the windowed / relational stages (windows.py,
relational.py, asof.py) against exact pandas/duckdb ground truth on
small deterministic in-memory tables."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

BASE = datetime.datetime(2024, 1, 1)


def _events(n_users=7, n_events=400, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, n_events)
    # bursts with occasional >30min gaps
    gaps = rng.choice([60, 300, 2400 * 60], size=n_events,
                      p=[0.6, 0.3, 0.1])
    ts = np.cumsum(gaps) + user * 977  # interleave users
    value = np.round(rng.uniform(0, 50, n_events), 2)
    return pa.table({
        "event_id": pa.array(np.arange(n_events), type=pa.int64()),
        "user_id": pa.array(user, type=pa.int64()),
        "ts": pa.array([BASE + datetime.timedelta(seconds=int(s))
                        for s in ts], type=pa.timestamp("us")),
        "value": pa.array(value, type=pa.float64()),
    })


@pytest.fixture(scope="module")
def events_tbl(ray_session):
    return _events()


def test_sessionize_matches_pandas(events_tbl):
    from apache_datasketches_go_ray.stages.windows import sessionize

    out = sessionize(ray.data.from_arrow(events_tbl), gap_minutes=30,
                     num_partitions=4).to_pandas() \
        .sort_values(["user_id", "session_no"], ignore_index=True)

    df = events_tbl.to_pandas()
    df["cents"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    rows = []
    for uid, g in df.groupby("user_id"):
        sess, last = 0, None
        for _, r in g.iterrows():
            if last is None or (r["ts"] - last) > pd.Timedelta(minutes=30):
                sess += 1
                rows.append({"user_id": uid, "session_no": sess,
                             "n_events": 0, "start_ts": r["ts"],
                             "end_ts": r["ts"], "sum_cents": 0})
            rows[-1]["n_events"] += 1
            rows[-1]["end_ts"] = r["ts"]
            rows[-1]["sum_cents"] += r["cents"]
            last = r["ts"]
    exp = pd.DataFrame(rows)
    assert len(out) == len(exp)
    for col in ["user_id", "session_no", "n_events", "sum_cents"]:
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert (pd.to_datetime(out["start_ts"]).to_numpy()
            == exp["start_ts"].to_numpy()).all()
    assert (pd.to_datetime(out["end_ts"]).to_numpy()
            == exp["end_ts"].to_numpy()).all()


def test_running_sum_matches_pandas(events_tbl):
    from apache_datasketches_go_ray.stages.windows import running_sum

    out = running_sum(ray.data.from_arrow(events_tbl),
                      num_partitions=4).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    df = events_tbl.to_pandas()
    df["cents"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    df["row_no"] = df.groupby("user_id").cumcount() + 1
    df["run_cents"] = df.groupby("user_id")["cents"].cumsum()
    exp = df.sort_values("event_id", ignore_index=True)
    assert (out["row_no"].to_numpy() == exp["row_no"].to_numpy()).all()
    assert (out["run_cents"].to_numpy()
            == exp["run_cents"].to_numpy()).all()


def test_top_k_exact(ray_session):
    from apache_datasketches_go_ray.stages.relational import top_k

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, 5000)
    t = pa.table({"id": pa.array(np.arange(5000), type=pa.int64()),
                  "v": pa.array(vals, type=pa.int64())})
    out = top_k(ray.data.from_arrow(t).repartition(8),
                [("v", "descending"), ("id", "ascending")], k=12) \
        .to_pandas()
    exp = t.to_pandas().sort_values(["v", "id"],
                                    ascending=[False, True]).head(12)
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()


def test_distinct_count_by(ray_session):
    from apache_datasketches_go_ray.stages.relational import distinct_count_by

    rng = np.random.default_rng(11)
    g = rng.integers(0, 5, 3000)
    v = rng.integers(0, 40, 3000)
    t = pa.table({"g": pa.array(g, type=pa.int64()),
                  "v": pa.array(v, type=pa.int64())})
    out = distinct_count_by(ray.data.from_arrow(t).repartition(6),
                            "g", "v", num_partitions=4).to_pandas() \
        .sort_values("g", ignore_index=True)
    exp = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    assert (out["n_distinct"].to_numpy() == exp.to_numpy()).all()


def test_semi_anti_join_partition(ray_session):
    from apache_datasketches_go_ray.stages.relational import (
        anti_join, semi_join,
    )

    left = pa.table({"k": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                     "x": pa.array(list("abcdef"))})
    right = pa.table({"rk": pa.array([2, 4, 4, 6, 9], type=pa.int64())})
    lds = ray.data.from_arrow(left).repartition(3)
    rds = ray.data.from_arrow(right).repartition(2)
    semi = semi_join(lds, rds, on=("k", "rk")).to_pandas() \
        .sort_values("k", ignore_index=True)
    anti = anti_join(lds, rds, on=("k", "rk")).to_pandas() \
        .sort_values("k", ignore_index=True)
    assert semi["k"].tolist() == [2, 4, 6]
    assert anti["k"].tolist() == [1, 3, 5]
    # semi + anti partition the left side exactly
    assert len(semi) + len(anti) == len(left)


def test_asof_join_matches_duckdb(events_tbl, ray_session):
    import duckdb
    from apache_datasketches_go_ray.stages.asof import asof_join

    rng = np.random.default_rng(5)
    n = 60
    right = pa.table({
        "o_key": pa.array(rng.integers(0, 7, n), type=pa.int64()),
        "o_ts": pa.array([BASE + datetime.timedelta(
            seconds=int(s)) for s in rng.integers(0, 3_000_000, n)],
            type=pa.timestamp("us")),
        "o_id": pa.array(np.arange(n), type=pa.int64()),
    })
    out = asof_join(
        ray.data.from_arrow(events_tbl).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        on=("user_id", "o_key"), ts=("ts", "o_ts"), tie_break="o_id",
        left_cols=["event_id"], right_cols=["o_id"],
        num_partitions=4).to_pandas().sort_values("event_id",
                                                  ignore_index=True)
    con = duckdb.connect()
    con.register("ev", events_tbl.to_pandas())
    con.register("rt", right.to_pandas())
    exp = con.execute("""
        WITH m AS (
          SELECT e.event_id, r.o_id,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY r.o_ts DESC, r.o_id DESC)
                   AS rn
          FROM ev e JOIN rt r
            ON r.o_key = e.user_id AND r.o_ts <= e.ts
        )
        SELECT event_id, o_id FROM m WHERE rn = 1 ORDER BY event_id
    """).df()
    assert len(out) == len(exp)
    assert (out["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    assert (out["o_id"].to_numpy() == exp["o_id"].to_numpy()).all()


def test_ngram_hashes_properties():
    from apache_datasketches_go_ray.stages.dedup_extras import _ngram_hashes

    tok = np.array([10, 20, 30, 40], dtype=np.uint64)
    bi = _ngram_hashes(tok, 2)
    assert len(bi) == 3
    # order-sensitive: (10,20) != (20,10)
    rev = _ngram_hashes(tok[::-1].copy(), 2)
    assert set(bi.tolist()).isdisjoint(rev.tolist())
    # deterministic
    assert (bi == _ngram_hashes(tok, 2)).all()
    # n=1 identity; short input -> empty
    assert (_ngram_hashes(tok, 1) == tok).all()
    assert len(_ngram_hashes(tok[:1], 2)) == 0


def test_range_sort_global_order(ray_session):
    from apache_datasketches_go_ray.stages.relational import range_sort

    rng = np.random.default_rng(23)
    vals = rng.normal(100, 40, 20_000)
    t = pa.table({"id": pa.array(np.arange(20_000), type=pa.int64()),
                  "v": pa.array(vals, type=pa.float64())})
    out = range_sort(ray.data.from_arrow(t).repartition(8), "v",
                     num_partitions=6).to_pandas()
    assert len(out) == 20_000
    # ranges are disjoint across partitions and sorted within each
    parts = sorted(out["__part"].unique())
    prev_max = -np.inf
    for p in parts:
        sub = out[out["__part"] == p]["v"].to_numpy()
        assert (np.diff(sub) >= 0).all()          # intra-block sorted
        assert sub[0] >= prev_max                  # disjoint ranges
        prev_max = sub[-1]
    # global multiset preserved
    assert np.allclose(np.sort(out["v"].to_numpy()), np.sort(vals))
    # balanced-ish partitions (KLL boundaries, not hash): no partition
    # holds more than 3x its fair share
    sizes = out.groupby("__part").size()
    assert sizes.max() <= 3 * 20_000 / len(parts)


def test_interval_join_agg_matches_duckdb(events_tbl, ray_session):
    import duckdb
    from apache_datasketches_go_ray.stages.rangejoin import (
        interval_join_agg,
    )

    # right side restricted to even users -> odd-user windows must
    # surface with count 0 / sum 0 (left-outer semantics)
    right = events_tbl.filter(
        pa.compute.equal(pa.compute.bit_wise_and(
            events_tbl.column("user_id"), 1), 0))
    out = interval_join_agg(
        ray.data.from_arrow(events_tbl).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        on=("user_id", "user_id"), ts=("ts", "ts"),
        window_us=30 * 60 * 1_000_000, left_cols=["event_id"],
        right_val="value", count_name="n_in", sum_name="sum_c",
        num_partitions=4).to_pandas().sort_values(
            "event_id", ignore_index=True)
    con = duckdb.connect()
    con.register("ev", events_tbl.to_pandas())
    con.register("rt", right.to_pandas())
    exp = con.execute("""
        SELECT s.event_id,
               CAST(count(e.user_id) AS BIGINT) AS n_in,
               CAST(coalesce(sum(CAST(round(e.value * 100) AS BIGINT)),
                             0) AS BIGINT) AS sum_c
        FROM ev s LEFT JOIN rt e
          ON e.user_id = s.user_id
         AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 30 MINUTE
        GROUP BY s.event_id ORDER BY s.event_id
    """).df()
    assert len(out) == len(exp) == len(events_tbl)
    assert (out["n_in"] == 0).any()  # the planted zero-match windows
    for col in ("event_id", "n_in", "sum_c"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_interval_join_agg_empty_and_boundaries(ray_session):
    from apache_datasketches_go_ray.stages.rangejoin import (
        interval_join_agg,
    )

    # window [t, t+10): right rows exactly at start count, at end do not
    t0 = BASE
    left = pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([t0, t0], type=pa.timestamp("us")),
        "lid": pa.array([10, 20], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 1, 3], type=pa.int64()),
        "ts": pa.array([t0, t0 + datetime.timedelta(microseconds=9),
                        t0 + datetime.timedelta(microseconds=10), t0],
                       type=pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0], type=pa.float64()),
    })
    out = interval_join_agg(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on=("k", "k"), ts=("ts", "ts"), window_us=10, left_cols=["lid"],
        right_val="value", count_name="n", sum_name="s",
        num_partitions=2).to_pandas().sort_values("lid",
                                                  ignore_index=True)
    assert out["lid"].tolist() == [10, 20]
    assert out["n"].tolist() == [2, 0]  # start inclusive, end exclusive
    assert out["s"].tolist() == [300, 0]


def test_sliding_window_sum_matches_duckdb(events_tbl, ray_session):
    import duckdb
    from apache_datasketches_go_ray.stages.windows import (
        sliding_window_sum,
    )

    out = sliding_window_sum(
        ray.data.from_arrow(events_tbl).repartition(4), preceding=2,
        num_partitions=4).to_pandas().sort_values(
            "event_id", ignore_index=True)
    con = duckdb.connect()
    con.register("ev", events_tbl.to_pandas())
    exp = con.execute("""
        SELECT event_id,
               CAST(count(*) OVER w AS BIGINT) AS win_n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS win_cents
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """).df()
    for col in ("event_id", "win_n", "win_cents"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col


def _brute_skyline(mx, mn):
    keep = []
    for i in range(len(mx)):
        dominated = any(
            (mx[j] >= mx[i] and mn[j] <= mn[i])
            and (mx[j] > mx[i] or mn[j] < mn[i])
            for j in range(len(mx)))
        keep.append(not dominated)
    return keep


def test_pareto_skyline_brute_parity(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.relational import (
        pareto_skyline_2d)

    rng = np.random.default_rng(7)
    n = 400
    mx = rng.integers(0, 50, n).astype(np.int64)
    mn = rng.integers(0, 50, n).astype(np.int64)
    # inject exact duplicates of one extreme point: all must survive
    mx[:3] = mx.max() + 5
    mn[:3] = mn.min() - 5
    tbl = pa.table({"rid": pa.array(np.arange(n), type=pa.int64()),
                    "mx": pa.array(mx), "mn": pa.array(mn)})
    want = {int(r) for r, k in
            zip(range(n), _brute_skyline(mx, mn)) if k}
    for parts in (1, 7):
        out = pareto_skyline_2d(
            ray.data.from_arrow(tbl).repartition(parts),
            "mx", "mn", carry=["rid"]).take_all()
        got = {int(r["rid"]) for r in out}
        assert got == want, parts
    assert {0, 1, 2} <= want  # the duplicated extreme survives x3


def test_exact_global_kth_matches_sort(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.relational import (
        exact_global_kth)

    rng = np.random.default_rng(11)
    v = rng.integers(-10**12, 10**12, 5000).astype(np.int64)
    v[:10] = v[0]  # heavy duplicate run
    s = np.sort(v)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)})) \
        .repartition(6)
    for k in (1, 2, len(v) // 2, len(v) - 1, len(v)):
        res = exact_global_kth(ds, "v", k, num_buckets=16,
                               gather_threshold=64)
        assert res["value"] == int(s[k - 1]), k
        assert res["n"] == len(v)
        assert res["rounds"] >= 2  # forced the multi-round path


def test_exact_global_kth_bounds(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from apache_datasketches_go_ray.stages.relational import (
        exact_global_kth)

    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array(np.array([3, 1, 2], dtype=np.int64))}))
    assert exact_global_kth(ds, "v", 1)["value"] == 1
    assert exact_global_kth(ds, "v", 3)["value"] == 3
    with pytest.raises(ValueError):
        exact_global_kth(ds, "v", 0)
    with pytest.raises(ValueError):
        exact_global_kth(ds, "v", 4)
