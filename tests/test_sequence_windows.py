"""Tests for the ordered-sequence / ranking operators added on top of
the base window suite: lag, time-range sliding window, dense_rank,
event paths (ordered string_agg), funnel depth, top-n per group, exact
grouped quantiles and global ntile — each against an exact DuckDB
window/aggregate oracle on a small deterministic table."""

import datetime

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

BASE = datetime.datetime(2024, 3, 1)


def _events(n_users=9, n_events=600, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, n_events)
    gaps = rng.choice([30, 900, 7200], size=n_events, p=[0.5, 0.35, 0.15])
    ts = np.cumsum(gaps) + user * 131
    value = np.round(rng.uniform(0, 80, n_events), 2)
    etype = rng.choice(["view", "click", "purchase", "error"], n_events,
                       p=[0.4, 0.3, 0.15, 0.15])
    return pa.table({
        "event_id": pa.array(np.arange(n_events), type=pa.int64()),
        "user_id": pa.array(user, type=pa.int64()),
        "ts": pa.array([BASE + datetime.timedelta(seconds=int(s))
                        for s in ts], type=pa.timestamp("us")),
        "event_type": pa.array(etype.tolist(), type=pa.string()),
        "value": pa.array(value, type=pa.float64()),
    })


@pytest.fixture(scope="module")
def events_tbl(ray_session):
    return _events()


@pytest.fixture(scope="module")
def con(events_tbl):
    c = duckdb.connect()
    c.register("events_arrow", events_tbl)
    c.execute("CREATE VIEW events AS SELECT * FROM events_arrow")
    return c


def _cmp(mine: pd.DataFrame, oracle: pd.DataFrame):
    cols = sorted(mine.columns)
    assert cols == sorted(oracle.columns)
    m = mine[cols].sort_values(cols, ignore_index=True)
    o = oracle[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(m, o, check_dtype=False)


def test_lag_delta(events_tbl, con):
    from apache_datasketches_go_ray.stages.windows import lag_delta

    mine = lag_delta(ray.data.from_arrow(events_tbl),
                     num_partitions=4).to_pandas()
    oracle = con.execute("""
        WITH t AS (SELECT event_id, user_id, ts,
                          cast(round(value*100) AS bigint) AS cents
                   FROM events)
        SELECT event_id, user_id,
               lag(cents, 1, 0) OVER w AS prev_cents,
               cents - lag(cents, 1, 0) OVER w AS delta_cents
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).df()
    _cmp(mine, oracle)


def test_time_window_sum(events_tbl, con):
    from apache_datasketches_go_ray.stages.windows import time_window_sum

    mine = time_window_sum(ray.data.from_arrow(events_tbl),
                           preceding_seconds=1800,
                           num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT event_id, user_id,
               count(*) OVER w AS win_n,
               sum(cast(round(value*100) AS bigint)) OVER w AS win_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                     AND CURRENT ROW)
    """).df()
    _cmp(mine, oracle)


def test_time_window_peer_rows_included(ray_session):
    """RANGE frames are peer-inclusive: rows sharing the current ts
    count even when they sort later within the key."""
    from apache_datasketches_go_ray.stages.windows import time_window_sum

    t = pa.table({
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "user_id": pa.array([7, 7, 7], type=pa.int64()),
        "ts": pa.array([BASE, BASE, BASE], type=pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0], type=pa.float64()),
    })
    out = time_window_sum(ray.data.from_arrow(t), preceding_seconds=60,
                          num_partitions=1).to_pandas()
    assert set(out["win_n"]) == {3}
    assert set(out["win_cents"]) == {700}


def test_dense_rank(events_tbl, con):
    from apache_datasketches_go_ray.stages.windows import dense_rank_in_group

    ds = ray.data.from_arrow(events_tbl)
    mine = dense_rank_in_group(ds, "user_id", "value", "event_id",
                               num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT event_id, user_id, value,
               dense_rank() OVER (PARTITION BY user_id
                                  ORDER BY value DESC) AS rnk
        FROM events
    """).df()
    _cmp(mine, oracle)


def test_event_paths(events_tbl, con):
    from apache_datasketches_go_ray.stages.sequence import event_paths

    mine = event_paths(ray.data.from_arrow(events_tbl),
                       num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT user_id, count(*) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id
    """).df()
    _cmp(mine, oracle)


def test_funnel_depth(events_tbl, con):
    from apache_datasketches_go_ray.stages.sequence import funnel_depth

    mine = funnel_depth(ray.data.from_arrow(events_tbl),
                        ["view", "click", "purchase"],
                        num_partitions=4).to_pandas()
    oracle = con.execute("""
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t2
               FROM events e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t3
               FROM events e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
               GROUP BY 1)
        SELECT u.user_id,
               CASE WHEN s3.t3 IS NOT NULL THEN 3
                    WHEN s2.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
               s1.t1 AS t_first, coalesce(s3.t3, s2.t2, s1.t1) AS t_deepest
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """).df()
    _cmp(mine, oracle)


def test_funnel_requires_order(ray_session):
    """A purchase BEFORE the first view must not complete the funnel."""
    from apache_datasketches_go_ray.stages.sequence import funnel_depth

    def row(i, uid, secs, et):
        return {"event_id": i, "user_id": uid,
                "ts": BASE + datetime.timedelta(seconds=secs),
                "event_type": et}

    rows = [row(1, 1, 0, "purchase"), row(2, 1, 10, "view"),
            row(3, 1, 20, "click"),
            row(4, 2, 0, "view"), row(5, 2, 5, "click"),
            row(6, 2, 9, "purchase")]
    t = pa.Table.from_pylist(rows)
    out = funnel_depth(ray.data.from_arrow(t),
                       ["view", "click", "purchase"],
                       num_partitions=1).to_pandas() \
        .set_index("user_id")["depth"].to_dict()
    assert out == {1: 2, 2: 3}


def test_top_n_per_group(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import top_n_per_group

    ds = ray.data.from_arrow(events_tbl).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "cents": pa.compute.round(
                pa.compute.multiply(b.column("value"), 100))
            .cast(pa.int64()),
        }), batch_format="pyarrow")
    mine = top_n_per_group(ds, "user_id", "cents", "event_id", 4,
                           num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT user_id, event_id,
               cast(round(value*100) AS bigint) AS cents,
               row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY cast(round(value*100) AS bigint) DESC,
                          event_id) AS rnk
        FROM events QUALIFY rnk <= 4
    """).df()
    _cmp(mine, oracle)


def test_grouped_quantile_disc(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
    )

    ds = ray.data.from_arrow(events_tbl).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "cents": pa.compute.round(
                pa.compute.multiply(b.column("value"), 100))
            .cast(pa.int64()),
        }), batch_format="pyarrow")
    mine = grouped_quantile_disc(ds, "user_id", "cents",
                                 (0.1, 0.5, 0.9),
                                 num_partitions=4).to_pandas()
    mine = mine.rename(columns={"user_id": "k"})
    oracle = con.execute("""
        SELECT user_id AS k,
               quantile_disc(cast(round(value*100) AS bigint), 0.1) AS q10,
               quantile_disc(cast(round(value*100) AS bigint), 0.5) AS q50,
               quantile_disc(cast(round(value*100) AS bigint), 0.9) AS q90
        FROM events GROUP BY user_id
    """).df()
    _cmp(mine, oracle)


@pytest.mark.parametrize("k", [3, 4, 7])
def test_global_ntile(events_tbl, con, k):
    from apache_datasketches_go_ray.stages.relational import global_ntile

    mine = global_ntile(ray.data.from_arrow(events_tbl), "value",
                        "event_id", k, num_partitions=5).to_pandas()
    oracle = con.execute(f"""
        SELECT event_id, value,
               ntile({k}) OVER (ORDER BY value, event_id) AS bucket
        FROM events
    """).df()
    _cmp(mine, oracle)


def test_set_op_keys(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import set_op_keys

    left = ray.data.from_arrow(events_tbl)
    right_tbl = pa.table({
        "uid": pa.array([0, 1, 2, 3, 100, 200], type=pa.int64())})
    right = ray.data.from_arrow(right_tbl)
    con.register("right_arrow", right_tbl)
    inter = set_op_keys(left, right, ("user_id", "uid"), "intersect",
                        num_partitions=3).to_pandas()
    exc = set_op_keys(left, right, ("user_id", "uid"), "except",
                      num_partitions=3).to_pandas()
    o_inter = con.execute("""
        SELECT DISTINCT user_id FROM events
        INTERSECT SELECT DISTINCT uid FROM right_arrow""").df()
    o_exc = con.execute("""
        SELECT DISTINCT user_id FROM events
        EXCEPT SELECT DISTINCT uid FROM right_arrow""").df()
    _cmp(inter, o_inter)
    _cmp(exc, o_exc)


def test_grouped_quantile_cont(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_cont,
    )

    ds = ray.data.from_arrow(events_tbl).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "value": b.column("value"),
        }), batch_format="pyarrow")
    mine = grouped_quantile_cont(ds, "user_id", "value", (0.5, 0.9),
                                 num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT user_id, quantile_cont(value, 0.5) AS q50,
               quantile_cont(value, 0.9) AS q90
        FROM events GROUP BY user_id
    """).df()
    _cmp(mine, oracle)


def test_share_of_group(events_tbl, con):
    from apache_datasketches_go_ray.stages.windows import share_of_group

    mine = share_of_group(ray.data.from_arrow(events_tbl),
                          num_partitions=4).to_pandas()
    oracle = con.execute("""
        WITH t AS (SELECT event_id, user_id,
                          cast(round(value*100) AS bigint) AS cents
                   FROM events)
        SELECT event_id, user_id, cents,
               sum(cents) OVER (PARTITION BY user_id) AS group_cents,
               (cents * 1000000) //
                 sum(cents) OVER (PARTITION BY user_id) AS share_ppm
        FROM t
    """).df()
    _cmp(mine, oracle)


def test_normalize_and_explode(ray_session):
    from apache_datasketches_go_ray.stages.textops import (
        explode_tokens_batch,
        normalize_text_batch,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": ["Hello,  WORLD! 42", "", "  ", "one\ttwo\nthree"],
    })
    norm = normalize_text_batch(t).to_pydict()
    assert norm["norm_text"] == ["hello world 42", "", "", "one two three"]
    ex = explode_tokens_batch(t).to_pydict()
    assert ex["doc_id"] == [1, 1, 1, 4, 4, 4]
    assert ex["tok"] == ["Hello,", "WORLD!", "42", "one", "two", "three"]
    assert ex["ord"] == [1, 2, 3, 1, 2, 3]
    # sliced batch: offsets arithmetic must respect the slice start
    ex2 = explode_tokens_batch(t.slice(3)).to_pydict()
    assert ex2["ord"] == [1, 2, 3]


def test_mode_per_group(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import mode_per_group

    mine = mode_per_group(ray.data.from_arrow(events_tbl), "user_id",
                          "event_type", num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT user_id, event_type AS top_value, cnt FROM (
          SELECT user_id, event_type, count(*) AS cnt,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC,
                                             event_type ASC) AS rn
          FROM events GROUP BY user_id, event_type) WHERE rn = 1
    """).df()
    _cmp(mine, oracle)


def test_cume_dist(events_tbl, con):
    from apache_datasketches_go_ray.stages.windows import cume_dist_in_group

    mine = cume_dist_in_group(ray.data.from_arrow(events_tbl),
                              "user_id", "value", "event_id",
                              num_partitions=4).to_pandas()
    oracle = con.execute("""
        SELECT event_id, user_id, value,
               cume_dist() OVER (PARTITION BY user_id
                                 ORDER BY value) AS cume
        FROM events
    """).df()
    _cmp(mine, oracle)


def test_bloom_semi_join(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import bloom_semi_join

    right_tbl = pa.table({
        "uid": pa.array(list(range(0, 9, 2)), type=pa.int64())})
    con.register("bloom_right", right_tbl)
    mine = bloom_semi_join(
        ray.data.from_arrow(events_tbl).select_columns(
            ["event_id", "user_id"]),
        ray.data.from_arrow(right_tbl),
        ("user_id", "uid")).to_pandas()
    oracle = con.execute("""
        SELECT event_id, user_id FROM events
        WHERE user_id IN (SELECT uid FROM bloom_right)
    """).df()
    _cmp(mine, oracle)


def test_bloom_kernel_no_false_negatives():
    from apache_datasketches_go_ray.stages.relational import (
        _bloom_build,
        _bloom_contains,
    )

    keys = np.arange(0, 40000, 4, dtype=np.int64)
    m = 10 * len(keys)
    bits = _bloom_build(keys, m)
    assert _bloom_contains(bits, m, keys).all()
    others = np.arange(1, 200001, 2, dtype=np.int64)
    assert _bloom_contains(bits, m, others).mean() < 0.02


def test_debounce_cascade(ray_session):
    """A burst collapses to one kept row per window, measured against
    the last KEPT row (suppressed rows must not reset the window)."""
    from apache_datasketches_go_ray.stages.windows import debounce

    # one key, events at t = 0,100,200,300,400,700 s; gap 300 s
    # greedy keep: 0 (then next >= 300) -> 300 (next >= 600) -> 700
    secs = [0, 100, 200, 300, 400, 700]
    t = pa.table({
        "event_id": pa.array(range(len(secs)), type=pa.int64()),
        "user_id": pa.array([1] * len(secs), type=pa.int64()),
        "event_type": pa.array(["x"] * len(secs)),
        "ts": pa.array([BASE + datetime.timedelta(seconds=s)
                        for s in secs], type=pa.timestamp("us")),
    })
    out = debounce(ray.data.from_arrow(t), ["user_id", "event_type"],
                   min_gap_seconds=300, num_partitions=1).to_pandas()
    assert sorted(out["event_id"]) == [0, 3, 5]


def test_debounce_matches_recursive_oracle(events_tbl, con):
    from apache_datasketches_go_ray.stages.windows import debounce

    mine = debounce(ray.data.from_arrow(events_tbl),
                    ["user_id", "event_type"], min_gap_seconds=600,
                    num_partitions=4).to_pandas()
    oracle = con.execute("""
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
              AND e.ts >= k.ts + INTERVAL 600 SECONDS
            ORDER BY e.ts, e.event_id LIMIT 1) n
        )
        SELECT user_id, event_type, event_id, ts FROM k
    """).df()
    _cmp(mine, oracle)


def test_full_outer_hash_join(events_tbl, con):
    from apache_datasketches_go_ray.stages.join import hash_join

    counts = ray.data.from_arrow(events_tbl).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
        }), batch_format="pyarrow").map_batches(
        lambda b: pa.table({
            "user_id": b.group_by("user_id").aggregate(
                [([], "count_all")]).column("user_id"),
            "n": b.group_by("user_id").aggregate(
                [([], "count_all")]).column("count_all").cast(pa.int64()),
        }), batch_format="pyarrow").repartition(2, keys=["user_id"]) \
        .map_batches(lambda b: pa.table({
            "user_id": b.group_by("user_id").aggregate(
                [("n", "sum")]).column("user_id"),
            "n": b.group_by("user_id").aggregate(
                [("n", "sum")]).column("n_sum").cast(pa.int64()),
        }), batch_format="pyarrow", batch_size=None)
    right_tbl = pa.table({
        "uid": pa.array([0, 1, 2, 50, 51], type=pa.int64()),
        "flag": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
    })
    con.register("fo_right", right_tbl)
    joined = hash_join(counts, ray.data.from_arrow(right_tbl),
                       ("user_id", "uid"), join_type="full outer",
                       broadcast_threshold=0, num_partitions=3)
    mine = joined.map_batches(lambda b: pa.table({
        "ukey": b.column("user_id"),
        "n": pa.compute.coalesce(b.column("n"),
                                 pa.scalar(0, type=pa.int64())),
        "flag": pa.compute.coalesce(b.column("flag"),
                                    pa.scalar(-1, type=pa.int64())),
    }), batch_format="pyarrow").to_pandas()
    oracle = con.execute("""
        WITH ec AS (SELECT user_id, count(*) AS n FROM events
                    GROUP BY user_id)
        SELECT coalesce(ec.user_id, r.uid) AS ukey,
               coalesce(ec.n, 0) AS n,
               coalesce(r.flag, -1) AS flag
        FROM ec FULL OUTER JOIN fo_right r ON ec.user_id = r.uid
    """).df()
    _cmp(mine, oracle)


def test_levenshtein_pairs_vs_duckdb():
    """Kernel vs DuckDB levenshtein (UTF-8 byte unit costs) on random
    multilingual strings, including the codepoint-prefix slicing."""
    import duckdb

    from apache_datasketches_go_ray.stages.textops import levenshtein_pairs

    rng = np.random.default_rng(3)
    alphabet = list("abcdef 中文éß42")
    strs = ["".join(rng.choice(alphabet, size=rng.integers(0, 40)))
            for _ in range(300)]
    a, b = strs[:150], strs[150:]
    got = levenshtein_pairs(a, b, prefix_chars=16)
    c = duckdb.connect()
    exp = [c.execute(
        "SELECT levenshtein(substring(?, 1, 16), substring(?, 1, 16))",
        [x, y]).fetchone()[0] for x, y in zip(a, b)]
    assert list(got) == exp


def test_window_suite_fuzz_vs_duckdb(ray_session):
    """Randomized (seeded) fuzz: lag, time-window, cume_dist and
    top-n against DuckDB on several adversarial shapes — heavy ties,
    single-user, one-row tables."""
    import duckdb

    from apache_datasketches_go_ray.stages.relational import top_n_per_group
    from apache_datasketches_go_ray.stages.windows import (
        cume_dist_in_group,
        lag_delta,
        time_window_sum,
    )

    for seed, n_users, n_events, tie_heavy in [
        (21, 1, 40, True), (22, 3, 1, False), (23, 5, 200, True),
        (24, 2, 77, False),
    ]:
        rng = np.random.default_rng(seed)
        user = rng.integers(0, n_users, n_events)
        if tie_heavy:
            vals = rng.choice([1.0, 2.0, 2.0, 3.0], n_events)
            secs = np.cumsum(rng.choice([0, 0, 60, 1800], n_events))
        else:
            vals = np.round(rng.uniform(0, 9, n_events), 2)
            secs = np.cumsum(rng.integers(1, 3600, n_events))
        t = pa.table({
            "event_id": pa.array(np.arange(n_events), type=pa.int64()),
            "user_id": pa.array(user, type=pa.int64()),
            "ts": pa.array([BASE + datetime.timedelta(seconds=int(s))
                            for s in secs], type=pa.timestamp("us")),
            "value": pa.array(vals, type=pa.float64()),
        })
        c = duckdb.connect()
        c.register("ev", t)
        ds = ray.data.from_arrow(t)
        _cmp(lag_delta(ds, num_partitions=2).to_pandas(), c.execute("""
            WITH x AS (SELECT event_id, user_id, ts,
                              cast(round(value*100) AS bigint) AS cents
                       FROM ev)
            SELECT event_id, user_id,
                   lag(cents, 1, 0) OVER w AS prev_cents,
                   cents - lag(cents, 1, 0) OVER w AS delta_cents
            FROM x WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)""").df())
        _cmp(time_window_sum(ds, preceding_seconds=900,
                             num_partitions=2).to_pandas(), c.execute("""
            SELECT event_id, user_id, count(*) OVER w AS win_n,
                   sum(cast(round(value*100) AS bigint)) OVER w
                     AS win_cents
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts
                                 RANGE BETWEEN INTERVAL 15 MINUTES
                                 PRECEDING AND CURRENT ROW)""").df())
        _cmp(cume_dist_in_group(ds, "user_id", "value", "event_id",
                                num_partitions=2).to_pandas(),
             c.execute("""
            SELECT event_id, user_id, value,
                   cume_dist() OVER (PARTITION BY user_id
                                     ORDER BY value) AS cume
            FROM ev""").df())
        prep = ds.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "cents": pa.compute.round(
                pa.compute.multiply(b.column("value"), 100))
            .cast(pa.int64()),
        }), batch_format="pyarrow")
        _cmp(top_n_per_group(prep, "user_id", "cents", "event_id", 2,
                             num_partitions=2).to_pandas(), c.execute("""
            SELECT user_id, event_id,
                   cast(round(value*100) AS bigint) AS cents,
                   row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY cast(round(value*100) AS bigint) DESC,
                              event_id) AS rnk
            FROM ev QUALIFY rnk <= 2""").df())


def test_join_size_estimate(events_tbl, con):
    """HLL-based join-size statistic lands within the sketch error
    envelope of the true join cardinality."""
    from apache_datasketches_go_ray.stages.relational import (
        estimate_join_size,
    )

    right_tbl = pa.table({
        "uid": pa.array(np.repeat(np.arange(0, 7, dtype=np.int64), 3)),
    })
    con.register("js_right", right_tbl)
    res = estimate_join_size(
        ray.data.from_arrow(events_tbl).select_columns(["user_id"]),
        ray.data.from_arrow(right_tbl), ("user_id", "uid"))
    truth = con.execute("""
        SELECT count(*) FROM events e JOIN js_right r
        ON e.user_id = r.uid""").fetchone()[0]
    assert truth > 0
    # tiny key domains are exact in HLL's coupon regime; allow slack for
    # the multiplicity-uniformity assumption only
    assert abs(res["est_join_rows"] - truth) / truth < 0.15
    assert res["rows_left"] == len(events_tbl)


def test_fingerprint_vectorized_matches_scalar():
    """Batch winnowing fingerprint == per-doc scalar winnowing path,
    including short docs, empties and boundary-straddling windows."""
    import random

    from apache_datasketches_go_ray.functions.murmur3 import fmix64
    from apache_datasketches_go_ray.functions.shingle import tokenize_column
    from apache_datasketches_go_ray.stages.textops import (
        fingerprint_batch,
        winnowing_fingerprints,
    )

    random.seed(9)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(random.choice(words)
                      for _ in range(random.randint(0, 10)))
             for _ in range(300)]
    texts += ["", "  ", "one", "one two three", "a b c d e f g"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = fingerprint_batch(t)["doc_fingerprint"].to_numpy()
    tok, off = tokenize_column(t.column("text").combine_chunks())
    for i in range(len(texts)):
        fp = winnowing_fingerprints(tok[off[i]:off[i + 1]], 4)
        exp = np.uint64(0)
        if len(fp):
            with np.errstate(over="ignore"):
                exp = np.bitwise_xor.reduce(fmix64(fp))
        assert got[i] == exp, i


def test_bloom_semi_join_string_keys(events_tbl, con):
    from apache_datasketches_go_ray.stages.relational import bloom_semi_join

    left = ray.data.from_arrow(events_tbl).map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "etype": b.column("event_type"),
        }), batch_format="pyarrow")
    right_tbl = pa.table({"t": pa.array(["view", "purchase"])})
    con.register("bloom_sright", right_tbl)
    mine = bloom_semi_join(left, ray.data.from_arrow(right_tbl),
                           ("etype", "t")).to_pandas()
    oracle = con.execute("""
        SELECT event_id, event_type AS etype FROM events
        WHERE event_type IN ('view', 'purchase')""").df()
    _cmp(mine, oracle)


def test_window_ops_under_heavy_skew(ray_session):
    """One key owning ~85% of all rows (the documented skew case): the
    single-shuffle window ops must stay correct — the hot key lands in
    one block and the kernels are O(block)."""
    import duckdb

    from apache_datasketches_go_ray.stages.relational import (
        grouped_quantile_disc,
        mode_per_group,
    )
    from apache_datasketches_go_ray.stages.windows import running_sum

    rng = np.random.default_rng(77)
    n = 5000
    user = np.where(rng.random(n) < 0.85, 0,
                    rng.integers(1, 40, n)).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(user, type=pa.int64()),
        "ts": pa.array([BASE + datetime.timedelta(seconds=int(s))
                        for s in np.cumsum(rng.integers(1, 30, n))],
                       type=pa.timestamp("us")),
        "event_type": pa.array(
            rng.choice(["a", "b", "c"], n).tolist()),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    c = duckdb.connect()
    c.register("skew_ev", t)
    ds = ray.data.from_arrow(t)
    mine = running_sum(ds, num_partitions=6).to_pandas()
    oracle = c.execute("""
        SELECT event_id, user_id,
               row_number() OVER w AS row_no,
               sum(cast(round(value*100) AS bigint)) OVER w AS run_cents
        FROM skew_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""").df()
    _cmp(mine, oracle)
    m2 = mode_per_group(ds, "user_id", "event_type",
                        num_partitions=6).to_pandas()
    o2 = c.execute("""
        SELECT user_id, event_type AS top_value, cnt FROM (
          SELECT user_id, event_type, count(*) AS cnt,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC,
                                             event_type) AS rn
          FROM skew_ev GROUP BY 1, 2) WHERE rn = 1""").df()
    _cmp(m2, o2)
    prep = ds.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "cents": pa.compute.round(
            pa.compute.multiply(b.column("value"), 100))
        .cast(pa.int64()),
    }), batch_format="pyarrow")
    m3 = grouped_quantile_disc(prep, "user_id", "cents", (0.5,),
                               num_partitions=6).to_pandas() \
        .rename(columns={"user_id": "k"})
    o3 = c.execute("""
        SELECT user_id AS k,
               quantile_disc(cast(round(value*100) AS bigint), 0.5)
                 AS q50
        FROM skew_ev GROUP BY user_id""").df()
    _cmp(m3, o3)
