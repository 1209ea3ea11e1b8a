"""resample_ffill (hourly grid + as-of forward fill) and
retention_cohorts vs brute single-process oracles, across >=2
partitionings. The Q5-style join is gated by its SQL oracle
(local_supplier_volume); here we pin its driver-dim fold shape."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


HOUR = 3_600_000_000


def _events(n=400, users=7, seed=13):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 20 * 24 * HOUR, n)
    # plant exact duplicate timestamps to exercise the tie-break
    ts[10] = ts[11]
    ts[12] = ts[13] = ts[14]
    uid = rng.integers(0, users, n).astype(np.int64)
    uid[10] = uid[11]
    uid[12] = uid[13] = uid[14]
    eid = np.arange(n, dtype=np.int64)
    cents = rng.integers(-100, 10_000, n).astype(np.int64)
    return uid, ts, eid, cents


def _brute_ffill(uid, ts, eid, cents):
    out = []
    for u in np.unique(uid):
        m = uid == u
        # order by (ts, event_id); last at-or-before wins
        order = np.lexsort((eid[m], ts[m]))
        t_s, c_s = ts[m][order], cents[m][order]
        g0 = (t_s.min() // HOUR) * HOUR
        g1 = (t_s.max() // HOUR) * HOUR
        for g in range(int(g0), int(g1) + 1, HOUR):
            i = np.searchsorted(t_s, g, side="right") - 1
            if i >= 0:
                out.append((int(u), int(g), int(c_s[i])))
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_resample_ffill_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.windows import resample_ffill

    uid, ts, eid, cents = _events()
    tbl = pa.table({
        "user_id": pa.array(uid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_id": pa.array(eid),
        "cents": pa.array(cents),
    })
    res = resample_ffill(_ds(tbl, blocks), "user_id", "ts", "cents",
                         tie_col="event_id").to_pandas()
    got = sorted(zip(res["user_id"],
                     res["hour"].astype("datetime64[us]").astype(np.int64),
                     res["last_cents"]))
    assert got == sorted(_brute_ffill(uid, ts, eid, cents))


def test_resample_ffill_drops_pre_first_event_hours(ray_session):
    from apache_datasketches_go_ray.stages.windows import resample_ffill

    base = np.datetime64("2024-01-01T00:30:00", "us").astype(np.int64)
    tbl = pa.table({
        "user_id": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([base, base + 3 * HOUR]).cast(pa.timestamp("us")),
        "event_id": pa.array([0, 1], type=pa.int64()),
        "cents": pa.array([5, 9], type=pa.int64()),
    })
    res = resample_ffill(_ds(tbl, 1), "user_id", "ts", "cents",
                         tie_col="event_id").to_pandas()
    # grid 00:00..03:00; 00:00 has no predecessor -> dropped; the
    # 03:30 event is after every grid point, so 5 carries throughout
    assert len(res) == 3
    assert list(res.sort_values("hour")["last_cents"]) == [5, 5, 5]


def _brute_cohorts(uid, ts, epoch):
    week = (ts - epoch) // (7 * 24 * HOUR)
    out = {}
    for u in np.unique(uid):
        ws = week[uid == u]
        c = int(ws.min())
        for w in np.unique(ws):
            out[(c, int(w))] = out.get((c, int(w)), 0) + 1
    return out


@pytest.mark.parametrize("blocks", [1, 6])
def test_retention_cohorts_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.windows import (
        retention_cohorts)

    uid, ts, _, _ = _events(n=500, users=12, seed=29)
    tbl = pa.table({
        "user_id": pa.array(uid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    res = retention_cohorts(_ds(tbl, blocks), "user_id", "ts",
                            epoch_day="2024-01-01").to_pandas()
    epoch = np.datetime64("2024-01-01", "us").astype(np.int64)
    brute = _brute_cohorts(uid, ts, epoch)
    got = {(int(r["cohort_week"]), int(r["week"])): int(r["n_users"])
           for _, r in res.iterrows()}
    assert got == brute
