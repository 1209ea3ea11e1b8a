"""churn_by_week, weighted_median_by, partition_checksums and
vocab_drift_weekly vs brute single-process oracles, across >=2
partitionings (each also carries a DuckDB SQL gate in oracle_sql)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


DAY = 86_400_000_000


def _events(n=600, users=12, seed=7):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 90 * DAY, n)
    uid = rng.integers(0, users, n).astype(np.int64)
    return uid, ts


def _brute_churn(uid, ts, epoch, week_days=7):
    week = (ts - epoch) // DAY // week_days
    rows = {}
    for u in np.unique(uid):
        ws = np.unique(week[uid == u])
        for i, w in enumerate(ws):
            if i == 0:
                st = "new"
            elif ws[i - 1] == w - 1:
                st = "retained"
            else:
                st = "resurrected"
            rows[(int(w), st)] = rows.get((int(w), st), 0) + 1
            if i > 0 and ws[i - 1] < w - 1:
                key = (int(ws[i - 1]) + 1, "churned")
                rows[key] = rows.get(key, 0) + 1
    return rows


@pytest.mark.parametrize("blocks", [1, 5])
def test_churn_by_week_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.windows import churn_by_week

    uid, ts = _events()
    epoch = np.datetime64("2024-01-01").astype(
        "datetime64[us]").astype(np.int64)
    tbl = pa.table({
        "user_id": pa.array(uid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    got = churn_by_week(_ds(tbl, blocks), "user_id", "ts",
                        epoch_day="2024-01-01").to_pandas()
    got_rows = {(int(r.week), r.status): int(r.n_users)
                for r in got.itertuples()}
    assert got_rows == _brute_churn(uid, ts, epoch)


@pytest.mark.parametrize("blocks", [1, 4])
def test_weighted_median_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import (
        weighted_median_by,
    )

    rng = np.random.default_rng(3)
    n = 500
    k = rng.integers(0, 6, n).astype(np.int64)
    v = rng.integers(-50, 200, n).astype(np.int64)
    w = rng.integers(1, 9, n).astype(np.int64)
    tbl = pa.table({"g": pa.array(k), "v": pa.array(v),
                    "w": pa.array(w)})
    got = weighted_median_by(_ds(tbl, blocks), "g", "v", "w") \
        .to_pandas().set_index("g").sort_index()
    for g in np.unique(k):
        m = k == g
        order = np.argsort(v[m], kind="stable")
        vs, ws = v[m][order], w[m][order]
        cw = np.cumsum(ws)
        tot = int(ws.sum())
        med = int(vs[np.flatnonzero(2 * cw >= tot)[0]])
        assert int(got.loc[int(g), "weighted_median"]) == med
        assert int(got.loc[int(g), "total_weight"]) == tot


@pytest.mark.parametrize("blocks", [1, 6])
def test_partition_checksums_partition_independent(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import (
        partition_checksums,
    )

    rng = np.random.default_rng(11)
    n = 700
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 10_000, n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(vals)})
    got = partition_checksums(_ds(tbl, blocks), "doc_id", "n_chars",
                              bucket_size=64).to_pandas() \
        .set_index("bucket").sort_index()
    mix = ((ids * 2654435761) % 4294967296) * 31 + vals
    bk = ids // 64
    for b in np.unique(bk):
        m = bk == b
        assert int(got.loc[int(b), "n_rows"]) == int(m.sum())
        assert int(got.loc[int(b), "sum_mix"]) == int(mix[m].sum())
        assert int(got.loc[int(b), "xor_mix"]) == int(
            np.bitwise_xor.reduce(mix[m]))


@pytest.mark.parametrize("blocks", [1, 4])
def test_vocab_drift_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.corpusops import (
        vocab_drift_weekly,
    )

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(40)], dtype=object)
    n = 300
    epoch = np.datetime64("2023-11-13").astype(
        "datetime64[us]").astype(np.int64)
    ts = epoch + rng.integers(0, 28 * DAY, n)
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 8)))
             for _ in range(n)]
    tbl = pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "text": pa.array(texts, type=pa.string()),
    })
    got = vocab_drift_weekly(_ds(tbl, blocks), "ts", "text",
                             epoch_day="2023-11-13").to_pandas()
    week = (ts - epoch) // DAY // 7
    sets = {}
    for w, t in zip(week, texts):
        sets.setdefault(int(w), set()).update(t.split())
    for r in got.itertuples():
        a, b = sets[int(r.week_a)], sets[int(r.week_b)]
        inter = len(a & b)
        assert int(r.n_a) == len(a) and int(r.n_b) == len(b)
        assert int(r.n_common) == inter
        assert int(r.jaccard_e4) == inter * 10_000 // len(a | b)
    assert len(got) == sum(
        1 for w in sets if w + 1 in sets and sets[w] and sets[w + 1])
