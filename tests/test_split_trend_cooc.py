"""split_conversations, grouped_linear_trend, cooccurrence_counts and
leakage_safe_split vs brute single-process oracles, across >=2
partitionings."""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


# ---------------------------------------------------------------------------
# split_conversations
# ---------------------------------------------------------------------------

def _session_table(seed, n_keys=12, max_turns=20):
    rng = np.random.default_rng(seed)
    keys, idxs, tss = [], [], []
    for k in range(n_keys):
        n = int(rng.integers(1, max_turns))
        t = 1_700_000_000_000_000  # fixed epoch-us base
        for i in range(n):
            keys.append(f"c{k}")
            idxs.append(i)
            tss.append(t)
            # mix of short gaps and occasional long pauses
            t += int(rng.choice([5_000_000, 30_000_000, 2_000_000_000]))
    return pa.table({
        "conv_id": pa.array(keys, type=pa.string()),
        "turn_idx": pa.array(idxs, type=pa.int32()),
        "ts": pa.array(tss, type=pa.timestamp("us")),
    })


def _brute_split(tbl, gap_us):
    rows = sorted(zip(tbl.column("conv_id").to_pylist(),
                      tbl.column("turn_idx").to_pylist(),
                      [t.timestamp() * 1e6 for t in
                       tbl.column("ts").to_pylist()]))
    out = {}
    prev_key, prev_ts, sub = None, None, -1
    for key, _idx, ts in rows:
        if key != prev_key:
            sub = 0
        elif ts - prev_ts > gap_us:
            sub += 1
        ent = out.setdefault((key, sub), [0, ts, ts])
        ent[0] += 1
        ent[1] = min(ent[1], ts)
        ent[2] = max(ent[2], ts)
        prev_key, prev_ts = key, ts
    return {k: (n, int(lo), int(hi)) for k, (n, lo, hi) in out.items()}


@pytest.mark.parametrize("blocks", [1, 3])
def test_split_conversations_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.assemble import (
        split_conversations,
    )

    tbl = _session_table(7)
    # shuffle the rows so in-block order is adversarial
    perm = np.random.default_rng(1).permutation(len(tbl))
    tbl = tbl.take(pa.array(perm))
    got = split_conversations(_ds(tbl, blocks), gap_us=100_000_000,
                              num_partitions=4).to_pandas()
    want = _brute_split(tbl, 100_000_000)
    got_map = {
        (r.conv_id, int(r.sub_id)):
            (int(r.n_turns), int(r.start_ts.timestamp() * 1e6),
             int(r.end_ts.timestamp() * 1e6))
        for r in got.itertuples()
    }
    assert got_map == want


def test_split_conversations_generic_columns(ray_session):
    """Event-stream sessionization: key/order/ts column names differ
    from the transcript defaults and the key is an int64."""
    from apache_datasketches_go_ray.stages.assemble import (
        split_conversations,
    )

    tbl = _session_table(11)
    ets = tbl.column("ts").cast(pa.int64())
    etbl = pa.table({
        "user_id": pa.array(
            [int(c[1:]) for c in tbl.column("conv_id").to_pylist()],
            type=pa.int64()),
        "t_us": ets,
        "ts": tbl.column("ts"),
    })
    got = split_conversations(
        _ds(etbl, 2), gap_us=100_000_000, key_col="user_id",
        order_col="t_us", ts_col="ts", num_partitions=3).to_pandas()
    want = _brute_split(tbl, 100_000_000)
    want = {(k[0][1:], k[1]): v for k, v in want.items()}
    got_map = {
        (r.user_id, int(r.sub_id)):
            (int(r.n_turns), int(r.start_ts.timestamp() * 1e6),
             int(r.end_ts.timestamp() * 1e6))
        for r in got.itertuples()
    }
    assert got_map == want


# ---------------------------------------------------------------------------
# grouped_linear_trend
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 4])
def test_grouped_linear_trend_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import (
        grouped_linear_trend,
    )

    rng = np.random.default_rng(3)
    n = 400
    k = rng.integers(0, 9, n).astype(np.int64)
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.integers(-500, 500, n).astype(np.int64)
    tbl = pa.table({"g": pa.array(k), "x": pa.array(x),
                    "y": pa.array(y)})
    got = grouped_linear_trend(_ds(tbl, blocks), "g", "x", "y",
                               num_partitions=3).to_pandas()
    for r in got.itertuples():
        m = k == r.g
        xs, ys = x[m], y[m]
        nn = int(m.sum())
        assert int(r.n) == nn
        assert int(r.slope_num) == nn * int(np.sum(xs * ys)) \
            - int(np.sum(xs)) * int(np.sum(ys))
        assert int(r.slope_den) == nn * int(np.sum(xs * xs)) \
            - int(np.sum(xs)) ** 2
    assert set(got["g"]) == set(np.unique(k).tolist())


# ---------------------------------------------------------------------------
# cooccurrence_counts
# ---------------------------------------------------------------------------

def _brute_cooc(keys, items):
    per_key = {}
    for k, it in zip(keys, items):
        per_key.setdefault(k, set()).add(it)
    out = {}
    for its in per_key.values():
        for a, b in itertools.combinations(sorted(its), 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_cooccurrence_counts_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import (
        cooccurrence_counts,
    )

    rng = np.random.default_rng(5)
    n = 600
    keys = rng.integers(0, 40, n).astype(np.int64)
    items = np.array([f"t{i}" for i in rng.integers(0, 8, n)],
                     dtype=object)
    tbl = pa.table({"k": pa.array(keys),
                    "item": pa.array(items, type=pa.string())})
    got = cooccurrence_counts(_ds(tbl, blocks), "k", "item",
                              num_partitions=4).to_pandas()
    got_map = {(r.item_a, r.item_b): int(r.n_keys)
               for r in got.itertuples()}
    assert got_map == _brute_cooc(keys.tolist(), items.tolist())
    # pairs are canonically ordered and unique
    assert all(a < b for a, b in got_map)
    assert len(got) == len(got_map)


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 3])
def test_leakage_safe_split_properties(ray_session, blocks):
    from apache_datasketches_go_ray.functions.murmur3 import hash_strings
    from apache_datasketches_go_ray.stages.cluster import (
        leakage_safe_split,
    )

    convs = [f"conv{i:03d}" for i in range(200)]
    # cluster labels over a subset: 3 clusters of varying size
    members = {
        "cl_a": convs[0:7],
        "cl_b": convs[50:52],
        "cl_c": convs[100:120],
    }
    rows_c, rows_l = [], []
    for cl, ms in members.items():
        for m in ms:
            rows_c.append(m)
            rows_l.append(cl)
    clusters = pa.table({
        "conv_id": pa.array(rows_c, type=pa.string()),
        "cluster_id": pa.array(rows_l, type=pa.string()),
    })
    # conv universe arrives as a turns table with repeats across blocks
    turns = pa.table({
        "conv_id": pa.array(convs * 3, type=pa.string()),
        "text": pa.array(["x"] * (len(convs) * 3), type=pa.string()),
    })
    got = leakage_safe_split(_ds(clusters, blocks), _ds(turns, blocks),
                             eval_permille=300, seed=9001,
                             num_partitions=4).to_pandas()
    # exactly one assignment per conversation
    assert sorted(got["conv_id"]) == sorted(convs)
    split_of = dict(zip(got["conv_id"], got["split"]))
    # whole-cluster cohesion: no near-dup cluster straddles the boundary
    for cl, ms in members.items():
        assert len({split_of[m] for m in ms}) == 1
    # brute oracle: bucket by cluster id if clustered else conv id
    label = {m: cl for cl, ms in members.items() for m in ms}
    keys = [label.get(c, c) for c in convs]
    h1, _ = hash_strings(keys, seed=9001)
    want = np.where(h1 % np.uint64(1000) < 300, "eval", "train")
    for c, w in zip(convs, want):
        assert split_of[c] == w
