"""diff_snapshots, edit_distance_join (FastSS ED<=1) and bm25_topk:
brute single-process oracles across >=2 partitionings."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


# ---------------------------------------------------------------------------
# diff_snapshots
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 4])
def test_diff_snapshots(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import diff_snapshots

    a = pa.table({
        "k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
        "s": pa.array(["a", "b", "c", "d", "e"]),
    })
    b = pa.table({
        "k": pa.array([2, 3, 4, 5, 6], type=pa.int64()),
        "v": pa.array([20, 99, 40, 50, 60], type=pa.int64()),
        "s": pa.array(["b", "c", "D", "e", "f"]),
    })
    res = diff_snapshots(_ds(a, blocks), _ds(b, max(1, blocks - 1)),
                         "k").to_pandas().sort_values("k") \
        .reset_index(drop=True)
    # k=1 removed; k=2 unchanged; k=3 changed (v); k=4 changed (s);
    # k=5 unchanged; k=6 added
    assert list(zip(res["k"], res["status"])) == [
        (1, "removed"), (3, "changed"), (4, "changed"), (6, "added")]


def test_diff_snapshots_null_payload(ray_session):
    from apache_datasketches_go_ray.stages.relational import diff_snapshots

    a = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "v": pa.array([None, 5], type=pa.int64())})
    b = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "v": pa.array([None, 6], type=pa.int64())})
    res = diff_snapshots(_ds(a, 1), _ds(b, 1), "k").to_pandas()
    # null vs null counts as changed (conservative: pc.equal -> null)
    assert set(zip(res["k"], res["status"])) == {
        (1, "changed"), (2, "changed")}


# ---------------------------------------------------------------------------
# edit_distance_join
# ---------------------------------------------------------------------------

def _brute_ed1_pairs(ids, strs):
    def ed(a, b):
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return 2
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = ed(strs[i].encode(), strs[j].encode())
            if d <= 1:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_edit_distance_join_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.dedup_extras import (
        edit_distance_join)

    rng = np.random.default_rng(17)
    base = ["spark", "sparc", "spar", "sparkz", "spork", "table",
            "tabel", "tble", "tables", "window", "windom", "x", "",
            "y", "xy"]
    strs = base + ["".join(chr(97 + int(c)) for c in
                           rng.integers(0, 5, 6)) for _ in range(40)]
    ids = list(range(100, 100 + len(strs)))
    tbl = pa.table({"id": pa.array(ids, type=pa.int64()),
                    "s": pa.array(strs, type=pa.string())})
    res = edit_distance_join(_ds(tbl, blocks), "id", "s").to_pandas()
    got = set(zip(res["id_a"], res["id_b"], res["ed"]))
    assert got == _brute_ed1_pairs(ids, strs)


def test_edit_distance_join_exact_dups(ray_session):
    from apache_datasketches_go_ray.stages.dedup_extras import (
        edit_distance_join)

    tbl = pa.table({"id": pa.array([1, 2, 3], type=pa.int64()),
                    "s": pa.array(["same", "same", "sam"])})
    res = edit_distance_join(_ds(tbl, 2), "id", "s").to_pandas()
    got = set(zip(res["id_a"], res["id_b"], res["ed"]))
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}


# ---------------------------------------------------------------------------
# bm25
# ---------------------------------------------------------------------------

def _brute_bm25(texts, q, k):
    import math

    toks = [t.split() for t in texts]
    N = len(texts)
    S = sum(len(t) for t in toks)
    df = {t: sum(1 for d in toks if t in d) for t in q}
    out = []
    for i, d in enumerate(toks):
        s = 0.0
        hit = False
        for t in q:
            tf = float(d.count(t))
            if tf == 0 or df[t] == 0:
                continue
            hit = True
            idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (
                0.25 + 0.75 * ((len(d) * N) / S)))
        if hit:
            out.append((i, math.floor(s * 10_000 + 0.5) / 10_000))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("blocks", [1, 4])
def test_bm25_topk_matches_brute(ray_session, blocks):
    from apache_datasketches_go_ray.stages.corpusops import bm25_topk

    rng = np.random.default_rng(23)
    vocab = ["merge", "join", "window", "scan", "sort", "agg", "row"]
    texts = [" ".join(vocab[int(j)] for j in
                      rng.integers(0, len(vocab), int(n)))
             for n in rng.integers(0, 40, 60)]
    texts[3] = ""
    tbl = pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                    "text": pa.array(texts, type=pa.string())})
    res = bm25_topk(_ds(tbl, blocks), ["merge", "join", "window"],
                    k=10).to_pandas()
    got = list(zip(res["doc_id"], res["bm25"]))
    assert got == _brute_bm25(texts, ["merge", "join", "window"], 10)
