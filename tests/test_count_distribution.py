"""grouped_count_distribution vs a brute single-process oracle,
including the zero-count bucket, across >=2 partitionings."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


@pytest.mark.parametrize("blocks,total", [(1, None), (4, 60), (3, 40)])
def test_grouped_count_distribution(ray_session, blocks, total):
    from apache_datasketches_go_ray.stages.relational import (
        grouped_count_distribution,
    )

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 40, 500).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys),
                    "junk": pa.array(keys * 2)})
    got = grouped_count_distribution(_ds(tbl, blocks), "k",
                                     total_keys=total,
                                     num_partitions=3).to_pandas()
    per_key = Counter(keys.tolist())
    want = Counter(per_key.values())
    if total is not None:
        zero = total - len(per_key)
        if zero > 0:
            want[0] = zero
    got_map = {int(r.cnt): int(r.n_keys) for r in got.itertuples()}
    assert got_map == dict(want)
    assert len(got) == len(got_map)


def _brute_group_bottomk(keys, a, b_, k, desc_a=False):
    rows = sorted(range(len(keys)),
                  key=lambda i: (keys[i], -a[i] if desc_a else a[i],
                                 b_[i]))
    out, seen = [], {}
    for i in rows:
        c = seen.get(keys[i], 0)
        if c < k:
            out.append(i)
            seen[keys[i]] = c + 1
    return sorted(out)


@pytest.mark.parametrize("blocks,desc", [(1, False), (4, False),
                                         (3, True)])
def test_grouped_bottom_k(ray_session, blocks, desc):
    from apache_datasketches_go_ray.stages.relational import (
        grouped_bottom_k,
    )

    rng = np.random.default_rng(21)
    n = 400
    keys = np.array([f"s{i}" for i in rng.integers(0, 12, n)],
                    dtype=object)
    a = rng.integers(0, 50, n).astype(np.int64)
    b_ = np.arange(n, dtype=np.int64)
    tbl = pa.table({"g": pa.array(keys, type=pa.string()),
                    "a": pa.array(a), "rid": pa.array(b_)})
    direction = "descending" if desc else "ascending"
    got = grouped_bottom_k(_ds(tbl, blocks), "g",
                           [("a", direction), ("rid", "ascending")],
                           k=3, num_partitions=3).to_pandas()
    want = _brute_group_bottomk(keys.tolist(), a.tolist(), b_.tolist(),
                                3, desc_a=desc)
    assert sorted(got["rid"].tolist()) == want


@pytest.mark.parametrize("blocks", [1, 4])
def test_flag_group_outliers(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import (
        flag_group_outliers,
    )

    rng = np.random.default_rng(33)
    n = 300
    keys = rng.integers(0, 8, n).astype(np.int64)
    x = rng.integers(90, 110, n).astype(np.int64)
    # plant extreme values
    x[::50] = 10_000
    rid = np.arange(n, dtype=np.int64)
    tbl = pa.table({"g": pa.array(keys), "v": pa.array(x),
                    "rid": pa.array(rid)})
    got = flag_group_outliers(_ds(tbl, blocks), "g", "v", z=3,
                              carry_cols=["rid"],
                              num_partitions=3).to_pandas()
    want = []
    for g in np.unique(keys):
        m = keys == g
        xs = x[m]
        nn, sx, sxx = len(xs), int(xs.sum()), int((xs * xs).sum())
        for v, r in zip(xs, rid[m]):
            if nn >= 2 and (nn * int(v) - sx) ** 2 \
                    > 9 * (nn * sxx - sx * sx):
                want.append(int(r))
    assert sorted(got["rid"].tolist()) == sorted(want)
    assert len(want) > 0


@pytest.mark.parametrize("blocks", [1, 4])
def test_top_ngrams_matches_brute(ray_session, blocks):
    from collections import Counter

    from apache_datasketches_go_ray.stages.corpusops import top_ngrams

    rng = np.random.default_rng(41)
    words = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(words, rng.integers(2, 30)))
             for _ in range(120)]
    tbl = pa.table({"text": pa.array(texts, type=pa.string())})
    got = top_ngrams(_ds(tbl, blocks), n=3, k=15,
                     num_partitions=3).to_pandas()
    want = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks) - 2):
            want[" ".join(toks[i:i + 3])] += 1
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got_pairs = list(zip(got["ngram"], got["n_occurrences"]))
    # top_k returns the right SET under (count desc, gram asc); order
    # within the returned block is the sort order
    assert sorted(got_pairs, key=lambda kv: (-kv[1], kv[0])) == ranked
