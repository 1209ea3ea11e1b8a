"""KLL quantiles + frequent-items sketch tests (reference invariants)."""

import numpy as np
import pytest

from apache_datasketches_go_ray.state.kll import (
    KllSketch, normalized_rank_error,
)
from apache_datasketches_go_ray.state.frequencies import FrequentItemsSketch


def test_kll_exact_when_small():
    sk = KllSketch(200)
    vals = np.arange(100, dtype=np.float64)
    sk.update_many(vals)
    assert sk.min_item == 0 and sk.max_item == 99
    assert sk.n == 100
    assert sk.get_quantile(0.0) == 0
    assert sk.get_quantile(1.0) == 99


@pytest.mark.parametrize("n", [1000, 100000])
def test_kll_rank_error_within_bound(n):
    """Rank error <= normalized bound (kll/utils.go:137-142); min/max exact
    and total weight exact, mirroring the reference's serde checks
    (kll/items_sletch_serialization_test.go:48-95)."""
    sk = KllSketch(200)
    sk.update_many(np.arange(n, dtype=np.float64))
    assert sk.min_item == 0.0 and sk.max_item == n - 1
    assert sum(int(cw if i == 0 else cw - pcw)
               for i, (cw, pcw) in enumerate(
                   zip(sk._sorted_view()[1], [0] + list(sk._sorted_view()[1][:-1])))
               ) == n
    eps = normalized_rank_error(200, pmf=False)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.get_quantile(q)
        true_rank = est / n
        assert abs(true_rank - q) <= 3 * eps + 1.0 / n


def test_kll_merge_matches_whole_distribution():
    whole = KllSketch(200)
    merged = KllSketch(200)
    rng = np.random.default_rng(5)
    data = rng.normal(size=50000)
    whole.update_many(data)
    for chunk in np.array_split(data, 9):
        part = KllSketch(200)
        part.update_many(chunk)
        merged.merge(part)
    assert merged.n == whole.n == 50000
    assert merged.min_item == whole.min_item
    assert merged.max_item == whole.max_item
    eps = normalized_rank_error(200, pmf=False)
    for q in (0.1, 0.5, 0.9):
        r_w = np.mean(data <= whole.get_quantile(q))
        r_m = np.mean(data <= merged.get_quantile(q))
        assert abs(r_w - q) <= 3 * eps
        assert abs(r_m - q) <= 3 * eps


def test_kll_deterministic():
    a, b = KllSketch(100), KllSketch(100)
    data = np.arange(10000, dtype=np.float64)
    a.update_many(data)
    b.update_many(data)
    assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))


def test_kll_pmf_cdf_and_boundaries():
    sk = KllSketch(200)
    sk.update_many(np.arange(10000, dtype=np.float64))
    pmf = sk.get_pmf(np.array([2500.0, 5000.0, 7500.0]))
    assert pmf.sum() == pytest.approx(1.0)
    assert all(p == pytest.approx(0.25, abs=0.03) for p in pmf)
    cdf = sk.get_cdf(np.array([5000.0]))
    assert cdf[-1] == 1.0
    bounds = sk.get_partition_boundaries(4)
    assert bounds[0] == 0.0 and bounds[-1] == 9999.0
    assert (np.diff(bounds) > 0).all()


def test_kll_serde_roundtrip():
    sk = KllSketch(200)
    sk.update_many(np.arange(5000, dtype=np.float64))
    rt = KllSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n
    assert rt.get_quantile(0.5) == sk.get_quantile(0.5)


def test_freq_exact_before_purge():
    sk = FrequentItemsSketch(10)
    for i in range(100):
        sk.update(i % 7)
    assert sk.get_maximum_error() == 0
    assert sk.get_estimate(0) == 15  # 0 appears ceil(100/7) = 15 times
    assert sk.get_estimate(6) == 14


def test_freq_heavy_hitter_guarantees():
    """lb <= true <= ub and ub - lb <= offset; epsilon = 3.5/maxMapSize
    (frequencies/longs_sketch.go:275-325)."""
    sk = FrequentItemsSketch(6)  # maxMapSize 64, cap 48 -> purges happen
    rng = np.random.default_rng(11)
    true = {}
    zipf = rng.zipf(1.5, size=50000)
    for v in zipf:
        v = int(v)
        true[v] = true.get(v, 0) + 1
        sk.update(v)
    assert sk.stream_weight == 50000
    assert sk.get_maximum_error() > 0  # purges occurred
    eps = sk.epsilon
    for item, cnt in true.items():
        lb, ub = sk.get_lower_bound(item), sk.get_upper_bound(item)
        if sk.counts.get(item):
            assert lb <= cnt <= ub, (item, lb, cnt, ub)
    # every sufficiently heavy item is tracked
    for item, cnt in true.items():
        if cnt > eps * 50000 + sk.offset:
            assert item in sk.counts, (item, cnt)
    hh = sk.get_frequent_items("no_false_negatives")
    heavy = {i for i, c in true.items() if c > sk.offset}
    assert heavy <= {r[0] for r in hh}


def test_freq_merge():
    a, b = FrequentItemsSketch(8), FrequentItemsSketch(8)
    for i in range(1000):
        a.update(i % 11)
        b.update(i % 13)
    a.merge(b)
    assert a.stream_weight == 2000
    # item 0: 1000/11 -> 91, 1000/13 -> 77 occurrences
    true0 = (1000 + 10) // 11 + (1000 + 12) // 13
    assert a.get_lower_bound(0) <= true0 <= a.get_upper_bound(0)


def test_approx_top_k_by_exact_and_purge(ray_session):
    """Grouped frequent-items: exact in the no-purge regime; heavy
    hitters still surface under purge with lb<=true<=ub semantics."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.sketch_aggs import approx_top_k_by

    rng = np.random.default_rng(17)
    groups, items = [], []
    for g in ("a", "b"):
        # zipf-ish: item f"t{j}" appears (50-j) times
        for j in range(40):
            groups += [g] * (50 - j)
            items += [f"{g}t{j:02d}"] * (50 - j)
    t = pa.table({"g": pa.array(groups), "i": pa.array(items)})
    ds = ray.data.from_arrow(t).repartition(4)

    exact = approx_top_k_by(ds, "g", "i", k=5, lg_max_map_size=10,
                            num_partitions=2).to_pandas()
    for g in ("a", "b"):
        sub = exact[exact["g"] == g].sort_values("rank")
        assert list(sub["item"]) == [f"{g}t{j:02d}" for j in range(5)]
        assert list(sub["estimate"]) == [50, 49, 48, 47, 46]

    # purge regime: tiny map (capacity 6) still surfaces the top items
    purged = approx_top_k_by(ds, "g", "i", k=3, lg_max_map_size=3,
                             num_partitions=2).to_pandas()
    for g in ("a", "b"):
        sub = purged[purged["g"] == g].sort_values("rank")
        assert len(sub) >= 1
        # estimates are upper bounds: est >= true count of that item
        for _, r in sub.iterrows():
            true = 50 - int(r["item"][-2:])
            assert r["estimate"] >= true


def test_approx_quantiles_by_exact_and_compressed(ray_session):
    """Grouped KLL quantiles: exact order statistics in the
    no-compaction regime (k >= group n); within the published rank
    error bound once the sketch compresses."""
    import pyarrow as pa
    import ray.data
    from apache_datasketches_go_ray.stages.sketch_aggs import (
        approx_quantiles_by,
    )

    rng = np.random.default_rng(23)
    gs, vs = [], []
    sizes = {"a": 500, "b": 137, "c": 1}
    for g, n in sizes.items():
        gs += [g] * n
        vs += list(rng.normal(100 * len(gs), 25, n))
    t = pa.table({"g": pa.array(gs), "v": pa.array(np.asarray(vs))})
    ds = ray.data.from_arrow(t).repartition(4)

    out = approx_quantiles_by(ds, "g", "v", ranks=[0.25, 0.5, 0.75],
                              k=1024, num_partitions=2).to_pandas() \
        .set_index("g")
    arr = np.asarray(vs)
    off = 0
    for g, n in sizes.items():
        sub = np.sort(arr[off:off + n])
        off += n
        assert out.loc[g, "n"] == n
        for r, c in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75")]:
            exact = sub[max(int(np.ceil(r * n)), 1) - 1]
            assert out.loc[g, c] == exact, (g, c)

    # compressed regime: k=32 over 5000 values -> rank error bound holds
    big = np.sort(rng.uniform(0, 1, 5000))
    t2 = pa.table({"g": pa.array(["x"] * 5000), "v": pa.array(big)})
    out2 = approx_quantiles_by(ray.data.from_arrow(t2).repartition(4),
                               "g", "v", ranks=[0.5], k=32,
                               num_partitions=2).to_pandas()
    got = out2["q50"].iloc[0]
    true_rank = np.searchsorted(big, got) / 5000
    from apache_datasketches_go_ray.state.kll import normalized_rank_error
    assert abs(true_rank - 0.5) < 3 * normalized_rank_error(32, False)


def test_kll_items_sketch_string_quantiles():
    """Generic-items KLL: exact regime == order statistics; approx
    regime rank error within the published bound; merge + serde
    round-trip preserve both."""
    import math

    import numpy as np

    from apache_datasketches_go_ray.state.kll import KllItemsSketch

    rng = np.random.default_rng(7)
    words = [f"w{int(i):05d}" for i in rng.integers(0, 3000, 8000)]
    srt = sorted(words)

    # exact (never compacts): percentile_disc semantics
    e = KllItemsSketch(k=8192)
    e.update_many(words[:4000])
    e2 = KllItemsSketch(k=8192)
    e2.update_many(words[4000:])
    e.merge(KllItemsSketch.from_bytes(e2.to_bytes()))
    assert e.n == len(words)
    assert e.min_item == srt[0] and e.max_item == srt[-1]
    for q in (0.25, 0.5, 0.75):
        assert e.get_quantile(q) == srt[max(math.ceil(q * len(srt)), 1) - 1]

    # approx: |true_rank(est) - q| bounded (loose 3x of the CDF bound)
    a = KllItemsSketch(k=128)
    a.update_many(words)
    from apache_datasketches_go_ray.state.kll import normalized_rank_error
    bound = 3 * normalized_rank_error(128, pmf=False)
    for q in (0.1, 0.5, 0.9):
        est = a.get_quantile(q)
        true_rank = np.searchsorted(srt, est, side="right") / len(srt)
        assert abs(true_rank - q) <= bound


def test_kll_items_partition_boundaries():
    import numpy as np

    from apache_datasketches_go_ray.state.kll import KllItemsSketch

    rng = np.random.default_rng(3)
    ids = [f"conv-{int(i):08d}" for i in rng.integers(0, 10**7, 4000)]
    sk = KllItemsSketch(k=4096)  # exact regime
    sk.update_many(ids)
    bounds = sk.get_partition_boundaries(4)
    assert len(bounds) == 5
    assert bounds[0] == min(ids) and bounds[-1] == max(ids)
    assert bounds == sorted(bounds)
    # ~balanced: each range holds 25% +- 2% of the ids (exact regime)
    srt = sorted(ids)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        frac = sum(1 for x in srt if lo <= x <= hi) / len(srt)
        assert 0.2 < frac < 0.3


# ---------------------------------------------------------------------------
# pluggable ItemSketchOp (kll/items_sketch.go:29-37)
# ---------------------------------------------------------------------------

def test_kll_items_int64_op_exact_and_serde():
    from apache_datasketches_go_ray.state.kll import (
        INT64_ITEM_OP, KllItemsSketch)

    rng = np.random.default_rng(5)
    vals = rng.integers(-10**9, 10**9, 150).tolist()
    sk = KllItemsSketch(256, op=INT64_ITEM_OP)
    sk.update_many(vals)
    s = sorted(vals)
    # exact regime: percentile_disc order statistics
    for r in (0.0, 0.25, 0.5, 0.75, 1.0):
        idx = max(int(np.ceil(r * len(s))) - 1, 0)
        assert sk.get_quantile(r) == s[idx]
    # fixed-width serde round-trip preserves everything incl. op layout
    back = KllItemsSketch.from_bytes(sk.to_bytes(), op=INT64_ITEM_OP)
    assert back.n == sk.n and back.min_item == min(vals)
    assert back.max_item == max(vals)
    assert back.to_bytes() == sk.to_bytes()
    for r in (0.1, 0.5, 0.9):
        assert back.get_quantile(r) == sk.get_quantile(r)


def test_kll_items_int64_compacting_merge_deterministic():
    from apache_datasketches_go_ray.state.kll import (
        INT64_ITEM_OP, KllItemsSketch)

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10**6, 5000).tolist()
    a = KllItemsSketch(64, op=INT64_ITEM_OP)
    a.update_many(vals[:2500])
    b = KllItemsSketch(64, op=INT64_ITEM_OP)
    b.update_many(vals[2500:])
    # serde round-trip mid-merge must not change the outcome
    a2 = KllItemsSketch.from_bytes(a.to_bytes(), op=INT64_ITEM_OP)
    b2 = KllItemsSketch.from_bytes(b.to_bytes(), op=INT64_ITEM_OP)
    a.merge(b)
    a2.merge(b2)
    assert a.to_bytes() == a2.to_bytes()
    assert a.n == 5000
    # estimates stay inside the published rank-error envelope
    s = np.sort(vals)
    err = 3 * 2.296 / 64**0.9723
    for r in (0.25, 0.5, 0.75):
        got = a.get_quantile(r)
        true_rank = np.searchsorted(s, got, side="right") / len(s)
        assert abs(true_rank - r) <= err


def test_kll_items_custom_less_fn_reverse_order():
    from apache_datasketches_go_ray.state.kll import (
        ItemSketchOp, KllItemsSketch)

    # reverse ordering: quantile 0 must be the LARGEST value
    op = ItemSketchOp("rev-int", lambda v: str(v).encode(),
                      lambda b: int(b.decode()),
                      less_fn=lambda x, y: x > y)
    sk = KllItemsSketch(128, op=op)
    vals = list(range(100))
    sk.update_many(vals)
    assert sk.min_item == 99 and sk.max_item == 0
    assert sk.get_quantile(0.0) == 99
    assert sk.get_quantile(1.0) == 0
    # median under reverse order mirrors the natural-order median
    assert sk.get_quantile(0.5) in (49, 50)
    # rank is measured along the injected ordering
    assert sk.get_rank(99, inclusive=True) == 1 / 100
