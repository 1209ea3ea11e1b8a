"""Count-Min sketch: one-sided bounds, exact mergeability, serde, and
distributed partial+fold parity across partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.state.cms import CountMinSketch


def _stream(seed, n=5000, vocab=200):
    rng = np.random.default_rng(seed)
    # zipf-ish skew so some items are heavy
    ranks = rng.zipf(1.3, n) % vocab
    return [f"tok{r}" for r in ranks]


def _true_counts(items):
    c = {}
    for it in items:
        c[it] = c.get(it, 0) + 1
    return c


def test_cms_one_sided_and_tight_when_wide():
    items = _stream(1)
    true = _true_counts(items)
    sk = CountMinSketch(depth=4, lg_width=16)  # wide: collisions ~ none
    sk.update_many(items)
    assert sk.stream_weight == len(items)
    keys = list(true)
    est = sk.get_estimates(keys)
    tv = np.array([true[k] for k in keys])
    assert (est >= tv).all()  # never under-estimates, by construction
    assert (est == tv).all()  # wide regime: exact
    # absent item estimates stay within the eps*N guarantee
    miss = sk.get_estimates([f"absent{i}" for i in range(50)])
    assert (miss <= sk.relative_error * sk.stream_weight).all()


def test_cms_narrow_still_one_sided():
    items = _stream(2, n=20000, vocab=5000)
    true = _true_counts(items)
    sk = CountMinSketch(depth=4, lg_width=6)  # 64 cells: heavy collisions
    sk.update_many(items)
    keys = list(true)
    est = sk.get_estimates(keys)
    tv = np.array([true[k] for k in keys])
    assert (est >= tv).all()


def test_cms_merge_equals_single_stream():
    items = _stream(3)
    a, b = items[: len(items) // 3], items[len(items) // 3:]
    whole = CountMinSketch(depth=5, lg_width=10)
    whole.update_many(items)
    pa_, pb = (CountMinSketch(depth=5, lg_width=10) for _ in range(2))
    pa_.update_many(a)
    pb.update_many(b)
    pa_.merge(pb)
    assert (pa_.table == whole.table).all()  # bit-exact mergeability
    assert pa_.stream_weight == whole.stream_weight

    with pytest.raises(ValueError):
        pa_.merge(CountMinSketch(depth=4, lg_width=10))


def test_cms_weighted_and_serde_roundtrip():
    sk = CountMinSketch(depth=3, lg_width=8)
    sk.update_many(["x", "y", "x"], [5, 2, 1])
    sk.update("z", 7)
    assert sk.get_estimate("x") >= 6
    assert sk.stream_weight == 15
    back = CountMinSketch.from_bytes(sk.to_bytes())
    assert (back.table == sk.table).all()
    assert back.stream_weight == sk.stream_weight
    assert back.get_estimate("z") == sk.get_estimate("z")
    with pytest.raises(ValueError):
        sk.update_many(["a"], [-1])


@pytest.mark.parametrize("blocks", [1, 5])
def test_cms_distributed_parity(ray_session, blocks):
    import ray.data

    from apache_datasketches_go_ray.stages.sketch_aggs import (
        cms_point_counts,
    )

    items = _stream(4, n=3000)
    true = _true_counts(items)
    tbl = pa.table({"token": pa.array(items, type=pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    probe = sorted(true)[:30]
    out, merged = cms_point_counts(ds, "token", probe,
                                   depth=4, lg_width=16)
    local = CountMinSketch(depth=4, lg_width=16)
    local.update_many(items)
    # partial+fold is bit-identical to the single-process sketch
    assert (merged.table == local.table).all()
    est = dict(zip(out.column("item").to_pylist(),
                   out.column("estimate").to_pylist()))
    assert est == {k: true[k] for k in probe}  # wide regime: exact
