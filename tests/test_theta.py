"""Theta/KMV sketch: exact regime, estimation error, set-operation
identities, merge order-independence, serde round trip."""

import numpy as np
import pytest

from apache_datasketches_go_ray.state.theta import (
    ThetaSketch,
    hash_int64_values,
)


def _sk(values, k=4096):
    sk = ThetaSketch(k)
    sk.update_hashes(hash_int64_values(np.asarray(values, dtype=np.int64)))
    return sk


def test_exact_regime_counts():
    sk = _sk(range(1000))
    assert sk.is_exact
    assert sk.get_retained() == 1000
    assert sk.get_estimate() == 1000.0
    sk.update_hashes(hash_int64_values(np.arange(500)))  # re-adds dedupe
    assert sk.get_retained() == 1000


def test_estimation_regime_error_bound():
    k = 512
    n = 200_000
    sk = ThetaSketch(k)
    # feed in chunks (stream order must not matter)
    h = hash_int64_values(np.arange(n))
    for c in np.array_split(h, 13):
        sk.update_hashes(c)
    assert not sk.is_exact
    est = sk.get_estimate()
    # rse ~ 1/sqrt(k-1) ~ 4.4%; allow 4 sigma
    assert abs(est - n) / n < 4 / np.sqrt(k - 1)


def test_merge_order_independent_and_matches_union():
    a = _sk(range(0, 3000), k=256)
    b = _sk(range(2000, 6000), k=256)
    ab = _sk(range(0, 3000), k=256).merge(_sk(range(2000, 6000), k=256))
    ba = _sk(range(2000, 6000), k=256).merge(_sk(range(0, 3000), k=256))
    assert ab._theta == ba._theta
    assert np.array_equal(ab.hashes, ba.hashes)
    est = ab.get_estimate()
    assert abs(est - 6000) / 6000 < 4 / np.sqrt(255)
    # inclusion-exclusion sanity in exact regime
    x = _sk(range(0, 300))
    y = _sk(range(200, 500))
    u = _sk(range(0, 300)).merge(y)
    i = ThetaSketch.intersect(x, y)
    assert u.get_retained() == 500
    assert i.get_retained() == 100
    d = ThetaSketch.a_not_b(x, y)
    assert d.get_retained() == 200
    assert u.get_retained() == i.get_retained() + d.get_retained() \
        + ThetaSketch.a_not_b(y, x).get_retained()


def test_intersect_estimation_regime():
    k = 1024
    x = _sk(range(0, 50_000), k=k)
    y = _sk(range(25_000, 75_000), k=k)
    i = ThetaSketch.intersect(x, y)
    est = i.get_estimate()
    assert abs(est - 25_000) / 25_000 < 0.25   # intersect variance is worse


def test_serde_roundtrip():
    for sk in (_sk(range(10)), _sk(range(100_000), k=128)):
        back = ThetaSketch.from_bytes(sk.to_bytes())
        assert back.k == sk.k
        assert back._theta == sk._theta
        assert np.array_equal(back.hashes, sk.hashes)
        assert back.get_estimate() == sk.get_estimate()
    with pytest.raises(ValueError):
        ThetaSketch.from_bytes(b"\x07" + b"\x00" * 20)
    with pytest.raises(ValueError):
        ThetaSketch(1)
