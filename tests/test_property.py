"""Property-based tests (hypothesis) over the kernel substrate — a
stronger net than the reference's fixed-vector tests (SURVEY §5 notes
it ships no fuzzing)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from apache_datasketches_go_ray.functions.murmur3 import (
    hash_strings, murmur3_128,
)
from apache_datasketches_go_ray.state.kll import KllSketch
from apache_datasketches_go_ray.state.unionfind import (
    UnionFind, connected_components_numpy,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=50))
def test_vectorized_string_hash_matches_scalar(texts):
    h1, h2 = hash_strings(texts)
    for i, t in enumerate(texts):
        s1, s2 = murmur3_128(t.encode("utf-8"))
        assert h1[i] == s1 and h2[i] == s2


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32), min_size=1, max_size=2000),
       st.integers(min_value=0, max_value=99))
def test_kll_rank_error_property(values, pct):
    vals = np.array(values, dtype=np.float64)
    sk = KllSketch(200)
    sk.update_many(vals)
    assert sk.n == len(vals)
    assert sk.min_item == vals.min() and sk.max_item == vals.max()
    q = sk.get_quantile(pct / 100.0)
    true_rank = (np.sort(vals) <= q).mean()
    # k=200 normalized rank error bound with slack
    assert abs(true_rank - pct / 100.0) <= 0.035 or len(vals) <= 200


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=2, max_value=200),
       st.lists(st.tuples(st.integers(0, 199), st.integers(0, 199)),
                max_size=400))
def test_numpy_cc_matches_dict_dsu(k, edges):
    edges = [(a % k, b % k) for a, b in edges]
    u = np.array([e[0] for e in edges], dtype=np.int64)
    v = np.array([e[1] for e in edges], dtype=np.int64)
    lab = connected_components_numpy(u, v, k)
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    comp = uf.components()
    for node, root in comp.items():
        assert lab[node] == root
    # untouched nodes are their own singleton components
    touched = set(comp)
    for n in range(k):
        if n not in touched:
            assert lab[n] == n
