"""Generic graph operators (stages/graph.py) vs brute single-process
oracles, across >= 2 partitionings."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _random_graph(seed, n_nodes=60, n_edges=120):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    # keep some duplicates and reversed duplicates on purpose; drop
    # nothing — the operators must canonicalize themselves
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def _brute_components(tbl):
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    keep = a != b
    a, b = a[keep], b[keep]
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {n: find(n) for n in parent}


def _brute_triangles(tbl):
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    edges = set()
    for x, y in zip(a.tolist(), b.tolist()):
        if x != y:
            edges.add((min(x, y), max(x, y)))
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    counts = {}
    for (x, y) in edges:
        for z in adj[x] & adj[y]:
            if z > y:  # each triangle once: x < y < z by construction
                for n in (x, y, z):
                    counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.parametrize("seed,blocks", [(1, 1), (1, 5), (2, 3)])
def test_connected_components_brute_parity(ray_session, seed, blocks):
    from apache_datasketches_go_ray.stages.graph import connected_components

    tbl = _random_graph(seed)
    out = connected_components(_ds(tbl, blocks), "a", "b",
                               num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    want = _brute_components(tbl)
    assert got == want


@pytest.mark.parametrize("seed,blocks", [(1, 1), (1, 5), (3, 4)])
def test_triangle_counts_brute_parity(ray_session, seed, blocks):
    from apache_datasketches_go_ray.stages.graph import triangle_counts

    tbl = _random_graph(seed, n_nodes=40, n_edges=160)
    out = triangle_counts(_ds(tbl, blocks), "a", "b",
                          num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    want = _brute_triangles(tbl)
    assert got == want
    assert all(v > 0 for v in got.values())


def test_triangle_counts_known_graph(ray_session):
    """K4 plus a pendant: every K4 node is in C(3,2)=3 triangles."""
    from apache_datasketches_go_ray.stages.graph import triangle_counts

    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    tbl = pa.table({"a": pa.array([x for x, _ in e], type=pa.int64()),
                    "b": pa.array([y for _, y in e], type=pa.int64())})
    out = triangle_counts(_ds(tbl, 2), "a", "b").to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def _brute_pagerank(tbl, iterations=3, num=17, den=20):
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    edges = set()
    for x, y in zip(a.tolist(), b.tolist()):
        if x != y:
            edges.add((min(x, y), max(x, y)))
    adj = {}
    for x, y in edges:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    base = ((den - num) * 1_000_000_000) // den
    rank = {n: 1_000_000_000 for n in adj}
    for _ in range(iterations):
        inc = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            c = rank[n] // len(nbrs)
            for m in nbrs:
                inc[m] += c
        rank = {n: base + (num * inc[n]) // den for n in adj}
    return rank


def _brute_bfs(tbl, source, max_hops=8):
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    adj = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x != y:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
    dist = {source: 0}
    frontier = [source]
    for h in range(1, max_hops + 1):
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.append(m)
        frontier = nxt
        if not frontier:
            break
    return dist


@pytest.mark.parametrize("seed,blocks", [(1, 1), (1, 4), (5, 3)])
def test_pagerank_brute_parity(ray_session, seed, blocks):
    from apache_datasketches_go_ray.stages.graph import pagerank_ppb

    tbl = _random_graph(seed, n_nodes=50, n_edges=130)
    out = pagerank_ppb(_ds(tbl, blocks), "a", "b",
                       iterations=3, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["rank_ppb"]))
    assert got == _brute_pagerank(tbl)


@pytest.mark.parametrize("seed,blocks", [(1, 1), (1, 4), (7, 2)])
def test_bfs_hops_brute_parity(ray_session, seed, blocks):
    from apache_datasketches_go_ray.stages.graph import bfs_hops

    tbl = _random_graph(seed, n_nodes=80, n_edges=110)
    src = int(min(tbl.column("a")[0].as_py(), tbl.column("b")[0].as_py()))
    out = bfs_hops(_ds(tbl, blocks), "a", "b", source=src,
                   max_hops=5, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["hops"]))
    assert got == _brute_bfs(tbl, src, max_hops=5)


def test_bfs_default_source_and_cap(ray_session):
    """Default source = min node id; max_hops truncates the frontier."""
    from apache_datasketches_go_ray.stages.graph import bfs_hops

    # path 3-4-5-6-7
    tbl = pa.table({"a": pa.array([3, 4, 5, 6], type=pa.int64()),
                    "b": pa.array([4, 5, 6, 7], type=pa.int64())})
    out = bfs_hops(_ds(tbl, 2), "a", "b", max_hops=2).to_pandas()
    got = dict(zip(out["node"], out["hops"]))
    assert got == {3: 0, 4: 1, 5: 2}


def _brute_kcore(tbl, k):
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    adj = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x != y:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items()}


@pytest.mark.parametrize("seed,blocks,k", [(1, 1, 2), (1, 4, 3), (9, 3, 2)])
def test_kcore_brute_parity(ray_session, seed, blocks, k):
    from apache_datasketches_go_ray.stages.graph import kcore

    tbl = _random_graph(seed, n_nodes=40, n_edges=140)
    out = kcore(_ds(tbl, blocks), "a", "b", k=k,
                num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["core_deg"]))
    assert got == _brute_kcore(tbl, k)


def test_kcore_peels_to_empty(ray_session):
    """A tree has no 2-core at all."""
    from apache_datasketches_go_ray.stages.graph import kcore

    tbl = pa.table({"a": pa.array([0, 0, 1, 1, 2], type=pa.int64()),
                    "b": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    assert kcore(_ds(tbl, 2), "a", "b", k=2).count() == 0
    # K4 plus pendant: the 3-core is exactly the K4 at degree 3
    e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    k4 = pa.table({"a": pa.array([x for x, _ in e], type=pa.int64()),
                   "b": pa.array([y for _, y in e], type=pa.int64())})
    out = kcore(_ds(k4, 2), "a", "b", k=3).to_pandas()
    assert dict(zip(out["node"], out["core_deg"])) == {
        0: 3, 1: 3, 2: 3, 3: 3}


def test_graph_ops_empty_and_triangle_free(ray_session):
    from apache_datasketches_go_ray.stages.graph import (
        connected_components, triangle_counts,
    )

    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    assert connected_components(_ds(empty, 1), "a", "b").count() == 0
    assert triangle_counts(_ds(empty, 1), "a", "b").count() == 0

    from apache_datasketches_go_ray.stages.graph import (
        bfs_hops, pagerank_ppb,
    )
    assert pagerank_ppb(_ds(empty, 1), "a", "b").count() == 0
    assert bfs_hops(_ds(empty, 1), "a", "b").count() == 0

    # a path graph has components but no triangles; self-loops ignored
    path = pa.table({"a": pa.array([0, 1, 2, 7, 5], type=pa.int64()),
                     "b": pa.array([1, 2, 3, 7, 6], type=pa.int64())})
    comp = connected_components(_ds(path, 2), "a", "b").to_pandas()
    got = dict(zip(comp["node"], comp["component"]))
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 5: 5, 6: 5}
    assert triangle_counts(_ds(path, 2), "a", "b").count() == 0


def _brute_bridges(edges):
    """Edge is a bridge iff removing it disconnects its endpoints
    (simple-graph semantics: duplicates collapse)."""
    from collections import defaultdict, deque

    edges = sorted(set(edges))

    def connected(u, v, skip):
        adj = defaultdict(list)
        for (a, b) in edges:
            if (a, b) == skip:
                continue
            adj[a].append(b)
            adj[b].append(a)
        seen = {u}
        dq = deque([u])
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    dq.append(y)
        return v in seen

    out = set()
    for e in set(edges):
        if e[0] != e[1] and not connected(e[0], e[1], e):
            out.add(e)
    return out


@pytest.mark.parametrize("seed", [1, 5, 9])
def test_bridge_edges_match_brute(ray_session, seed):
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.graph import bridge_edges

    rng = np.random.default_rng(seed)
    # sparse random graph + a guaranteed pendant chain (bridges)
    n = 60
    m = 70
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    chain = [(100, 101), (101, 102), (0, 102)]
    edges = [(int(min(x, y)), int(max(x, y)))
             for x, y in zip(a, b) if x != y] + chain
    tbl = pa.table({
        "a": pa.array([e[0] for e in edges], type=pa.int64()),
        "b": pa.array([e[1] for e in edges], type=pa.int64()),
    })
    got = bridge_edges(ray.data.from_arrow(tbl).repartition(4)) \
        .to_pandas()
    got_bridges = {(int(r.u), int(r.v))
                   for r in got.itertuples() if r.is_bridge == 1}
    assert got_bridges == _brute_bridges(edges)
    # every canonical distinct edge classified exactly once
    assert len(got) == len(set(edges))
    # the planted pendant chain must be all bridges
    for e in chain:
        assert e in got_bridges
