"""Distributed union-find: iterative hash-partitioned edge exchange.

Connected components over the verified edge set via alternating
large-star / small-star rounds (Kiveris et al., "Connected Components in
MapReduce and Beyond" — public algorithm), which converges in O(log^2 n)
rounds even on long chains (the skew-cap pair chains from stages/lsh.py
can be long). Built ONLY from key-colocating hash shuffles
(``repartition(keys=...)``) and vectorized per-block group scans — no
driver-side row loops, no Dataset.join.

  large-star(u): for neighbors v > u, rewire v to m = min(N(u) ∪ {u})
  small-star(u): for neighbors v <= u, rewire v and u to
                 m = min({v in N(u): v <= u} ∪ {u})

The edge set monotonically contracts toward stars rooted at each
component's minimum id; at the fixed point every edge is (component_min,
member), giving deterministic min-id cluster labels identical to the
single-process oracle's DSU labeling. Fixed point is detected by an
(edge-count, order-independent checksum) pair going stable.

Each round's edge set can be checkpointed through ``checkpoint_cb``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .arrow_util import as_array
from ..functions.murmur3 import fmix64, hash_strings


def _group_bounds(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    newgrp = np.ones(len(sorted_keys), dtype=bool)
    if len(sorted_keys) > 1:
        newgrp[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.flatnonzero(newgrp)
    ends = np.concatenate([starts[1:], [len(sorted_keys)]])
    return starts, ends


def _explode_bidirectional(batch: pa.Table) -> pa.Table:
    a = as_array(batch.column("a")).cast(pa.string())
    b = as_array(batch.column("b")).cast(pa.string())
    return pa.table({
        "u": pa.concat_arrays([a, b]),
        "v": pa.concat_arrays([b, a]),
    })


def _star_block(batch: pa.Table, large: bool) -> pa.Table:
    """One star operation over all nodes whose neighborhoods live in this
    block (hash-partitioned on u)."""
    u = np.asarray(as_array(batch.column("u")).to_pylist(), dtype=object)
    v = np.asarray(as_array(batch.column("v")).to_pylist(), dtype=object)
    order = np.lexsort((v, u))
    u_s, v_s = u[order], v[order]
    starts, ends = _group_bounds(u_s)
    a_out: list = []
    b_out: list = []
    for s, e in zip(starts, ends):
        node = u_s[s]
        nbrs = v_s[s:e]
        if large:
            m = min(node, nbrs[0])  # nbrs sorted; nbrs[0] is min neighbor
            for t in nbrs:
                if t > node and t != m:
                    a_out.append(m if m < t else t)
                    b_out.append(t if m < t else m)
        else:
            small = [t for t in nbrs if t <= node]
            m = min([node] + small) if small else node
            for t in small:
                if t != m:
                    a_out.append(m)
                    b_out.append(t)
            if node != m:
                a_out.append(m)
                b_out.append(node)
    return pa.table({"a": pa.array(a_out, type=pa.string()),
                     "b": pa.array(b_out, type=pa.string())})


def _dedup_block(batch: pa.Table) -> pa.Table:
    if len(batch) == 0:
        return batch
    t = batch.group_by(["a", "b"]).aggregate([])
    return t.select(["a", "b"])


def _checksum_block(batch: pa.Table) -> pa.Table:
    """Order-independent (count, sum-of-hash) fingerprint of an edge set."""
    n = len(batch)
    if n == 0:
        return pa.table({"n": pa.array([0], type=pa.int64()),
                         "h": pa.array([0], type=pa.uint64())})
    a = as_array(batch.column("a")).to_pylist()
    b = as_array(batch.column("b")).to_pylist()
    ha, _ = hash_strings(a)
    hb, _ = hash_strings(b)
    h = fmix64(ha * np.uint64(3) ^ hb)
    with np.errstate(over="ignore"):
        total = np.uint64(np.sum(h, dtype=np.uint64))
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "h": pa.array([int(total)], type=pa.uint64())})


def _fingerprint(edges) -> tuple[int, int]:
    parts = edges.map_batches(_checksum_block, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    n = sum(p["n"] for p in parts)
    h = 0
    for p in parts:
        h = (h + int(p["h"])) & 0xFFFFFFFFFFFFFFFF
    return n, h


def _star_round(edges, P: int, large: bool):
    return (
        edges.map_batches(_explode_bidirectional, batch_format="pyarrow",
                          zero_copy_batch=True)
        .repartition(P, keys=["u"])
        .map_batches(lambda t, large=large: _star_block(t, large),
                     batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .repartition(P, keys=["a", "b"])
        .map_batches(_dedup_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def cluster_edges(edges_ds, num_partitions: int, max_rounds: int = 40,
                  checkpoint_cb=None):
    """edge table (a, b) -> cluster assignment (conv_id, cluster_id).

    Only nodes appearing in edges are returned (singleton convs are
    implicit clusters of themselves)."""
    P = num_partitions
    empty = pa.table({"conv_id": pa.array([], type=pa.string()),
                      "cluster_id": pa.array([], type=pa.string())})
    edges = edges_ds.select_columns(["a", "b"]).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    fp = _fingerprint(edges)
    for rnd in range(max_rounds):
        edges = _star_round(edges, P, large=True).materialize()
        edges = _star_round(edges, P, large=False).materialize()
        if checkpoint_cb is not None:
            checkpoint_cb(rnd, edges)
        new_fp = _fingerprint(edges)
        if new_fp == fp:
            break
        fp = new_fp

    # fixed point: every edge is (component_min, member). Labels: member ->
    # min neighbor; centers label themselves.
    def labels_block(batch: pa.Table) -> pa.Table:
        u = np.asarray(as_array(batch.column("u")).to_pylist(), dtype=object)
        v = np.asarray(as_array(batch.column("v")).to_pylist(), dtype=object)
        order = np.lexsort((v, u))
        u_s, v_s = u[order], v[order]
        starts, _ends = _group_bounds(u_s)
        nodes = u_s[starts]
        min_nbr = v_s[starts]
        lab = np.minimum(nodes, min_nbr)
        return pa.table({"conv_id": pa.array(nodes, type=pa.string()),
                         "cluster_id": pa.array(lab, type=pa.string())})

    return (
        edges.map_batches(_explode_bidirectional, batch_format="pyarrow",
                          zero_copy_batch=True)
        .repartition(P, keys=["u"])
        .map_batches(labels_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
