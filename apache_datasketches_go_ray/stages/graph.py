"""Generic graph analytics over edge tables.

The flagship dedup pipeline's distributed union-find
(stages/cluster.py:cluster_edges, the large/small-star rounds) is exposed
here as a general-purpose connected-components operator over ANY edge
table, plus an exact distributed triangle counter (compact-forward with
degree-ordered orientation, the standard two-shuffle MapReduce scheme).

Scale notes (100 TB posture):
- connected_components inherits cluster_edges' properties: O(log^2 n)
  star rounds of keyed shuffles, driver state bounded (edge fingerprint
  only), small edge sets finish with one vectorized local pass.
- triangle_counts orients every edge from its lower-(degree, id) endpoint
  to the higher one, so wedge generation per node is bounded by its
  *effective* (oriented, out-) degree squared — the hub that breaks the
  naive algorithm has out-degree ~0 after orientation. Wedge closure is a
  keyed co-partition against the canonical edge set: no broadcast of the
  edge set, no all-pairs.

Parity lineage: the mergeability discipline mirrors the reference's
union contract (hll/union.go:151-158) — every stage is a partial
per-block computation folded through a keyed shuffle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .arrow_util import as_array
from .cluster import cluster_edges
from .context import auto_partitions

_PAD = 20  # zero-pad width: lexicographic min == numeric min for int64 >= 0


def _lpad(arr: pa.Array) -> pa.Array:
    return pc.utf8_lpad(arr.cast(pa.string()), _PAD, "0")


def connected_components(edges_ds, src: str = "a", dst: str = "b", *,
                         num_partitions: int = 8):
    """Undirected connected components over an (src, dst) edge table of
    non-negative int64 node ids.

    Returns a Dataset (node: int64, component: int64) where component is
    the MINIMUM node id in the node's component. Only nodes that appear
    in at least one edge are returned (isolated nodes are implicit
    singleton components), matching the SQL min-label-propagation
    fixpoint oracle.
    """

    def enc(b: pa.Table) -> pa.Table:
        if len(b):
            # self-loops add nothing (a singleton is its own component)
            b = b.filter(pc.invert(pc.equal(b.column(src), b.column(dst))))
        if len(b) == 0:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string())})
        return pa.table({"a": _lpad(as_array(b.column(src))),
                         "b": _lpad(as_array(b.column(dst)))})

    labs = cluster_edges(
        edges_ds.map_batches(enc, batch_format="pyarrow",
                             zero_copy_batch=True),
        num_partitions=num_partitions)

    def dec(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "component": pa.array([], type=pa.int64())})
        return pa.table({
            "node": b.column("conv_id").cast(pa.int64()),
            "component": b.column("cluster_id").cast(pa.int64()),
        })

    return labs.map_batches(dec, batch_format="pyarrow",
                            zero_copy_batch=True)


_EDGE_EMPTY = pa.table({"u": pa.array([], type=pa.int64()),
                        "v": pa.array([], type=pa.int64())})
_TRI_EMPTY = pa.table({"node": pa.array([], type=pa.int64()),
                       "n_triangles": pa.array([], type=pa.int64())})


def _canon_block(b: pa.Table, src: str, dst: str) -> pa.Table:
    """(src, dst) -> distinct canonical (u=min, v=max), self-loops dropped."""
    if len(b) == 0:
        return _EDGE_EMPTY
    a = as_array(b.column(src)).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    c = as_array(b.column(dst)).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    u = np.minimum(a, c)
    v = np.maximum(a, c)
    keep = u != v
    u, v = u[keep], v[keep]
    if not len(u):
        return _EDGE_EMPTY
    return pa.table({"u": pa.array(u), "v": pa.array(v)}).group_by(
        ["u", "v"]).aggregate([])


def _dedup_uv(b: pa.Table) -> pa.Table:
    if len(b) == 0:
        return _EDGE_EMPTY
    return b.group_by(["u", "v"]).aggregate([])


def triangle_counts(edges_ds, src: str = "a", dst: str = "b", *,
                    num_partitions: int = 8):
    """Exact per-node triangle participation counts over an undirected
    simple graph given as an (src, dst) int64 edge table (duplicates and
    self-loops tolerated; orientation of the input rows irrelevant).

    Returns (node: int64, n_triangles: int64) for nodes in >= 1 triangle.

    Shape: canonical-edge dedup shuffle -> degree fold -> degree-ordered
    orientation (map-side, degrees attached via keyed joins) -> per-source
    wedge expansion -> (u, v)-keyed co-partition closure against the
    canonical edges -> per-corner count fold. Every intermediate is
    bounded: wedges by sum of oriented-degree^2, closure groups by the
    wedge multiplicity of a single edge key.
    """
    import ray
    import ray.data  # noqa: F401

    n_in = edges_ds.count()
    P = auto_partitions(max(n_in, 1), 500_000, num_partitions)

    canon = (edges_ds
             .map_batches(lambda b: _canon_block(b, src, dst),
                          batch_format="pyarrow", zero_copy_batch=True)
             .repartition(P, keys=["u", "v"])
             .map_batches(_dedup_uv, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
             .materialize())
    if canon.count() == 0:
        return ray.data.from_arrow(_TRI_EMPTY)

    # Degrees: both endpoints -> keyed count. The degree table is
    # node-sized; it is re-joined to the edges by key, never broadcast.
    def endpoints(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"node": pa.array([], type=pa.int64())})
        return pa.table({"node": pa.concat_arrays(
            [as_array(b.column("u")), as_array(b.column("v"))])})

    def deg_fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "deg": pa.array([], type=pa.int64())})
        g = b.group_by("node").aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "deg": g.column("count_all").cast(pa.int64())})

    degrees = (canon.map_batches(endpoints, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .repartition(P, keys=["node"])
               .map_batches(deg_fold, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))

    from .join import hash_join

    with_du = hash_join(canon, degrees.rename_columns(["node", "deg_u"]),
                        on=("u", "node"), num_partitions=P)
    with_both = hash_join(with_du,
                          degrees.rename_columns(["node", "deg_v"]),
                          on=("v", "node"), num_partitions=P)

    # Orient each edge from its lower-(deg, id) endpoint to the higher.
    def orient(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"s": pa.array([], type=pa.int64()),
                             "t": pa.array([], type=pa.int64())})
        u = as_array(b.column("u")).to_numpy(zero_copy_only=False)
        v = as_array(b.column("v")).to_numpy(zero_copy_only=False)
        du = as_array(b.column("deg_u")).to_numpy(zero_copy_only=False)
        dv = as_array(b.column("deg_v")).to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        s = np.where(u_first, u, v)
        t = np.where(u_first, v, u)
        return pa.table({"s": pa.array(s), "t": pa.array(t)})

    oriented = with_both.map_batches(orient, batch_format="pyarrow",
                                     zero_copy_batch=True)

    _WEDGE_EMPTY = pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64()),
                             "center": pa.array([], type=pa.int64())})

    # Wedges: for each source s, all unordered out-neighbor pairs. The
    # closure key is the canonical (min, max) of the pair so it meets the
    # canonical edge table on the same partitioning.
    def wedges(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _WEDGE_EMPTY
        s = as_array(b.column("s")).to_numpy(zero_copy_only=False)
        t = as_array(b.column("t")).to_numpy(zero_copy_only=False)
        order = np.lexsort((t, s))
        ss, ts = s[order], t[order]
        first = np.empty(len(ss), dtype=bool)
        first[0] = True
        np.not_equal(ss[1:], ss[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(ss)))
        a_parts, b_parts, c_parts = [], [], []
        for g in np.unique(lens):
            if g < 2:
                continue
            offs = starts[lens == g]
            idx = offs[:, None] + np.arange(g)
            ii, jj = np.triu_indices(g, k=1)
            ta = ts[idx][:, ii].ravel()
            tb = ts[idx][:, jj].ravel()
            a_parts.append(np.minimum(ta, tb))
            b_parts.append(np.maximum(ta, tb))
            c_parts.append(np.repeat(ss[offs], len(ii)))
        if not a_parts:
            return _WEDGE_EMPTY
        return pa.table({"u": pa.array(np.concatenate(a_parts)),
                         "v": pa.array(np.concatenate(b_parts)),
                         "center": pa.array(np.concatenate(c_parts))})

    wedge_ds = (oriented.repartition(P, keys=["s"])
                .map_batches(wedges, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True))

    # Tag-union closure: edges carry center = -1 (node ids are
    # non-negative); wedges carry their center. After the (u, v) keyed
    # shuffle a wedge is a triangle iff its (u, v) key also appears as an
    # edge row in the same block.
    def tag_edge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _WEDGE_EMPTY
        return b.append_column(
            "center", pa.array(np.full(len(b), -1, dtype=np.int64)))

    tagged = wedge_ds.union(canon.map_batches(
        tag_edge, batch_format="pyarrow", zero_copy_batch=True))

    def close_block(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _TRI_EMPTY
        u = as_array(b.column("u")).to_numpy(zero_copy_only=False)
        v = as_array(b.column("v")).to_numpy(zero_copy_only=False)
        c = as_array(b.column("center")).to_numpy(zero_copy_only=False)
        is_edge = c == -1
        if not is_edge.any() or is_edge.all():
            return _TRI_EMPTY
        # composite lexicographic membership via sorted structured arrays
        edge_rec = np.empty(int(is_edge.sum()), dtype=[("u", np.int64),
                                                       ("v", np.int64)])
        edge_rec["u"], edge_rec["v"] = u[is_edge], v[is_edge]
        edge_rec.sort(order=("u", "v"))
        wu, wv, wc = u[~is_edge], v[~is_edge], c[~is_edge]
        wedge_rec = np.empty(len(wu), dtype=[("u", np.int64),
                                             ("v", np.int64)])
        wedge_rec["u"], wedge_rec["v"] = wu, wv
        idx = np.searchsorted(edge_rec, wedge_rec, side="left")
        hit = np.zeros(len(wu), dtype=bool)
        idx_ok = idx < len(edge_rec)
        hit[idx_ok] = edge_rec[idx[idx_ok]] == wedge_rec[idx_ok]
        if not hit.any():
            return _TRI_EMPTY
        corners = np.concatenate([wu[hit], wv[hit], wc[hit]])
        nodes, cnt = np.unique(corners, return_counts=True)
        return pa.table({"node": pa.array(nodes),
                         "n_triangles": pa.array(cnt.astype(np.int64))})

    def count_fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _TRI_EMPTY
        g = b.group_by("node").aggregate([("n_triangles", "sum")])
        return pa.table({
            "node": g.column("node"),
            "n_triangles": g.column("n_triangles_sum").cast(pa.int64()),
        })

    return (tagged.repartition(P, keys=["u", "v"])
            .map_batches(close_block, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
            .repartition(max(P // 2, 1), keys=["node"])
            .map_batches(count_fold, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))
