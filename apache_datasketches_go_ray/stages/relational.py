"""Relational building blocks beyond the equi-join: scalable top-k,
exact grouped distinct counts, and broadcast semi/anti joins.

Each follows the partial-combine-final discipline the reference's
mergeable sketches impose (SURVEY.md §3.4): per-block combiners shrink
data before any shuffle, and the "final" step only ever sees k rows per
block (top_k) or pre-distinct keys (distinct counts).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .context import auto_partitions


def _topk_block(b: pa.Table, sort_keys: list[tuple[str, str]],
                k: int) -> pa.Table:
    if len(b) <= k:
        return b
    idx = pc.sort_indices(b, sort_keys=sort_keys)[:k]
    return b.take(idx)


def top_k(ds, sort_keys: list[tuple[str, str]], k: int):
    """Global top-k rows under a (col, 'ascending'|'descending') order.

    Per-block partial top-k (the combiner — each block forwards at most
    k rows) -> single final block -> exact top-k. No global sort: the
    all-to-all a `ds.sort().limit(k)` would pay is replaced by a
    gather of num_blocks*k rows."""
    partial = ds.map_batches(
        functools.partial(_topk_block, sort_keys=sort_keys, k=k),
        batch_format="pyarrow", zero_copy_batch=True)
    return partial.repartition(1).map_batches(
        functools.partial(_topk_block, sort_keys=sort_keys, k=k),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def distinct_count_by(ds, group_col: str, distinct_col: str, *,
                      num_partitions: int = 32):
    """Exact count(DISTINCT distinct_col) per group_col.

    Per-block pre-distinct (combiner) -> hash shuffle on BOTH columns
    (global distinct without ever co-locating a whole group) ->
    per-block distinct + per-group partial counts -> tiny shuffle on
    group -> sum. Two shuffles, both over pre-shrunk data."""

    def pre(b: pa.Table) -> pa.Table:
        return b.select([group_col, distinct_col]) \
            .group_by([group_col, distinct_col]).aggregate([])

    def count_partial(b: pa.Table) -> pa.Table:
        d = b.group_by([group_col, distinct_col]).aggregate([])
        g = d.group_by(group_col).aggregate([(distinct_col, "count")])
        return pa.table({
            group_col: g.column(group_col),
            "n_distinct": g.column(f"{distinct_col}_count")
                .cast(pa.int64()),
        })

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(group_col).aggregate([("n_distinct", "sum")])
        return pa.table({
            group_col: g.column(group_col),
            "n_distinct": g.column("n_distinct_sum").cast(pa.int64()),
        })

    P = auto_partitions(ds.count(), 500_000, num_partitions)
    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(P, keys=[group_col, distinct_col])
        .map_batches(count_partial, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
        .repartition(min(8, P), keys=[group_col])
        .map_batches(fold, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def _distinct_keys_table(ds, col: str) -> pa.Table:
    """Driver-side distinct key column of a dataset (combiner first, so
    only pre-distinct per-block keys cross the wire)."""

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(b.column(col).combine_chunks())})

    parts = ray.get(ds.map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs())
    allk = pa.concat_tables([p for p in parts if len(p)]) if parts \
        else pa.table({col: pa.array([])})
    return pa.table({col: pc.unique(allk.column(col).combine_chunks())})


def _semi_anti_batch(b: pa.Table, keys_ref, lk: str, rk: str,
                     join_type: str) -> pa.Table:
    from .join import _RIGHT_CACHE

    key = keys_ref.hex() if hasattr(keys_ref, "hex") else id(keys_ref)
    right = _RIGHT_CACHE.get(key)
    if right is None:
        right = ray.get(keys_ref)
        _RIGHT_CACHE[key] = right
    return b.join(right, keys=[lk], right_keys=[rk], join_type=join_type)


def semi_join(left_ds, right_ds, on: tuple[str, str]):
    """left rows whose key appears in right (broadcast the distinct right
    keys once via ray.put; map-only, zero shuffles)."""
    return _semi_anti(left_ds, right_ds, on, "left semi")


def anti_join(left_ds, right_ds, on: tuple[str, str]):
    """left rows whose key does NOT appear in right."""
    return _semi_anti(left_ds, right_ds, on, "left anti")


def _semi_anti(left_ds, right_ds, on: tuple[str, str], join_type: str):
    lk, rk = on
    keys_ref = ray.put(_distinct_keys_table(right_ds, rk))
    return left_ds.map_batches(
        functools.partial(_semi_anti_batch, keys_ref=keys_ref, lk=lk,
                          rk=rk, join_type=join_type),
        batch_format="pyarrow", zero_copy_batch=True)


def range_sort(ds, col: str, *, num_partitions: int = 16,
               descending: bool = False, kll_k: int = 400):
    """Globally-ordered output via KLL range partitioning — the
    reference's GetPartitionBoundaries
    (kll/items_sketch_partition_boundaries.go:35-59) applied to its
    stated purpose: sizing a range shuffle.

    One sampling pass builds a merged KLL sketch of the sort column
    (KB-sized partials, driver merge); evenly-spaced-rank boundaries
    assign each row a partition id; a hash shuffle on the id co-locates
    each range; blocks sort locally. Ordering holds across blocks when
    read in partition order (__part is ascending in the output and
    dropped after verification). Unlike ds.sort() this exposes the
    boundary state (checkpointable, reusable across runs)."""
    from ..state.kll import KllSketch

    def sample(b: pa.Table) -> pa.Table:
        sk = KllSketch(kll_k)
        vals = b.column(col).to_numpy(zero_copy_only=False)
        sk.update_many(vals.astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()],
                                        type=pa.large_binary())})

    merged = KllSketch(kll_k)
    for r in ds.select_columns([col]).map_batches(
            sample, batch_format="pyarrow",
            zero_copy_batch=True).take_all():
        merged.merge(KllSketch.from_bytes(r["sk"]))
    inner = merged.get_partition_boundaries(num_partitions)[1:-1]
    bounds = np.unique(inner)

    def assign(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        part = np.searchsorted(bounds, vals, side="right")
        if descending:
            part = len(bounds) - part
        return b.append_column("__part",
                               pa.array(part.astype(np.int64)))

    def sort_block(b: pa.Table) -> pa.Table:
        order = "descending" if descending else "ascending"
        idx = pc.sort_indices(b, sort_keys=[(col, order)])
        return b.take(idx)

    return (
        ds.map_batches(assign, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(len(bounds) + 1, keys=["__part"])
        .map_batches(sort_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
