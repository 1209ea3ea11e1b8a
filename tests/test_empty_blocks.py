"""Empty-block hardening: at high block counts (ReadParquet ->
SplitBlocks at num_cpus=32) zero-row blocks coming out of a
union/repartition can carry an EMPTY schema, which used to crash every
``pa.concat_tables(ray.get(ds.to_arrow_refs()))`` gather (observed on
region_revenue / supplier_balance in the round-1 driver run). These
tests manufacture the many-empty-block layout explicitly and drive the
shared gather + the broadcast join through it."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _many_block_ds(tmp_path, n_rows=5, n_blocks=64):
    import pyarrow.parquet as pq

    path = str(tmp_path / "right.parquet")
    pq.write_table(pa.table({
        "k": pa.array(np.arange(n_rows, dtype=np.int64)),
        "v": pa.array([f"v{i}" for i in range(n_rows)]),
    }), path)
    # 64-way split of a 5-row table: most blocks are empty
    return ray.data.read_parquet(path, override_num_blocks=n_blocks)


def test_gather_table_empty_schema_blocks(ray_session, tmp_path):
    from apache_datasketches_go_ray.stages.context import gather_table

    ds = _many_block_ds(tmp_path).repartition(64)
    tbl = gather_table(ds.materialize())
    assert tbl.num_rows == 5
    assert sorted(tbl.column("k").to_pylist()) == [0, 1, 2, 3, 4]


def test_gather_table_all_empty(ray_session, tmp_path):
    from apache_datasketches_go_ray.stages.context import gather_table

    ds = _many_block_ds(tmp_path).filter(expr="k > 1000").materialize()
    tbl = gather_table(ds)
    assert tbl.num_rows == 0
    assert "k" in tbl.schema.names


def test_broadcast_hash_join_many_empty_blocks(ray_session, tmp_path):
    from apache_datasketches_go_ray.stages.join import hash_join

    right = _many_block_ds(tmp_path).repartition(64)
    left = ray.data.from_arrow(pa.table({
        "lk": pa.array([0, 1, 2, 9], type=pa.int64()),
        "payload": pa.array(["a", "b", "c", "d"]),
    }))
    out = hash_join(left, right, on=("lk", "k")).to_pandas() \
        .sort_values("lk", ignore_index=True)
    assert out["lk"].tolist() == [0, 1, 2]
    assert out["v"].tolist() == ["v0", "v1", "v2"]


@pytest.mark.parametrize("keep", ["none", "one"])
def test_verify_broadcast_gather_empty_blocks(ray_session, tmp_path, keep):
    """The verify stage's candidate gather takes the same path."""
    from apache_datasketches_go_ray.stages.context import gather_table

    ds = _many_block_ds(tmp_path, n_rows=3, n_blocks=32)
    expr = "k > 1000" if keep == "none" else "k == 1"
    ds = ds.filter(expr=expr).repartition(16).materialize()
    tbl = gather_table(ds)
    assert tbl.num_rows == (0 if keep == "none" else 1)
