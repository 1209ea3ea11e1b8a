"""Multi-format transcript ingestion: parquet/jsonl/csv readers all
normalize to the canonical schema with identical rows."""

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from apache_datasketches_go_ray.sources.readers import (
    CANONICAL_SCHEMA, normalize_batch, read_transcripts,
    write_transcripts_jsonl,
)
from apache_datasketches_go_ray.sources.transcripts import (
    conversations_to_table, generate_conversations,
)


@pytest.fixture(scope="module")
def canon_tbl():
    return conversations_to_table(generate_conversations(30, seed=9))


def _sorted_pdf(ds):
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"],
                                    ignore_index=True)
    return df


def test_parquet_roundtrip(canon_tbl, ray_session, tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(canon_tbl, p)
    ds = read_transcripts(p, format="parquet")
    assert ds.schema().base_schema == CANONICAL_SCHEMA
    df = _sorted_pdf(ds)
    exp = canon_tbl.to_pandas().sort_values(["conv_id", "turn_idx"],
                                            ignore_index=True)
    assert (df["text"] == exp["text"]).all()
    assert (df["ts"] == exp["ts"]).all()


def test_jsonl_matches_parquet(canon_tbl, ray_session, tmp_path):
    p = str(tmp_path / "t.jsonl")
    write_transcripts_jsonl(canon_tbl, p)
    ds = read_transcripts(p, format="jsonl")
    assert ds.schema().base_schema == CANONICAL_SCHEMA
    df = _sorted_pdf(ds)
    exp = canon_tbl.to_pandas().sort_values(["conv_id", "turn_idx"],
                                            ignore_index=True)
    for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        assert (df[c] == exp[c]).all(), c


def test_csv_matches_parquet(canon_tbl, ray_session, tmp_path):
    p = str(tmp_path / "t.csv")
    # CSV drops type info: ts as ISO string — reader must re-coerce
    iso = pa.compute.strftime(canon_tbl.column("ts"),
                              format="%Y-%m-%dT%H:%M:%S")
    tbl = canon_tbl.set_column(
        canon_tbl.schema.get_field_index("ts"), "ts", iso)
    pacsv.write_csv(tbl, p)
    ds = read_transcripts(p, format="csv")
    assert ds.schema().base_schema == CANONICAL_SCHEMA
    df = _sorted_pdf(ds)
    exp = canon_tbl.to_pandas().sort_values(["conv_id", "turn_idx"],
                                            ignore_index=True)
    for c in ("conv_id", "turn_idx", "role", "text", "ts"):
        assert (df[c] == exp[c]).all(), c


def test_normalize_loose_types():
    b = pa.table({
        "conv_id": pa.array([1, 2]),                   # ints -> string
        "turn_idx": pa.array(["0", "1"]),              # digit strings
        "role": pa.array(["user", "assistant"]),
        "text": pa.array(["hi", None]),                # null -> ""
        "ts": pa.array([1.5, 2.0], type=pa.float64()),  # epoch seconds
    })                                                  # no tool column
    out = normalize_batch(b)
    assert out.schema == CANONICAL_SCHEMA
    assert out.column("conv_id").to_pylist() == ["1", "2"]
    assert out.column("turn_idx").to_pylist() == [0, 1]
    assert out.column("text").to_pylist() == ["hi", ""]
    assert out.column("tool").to_pylist() == ["", ""]
    assert out.column("ts").cast(pa.int64()).to_pylist() == [1_500_000,
                                                             2_000_000]


def test_assemble_conv_grouped_fast_path(ray_session, tmp_path):
    """conv_grouped assembly (fragment combiner + fragment-only shuffle)
    produces exactly the same conversations as the always-correct
    shuffled path when the input files are sorted by
    (conv_id, turn_idx) — any row-range split keeps per-block turn
    ranges contiguous."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from apache_datasketches_go_ray.sources.transcripts import (
        write_transcripts,
    )
    from apache_datasketches_go_ray.stages.assemble import assemble

    base = str(tmp_path / "t")
    write_transcripts(base, 120, seed=42, shards=4)
    tdir = os.path.join(base, "transcripts")

    shuffled = ray.data.read_parquet(tdir)
    expected = assemble(shuffled, 4).to_pandas() \
        .sort_values("conv_id", ignore_index=True)

    # re-write the same rows conversation-contiguously, split mid-conv
    tbl = pq.read_table(tdir)
    idx = tbl.to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable").index.to_numpy()
    import pyarrow as pa

    sorted_tbl = tbl.take(pa.array(idx))
    sdir = tmp_path / "sorted"
    sdir.mkdir()
    n = sorted_tbl.num_rows
    cuts = [0, n // 3 + 1, 2 * n // 3 - 1, n]  # deliberately mid-conv
    for i in range(3):
        pq.write_table(sorted_tbl.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       str(sdir / f"part-{i}.parquet"))

    got = assemble(ray.data.read_parquet(str(sdir)), 4,
                   input_layout="conv_grouped").to_pandas() \
        .sort_values("conv_id", ignore_index=True)

    assert got["conv_id"].tolist() == expected["conv_id"].tolist()
    assert got["text"].tolist() == expected["text"].tolist()
    assert got["n_turns"].tolist() == expected["n_turns"].tolist()
