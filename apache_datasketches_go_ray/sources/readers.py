"""Multi-format transcript ingestion normalized to the canonical schema.

The engine's canonical transcript schema (BASELINE.json input_hint) is
  conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string, ts:timestamp[us]

Real transcript corpora arrive as Parquet, JSONL or CSV with loose
types (ints as strings, epoch floats, missing tool column). Each reader
returns a `ray.data.Dataset` already coerced to the canonical schema by
a vectorized `map_batches` pass, so every downstream stage can assume
exact types. Reads are streaming (`read_parquet` / `read_json` /
`read_csv` with column pruning where the format supports it) — no
driver-side materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CANONICAL_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_COLS = [f.name for f in CANONICAL_SCHEMA]


def normalize_batch(b: pa.Table) -> pa.Table:
    """Coerce a loose transcript batch to the canonical schema.

    Rules: conv_id/role/text/tool cast to string ('' for missing tool
    or nulls in tool/text); turn_idx int-castable (string digits ok);
    ts accepts timestamp (any unit), ISO-8601 strings, or numeric
    epoch seconds (float) / microseconds (int)."""
    cols: dict[str, pa.Array] = {}
    names = set(b.column_names)

    def col(n):
        return b.column(n).combine_chunks() if n in names else None

    cols["conv_id"] = col("conv_id").cast(pa.string())
    ti = col("turn_idx")
    if pa.types.is_string(ti.type) or pa.types.is_large_string(ti.type):
        ti = pc.cast(ti, pa.int64())
    cols["turn_idx"] = ti.cast(pa.int32())
    cols["role"] = col("role").cast(pa.string())
    text = col("text").cast(pa.string())
    cols["text"] = pc.fill_null(text, "")
    tool = col("tool")
    if tool is None:
        cols["tool"] = pa.nulls(len(b), pa.string()).fill_null("")
    else:
        cols["tool"] = pc.fill_null(tool.cast(pa.string()), "")
    ts = col("ts")
    if pa.types.is_timestamp(ts.type):
        ts = ts.cast(pa.timestamp("us"))
    elif pa.types.is_string(ts.type) or pa.types.is_large_string(ts.type):
        # ISO-8601; Arrow's cast parses fractional seconds (strptime %f
        # is unsupported in Arrow)
        ts = ts.cast(pa.timestamp("us"))
    elif pa.types.is_floating(ts.type):
        # epoch seconds
        us = pc.round(pc.multiply(ts, 1_000_000.0)).cast(pa.int64())
        ts = us.cast(pa.timestamp("us"))
    else:
        # integer epoch microseconds
        ts = ts.cast(pa.int64()).cast(pa.timestamp("us"))
    cols["ts"] = ts
    return pa.table({n: cols[n] for n in _COLS})


def read_transcripts(paths, format: str = "parquet") -> ray.data.Dataset:
    """Read a transcript corpus in parquet / jsonl / csv form, coerced
    to the canonical schema."""
    if format == "parquet":
        ds = ray.data.read_parquet(paths, columns=_COLS)
    elif format in ("json", "jsonl"):
        ds = ray.data.read_json(paths)
    elif format == "csv":
        ds = ray.data.read_csv(paths)
    else:
        raise ValueError(f"unsupported transcript format: {format}")
    return ds.map_batches(normalize_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_transcripts_jsonl(table: pa.Table, path: str) -> None:
    """Test/interchange helper: dump a canonical transcript table as
    JSONL with ISO timestamps (the inverse of read_transcripts jsonl)."""
    import json

    # Arrow's %S already includes fractional seconds (%f is unsupported)
    ts_iso = pc.strftime(table.column("ts").cast(pa.timestamp("us")),
                         format="%Y-%m-%dT%H:%M:%S")
    with open(path, "w") as f:
        for i in range(len(table)):
            rec = {
                "conv_id": table.column("conv_id")[i].as_py(),
                "turn_idx": table.column("turn_idx")[i].as_py(),
                "role": table.column("role")[i].as_py(),
                "text": table.column("text")[i].as_py(),
                "tool": table.column("tool")[i].as_py(),
                "ts": ts_iso[i].as_py(),
            }
            f.write(json.dumps(rec) + "\n")
