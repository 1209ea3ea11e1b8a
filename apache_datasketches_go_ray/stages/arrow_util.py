"""Small Arrow helpers shared by the stages."""

from __future__ import annotations

import pyarrow as pa


def as_array(col) -> pa.Array:
    """Column (Array | ChunkedArray) -> single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        return col.combine_chunks()
    return col
