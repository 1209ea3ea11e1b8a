"""Conversation assembly: groupby(conv_id) with stable turn_idx sort.

Shuffle #1 of the pipeline. Rows arrive shuffled across convs/turns; we
hash-partition by conv_id (``repartition(P, keys=["conv_id"])`` — the
HASH_SHUFFLE strategy co-locates every conv's rows in exactly one block)
and assemble each conversation with a vectorized in-block lexsort instead
of per-group ``map_groups`` calls (which pay a Python call per conv).

Per-row invariant (BASELINE.json input_hint): per-turn text equality under
stable turn ordering — turns are ordered by turn_idx with a stable sort,
and the assembled text is the '\\n'-joined turn sequence. Ties on
(conv_id, turn_idx) keep input order (stable lexsort), and the original
turn texts are recoverable by splitting, which tests assert.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TURN_SEP = "\n"


def assemble_block(batch: pa.Table) -> pa.Table:
    """Assemble all conversations fully contained in this block."""
    from .arrow_util import as_array

    conv = as_array(batch.column("conv_id"))
    # dictionary-encode conv ids for a cheap integer sort key
    dict_arr = as_array(pc.dictionary_encode(conv))
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    convs = dict_arr.dictionary
    turn_idx = as_array(batch.column("turn_idx")).to_numpy(zero_copy_only=False)
    order = np.lexsort((turn_idx, codes))  # stable: by conv then turn
    codes_s = codes[order]
    texts = as_array(batch.column("text")).take(pa.array(order))

    n_convs = len(convs)
    counts = np.bincount(codes_s, minlength=n_convs)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    # native list-wrap + binary_join: no Python-string materialization
    turns = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        texts.cast(pa.string()) if texts.type != pa.string() else texts)
    joined = pc.binary_join(turns, TURN_SEP)
    return pa.table(
        {
            "conv_id": convs.cast(pa.string()),
            "text": joined,
            "n_turns": pa.array(counts.astype(np.int32)),
        }
    )


def assemble(ds, num_partitions: int):
    """transcript rows -> one row per conversation (conv_id, text, n_turns)."""
    from .context import auto_partitions

    # ~25k turns/partition: downstream signer tasks are per-block, so this
    # also sets the signing parallelism grain (~2k convs / ~3s per task)
    P = auto_partitions(ds.count(), 25_000, num_partitions)
    return (
        ds.select_columns(["conv_id", "turn_idx", "text"])
        .repartition(P, keys=["conv_id"])
        .map_batches(assemble_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )
