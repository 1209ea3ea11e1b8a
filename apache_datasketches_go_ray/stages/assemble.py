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


def _fragment_block(batch: pa.Table) -> pa.Table:
    """conv_grouped combiner: per-block partial assembly into one
    fragment row per (conv, block) — ``(conv_id, text, n_turns,
    first_turn, boundary)``. Correct whenever each block holds a
    CONTIGUOUS turn range per conversation (any row-range split of a
    file sorted by (conv_id, turn_idx) satisfies this).

    In that sorted layout only the conversations at a block's first and
    last row can possibly continue in a neighboring block, so only
    those are marked ``boundary`` — every other row is already the
    final assembled conversation and skips the shuffle entirely."""
    part = assemble_block(batch)
    from .arrow_util import as_array

    conv = as_array(batch.column("conv_id"))
    dict_arr = as_array(pc.dictionary_encode(conv))
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    tidx = as_array(batch.column("turn_idx")).to_numpy(zero_copy_only=False)
    n_convs = len(dict_arr.dictionary)
    first = np.full(n_convs, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first, codes, tidx.astype(np.int64))
    boundary = np.zeros(n_convs, dtype=bool)
    if len(codes):
        boundary[codes[0]] = True
        boundary[codes[-1]] = True
    return part.append_column(
        "first_turn", pa.array(first, type=pa.int64())).append_column(
        "boundary", pa.array(boundary))


def _merge_fragments(batch: pa.Table) -> pa.Table:
    """Fold co-located fragments of each conv in first_turn order."""
    from .arrow_util import as_array

    if len(batch) == 0:
        return pa.table({
            "conv_id": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string()),
            "n_turns": pa.array([], type=pa.int32()),
        })
    conv = as_array(batch.column("conv_id"))
    dict_arr = as_array(pc.dictionary_encode(conv))
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    first = as_array(batch.column("first_turn")).to_numpy(
        zero_copy_only=False)
    order = np.lexsort((first, codes))
    codes_s = codes[order]
    texts = as_array(batch.column("text")).take(pa.array(order))
    nt = as_array(batch.column("n_turns")).to_numpy(
        zero_copy_only=False)[order]
    n_convs = len(dict_arr.dictionary)
    counts = np.bincount(codes_s, minlength=n_convs)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        texts.cast(pa.string()) if texts.type != pa.string() else texts)
    nsum = np.zeros(n_convs, dtype=np.int64)
    np.add.at(nsum, codes_s, nt.astype(np.int64))
    return pa.table({
        "conv_id": dict_arr.dictionary.cast(pa.string()),
        "text": pc.binary_join(lists, TURN_SEP),
        "n_turns": pa.array(nsum.astype(np.int32)),
    })


def assemble(ds, num_partitions: int, input_layout: str = "shuffled"):
    """transcript rows -> one row per conversation (conv_id, text, n_turns).

    ``input_layout``:

    * ``"shuffled"`` (default, always correct): hash-partition the raw
      turn rows on conv_id and lexsort in-block — the full all-to-all.
    * ``"conv_grouped"``: the data-at-rest fast path for transcripts
      written conversation-contiguously (files sorted by
      (conv_id, turn_idx), however the reader splits them). Each block
      assembles its contiguous turn runs locally; in that layout only
      the conversations touching a block's first or last row can span
      blocks, so ONLY those (<= 2 per block) shuffle as fragments —
      the corpus-wide turn shuffle disappears. INCORRECT for
      interleaved inputs (fragments would concatenate out of order);
      callers assert the layout, tests pin equivalence including
      mid-conversation file splits.
    """
    from .context import auto_partitions

    if input_layout not in ("shuffled", "conv_grouped"):
        # "auto" must be resolved by the caller
        # (pipelines.dedup.resolve_input_layout) — a silent fall-through
        # here would quietly skip the fast path forever
        raise ValueError(f"assemble: unknown input_layout {input_layout!r}")
    # ~25k turns/partition: downstream signer tasks are per-block, so this
    # also sets the signing parallelism grain (~2k convs / ~3s per task)
    P = auto_partitions(ds.count(), 25_000, num_partitions)
    if input_layout == "conv_grouped":
        frags = ds.select_columns(["conv_id", "turn_idx", "text"]) \
            .map_batches(_fragment_block, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True) \
            .materialize()  # two consumers below
        done = frags.filter(expr="boundary == False") \
            .select_columns(["conv_id", "text", "n_turns"])
        bnd = (frags.filter(expr="boundary == True")
               .select_columns(["conv_id", "text", "n_turns",
                                "first_turn"])
               .repartition(max(2, min(P, 8)), keys=["conv_id"])
               .map_batches(_merge_fragments, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True))
        return done.union(bnd)
    return (
        ds.select_columns(["conv_id", "turn_idx", "text"])
        .repartition(P, keys=["conv_id"])
        .map_batches(assemble_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


def split_conversations(ds, gap_us: int = 1_800_000_000, *,
                        key_col: str = "conv_id",
                        order_col: str = "turn_idx",
                        ts_col: str = "ts",
                        num_partitions: int = 16):
    """Split each conversation into sub-conversations at turn gaps
    longer than ``gap_us`` (``order_col`` order) — long agent sessions
    broken at real pauses before packing/training. Output one row per
    (key, sub_id): turn count, first/last timestamp. Generic over
    column names so the same operator sessionizes any keyed event
    stream (pass the epoch-us of the timestamp as ``order_col`` to
    order by time). One key-keyed shuffle, in-block lexsort, segment
    boundaries from one vectorized diff — same discipline as
    assemble_block."""
    from .arrow_util import as_array
    from .context import auto_partitions

    def fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({
                key_col: pa.array([], type=pa.string()),
                "sub_id": pa.array([], type=pa.int64()),
                "n_turns": pa.array([], type=pa.int64()),
                "start_ts": pa.array([], type=pa.timestamp("us")),
                "end_ts": pa.array([], type=pa.timestamp("us")),
            })
        conv = as_array(b.column(key_col).cast(pa.string()))
        dict_arr = as_array(pc.dictionary_encode(conv))
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        ti = as_array(b.column(order_col)).to_numpy(
            zero_copy_only=False)
        ts = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, codes))
        c_s, ts_s = codes[order], ts[order]
        firstc = np.empty(len(c_s), dtype=bool)
        firstc[0] = True
        np.not_equal(c_s[1:], c_s[:-1], out=firstc[1:])
        gap = np.zeros(len(c_s), dtype=np.int64)
        gap[1:] = ts_s[1:] - ts_s[:-1]
        new_seg = firstc | (gap > gap_us)
        seg_starts = np.flatnonzero(new_seg)
        seg_lens = np.diff(np.append(seg_starts, len(c_s)))
        # 0-based sub index within each conversation: running segment
        # counter reset at each conversation's first segment
        conv_of_seg = c_s[seg_starts]
        first_seg_of_conv = np.empty(len(seg_starts), dtype=bool)
        first_seg_of_conv[0] = True
        np.not_equal(conv_of_seg[1:], conv_of_seg[:-1],
                     out=first_seg_of_conv[1:])
        base = np.maximum.accumulate(
            np.where(first_seg_of_conv, np.arange(len(seg_starts)), 0))
        sub_id = np.arange(len(seg_starts)) - base
        start_ts = np.minimum.reduceat(ts_s, seg_starts)
        end_ts = np.maximum.reduceat(ts_s, seg_starts)
        conv_names = dict_arr.dictionary.take(
            pa.array(conv_of_seg, type=pa.int32())).cast(pa.string())
        return pa.table({
            key_col: conv_names,
            "sub_id": pa.array(sub_id.astype(np.int64)),
            "n_turns": pa.array(seg_lens.astype(np.int64)),
            "start_ts": pa.array(start_ts).cast(pa.timestamp("us")),
            "end_ts": pa.array(end_ts).cast(pa.timestamp("us")),
        })

    P = auto_partitions(ds.count(), 1_000_000, num_partitions)
    return (ds.select_columns([key_col, order_col, ts_col])
            .repartition(P, keys=[key_col])
            .map_batches(fold, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))
