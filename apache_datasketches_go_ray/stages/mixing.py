"""Domain-mixture reweighting: deterministic resampling to target
source proportions — the "data mixing" step of an LLM training-data
pipeline (adjust web/books/code shares before training).

Scale shape: one tiny per-block partial count pass (output rows =
blocks x distinct sources, folded on the driver — source cardinality is
small by definition), then a pure streaming filter: a row survives iff
``knuth_hash(id) < threshold[source]``, an integer compare against a
broadcast dict. No shuffle, no sort, no per-group top-n selection — the
sampler never moves data, so it runs at read bandwidth on any input
size. Counts are binomial around the target mixture (exact-n selection
would need a per-group distributed selection; the rate-based form is
the 100-TB design).

The acceptance threshold is pure int/float arithmetic on the Knuth
multiplicative hash (same substrate as train_eval_split), so a DuckDB
oracle running the identical op sequence reproduces the sample
value-exact — determinism across engines, runs and partitionings.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .arrow_util import as_array


def reweight_sample(ds, group_col: str, weights: dict[str, float],
                    id_col: str):
    """Downsample ``ds`` so group ``s`` contributes ~``weights[s]`` of
    the output. ``weights`` are target shares (sum ~1). The output size
    is the maximum feasible: M = min_s(count_s / weights_s); group s
    keeps rows with hash < floor(weights_s * M / count_s * 2^32).
    Groups absent from ``weights`` are dropped (share 0)."""

    def counts_block(b: pa.Table) -> pa.Table:
        d = pc.dictionary_encode(as_array(b.column(group_col)))
        idx = d.indices.to_numpy(zero_copy_only=False)
        c = np.bincount(idx, minlength=len(d.dictionary))
        return pa.table({
            group_col: d.dictionary.cast(pa.string()),
            "cnt": pa.array(c, type=pa.int64()),
        })

    partials = (ds.select_columns([group_col])
                .map_batches(counts_block, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
                .take_all())     # tiny: n_blocks x n_sources rows
    counts: dict[str, int] = {}
    for r in partials:
        counts[r[group_col]] = counts.get(r[group_col], 0) + r["cnt"]

    present = [s for s in counts if s in weights and weights[s] > 0]
    if not present:
        raise ValueError("no weighted group present in the data")
    M = min(counts[s] / weights[s] for s in present)
    thr = {s: math.floor(weights[s] * M / counts[s] * 4294967296.0)
           for s in present}

    def filt(b: pa.Table) -> pa.Table:
        ids = as_array(b.column(id_col)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = (ids.astype(np.int64) * 2654435761) % 4294967296
        d = pc.dictionary_encode(as_array(b.column(group_col)))
        idx = d.indices.to_numpy(zero_copy_only=False)
        t = np.array([thr.get(x, 0)
                      for x in d.dictionary.to_pylist()], dtype=np.int64)
        return b.filter(pa.array(h < t[idx]))

    return ds.map_batches(filt, batch_format="pyarrow",
                          zero_copy_batch=True)
