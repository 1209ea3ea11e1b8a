"""Candidate-pair verification: exact Jaccard + suffix-array containment.

Join strategy: the candidate pair set is orders of magnitude smaller than
the corpus (bounded by the band caps), so we first stream-filter the
signature table down to candidate conv_ids using a broadcast id set
(``ray.put`` once, read per task — a semi-join that avoids shuffling the
full signature table), then hash-join pairs with the filtered signatures
on each endpoint (Ray Dataset.join, 2 joins).

A pair becomes an edge when
  * exact Jaccard(shingles_a, shingles_b) >= jaccard_threshold, or
  * shingle containment >= containment_threshold AND the suffix-array
    longest-common-substring covers >= substring_frac of the shorter text
    (containment duplicates: FIXTURES.md F2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import DedupConfig
from ..functions.jaccard import intersect_size
from ..functions.suffixarray import longest_common_substring


class _FilterToCandidates:
    def __init__(self, ids_ref):
        self.ids = ray.get(ids_ref) if not isinstance(ids_ref, set) else ids_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [c in self.ids for c in batch.column("conv_id").to_pylist()]
        )
        return batch.filter(mask)


class PairVerifier:
    def __init__(self, config: DedupConfig):
        self.cfg = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        sh_a_list = batch.column("shingles_a").to_pylist()
        sh_b_list = batch.column("shingles_b").to_pylist()
        texts_a = batch.column("text_a").to_pylist() if "text_a" in batch.column_names else [None] * n
        texts_b = batch.column("text_b").to_pylist() if "text_b" in batch.column_names else [None] * n

        jac = np.zeros(n)
        con = np.zeros(n)
        ok = np.zeros(n, dtype=bool)
        method = np.empty(n, dtype=object)
        for i in range(n):
            A = np.frombuffer(sh_a_list[i], dtype=np.uint64)
            B = np.frombuffer(sh_b_list[i], dtype=np.uint64)
            inter = intersect_size(A, B)
            union = len(A) + len(B) - inter
            m = min(len(A), len(B))
            jac[i] = inter / union if union else 1.0
            con[i] = inter / m if m else (1.0 if len(A) == len(B) else 0.0)
            if jac[i] >= cfg.jaccard_threshold:
                ok[i] = True
                method[i] = "jaccard"
            elif con[i] >= cfg.containment_threshold and texts_a[i] is not None:
                ta, tb = texts_a[i], texts_b[i]
                lcs = longest_common_substring(ta, tb)
                shorter = min(len(ta.encode()), len(tb.encode()))
                if shorter and lcs >= cfg.substring_frac * shorter:
                    ok[i] = True
                    method[i] = "containment"
            if not ok[i]:
                method[i] = "rejected"
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "jaccard": pa.array(jac),
                "containment": pa.array(con),
                "method": pa.array(method, type=pa.string()),
                "is_dup": pa.array(ok),
            }
        )


def verify_pairs(pairs_ds, sig_ds, config: DedupConfig):
    """pairs (a,b) + signature table -> verified edge table.

    Returns the full verification table (is_dup marks edges) so metrics
    can report rejection rates; filter on is_dup for clustering.
    """
    P = config.num_partitions
    # ---- broadcast semi-join: shrink signatures to candidate ids ----
    from .arrow_util import as_array

    id_batches = pairs_ds.map_batches(
        lambda b: pa.table({"conv_id": pa.concat_arrays(
            [as_array(b.column("a")).cast(pa.string()),
             as_array(b.column("b")).cast(pa.string())]
        )}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cand_ids = set()
    for blk in id_batches.iter_batches(batch_size=None, batch_format="pyarrow"):
        cand_ids.update(blk.column("conv_id").to_pylist())
    ids_ref = ray.put(cand_ids)

    keep_cols = ["conv_id", "shingles"]
    has_text = "text" in sig_ds.schema().names
    if has_text:
        keep_cols.append("text")
    cand_sigs = sig_ds.select_columns(keep_cols).map_batches(
        _FilterToCandidates, fn_constructor_args=(ids_ref,),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    )

    left = cand_sigs.rename_columns(
        {"conv_id": "a", "shingles": "shingles_a", **({"text": "text_a"} if has_text else {})}
    )
    right = cand_sigs.rename_columns(
        {"conv_id": "b", "shingles": "shingles_b", **({"text": "text_b"} if has_text else {})}
    )
    joined = pairs_ds.join(left, join_type="inner", num_partitions=P, on=("a",))
    joined = joined.join(right, join_type="inner", num_partitions=P, on=("b",))

    import ray as _ray

    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    return joined.map_batches(
        PairVerifier, fn_constructor_args=(config,),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=1024,
        concurrency=(1, max(2, n_cpu)),
    )
