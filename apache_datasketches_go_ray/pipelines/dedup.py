"""End-to-end transcript dedup pipeline with checkpoints, lineage and
resume.

Stages (each checkpointed as partitioned Parquet + a manifest entry):
  read -> assemble (shuffle on conv_id) -> sign (actor pool) ->
  candidate pairs (shuffle on band key, pair-dedup shuffle) ->
  verify (broadcast semi-join + 2 hash joins) ->
  cluster (iterative hash-partitioned min-label exchange).

Resume: each stage's manifest entry records an input fingerprint
(config + upstream fingerprint + row count); a re-run with an intact
checkpoint directory skips every stage whose entry is complete and
fingerprint-matching, re-reading its Parquet output instead. Union-find
rounds checkpoint individually, and the final clusters table is
deterministic (min-conv_id labels), so resumed and fresh runs are
byte-identical after canonical sorting.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray.data

from ..config import DedupConfig
from ..stages.context import ensure_hash_shuffle
from ..stages.assemble import assemble
from ..stages.signature import sign
from ..stages.lsh import candidate_pairs
from ..stages.verify import verify_pairs
from ..stages.cluster import cluster_edges
from .base import CheckpointedPipeline


class DedupPipeline(CheckpointedPipeline):
    def __init__(self, config: DedupConfig, checkpoint_dir: str | None = None):
        super().__init__(config.to_dict(), checkpoint_dir)
        self.cfg = config
        ensure_hash_shuffle()

    # ---- pipeline ---------------------------------------------------------
    def run(self, transcripts_ds, *, input_fingerprint: str = "",
            signer_concurrency=None):
        cfg = self.cfg
        t_start = time.time()

        # assembled IS materialized: fusing read -> repartition -> assemble
        # -> sign into one streaming chain measured ~2x slower than
        # stage-wise execution (same pathology as fusing the verify joins)
        assembled, fp = self._stage(
            "assembled", input_fingerprint,
            lambda: assemble(transcripts_ds, cfg.num_partitions,
                             input_layout=cfg.input_layout),
        )
        # keep_text=False: texts stay in the assembled table only; the
        # containment pass pulls just the texts it needs from there
        signatures, fp = self._stage(
            "signatures", fp,
            lambda: sign(assembled, cfg, concurrency=signer_concurrency,
                         keep_text=False),
        )
        # pairs stay band-deduped only; the (a, b) dedup happens for free
        # inside verify's first co-partition join (saves one all-to-all)
        pairs, fp = self._stage(
            "pairs", fp, lambda: candidate_pairs(signatures, cfg, dedup=False),
        )
        # verified IS materialized: fusing its two co-partition joins into
        # the clustering chain makes the streaming executor schedule both
        # repartitions + union branches concurrently, ~6x slower than
        # stage-wise execution (measured at 200k convs)
        verified, fp = self._stage(
            "verified", fp,
            lambda: verify_pairs(pairs, signatures, cfg, dedup_pairs=True,
                                 texts_ds=assembled),
        )
        edges = verified.filter(expr="is_dup == True").select_columns(["a", "b"])

        def ckpt_round(rnd, labels_ds):
            if self.ckpt:
                d = os.path.join(self.ckpt, f"unionfind_round_{rnd}")
                labels_ds.write_parquet(d)

        clusters, fp = self._stage(
            "clusters", fp,
            lambda: cluster_edges(edges, cfg.num_partitions,
                                  checkpoint_cb=ckpt_round),
        )
        self.metrics["total_sec"] = round(time.time() - t_start, 3)
        if self.ckpt:
            with open(os.path.join(self.ckpt, "metrics.json"), "w") as f:
                json.dump(self.metrics, f, indent=2)
        return {
            "assembled": assembled,
            "signatures": signatures,
            "pairs": pairs,
            "verified": verified,
            "clusters": clusters,
            "metrics": self.metrics,
        }


def run_dedup(
    transcripts_ds,
    config: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    **kwargs,
):
    cfg = config or DedupConfig()
    return DedupPipeline(cfg, checkpoint_dir).run(transcripts_ds, **kwargs)
