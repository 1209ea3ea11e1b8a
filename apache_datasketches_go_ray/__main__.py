"""Job entry point: `ray job submit -- python -m apache_datasketches_go_ray ...`

Runs the flagship transcript dedup pipeline (or the document curation
pipeline) end-to-end against a Parquet/JSONL/CSV corpus, with
checkpoint/resume and a metrics sidecar — the north_rule's
cluster-submission surface, runnable identically on a laptop
(`RAY_ADDRESS=local`) and a multi-node cluster (ray job submit attaches
to the cluster address; this script only ever calls ray.init when no
session exists).

Examples:
  python -m apache_datasketches_go_ray dedup \
      --input /data/transcripts --format parquet \
      --output /out/clusters --checkpoint /ckpt/run1 --partitions 256
  python -m apache_datasketches_go_ray curate \
      --input /data/docs.parquet --output /out/curated
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="apache_datasketches_go_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="transcript near-dup clustering")
    d.add_argument("--input", required=True)
    d.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl", "csv"])
    d.add_argument("--output", required=True)
    d.add_argument("--checkpoint", default=None)
    d.add_argument("--partitions", type=int, default=64)
    d.add_argument("--shingle-k", type=int, default=None)
    d.add_argument("--threshold", type=float, default=None)
    d.add_argument("--layout", default="shuffled",
                   choices=["shuffled", "conv_grouped", "auto"],
                   help="input layout; 'auto' runs the exact probe and "
                        "takes the conv-grouped fast path only when "
                        "proven safe")

    s = sub.add_parser(
        "sketch-column",
        help="build (or incrementally update) a grouped sketch column "
             "in the reference wire format and write it to parquet")
    s.add_argument("--input", required=True, help="source parquet")
    s.add_argument("--key", required=True)
    s.add_argument("--column", required=True)
    s.add_argument("--family", default="hll",
                   choices=["hll", "freq", "kll"])
    s.add_argument("--output", required=True)
    s.add_argument("--update", default=None,
                   help="existing column dir to fold the new batch into")
    s.add_argument("--lg-k", type=int, default=12)
    s.add_argument("--k", type=int, default=200)
    s.add_argument("--max-map-size", type=int, default=1 << 16)
    s.add_argument("--tokenize", action="store_true")
    s.add_argument("--partitions", type=int, default=16)

    rl = sub.add_parser(
        "rewrite-layout",
        help="one-time corpus re-sort to the conv-contiguous at-rest "
             "layout (each conversation lands whole in one shard, turns "
             "sorted) — unlocks the conv_grouped assembly fast path for "
             "every later run; the probe verdict on the output is "
             "printed as proof")
    rl.add_argument("--input", required=True)
    rl.add_argument("--output", required=True)
    rl.add_argument("--partitions", type=int, default=64)

    p = sub.add_parser(
        "probe-layout",
        help="exact layout probe: is a transcript corpus safe for the "
             "conv-grouped assembly fast path? (reads only conv_id + "
             "turn_idx)")
    p.add_argument("--input", required=True)

    x = sub.add_parser(
        "delete",
        help="right-to-be-forgotten removal from a dedup checkpoint")
    x.add_argument("--against", required=True, action="append",
                   help="prior checkpoint dir; repeat for a chain "
                        "(full run + each increment, in order)")
    x.add_argument("--ids", default=None,
                   help="comma-separated conv ids to remove")
    x.add_argument("--ids-file", default=None,
                   help="file with one conv id per line")
    x.add_argument("--output", required=True,
                   help="where the new cluster table is written")
    x.add_argument("--checkpoint", default=None,
                   help="write a consolidated post-deletion checkpoint "
                        "here (chainable by future increments)")
    x.add_argument("--partitions", type=int, default=64)

    c = sub.add_parser("curate", help="document curation funnel")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--partitions", type=int, default=64)
    c.add_argument("--min-quality", type=float, default=0.35)
    c.add_argument("--langs", default="en")

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()

    if args.cmd == "dedup":
        from .config import DedupConfig
        from .pipelines.dedup import run_dedup
        from .sources.readers import read_transcripts

        kw = {"num_partitions": args.partitions,
              "input_layout": args.layout}
        if args.shingle_k is not None:
            kw["shingle_k"] = args.shingle_k
        if args.threshold is not None:
            kw["jaccard_threshold"] = args.threshold
        cfg = DedupConfig(**kw)
        ds = read_transcripts(args.input, format=args.format)
        # read_transcripts normalizes through map_batches, which erases
        # input-file metadata — pass the source path so --layout auto
        # can actually probe it (parquet only; other formats stay on
        # the always-correct shuffled path)
        paths = args.input if args.format == "parquet" else None
        res = run_dedup(ds, cfg, checkpoint_dir=args.checkpoint,
                        input_paths=paths)
        res["clusters"].write_parquet(args.output)
        print(json.dumps({"clusters": res["clusters"].count(),
                          "stages": {k: v.get("sec")
                                     for k, v in
                                     res["metrics"]["stages"].items()}}))
    elif args.cmd == "sketch-column":
        import ray.data

        from .stages import sketch_aggs as sa

        ds = ray.data.read_parquet(args.input,
                                   columns=[args.key, args.column])
        if args.family == "hll":
            if args.update:
                # fail fast on a config mismatch: merging columns built
                # at different lgK raises deep inside a Ray task once
                # both sides reach HLL mode (and silently "works" in
                # coupon regime until data volume grows)
                import pyarrow.parquet as _pq

                sample = _pq.read_table(args.update,
                                        columns=["sketch"]).slice(0, 1)
                if len(sample):
                    stored_lgk = sample.column("sketch")[0].as_py()[3]
                    if stored_lgk != args.lg_k:
                        ap.error(
                            f"--update column was built with lgK "
                            f"{stored_lgk}; pass --lg-k {stored_lgk}")
                col = sa.hll_wire_update_column(
                    ray.data.read_parquet(args.update), ds, args.key,
                    args.column, lg_k=args.lg_k,
                    num_partitions=args.partitions)
            else:
                col = sa.hll_wire_sketch_column_by(
                    ds, args.key, args.column, lg_k=args.lg_k,
                    num_partitions=args.partitions)
        elif args.family == "freq":
            if args.update:
                import pyarrow.parquet as _pq

                sample = _pq.read_table(args.update,
                                        columns=["sketch"]).slice(0, 1)
                if len(sample):
                    stored_lg = sample.column("sketch")[0].as_py()[3]
                    if (1 << stored_lg) != args.max_map_size:
                        ap.error(
                            f"--update column was built with "
                            f"max-map-size {1 << stored_lg}; pass "
                            f"--max-map-size {1 << stored_lg}")
                col = sa.freq_wire_update_column(
                    ray.data.read_parquet(args.update), ds, args.key,
                    args.column, max_map_size=args.max_map_size,
                    tokenize=args.tokenize,
                    num_partitions=args.partitions)
            else:
                col = sa.freq_wire_sketch_column_by(
                    ds, args.key, args.column,
                    max_map_size=args.max_map_size,
                    tokenize=args.tokenize,
                    num_partitions=args.partitions)
        else:
            if args.update:
                import struct as _struct

                import pyarrow.parquet as _pq

                sample = _pq.read_table(args.update,
                                        columns=["sketch"]).slice(0, 1)
                if len(sample):
                    stored_k, = _struct.unpack_from(
                        "<H", sample.column("sketch")[0].as_py(), 4)
                    if stored_k != args.k:
                        ap.error(f"--update column was built with k "
                                 f"{stored_k}; pass --k {stored_k}")
                col = sa.kll_wire_update_column(
                    ray.data.read_parquet(args.update), ds, args.key,
                    args.column, k=args.k,
                    num_partitions=args.partitions)
            else:
                col = sa.kll_wire_sketch_column_by(
                    ds, args.key, args.column, k=args.k,
                    num_partitions=args.partitions)
        col = col.materialize()
        col.write_parquet(args.output)
        print(json.dumps({"family": args.family,
                          "groups": col.count(),
                          "output": args.output}))
    elif args.cmd == "rewrite-layout":
        from .sources.readers import detect_input_layout, rewrite_conv_grouped

        n = rewrite_conv_grouped(args.input, args.output,
                                 num_partitions=args.partitions)
        verdict = detect_input_layout(args.output)
        print(json.dumps({"rows": n, "output": args.output,
                          "layout": verdict}))
    elif args.cmd == "probe-layout":
        from .sources.readers import detect_input_layout

        verdict = detect_input_layout(args.input)
        print(json.dumps({"input": args.input, "layout": verdict}))
    elif args.cmd == "delete":
        from .config import DedupConfig
        from .pipelines.dedup import delete_convs

        ids: list[str] = []
        if args.ids:
            ids += [s for s in args.ids.split(",") if s]
        if args.ids_file:
            with open(args.ids_file) as f:
                ids += [ln.strip() for ln in f if ln.strip()]
        if not ids:
            ap.error("delete: provide --ids and/or --ids-file")
        cfg = DedupConfig(num_partitions=args.partitions)
        res = delete_convs(args.against, ids, cfg,
                           checkpoint_dir=args.checkpoint)
        res["clusters"].write_parquet(args.output)
        print(json.dumps({"removed": len(set(ids)),
                          "clusters": res["clusters"].count(),
                          "stages": {k: v.get("sec")
                                     for k, v in
                                     res["metrics"]["stages"].items()}}))
    else:
        import ray.data

        from .pipelines.curate import CurateConfig, run_curate

        cfg = CurateConfig(min_quality=args.min_quality,
                           allowed_langs=tuple(args.langs.split(",")),
                           num_partitions=args.partitions)
        ds = ray.data.read_parquet(args.input)
        res = run_curate(ds, cfg, checkpoint_dir=args.checkpoint)
        res["curated"].write_parquet(args.output)
        print(json.dumps({"rows_in": res["metrics"]["rows_in"],
                          "rows_out": res["metrics"]["rows_out"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
