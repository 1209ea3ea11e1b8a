"""Spill-cliff probe: flagship dedup at 2.4M convs / ~36M turns — 2x the
largest round-2 scale probe, sized so the stage-wise signature
checkpoints (~2x corpus signatures) exceed the local object store and
force spill. Records stage times, spill counters and planted-dup recall.

The monolithic fixture generator would hold all ~36M turn texts as
Python strings at once (OOM territory), so the fixture is generated in
chunks with a per-chunk conv_id/group_id namespace prefix — the planted
ground truth stays consistent and conv ids never collide.

Usage: python tools/spill_probe.py [n_convs] [chunk_size]
Prints ONE JSON line; record the result in BASELINE.md §6.
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixture(cache: str, n_convs: int, chunk: int,
                  shards_per_chunk: int = 4) -> str:
    from apache_datasketches_go_ray.sources.transcripts import (
        conversations_to_table,
        generate_conversations,
        inject_duplicates,
    )

    marker = os.path.join(cache, "_complete")
    tdir = os.path.join(cache, "transcripts")
    if os.path.exists(marker):
        return tdir
    os.makedirs(tdir, exist_ok=True)
    group_tabs = []
    n_chunks = (n_convs + chunk - 1) // chunk
    for i in range(n_chunks):
        n_i = min(chunk, n_convs - i * chunk)
        convs = generate_conversations(n_i, seed=42 + 7 * i)
        convs, groups = inject_duplicates(convs, seed=43 + 7 * i)
        tbl = conversations_to_table(convs, seed=44 + 7 * i)
        del convs
        pref = f"c{i:02d}-"
        tbl = tbl.set_column(
            tbl.schema.get_field_index("conv_id"), "conv_id",
            pc.binary_replace_slice(tbl.column("conv_id"), start=0,
                                    stop=0, replacement=pref))
        bounds = np.linspace(0, tbl.num_rows,
                             shards_per_chunk + 1).astype(int)
        for s in range(shards_per_chunk):
            pq.write_table(
                tbl.slice(bounds[s], bounds[s + 1] - bounds[s]),
                os.path.join(
                    tdir, f"part-{i * shards_per_chunk + s:05d}.parquet"))
        group_tabs.append(pa.table({
            "conv_id": pa.array([pref + g["conv_id"] for g in groups],
                                type=pa.string()),
            "group_id": pa.array([pref + g["group_id"] for g in groups],
                                 type=pa.string()),
            "kind": pa.array([g["kind"] for g in groups],
                             type=pa.string()),
        }))
        print(f"chunk {i + 1}/{n_chunks}: {tbl.num_rows} turns",
              file=sys.stderr)
        del tbl
    pq.write_table(pa.concat_tables(group_tabs),
                   os.path.join(cache, "dup_groups.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return tdir


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    cache = f"/tmp/adgr_bench_cache/probe-{n_convs}"

    t0 = time.time()
    tdir = build_fixture(cache, n_convs, chunk)
    gen_s = round(time.time() - t0, 1)

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    import ray.data
    import apache_datasketches_go_ray  # noqa: F401 (hash-shuffle context)
    from apache_datasketches_go_ray.config import DedupConfig
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup

    turns = ray.data.read_parquet(tdir).count()
    cfg = DedupConfig(num_partitions=32)
    t0 = time.time()
    res = run_dedup(
        ray.data.read_parquet(tdir, columns=["conv_id", "turn_idx",
                                             "text"]), cfg)
    n_clusters = res["clusters"].count()
    dedup_s = time.time() - t0

    from bench import _dup_pair_recall

    recall = _dup_pair_recall(tdir, res["clusters"], cfg)

    spilled_mb = None
    try:
        from ray._private.internal_api import memory_summary

        summary = memory_summary(stats_only=True)
        for line in summary.splitlines():
            if "Spilled" in line:
                spilled_mb = line.strip()
                break
    except Exception:
        pass

    out = {
        "metric": "spill-cliff probe (flagship dedup)",
        "n_convs": n_convs,
        "turns": turns,
        "num_cpus": num_cpus,
        "fixture_gen_sec": gen_s,
        "dedup_sec": round(dedup_s, 1),
        "turns_per_sec": round(turns / dedup_s, 1),
        "clustered_convs": n_clusters,
        "stages": {k: v["sec"]
                   for k, v in res["metrics"]["stages"].items()},
        "spilled": spilled_mb,
        **recall,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
