"""Spill-cliff probe: flagship dedup at 2.4M convs / ~36M turns — 2x the
largest round-2 scale probe, sized so the stage-wise signature
checkpoints (~2x corpus signatures) exceed the local object store and
force spill. Records stage times, spill counters and planted-dup recall.

The monolithic fixture generator would hold all ~36M turn texts as
Python strings at once (OOM territory), so the fixture is generated in
chunks with a per-chunk conv_id/group_id namespace prefix — the planted
ground truth stays consistent and conv ids never collide. Chunks are
independent (disjoint seeds/namespaces), so they build as parallel Ray
tasks, each writing its own shards + per-chunk ground-truth parquet
with a completion marker — a killed run resumes without regenerating
finished chunks.

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


def _build_chunk(cache: str, i: int, n_i: int, n_chunks: int,
                 shards_per_chunk: int) -> int:
    """Generate one independent fixture chunk (disjoint seed + conv_id
    namespace), write its transcript shards and per-chunk ground truth,
    then mark it complete. Runs as a Ray task; also importable directly."""
    from apache_datasketches_go_ray.sources.transcripts import (
        conversations_to_table,
        generate_conversations,
        inject_duplicates,
    )

    tdir = os.path.join(cache, "transcripts")
    chunk_marker = os.path.join(cache, f"_chunk_{i:02d}_done")
    if os.path.exists(chunk_marker):
        return 0
    convs = generate_conversations(n_i, seed=42 + 7 * i)
    convs, groups = inject_duplicates(convs, seed=43 + 7 * i)
    tbl = conversations_to_table(convs, seed=44 + 7 * i)
    del convs
    pref = f"c{i:02d}-"
    tbl = tbl.set_column(
        tbl.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_replace_slice(tbl.column("conv_id"), start=0,
                                stop=0, replacement=pref))
    bounds = np.linspace(0, tbl.num_rows, shards_per_chunk + 1).astype(int)
    for s in range(shards_per_chunk):
        pq.write_table(
            tbl.slice(bounds[s], bounds[s + 1] - bounds[s]),
            os.path.join(
                tdir, f"part-{i * shards_per_chunk + s:05d}.parquet"))
    pq.write_table(pa.table({
        "conv_id": pa.array([pref + g["conv_id"] for g in groups],
                            type=pa.string()),
        "group_id": pa.array([pref + g["group_id"] for g in groups],
                             type=pa.string()),
        "kind": pa.array([g["kind"] for g in groups], type=pa.string()),
    }), os.path.join(cache, f"dup_groups_{i:02d}.parquet"))
    n_rows = tbl.num_rows
    del tbl
    with open(chunk_marker, "w") as f:
        f.write("ok")
    print(f"chunk {i + 1}/{n_chunks}: {n_rows} turns", file=sys.stderr)
    return n_rows


def build_fixture(cache: str, n_convs: int, chunk: int,
                  shards_per_chunk: int = 4) -> str:
    marker = os.path.join(cache, "_complete")
    tdir = os.path.join(cache, "transcripts")
    if os.path.exists(marker):
        return tdir
    os.makedirs(tdir, exist_ok=True)
    n_chunks = (n_convs + chunk - 1) // chunk

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    # each chunk holds ~4.5M turn texts (~1.5 GB peak); cap concurrency
    # via num_cpus so parallel generation stays inside the host's heap
    build = ray.remote(num_cpus=4)(_build_chunk)
    ray.get([build.remote(cache, i, min(chunk, n_convs - i * chunk),
                          n_chunks, shards_per_chunk)
             for i in range(n_chunks)])
    pq.write_table(
        pa.concat_tables([
            pq.read_table(os.path.join(cache, f"dup_groups_{i:02d}.parquet"))
            for i in range(n_chunks)]),
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
    # RAY_GRAFT_STORE_GB: size the plasma store to the probe's working
    # set (it lives in /dev/shm) so spill volume stays inside the host's
    # disk budget — the round-5 36M-turn attempt ENOSPC'd the spill disk
    # with the default ~37 GiB store on this 125 GiB host
    store_gb = float(os.environ.get("RAY_GRAFT_STORE_GB", "0"))
    kw = {"object_store_memory": int(store_gb * (1 << 30))}         if store_gb else {}
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, **kw)
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
