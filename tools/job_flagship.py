"""Flagship dedup as a `ray job submit` payload against a running
(multi-node) cluster — the north_rule's deployment shape. Connects to
the existing cluster (address="auto"), runs the transcript MinHash/LSH
dedup over the sf-tier transcript parquet, and prints one JSON line
with node count, turns, clusters and throughput.

Usage (2-node local sim, 16 CPUs per raylet):
  ray start --head --num-cpus=16 --port=6379 --include-dashboard=false
  ray start --address=127.0.0.1:6379 --num-cpus=16
  ray job submit --working-dir /root/repo -- python tools/job_flagship.py sf0.1
"""

import json
import os
import sys
import time

import ray
import ray.data  # noqa: F401 (register the Dataset API on the ray module)


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    convs = int(sys.argv[2]) if len(sys.argv) > 2 else None
    # the sandbox presets RAY_ADDRESS=local, which would silently spin
    # up a fresh single-node instance instead of joining the cluster
    if os.environ.get("RAY_ADDRESS") == "local":
        del os.environ["RAY_ADDRESS"]
    ray.init(address="auto", include_dashboard=False,
             ignore_reinit_error=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entrymod
    from apache_datasketches_go_ray.config import DedupConfig
    from apache_datasketches_go_ray.pipelines.dedup import run_dedup

    if convs is not None:
        # bench-scale fixture (100k+ convs) for meaningful wall time
        from bench import _bench_transcripts

        tdir = _bench_transcripts(f"/root/testdata/{tier}", convs)
    else:
        tdir = entrymod._transcripts_dir(f"/root/testdata/{tier}")
    nodes = [n for n in ray.nodes() if n.get("Alive")]
    ds = ray.data.read_parquet(
        tdir, columns=["conv_id", "turn_idx", "text"])
    turns = ds.count()
    t0 = time.time()
    res = run_dedup(ds, DedupConfig(num_partitions=32))
    n_clustered = res["clusters"].count()
    dt = time.time() - t0
    print(json.dumps({
        "job": "transcript_dedup",
        "tier": tier,
        "nodes": len(nodes),
        "cpus": int(ray.cluster_resources().get("CPU", 0)),
        "turns": int(turns),
        "clustered_convs": int(n_clustered),
        "wall_sec": round(dt, 3),
        "turns_per_sec": round(turns / dt, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
