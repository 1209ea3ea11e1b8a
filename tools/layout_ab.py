"""Layout-probe A/B: measure assemble cost on a conv-contiguous corpus
via (a) the always-correct shuffled path, (b) input_layout='auto'
(probe + conv_grouped fast path), and report probe cost separately.

Usage: python tools/layout_ab.py [n_convs] [num_cpus]
Writes one JSON line; outputs under /tmp/adgr_layout_ab.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from apache_datasketches_go_ray.sources.readers import (
        detect_input_layout,
    )
    from apache_datasketches_go_ray.sources.transcripts import (
        write_transcripts,
    )
    from apache_datasketches_go_ray.stages.assemble import assemble
    from apache_datasketches_go_ray.stages.context import (
        ensure_hash_shuffle,
    )

    ensure_hash_shuffle()
    base = f"/tmp/adgr_layout_ab/{n}"
    sdir = os.path.join(base, "sorted")
    if not os.path.exists(os.path.join(base, "_complete")):
        shutil.rmtree(base, ignore_errors=True)
        write_transcripts(base, n, seed=42, shards=32)
        # rewrite conversation-contiguously, preserving shard count
        tbl = pq.read_table(os.path.join(base, "transcripts"))
        idx = np.lexsort((
            tbl.column("turn_idx").to_numpy(zero_copy_only=False),
            np.asarray(tbl.column("conv_id").to_pylist(), dtype=object)))
        tbl = tbl.take(pa.array(idx))
        os.makedirs(sdir, exist_ok=True)
        bounds = np.linspace(0, tbl.num_rows, 33).astype(int)
        for i in range(32):
            pq.write_table(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
                           os.path.join(sdir, f"part-{i:05d}.parquet"))
        with open(os.path.join(base, "_complete"), "w") as f:
            f.write("ok")

    def run(layout):
        ds = ray.data.read_parquet(sdir)
        t0 = time.time()
        out = assemble(ds, 64, input_layout=layout).materialize()
        return time.time() - t0, out.count()

    t0 = time.time()
    verdict = detect_input_layout(sdir)
    probe_sec = time.time() - t0

    shuf_sec, n_shuf = run("shuffled")
    fast_sec, n_fast = run(verdict)

    print(json.dumps({
        "n_convs": n, "num_cpus": cpus, "probe_verdict": verdict,
        "probe_sec": round(probe_sec, 2),
        "assemble_shuffled_sec": round(shuf_sec, 2),
        "assemble_fast_sec": round(fast_sec, 2),
        "rows_equal": n_shuf == n_fast,
        "speedup_incl_probe": round(shuf_sec / (fast_sec + probe_sec), 2),
        "speedup_excl_probe": round(shuf_sec / fast_sec, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
