"""Prefix-filter exact Jaccard self-join: recall guarantee + both
verify paths (broadcast and two-step shuffle attach) agree."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from apache_datasketches_go_ray.stages.dedup_extras import (
    jaccard_similarity_join,
)


def _pairs(df):
    return {(int(r["doc_a"]), int(r["doc_b"]), float(r["jacc"]))
            for _, r in df.iterrows()}


def test_planted_pairs_exact(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    texts, n = [], 40
    for i in range(n):
        toks = rng.choice(vocab, size=30, replace=False)
        texts.append(" ".join(toks))
    # plant: doc n is an exact copy of doc 0; doc n+1 shares 29/30 tokens
    # with doc 1 (jaccard 29/31)
    texts.append(texts[0])
    base = texts[1].split()
    texts.append(" ".join(base[:-1] + ["zzz_unique"]))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n + 2), type=pa.int64()),
        "text": pa.array(texts),
    }))
    out = jaccard_similarity_join(ds, tau=0.85, num_partitions=8).to_pandas()
    got = _pairs(out)
    assert (0, n, 1.0) in got
    near = [p for p in got if p[0] == 1 and p[1] == n + 1]
    assert near and abs(near[0][2] - 29 / 31) < 1e-6


def test_shuffle_and_broadcast_paths_agree(ray_session):
    sf = "/root/testdata/sf0.001/documents.parquet"
    bcast = jaccard_similarity_join(rd.read_parquet(sf), tau=0.95,
                                    num_partitions=8).to_pandas()
    shuf = jaccard_similarity_join(rd.read_parquet(sf), tau=0.95,
                                   num_partitions=8,
                                   broadcast_gate_bytes=0).to_pandas()
    assert _pairs(bcast) == _pairs(shuf)
    assert len(bcast) > 0
