"""SemDeDup-style semantic dedup: planted-duplicate recall,
keep-min-id determinism, partition independence."""

import numpy as np
import pyarrow as pa


def _mk_corpus(n=600, dim=32, n_dups=40, seed=21):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    noise = rng.standard_normal((n_dups, dim)).astype(np.float32)
    dup = m[:n_dups] + 0.02 * noise
    ids = np.concatenate([np.arange(n), np.arange(n_dups) + 1_000_000])
    emb = np.concatenate([m, dup]).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
    })


def test_semantic_dedup_drops_planted(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.ann import semantic_dedup

    tbl = _mk_corpus()
    out = semantic_dedup(ray.data.from_arrow(tbl).repartition(4),
                         threshold=0.95, n_clusters=6,
                         num_partitions=4).to_pandas()
    assert len(out) == len(tbl)
    dropped = set(out.loc[~out["keep"], "vec_id"])
    planted = set(range(1_000_000, 1_000_040))
    # a planted dup lands in its original's cluster (2% noise) and has
    # the higher id, so keep-min-id must drop it
    recall = len(dropped & planted) / len(planted)
    assert recall >= 0.95, recall
    # originals are the min-id member of their pair: none dropped
    # unless they collide with another natural near-dup (none planted)
    kept_orig = out[(out["vec_id"] < 1_000_000) & out["keep"]]
    assert len(kept_orig) >= 590


def test_semantic_dedup_partition_independent(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.ann import semantic_dedup

    tbl = _mk_corpus(n=300, n_dups=20, seed=4)
    outs = []
    for blocks, parts in ((1, 2), (8, 5)):
        out = semantic_dedup(ray.data.from_arrow(tbl).repartition(blocks),
                             threshold=0.95, n_clusters=5,
                             num_partitions=parts) \
            .to_pandas().sort_values("vec_id", ignore_index=True)
        outs.append(out)
    # cluster training samples from ds.limit -> same rows regardless of
    # block layout, so assignments and keep decisions are identical
    assert outs[0].equals(outs[1])


def test_semantic_dedup_chunked_matches_unchunked(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.ann import semantic_dedup

    tbl = _mk_corpus(n=250, n_dups=25, seed=8)
    a = semantic_dedup(ray.data.from_arrow(tbl), threshold=0.95,
                       n_clusters=4, chunk=7) \
        .to_pandas().sort_values("vec_id", ignore_index=True)
    b = semantic_dedup(ray.data.from_arrow(tbl), threshold=0.95,
                       n_clusters=4, chunk=100_000) \
        .to_pandas().sort_values("vec_id", ignore_index=True)
    assert a.equals(b)
