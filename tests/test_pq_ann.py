"""Product-quantization ANN: recall vs brute force on clustered
embeddings, determinism across partitionings, and codebook shape."""

import numpy as np
import pyarrow as pa
import pytest


def _clustered(n=2000, dim=32, n_clusters=12, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 4
    assign = rng.integers(0, n_clusters, n)
    X = centers[assign] + rng.normal(size=(n, dim))
    return X.astype(np.float32)


def _emb_ds(X, blocks):
    import ray.data

    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


def _brute_topk(X, q_idx, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for qi in q_idx:
        s = Xn @ Xn[qi]
        order = np.lexsort((np.arange(len(X)), -s))
        out[qi] = set(order[:k].tolist())
    return out


def test_pq_train_shapes():
    from apache_datasketches_go_ray.stages.ann import pq_train

    X = _clustered(500)
    books = pq_train(X, n_subq=8, n_centroids=16)
    assert books.shape == (8, 16, 4)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(X, n_subq=7)


@pytest.mark.parametrize("blocks", [1, 6])
def test_pq_topk_recall_and_determinism(ray_session, blocks):
    from apache_datasketches_go_ray.stages.ann import pq_topk

    X = _clustered()
    q_idx = np.arange(0, 2000, 97)
    qm = X[q_idx].astype(np.float64)

    t = pq_topk(_emb_ds(X, blocks), q_idx, qm, k=10, n_subq=8,
                n_centroids=64, rerank=256)
    got = {}
    for qid, vid in zip(t.column("query_id").to_pylist(),
                        t.column("vec_id").to_pylist()):
        got.setdefault(qid, set()).add(vid)

    brute = _brute_topk(X, q_idx, 10)
    recalls = [len(got[int(q)] & brute[int(q)]) / 10 for q in q_idx]
    assert float(np.mean(recalls)) >= 0.95  # ADC shortlist + exact rerank

    # partition-independence of the result table
    t2 = pq_topk(_emb_ds(X, 3), q_idx, qm, k=10, n_subq=8,
                 n_centroids=64, rerank=256)
    assert t.to_pydict() == t2.to_pydict()
