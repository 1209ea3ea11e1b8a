"""Embedding analytics: centroids, nearest-centroid confusion, norms.

Each operator is checked against a brute-force numpy oracle on a small
synthetic labelled embedding table, across two partitionings (the
fold must be partition-independent).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.embops import (
    centroid_confusion, label_centroids, norm_stats_by_label)


def _r4(x):
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _emb_table(n=200, d=8, n_labels=4, seed=11):
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, n_labels, n)
    # label-dependent mean so the confusion matrix is non-trivial
    centers = rng.normal(0, 1, (n_labels, d))
    m = centers[lab] + rng.normal(0, 0.8, (n, d))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": pa.array(lab.astype(np.int64)),
    })


def _ds(tbl, blocks=6):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _mat(tbl):
    return np.array(tbl.column("embedding").to_pylist(),
                    dtype=np.float32).astype(np.float64)


@pytest.mark.parametrize("parts", [2, 7])
def test_label_centroids_matches_brute(ray_session, parts):
    tbl = _emb_table()
    out = label_centroids(_ds(tbl), num_partitions=parts).to_pandas()
    m = _mat(tbl)
    lab = tbl.column("label").to_numpy()
    got = {(r.label, r.dim): r.centroid for r in out.itertuples()}
    for lb in np.unique(lab):
        c = m[lab == lb].sum(axis=0) / (lab == lb).sum()
        for j, v in enumerate(c, 1):
            assert got[(lb, j)] == _r4(v)
    assert len(got) == len(np.unique(lab)) * m.shape[1]


def test_centroid_confusion_matches_brute(ray_session):
    tbl = _emb_table()
    out = centroid_confusion(_ds(tbl), num_partitions=3).to_pandas()
    m = _mat(tbl)
    lab = tbl.column("label").to_numpy()
    labels = np.unique(lab)
    cent = np.stack([m[lab == lb].mean(axis=0) for lb in labels])
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    assigned = labels[np.argmax(mn @ cn.T, axis=1)]
    exp = {}
    for lo, a in zip(lab, assigned):
        exp[(lo, a)] = exp.get((lo, a), 0) + 1
    got = {(r.label, r.assigned): r.n for r in out.itertuples()}
    assert got == exp
    # diagonal dominates (centers are separated)
    diag = sum(v for (a, b), v in got.items() if a == b)
    assert diag > 0.6 * len(tbl)


def test_norm_stats_matches_brute(ray_session):
    tbl = _emb_table()
    out = norm_stats_by_label(_ds(tbl), num_partitions=2).to_pandas()
    m = _mat(tbl)
    lab = tbl.column("label").to_numpy()
    nr = np.sqrt((m * m).sum(axis=1))
    by = {int(r.label): r for r in out.itertuples()}
    for lb in np.unique(lab):
        sub = nr[lab == lb]
        r = by[int(lb)]
        assert r.n == len(sub)
        assert r.mean_norm == _r4(sub.sum() / len(sub))
        assert r.min_norm == _r4(sub.min())
        assert r.max_norm == _r4(sub.max())


def test_hard_negative_topk_zero_norm_query(ray_session):
    """An all-zero query vector must not silently vanish: with the norm
    guard its scores are 0 (not NaN), so it still emits its top-k
    different-label rows."""
    from apache_datasketches_go_ray.stages.embops import hard_negative_topk

    tbl = _emb_table(n=60, d=6, n_labels=3, seed=3)
    qmat = np.vstack([np.zeros(6), _mat(tbl)[0]])
    qids = np.array([900, 901], dtype=np.int64)
    qlabels = np.array([0, 0], dtype=np.int64)
    got = hard_negative_topk(_ds(tbl, 4), qids, qmat, qlabels,
                             k=3).to_pandas()
    per_q = got.groupby("query_id").size()
    assert per_q.get(900, 0) == 3  # zero-norm query still present
    assert per_q.get(901, 0) == 3
    assert np.isfinite(got["score"]).all()
