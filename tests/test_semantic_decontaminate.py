"""semantic_decontaminate: planted near-copies of eval vectors must be
flagged, orthogonal vectors must not, across partitionings. (SQL gate:
the semantic_decontaminate oracle at sf0.01/sf0.001.)"""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _emb_table(ids, mat):
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "embedding": pa.array(list(np.asarray(mat, dtype=np.float32)),
                              type=pa.list_(pa.float32())),
    })


@pytest.mark.parametrize("blocks", [1, 5])
def test_planted_contamination_flagged(ray_session, blocks):
    from apache_datasketches_go_ray.stages.decontaminate import (
        semantic_decontaminate,
    )

    rng = np.random.default_rng(17)
    dim = 32
    ev = rng.normal(size=(6, dim))
    # train: 3 contaminated (eval + tiny noise), 40 random
    contaminated = ev[:3] + rng.normal(scale=0.01, size=(3, dim))
    clean = rng.normal(size=(40, dim))
    train = np.vstack([contaminated, clean])
    ids = np.arange(100, 100 + len(train))

    got = semantic_decontaminate(
        _ds(_emb_table(ids, train), blocks),
        _ds(_emb_table(np.arange(6), ev), 2),
        threshold=0.9).to_pandas().sort_values("vec_id",
                                               ignore_index=True)
    assert list(got["vec_id"]) == [100, 101, 102]
    assert (got["n_contaminating"] == 1).all()

    # brute check at a loose threshold across all train rows
    evn = ev / np.linalg.norm(ev, axis=1, keepdims=True)
    tn = train / np.linalg.norm(train, axis=1, keepdims=True)
    cnt = ((tn @ evn.T) >= 0.5).sum(axis=1)
    loose = semantic_decontaminate(
        _ds(_emb_table(ids, train), blocks),
        _ds(_emb_table(np.arange(6), ev), 2),
        threshold=0.5).to_pandas().sort_values("vec_id",
                                               ignore_index=True)
    exp = {int(i): int(c) for i, c in zip(ids, cnt) if c > 0}
    assert {int(r.vec_id): int(r.n_contaminating)
            for r in loose.itertuples()} == exp


def test_empty_eval_set_returns_empty(ray_session):
    from apache_datasketches_go_ray.stages.decontaminate import (
        semantic_decontaminate,
    )

    rng = np.random.default_rng(3)
    train = _emb_table(np.arange(10), rng.normal(size=(10, 16)))
    empty = _emb_table(np.array([], dtype=np.int64),
                       np.zeros((0, 16)))
    got = semantic_decontaminate(_ds(train, 2), _ds(empty, 1),
                                 threshold=0.5).to_pandas()
    assert len(got) == 0  # no contamination, no crash
    # (column metadata on fully-empty pandas conversions is a Ray
    # cosmetic: each block IS typed, see stages/decontaminate.flag)
