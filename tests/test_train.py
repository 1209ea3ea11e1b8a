"""Distributed logistic-regression training: parity vs a
single-process trainer, same-partitioning determinism, and that the
model actually learns a separable synthetic problem."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.train import logreg_train


def _make_table(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    w_true = np.array([2.0, -1.5, 0.5])
    z = X @ w_true + 0.3
    y = (z + rng.normal(scale=0.5, size=n) > 0).astype(np.int64)
    return pa.table({
        "f0": pa.array(X[:, 0]), "f1": pa.array(X[:, 1]),
        "f2": pa.array(X[:, 2]), "label": pa.array(y),
    }), X, y


def _local_logreg(X, y, n_iters=25, lr=0.5):
    n, d = X.shape
    w = np.zeros(d + 1)
    for _ in range(n_iters):
        z = X @ w[:d] + w[d]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.concatenate([X.T @ r, [r.sum()]]) / n
        w = w - lr * g
    z = X @ w[:d] + w[d]
    p = 1.0 / (1.0 + np.exp(-z))
    eps = 1e-15
    pc_ = np.clip(p, eps, 1 - eps)
    loss = -(y * np.log(pc_) + (1 - y) * np.log(1 - pc_)).mean()
    acc = ((p >= 0.5) == (y >= 0.5)).mean()
    return w, loss, acc


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


@pytest.mark.parametrize("parts", [1, 6])
def test_logreg_matches_local_trainer(ray_session, parts):
    tbl, X, y = _make_table()
    out = logreg_train(_ds(tbl, parts), ["f0", "f1", "f2"], "label",
                       n_iters=25, lr=0.5)
    got = dict(zip(out.column("term").to_pylist(),
                   out.column("value").to_pylist()))
    w, loss, acc = _local_logreg(X, y, n_iters=25, lr=0.5)
    want = {"w_f0": w[0], "w_f1": w[1], "w_f2": w[2],
            "intercept": w[3], "train_logloss": loss,
            "train_acc": acc, "n_rows": float(len(y))}
    assert set(got) == set(want)
    for k in want:
        # block-partial float sums reorder addition; agreement is to
        # rounding, not bit-exact, for parts > 1
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12), k
    assert got["train_acc"] >= 0.9


def test_logreg_deterministic_same_partitioning(ray_session):
    tbl, _, _ = _make_table()
    a = logreg_train(_ds(tbl, 5), ["f0", "f1", "f2"], "label",
                     n_iters=10, lr=0.5)
    b = logreg_train(_ds(tbl, 5), ["f0", "f1", "f2"], "label",
                     n_iters=10, lr=0.5)
    assert a.column("value").to_pylist() == b.column("value").to_pylist()


def test_logreg_empty_input(ray_session):
    tbl = pa.table({"f0": pa.array([], type=pa.float64()),
                    "label": pa.array([], type=pa.int64())})
    out = logreg_train(_ds(tbl, 1), ["f0"], "label", n_iters=3)
    assert len(out) == 0


def test_logreg_apply_matches_brute(ray_session):
    """Broadcast-weights inference == numpy scoring of the same model."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.train import (
        logreg_apply, logreg_train, _sigmoid,
    )

    rng = np.random.default_rng(17)
    n = 300
    f1 = rng.normal(0, 1, n)
    f2 = rng.normal(0, 1, n)
    y = ((2 * f1 - f2 + rng.normal(0, 0.3, n)) > 0).astype(np.int64)
    tbl = pa.table({
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.array(f1), "b": pa.array(f2),
        "label": pa.array(y),
    })
    ds = ray.data.from_arrow(tbl).repartition(3).materialize()
    model = logreg_train(ds, ["a", "b"], "label", n_iters=25, lr=0.5)
    got = logreg_apply(ds, model, ["a", "b"], "rid",
                       threshold=0.5).to_pandas() \
        .sort_values("rid", ignore_index=True)
    lk = dict(zip(model.column("term").to_pylist(),
                  model.column("value").to_numpy(zero_copy_only=False)))
    w = np.array([lk["w_a"], lk["w_b"], lk["intercept"]])
    p = _sigmoid(np.column_stack([f1, f2]) @ w[:2] + w[2])
    want_e6 = np.floor(p * 1e6 + 0.5).astype(np.int64)
    assert got["score_e6"].to_numpy().tolist() == want_e6.tolist()
    assert got["keep"].to_numpy().tolist() == (p >= 0.5).tolist()
    # the learned filter actually separates the planted signal
    acc = ((p >= 0.5).astype(int) == y).mean()
    assert acc > 0.85
