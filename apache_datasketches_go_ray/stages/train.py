"""Distributed model training over Ray Data — iterative optimization
expressed as repeated mergeable-partial passes.

``logreg_train`` fits a binary logistic-regression classifier (the
standard quality-classifier shape: a handful of cheap per-doc features
→ keep/drop probability) by full-batch gradient descent. Each
iteration is ONE streaming pass: every block emits an exact
(d+1)-float gradient partial plus its loss/correct-count partial —
the same partial+combine discipline as the reference's sketch merges
(hll/union.go:151-158), with the model vector broadcast back each
round. Nothing but d+1 doubles per block ever crosses the wire, and
the driver state is the weight vector itself.

Scale notes: the feature table is materialized once (d float64s per
row — tiny next to the corpus text); at 100 TB you would subsample or
mini-batch rather than run 40 full passes, which is a parameter choice,
not a structural change. Partial sums are gathered with their partition
index and reduced in sorted order, so a fixed partitioning reproduces
bit-identical weights run-to-run (float addition is order-dependent;
different partitionings agree to ~1e-12 relative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .arrow_util import as_array


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_train(ds, feature_cols: list[str], label_col: str,
                 n_iters: int = 40, lr: float = 0.5, l2: float = 0.0):
    """Fit binary logistic regression by full-batch gradient descent.

    ``ds`` must carry float64-castable ``feature_cols`` and a 0/1
    ``label_col``. Returns a long-format ``pyarrow.Table``
    (term, value): one row per feature weight, the intercept, and the
    final train log-loss / accuracy / row count.
    """
    import ray

    d = len(feature_cols)
    cols = list(feature_cols) + [label_col]
    feats = ds.select_columns(cols).materialize()
    n_total = feats.count()
    if n_total == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "value": pa.array([], type=pa.float64())})

    _PART = pa.schema([("pid", pa.int64()), ("kind", pa.string()),
                       ("vals", pa.large_list(pa.float64()))])

    def make_pass(w_ref, want_metrics: bool):
        def grad_partial(b: pa.Table, ctx=None) -> pa.Table:
            if len(b) == 0:
                return _PART.empty_table()
            wv = ray.get(w_ref)
            X = np.column_stack([
                as_array(b.column(c)).to_numpy(zero_copy_only=False)
                .astype(np.float64) for c in feature_cols])
            y = as_array(b.column(label_col)).to_numpy(
                zero_copy_only=False).astype(np.float64)
            z = X @ wv[:d] + wv[d]
            p = _sigmoid(z)
            r = p - y
            g = np.empty(d + 1, dtype=np.float64)
            g[:d] = X.T @ r
            g[d] = r.sum()
            rows = [g]
            kinds = ["g"]
            if want_metrics:
                eps = 1e-15
                pc_ = np.clip(p, eps, 1 - eps)
                loss = -(y * np.log(pc_)
                         + (1 - y) * np.log(1 - pc_)).sum()
                acc = float(((p >= 0.5) == (y >= 0.5)).sum())
                rows.append(np.array([loss, acc, float(len(b))]))
                kinds.append("m")
            # pid: a stable per-partial ordering key (content hash of
            # the gradient bytes) so driver-side reduction order is
            # deterministic for a fixed partitioning
            mask = np.uint64(0x7FFFFFFFFFFFFFFF)
            pids = [int(np.frombuffer(
                np.ascontiguousarray(v).tobytes(), dtype=np.uint64)
                .sum(dtype=np.uint64) & mask) for v in rows]
            return pa.table({
                "pid": pa.array(pids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "vals": pa.array([list(map(float, v)) for v in rows],
                                 type=pa.large_list(pa.float64())),
            })
        return grad_partial

    w = np.zeros(d + 1, dtype=np.float64)
    from .context import gather_table

    def run_pass(want_metrics: bool):
        w_ref = ray.put(w)
        parts = gather_table(
            feats.map_batches(make_pass(w_ref, want_metrics),
                              batch_format="pyarrow",
                              zero_copy_batch=True),
            schema=_PART)
        kinds = parts.column("kind").to_numpy(zero_copy_only=False)
        pids = parts.column("pid").to_numpy(zero_copy_only=False)
        vals = parts.column("vals").to_pylist()
        order = np.lexsort((pids,))
        g = np.zeros(d + 1, dtype=np.float64)
        m = np.zeros(3, dtype=np.float64)
        for i in order:
            if kinds[i] == "g":
                g += np.asarray(vals[i], dtype=np.float64)
            else:
                m += np.asarray(vals[i], dtype=np.float64)
        return g, m

    for _ in range(n_iters):
        g, _m = run_pass(False)
        g /= n_total
        if l2:
            g[:d] += l2 * w[:d]
        w = w - lr * g
    _g, metrics = run_pass(True)

    terms = [f"w_{c}" for c in feature_cols] + [
        "intercept", "train_logloss", "train_acc", "n_rows"]
    values = list(w) + [metrics[0] / n_total, metrics[1] / n_total,
                        float(n_total)]
    return pa.table({"term": pa.array(terms, type=pa.string()),
                     "value": pa.array(values, type=pa.float64())})


def logreg_apply(ds, model_tbl: pa.Table, feature_cols: list[str],
                 id_col: str, *, threshold: float = 0.5):
    """Score every row with a trained logreg model (the long-format
    (term, value) table logreg_train returns): weights are ray.put ONCE
    and every block does one vectorized X@w + sigmoid — map-only, no
    shuffle. Returns (id, score_e6, keep): score rounded half-up to
    1e-6 (engine float-parity grid), keep = score >= threshold. The
    inference half of the learned-quality-filter loop."""
    import functools

    import ray

    terms = model_tbl.column("term").to_pylist()
    vals = model_tbl.column("value").to_numpy(zero_copy_only=False)
    lookup = dict(zip(terms, vals))
    w = np.array([lookup[f"w_{c}"] for c in feature_cols]
                 + [lookup["intercept"]], dtype=np.float64)
    w_ref = ray.put(w)
    d = len(feature_cols)

    def score(b: pa.Table, w_ref=w_ref) -> pa.Table:
        if len(b) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "score_e6": pa.array([], type=pa.int64()),
                "keep": pa.array([], type=pa.bool_()),
            })
        wv = ray.get(w_ref)
        X = np.column_stack([
            as_array(b.column(c)).to_numpy(zero_copy_only=False)
            .astype(np.float64) for c in feature_cols])
        p = _sigmoid(X @ wv[:d] + wv[d])
        e6 = np.floor(p * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "score_e6": pa.array(e6),
            "keep": pa.array(p >= threshold),
        })

    return ds.map_batches(functools.partial(score),
                          batch_format="pyarrow", zero_copy_batch=True)
