"""Character-trigram language-model quality scoring (CCNet-style,
Wenzek et al. 2020 — public paper; KenLM replaced by a byte-trigram
model trainable with numpy only).

The standard "does this look like real text" filter an LLM
training-data pipeline runs: train a small LM on an in-domain sample,
score every document by mean log-probability, drop the tail. Scale
shape: the model trains ONCE on a bounded, deterministic driver sample
(``ds.limit`` — same trick as the IVF coarse quantizer), is broadcast
via ``ray.put``, and scoring is a pure streaming ``map_batches`` pass —
no shuffle, no state, vectorized end to end:

* document bytes are viewed through the Arrow value buffer + offsets
  (no per-row Python),
* trigram keys are shifted-slice arithmetic over one uint8 array,
* model lookups are ``np.searchsorted`` into sorted key arrays,
* per-doc folds are ``np.bincount`` on parent indices.

Add-one smoothing over the 256-byte alphabet:
  logp(c3 | c1 c2) = log(tri_count + 1) - log(bi_count + 256)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .arrow_util import as_array


def _byte_views(texts: pa.Array):
    """string/large_string column -> (uint8 data, absolute int64
    offsets per row boundary)."""
    arr = as_array(texts)
    if arr.type == pa.string():
        arr = arr.cast(pa.large_string())
    elif arr.type != pa.large_string():
        raise TypeError(f"expected string column, got {arr.type}")
    if len(arr) == 0 or arr.buffers()[1] is None:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.empty(0, dtype=np.uint8))
    return data, offs


def _trigram_keys(data: np.ndarray, offs: np.ndarray):
    """Packed uint32 trigram keys + parent row per trigram (trigrams
    never cross document boundaries)."""
    total = offs[-1] - offs[0]
    if total < 3:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    lo, hi = int(offs[0]), int(offs[-1])
    b = data[lo:hi].astype(np.int64)
    keys = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
    pos = np.arange(lo, hi - 2, dtype=np.int64)
    parent = np.searchsorted(offs, pos, side="right") - 1
    valid = pos + 3 <= offs[parent + 1]
    return keys[valid], parent[valid]


class TrigramLM:
    """Sorted-array trigram/bigram count tables + scoring kernel."""

    def __init__(self, tri_keys, tri_counts, bi_keys, bi_counts):
        self.tri_keys = tri_keys
        self.tri_counts = tri_counts
        self.bi_keys = bi_keys
        self.bi_counts = bi_counts

    @classmethod
    def train(cls, texts: pa.Array) -> "TrigramLM":
        data, offs = _byte_views(texts)
        keys, _ = _trigram_keys(data, offs)
        tri_keys, tri_counts = np.unique(keys, return_counts=True)
        bi_keys, bi_counts = np.unique(keys >> 8, return_counts=True)
        return cls(tri_keys, tri_counts, bi_keys, bi_counts)

    def _lookup(self, keys, table_keys, table_counts):
        idx = np.searchsorted(table_keys, keys)
        idx = np.minimum(idx, len(table_keys) - 1) \
            if len(table_keys) else np.zeros(len(keys), dtype=np.int64)
        cnt = np.zeros(len(keys), dtype=np.int64)
        if len(table_keys):
            hit = table_keys[idx] == keys
            cnt[hit] = table_counts[idx[hit]]
        return cnt

    def score(self, texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """-> (mean logp per row, trigram count per row); rows with no
        trigram score 0.0."""
        n = len(texts)
        data, offs = _byte_views(texts)
        keys, parent = _trigram_keys(data, offs)
        scores = np.zeros(n)
        counts = np.bincount(parent, minlength=n).astype(np.int64)
        if len(keys):
            tri = self._lookup(keys, self.tri_keys, self.tri_counts)
            bi = self._lookup(keys >> 8, self.bi_keys, self.bi_counts)
            logp = np.log(tri + 1.0) - np.log(bi + 256.0)
            tot = np.bincount(parent, weights=logp, minlength=n)
            nz = counts > 0
            scores[nz] = tot[nz] / counts[nz]
        return scores, counts


class _ScoreStage:
    """Actor-pool stage: model ray.get once per actor in __init__."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        self.model: TrigramLM = ray.get(model_ref)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = as_array(batch.column(self.text_col))
        scores, counts = self.model.score(texts)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_trigrams": pa.array(counts, type=pa.int64()),
            "lm_score": pa.array(scores, type=pa.float64()),
        })


def lm_quality_score(ds, sample_size: int = 2048, text_col: str = "text",
                     id_col: str = "doc_id", concurrency=None):
    """(id, text) rows -> (id, n_trigrams, lm_score): mean byte-trigram
    log-probability under a model trained on the dataset's own leading
    sample. Deterministic (sample = ds.limit in file order)."""
    sample_refs = (ds.select_columns([text_col]).limit(sample_size)
                   .materialize().to_arrow_refs())
    parts = [as_array(t.column(text_col))
             for t in (ray.get(r) for r in sample_refs) if len(t)]
    model = TrigramLM.train(pa.concat_arrays(parts))
    ref = ray.put(model)
    if concurrency is None:
        n_cpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, n_cpu))
    return ds.map_batches(
        _ScoreStage, fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
