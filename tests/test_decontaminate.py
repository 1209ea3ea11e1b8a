"""Eval-set decontamination: planted-contamination fixtures."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from apache_datasketches_go_ray.stages.decontaminate import (
    decontaminate, eval_ngram_hashes, flag_contaminated)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]


def _sentence(rng, n):
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def _make_tables(n_eval=6, n_train=40, n=13, seed=7):
    rng = np.random.default_rng(seed)
    eval_texts = [_sentence(rng, 30 + int(rng.integers(0, 10)))
                  for _ in range(n_eval)]
    train_texts, expected = [], []
    for i in range(n_train):
        kind = i % 4
        if kind == 0:
            # verbatim n-gram from an eval doc spliced into fresh text
            src = eval_texts[i % n_eval].split()
            start = int(rng.integers(0, len(src) - n + 1))
            gram = " ".join(src[start:start + n])
            train_texts.append(
                _sentence(rng, 8) + " " + gram + " " + _sentence(rng, 8))
            expected.append(True)
        elif kind == 1:
            # near-miss: n-1 shared tokens only (one token changed)
            src = eval_texts[i % n_eval].split()
            window = src[:n]
            window[n // 2] = "UNIQUETOKEN%d" % i
            train_texts.append(" ".join(window) + " " + _sentence(rng, 10))
            expected.append(False)
        elif kind == 2:
            # short doc (< n tokens) copied from eval prefix: can't hold
            # an n-gram, must never flag
            train_texts.append(
                " ".join(eval_texts[i % n_eval].split()[: n - 1]))
            expected.append(False)
        else:
            train_texts.append(_sentence(rng, 25) + " CLEAN%d" % i)
            expected.append(False)
    ev = pa.table({"doc_id": pa.array(range(n_eval), type=pa.int64()),
                   "text": pa.array(eval_texts)})
    tr = pa.table({"doc_id": pa.array(range(100, 100 + n_train),
                                      type=pa.int64()),
                   "text": pa.array(train_texts)})
    return ev, tr, expected


def test_planted_contamination_flags_exactly(ray_session):
    ev, tr, expected = _make_tables()
    out = decontaminate(ray.data.from_arrow(tr).repartition(4),
                        ray.data.from_arrow(ev).repartition(2),
                        n=13, keep_clean=True).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(expected)
    got = out["contaminated"].tolist()
    assert got == expected
    # contaminated docs have >= 1 distinct hit; clean docs exactly 0
    assert (out.loc[out["contaminated"], "n_hits"] >= 1).all()
    assert (out.loc[~out["contaminated"], "n_hits"] == 0).all()


def test_flagged_only_output_matches_keep_clean(ray_session):
    ev, tr, _ = _make_tables(seed=11)
    tr_ds = ray.data.from_arrow(tr).repartition(3)
    hashes = eval_ngram_hashes(ray.data.from_arrow(ev), n=13)
    full = flag_contaminated(tr_ds, hashes, n=13,
                             keep_clean=True).to_pandas()
    only = flag_contaminated(tr_ds, hashes, n=13,
                             keep_clean=False).to_pandas()
    want = full[full["contaminated"]].sort_values("doc_id") \
        .reset_index(drop=True)
    got = only.sort_values("doc_id").reset_index(drop=True)
    assert want.equals(got)


def test_empty_eval_set_flags_nothing(ray_session):
    _ev, tr, _ = _make_tables(seed=3)
    empty_ev = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    out = decontaminate(ray.data.from_arrow(tr), empty_ev, n=13,
                        keep_clean=True).to_pandas()
    assert not out["contaminated"].any()


@pytest.mark.parametrize("blocks", [1, 4])
def test_contamination_pairs_matches_brute(ray_session, blocks):
    """Pair provenance == brute per-doc-distinct 13-gram join, under
    the Knuth train/eval split, across partitionings."""
    import numpy as np
    import ray.data

    from apache_datasketches_go_ray.stages.decontaminate import (
        contamination_pairs,
    )

    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, rng.integers(13, 40)))
             for _ in range(80)]
    # plant leaks: copy a 13-token window from doc a into doc b
    for a, b in [(0, 11), (2, 31), (4, 51), (6, 71)]:
        win = texts[a].split()[:13]
        texts[b] = texts[b] + " " + " ".join(win)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })
    got = contamination_pairs(
        ray.data.from_arrow(tbl).repartition(blocks),
        n=13, eval_pct=10, num_partitions=4).to_pandas()
    got_map = {(int(r.train_doc), int(r.eval_doc)): int(r.n_shared)
               for r in got.itertuples()}

    def grams(t):
        toks = t.split()
        return {" ".join(toks[i:i + 13])
                for i in range(len(toks) - 12)}

    is_eval = [((i * 2654435761) % 4294967296) % 100 < 10
               for i in range(80)]
    want = {}
    for tr_id in range(80):
        if is_eval[tr_id]:
            continue
        gt = grams(texts[tr_id])
        for ev_id in range(80):
            if not is_eval[ev_id]:
                continue
            shared = len(gt & grams(texts[ev_id]))
            if shared:
                want[(tr_id, ev_id)] = shared
    assert got_map == want
