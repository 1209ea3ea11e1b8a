"""Corpus-stats operators: TF-IDF, duplicated-span stats, DSIR weights.

Each operator is checked against a brute-force single-process oracle on
a small synthetic corpus, on BOTH the broadcast and the co-partition
(broadcast_threshold=0) paths — the two paths must agree exactly.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.corpusops import (
    dsir_importance, dup_span_rewrite, dup_span_stats, oov_rate,
    tfidf_top_terms, zipf_slope)


def _docs_table():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts, langs = [], []
    for i in range(60):
        n = int(rng.integers(0, 30))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        texts.append(" ".join(toks))
        langs.append(["en", "fr", "de"][i % 3])
    # a planted shared span of 5 tokens between docs 0 and 1 (k=3 grams)
    span = "s1 s2 s3 s4 s5"
    texts[0] = texts[0] + " " + span
    texts[1] = span + " " + texts[1]
    texts[2] = ""  # empty doc
    return pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def _ds(tbl, blocks=7):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _r4(x):
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _brute_tfidf(tbl, top_n=3):
    docs = {i: t.split() for i, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())}
    n_total = len(docs)
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    rows = []
    for d, toks in docs.items():
        if not toks:
            continue
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((_r4(c * (math.log((n_total + 1.0) / (df[t] + 1.0)) + 1.0)), t)
             for t, c in tf.items()),
            key=lambda p: (-p[0], p[1]))
        for r, (s, t) in enumerate(scored[:top_n], 1):
            rows.append((d, r, t, s))
    return sorted(rows)


@pytest.mark.parametrize("threshold", [1 << 30, 0])
def test_tfidf_matches_brute_force(ray_session, threshold):
    tbl = _docs_table()
    out = tfidf_top_terms(_ds(tbl), top_n=3, num_partitions=5,
                          broadcast_threshold=threshold).to_pandas()
    got = sorted(zip(out["doc_id"], out["rank"], out["token"], out["score"]))
    assert got == _brute_tfidf(tbl)


def _brute_spans(tbl, k):
    docs = {i: t.split() for i, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())}
    grams = {d: {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}
             for d, toks in docs.items()}
    by_gram = {}
    for d, gs in grams.items():
        for g in gs:
            by_gram.setdefault(g, set()).add(d)
    rows = []
    for d, gs in grams.items():
        nd = sum(1 for g in gs if len(by_gram[g]) >= 2)
        rows.append((d, len(gs), nd, _r4(nd / max(len(gs), 1))))
    return sorted(rows)


def test_dup_span_stats_matches_brute_force(ray_session):
    tbl = _docs_table()
    out = dup_span_stats(_ds(tbl), k=3, num_partitions=5).to_pandas()
    got = sorted(zip(out["doc_id"], out["n_grams"], out["n_dup_grams"],
                     out["dup_ratio"]))
    assert got == _brute_spans(tbl, 3)
    # the planted 5-token span gives docs 0 and 1 at least 3 dup 3-grams
    per = {d: nd for d, _, nd, _ in got}
    assert per[0] >= 3 and per[1] >= 3
    # every doc row present, including the empty doc (0/0/0.0)
    assert len(got) == 60 and per[2] == 0


def _brute_rewrite(tbl, k):
    """Keep-first exact substring dedup: every k-gram occurrence after
    the corpus-wide (doc_id, pos)-min marks its k tokens covered."""
    docs = {i: t.split() for i, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())}
    first = {}
    for d in sorted(docs):
        toks = docs[d]
        for p in range(len(toks) - k + 1):
            g = tuple(toks[p:p + k])
            if g not in first:
                first[g] = (d, p)
    rows = []
    for d, toks in docs.items():
        covered = [False] * len(toks)
        for p in range(len(toks) - k + 1):
            if first[tuple(toks[p:p + k])] != (d, p):
                for j in range(p, p + k):
                    covered[j] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        rows.append((d, " ".join(kept), len(toks), sum(covered)))
    return sorted(rows)


@pytest.mark.parametrize("parts", [2, 5])
def test_dup_span_rewrite_matches_brute_force(ray_session, parts):
    tbl = _docs_table()
    out = dup_span_rewrite(_ds(tbl), k=3, num_partitions=parts).to_pandas()
    got = sorted(zip(out["doc_id"], out["new_text"], out["n_tokens"],
                     out["n_removed"]))
    exp = _brute_rewrite(tbl, 3)
    assert got == exp
    # the planted shared span was actually removed from the later doc
    per = {d: nr for d, _, _, nr in got}
    assert per[1] >= 3 and per[0] == 0 or per[0] >= 3  # one side rewritten
    # every doc present, empty doc passes through as ''
    assert len(got) == 60
    assert dict((d, t) for d, t, _, _ in got)[2] == ""


def test_dup_span_rewrite_intra_doc(ray_session):
    # a gram repeated within ONE doc keeps only its first occurrence
    tbl = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": pa.array(["a b c x a b c"], type=pa.string()),
    })
    out = dup_span_rewrite(_ds(tbl, blocks=1), k=3,
                           num_partitions=2).to_pandas()
    assert list(out["new_text"]) == ["a b c x"]
    assert list(out["n_removed"]) == [3]


def _brute_oov(tbl, vocab_size):
    docs = {i: t.split() for i, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())}
    cnt = {}
    for toks in docs.values():
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
    vocab = set(t for _, t in sorted(
        ((-c, t) for t, c in cnt.items()))[:vocab_size])
    rows = []
    for d, toks in docs.items():
        noov = sum(1 for t in toks if t not in vocab)
        rows.append((d, len(toks), noov, _r4(noov / max(len(toks), 1))))
    return sorted(rows)


@pytest.mark.parametrize("vocab_size", [10, 1000])
def test_oov_rate_matches_brute(ray_session, vocab_size):
    tbl = _docs_table()
    out = oov_rate(_ds(tbl), vocab_size=vocab_size,
                   num_partitions=5).to_pandas()
    got = sorted(zip(out["doc_id"], out["n_tokens"], out["n_oov"],
                     out["oov_rate"]))
    assert got == _brute_oov(tbl, vocab_size)
    assert len(got) == 60  # zero-token doc included


def _brute_zipf(tbl, top_r):
    by_src = {}
    for s, t in zip(tbl.column("lang").to_pylist(),
                    tbl.column("text").to_pylist()):
        c = by_src.setdefault(s, {})
        for tok in t.split():
            c[tok] = c.get(tok, 0) + 1
    rows = []
    for s, cnt in by_src.items():
        ranked = sorted(((-c, t) for t, c in cnt.items()))[:top_r]
        if len(ranked) < 2:
            continue
        x = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
        y = np.log(np.array([-c for c, _ in ranked], dtype=np.float64))
        slope = (((x - x.mean()) * (y - y.mean())).sum()
                 / ((x - x.mean()) ** 2).sum())
        rows.append((s, len(ranked), _r4(slope)))
    return sorted(rows)


@pytest.mark.parametrize("top_r", [5, 200])
def test_zipf_slope_matches_brute(ray_session, top_r):
    tbl = _docs_table()
    out = zipf_slope(_ds(tbl), group_col="lang", top_r=top_r,
                     num_partitions=6).to_pandas()
    got = sorted(zip(out["lang"], out["n_terms"], out["zipf_slope"]))
    exp = _brute_zipf(tbl, top_r)
    assert [(s, n) for s, n, _ in got] == [(s, n) for s, n, _ in exp]
    for (_, _, a), (_, _, b) in zip(got, exp):
        assert abs(a - b) < 2e-4


def _brute_dsir(tbl, target="en"):
    docs = {i: t.split() for i, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())}
    langs = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("lang").to_pylist()))
    c_all, c_tgt = {}, {}
    for d, toks in docs.items():
        for t in toks:
            c_all[t] = c_all.get(t, 0) + 1
            if langs[d] == target:
                c_tgt[t] = c_tgt.get(t, 0) + 1
    r = sum(c_all.values())
    tt = sum(c_tgt.values())
    v = len(c_all)
    rows = []
    for d, toks in docs.items():
        if not toks:
            continue
        w = [math.log((c_tgt.get(t, 0) + 1.0) / (tt + v))
             - math.log((c_all[t] + 1.0) / (r + v)) for t in toks]
        rows.append((d, _r4(sum(w) / len(w))))
    return sorted(rows)


@pytest.mark.parametrize("threshold", [1 << 30, 0])
def test_dsir_matches_brute_force(ray_session, threshold):
    tbl = _docs_table()
    out = dsir_importance(_ds(tbl), target_value="en", num_partitions=5,
                          broadcast_threshold=threshold).to_pandas()
    got = sorted(zip(out["doc_id"], out["llr"]))
    want = _brute_dsir(tbl)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=2e-4)
    # en docs should on average score higher than non-en docs
    langs = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("lang").to_pylist()))
    en = [s for d, s in got if langs[d] == "en"]
    other = [s for d, s in got if langs[d] != "en"]
    assert np.mean(en) > np.mean(other)


# ---------------------------------------------------------------------------
# collocation_stats
# ---------------------------------------------------------------------------

def _brute_collocations(tbl, min_count):
    from collections import Counter

    pairs = []
    for t in tbl.column("text").to_pylist():
        toks = t.split()
        pairs.extend(zip(toks, toks[1:]))
    n_total = len(pairs)
    n_xy = Counter(pairs)
    n_x = Counter(x for x, _ in pairs)
    n_y = Counter(y for _, y in pairs)
    return {f"{x} {y}": (c, n_x[x], n_y[y], n_total)
            for (x, y), c in n_xy.items() if c >= min_count}


@pytest.mark.parametrize("parts", [2, 8])
def test_collocation_stats_matches_brute(ray_session, parts):
    from apache_datasketches_go_ray.stages.corpusops import collocation_stats

    tbl = _docs_table()
    out = collocation_stats(_ds(tbl), min_count=2,
                            num_partitions=parts).to_pandas()
    exp = _brute_collocations(tbl, min_count=2)
    got = {r.bigram: (r.n_xy, r.n_x, r.n_y, r.n_total)
           for r in out.itertuples()}
    assert got == exp
    assert len(out) == len(exp)


# ---------------------------------------------------------------------------
# source_vocab_overlap
# ---------------------------------------------------------------------------

def _brute_overlap(tbl):
    vocab = {}
    for s, t in zip(tbl.column("source").to_pylist(),
                    tbl.column("text").to_pylist()):
        vocab.setdefault(s, set()).update(t.split())
    rows = {}
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            nc = len(vocab[a] & vocab[b])
            if nc:
                j = math.floor(
                    nc / (len(vocab[a]) + len(vocab[b]) - nc) * 1e6
                    + 0.5) / 1e6
                rows[(a, b)] = (len(vocab[a]), len(vocab[b]), nc, j)
    return rows


def test_source_vocab_overlap_matches_brute(ray_session):
    from apache_datasketches_go_ray.stages.corpusops import (
        source_vocab_overlap)

    tbl = _docs_table().rename_columns(["doc_id", "text", "source"])
    out = source_vocab_overlap(_ds(tbl, blocks=5), num_partitions=4)
    got = {}
    for r in out.to_pylist():
        got[(r["source_a"], r["source_b"])] = (
            r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
    assert got == _brute_overlap(tbl)
    # partition-count independence
    out2 = source_vocab_overlap(_ds(tbl, blocks=1), num_partitions=9)
    got2 = {(r["source_a"], r["source_b"]):
            (r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
            for r in out2.to_pylist()}
    assert got2 == got


# ---------------------------------------------------------------------------
# novelty_scores
# ---------------------------------------------------------------------------

def _brute_novelty(texts, n=3):
    grams = {}
    per_doc = {}
    for doc_id, t in enumerate(texts):
        toks = t.split()
        g = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        per_doc[doc_id] = g
        for gm in g:
            grams.setdefault(gm, doc_id)
            grams[gm] = min(grams[gm], doc_id)
    out = {}
    for doc_id, g in per_doc.items():
        if not g:
            continue
        n_new = sum(1 for gm in g if grams[gm] == doc_id)
        out[doc_id] = (len(g), n_new, n_new * 1_000_000 // len(g))
    return out


@pytest.mark.parametrize("blocks", [1, 4])
def test_novelty_scores_brute_parity(ray_session, blocks):
    import ray.data

    from apache_datasketches_go_ray.stages.corpusops import novelty_scores

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 25))))
             for _ in range(60)]
    texts[10] = texts[3]          # full copy: zero novelty
    texts[11] = ""                # empty doc: no output row
    tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    out = novelty_scores(ds, num_partitions=4).to_pandas()
    got = {int(r.doc_id): (int(r.n_total), int(r.n_new),
                           int(r.novelty_ppm))
           for r in out.itertuples()}
    assert got == _brute_novelty(texts)
    assert got[10][1] == 0 or texts[10] != texts[3]
