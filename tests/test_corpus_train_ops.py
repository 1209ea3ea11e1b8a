"""Classifier-training / tokenizer-training / sliding-distinct ops:
naive-Bayes token likelihoods, BPE merge learning, trailing-window
distinct, bigram diversity. Each checked against a brute single-process
oracle on a small synthetic corpus, across >=2 partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.corpusops import (
    _bpe_merge_loop, bpe_learn_merges, ngram_diversity_by,
    nb_token_likelihoods)
from apache_datasketches_go_ray.stages.windows import (
    trailing_distinct_by_day)


def _docs_table():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts, langs, srcs = [], [], []
    for i in range(80):
        n = int(rng.integers(0, 25))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        texts.append(" ".join(toks))
        langs.append(["en", "fr", "de"][i % 3])
        srcs.append(f"s{i % 4}")
    texts[5] = ""  # empty doc
    texts[6] = "solo"  # single-token doc (no bigrams)
    return pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
    })


def _ds(tbl, blocks=7):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


# ---------------------------------------------------------------- NB


def _brute_nb(tbl, top_k=5):
    from collections import Counter

    cnt: Counter = Counter()
    vocab = set()
    totals: Counter = Counter()
    for lang, text in zip(tbl.column("lang").to_pylist(),
                          tbl.column("text").to_pylist()):
        for t in text.split():
            cnt[(lang, t)] += 1
            vocab.add(t)
            totals[lang] += 1
    V = len(vocab)
    rows = []
    for lang in sorted(totals):
        items = sorted(((lt[1], c) for lt, c in cnt.items()
                        if lt[0] == lang),
                       key=lambda tc: (-tc[1], tc[0]))[:top_k]
        for t, c in items:
            rows.append((lang, t, c, (c + 1) * 1.0 / (totals[lang] + V)))
    return rows


@pytest.mark.parametrize("parts", [3, 11])
def test_nb_token_likelihoods_matches_brute(ray_session, parts):
    tbl = _docs_table()
    out = nb_token_likelihoods(_ds(tbl, parts), class_col="lang",
                               top_k=5, num_partitions=parts)
    got = sorted(zip(out.column("lang").to_pylist(),
                     out.column("token").to_pylist(),
                     out.column("c").to_pylist(),
                     out.column("p").to_pylist()))
    want = sorted(_brute_nb(tbl, top_k=5))
    assert got == want  # exact, including the IEEE division


# ---------------------------------------------------------------- BPE


def _brute_bpe(word_freqs: dict, n_merges: int):
    """Dict-of-string-tuples reference trainer (Sennrich et al. 2016
    pseudocode shape)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best_c = max(pairs.values())
        if best_c < 2:
            break
        bl, br = min(p for p, c in pairs.items() if c == best_c)
        merged = bl + br
        merges.append((bl, br, merged, best_c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == bl
                        and syms[i + 1] == br):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merge_loop_matches_reference_trainer():
    rng = np.random.default_rng(3)
    alphabet = "abcdefg"
    wf = {}
    for _ in range(200):
        n = int(rng.integers(1, 9))
        w = "".join(alphabet[int(i)]
                    for i in rng.integers(0, len(alphabet), n))
        wf[w] = wf.get(w, 0) + int(rng.integers(1, 50))
    words = sorted(wf)
    freqs = np.array([wf[w] for w in words], dtype=np.int64)
    got = _bpe_merge_loop(words, freqs, 25)
    want = _brute_bpe(wf, 25)
    assert got == want


def test_bpe_overlap_is_left_to_right_greedy():
    # 'aaaa' with merge (a,a): greedy left-to-right -> 'aa','aa';
    # next round merges ('aa','aa')
    got = _bpe_merge_loop(["aaaa"], np.array([3]), 2)
    want = _brute_bpe({"aaaa": 3}, 2)
    assert got == want
    assert got[0][:3] == ("a", "a", "aa")
    assert got[1][:3] == ("aa", "aa", "aaaa")


def test_bpe_same_string_from_two_merge_paths():
    # force 'ab'+'c' and 'a'+'bc' to both appear: symbols are strings,
    # so the second path must reuse the same symbol identity
    wf = {"abc": 10, "xab": 6, "bcy": 6, "abcz": 5}
    words = sorted(wf)
    freqs = np.array([wf[w] for w in words], dtype=np.int64)
    got = _bpe_merge_loop(words, freqs, 6)
    want = _brute_bpe(wf, 6)
    assert got == want


@pytest.mark.parametrize("parts", [3, 9])
def test_bpe_learn_merges_partition_independent(ray_session, parts):
    tbl = _docs_table()
    out = bpe_learn_merges(_ds(tbl, parts), n_merges=8,
                           vocab_size=1000, num_partitions=parts)
    # brute: word freqs from the whole corpus
    wf = {}
    for text in tbl.column("text").to_pylist():
        for t in text.split():
            wf[t] = wf.get(t, 0) + 1
    want = _brute_bpe(wf, 8)
    got = list(zip(out.column("left").to_pylist(),
                   out.column("right").to_pylist(),
                   out.column("merged").to_pylist(),
                   out.column("count").to_pylist()))
    assert got == want


# ------------------------------------------------- trailing distinct


@pytest.mark.parametrize("parts", [3, 10])
def test_trailing_distinct_matches_brute(ray_session, parts):
    rng = np.random.default_rng(5)
    n = 4000
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 40, n) * 86_400_000_000 \
        + rng.integers(0, 86_400_000_000, n)
    users = rng.integers(0, 60, n).astype(np.int64)
    # leave a gap: drop days 10..13 entirely
    day_idx = (ts - base) // 86_400_000_000
    keep = ~np.isin(day_idx, [10, 11, 12, 13])
    ts, users = ts[keep], users[keep]
    tbl = pa.table({"ts": pa.array(ts, type=pa.int64())
                    .cast(pa.timestamp("us")),
                    "user_id": pa.array(users, type=pa.int64())})
    out = trailing_distinct_by_day(_ds(tbl, parts), days=7,
                                   num_partitions=parts)
    import pandas as pd

    odf = out.to_pandas()
    got = {d: n_ for d, n_ in zip(odf["day"], odf["n_users"])}
    df = pd.DataFrame({"day": pd.to_datetime(ts, unit="us")
                      .floor("D"), "u": users})
    days_present = sorted(df["day"].unique())
    want = {}
    for d in days_present:
        lo = d - pd.Timedelta(days=6)
        want[d] = df[(df["day"] >= lo) & (df["day"] <= d)]["u"].nunique()
    got = {pd.Timestamp(k): v for k, v in got.items()}
    assert got == want


# ---------------------------------------------------- bigram diversity


@pytest.mark.parametrize("parts", [3, 9])
def test_ngram_diversity_matches_brute(ray_session, parts):
    tbl = _docs_table()
    out = ngram_diversity_by(_ds(tbl, parts), group_col="source",
                             num_partitions=parts)
    out = out.to_pandas()
    got = {r["source"]: (r["n_bigrams"], r["n_distinct"], r["diversity"])
           for _, r in out.iterrows()}
    want = {}
    for src, text in zip(tbl.column("source").to_pylist(),
                         tbl.column("text").to_pylist()):
        toks = text.split()
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tot, dst = want.get(src, (0, set()))
        want[src] = (tot + len(bgs), dst | set(bgs))
    want = {s: (t, len(d), len(d) * 1.0 / t)
            for s, (t, d) in want.items() if t > 0}
    assert got == want


def test_bpe_encode_matches_direct_apply(ray_session):
    """Distributed encode (actor-pool, distinct-word cache) equals a
    direct per-doc merge application, and is insensitive to batch
    boundaries."""
    import ray.data

    from apache_datasketches_go_ray.stages.corpusops import (
        bpe_apply_word, bpe_encode_stats, bpe_learn_merges,
    )

    docs = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a b c d e the the the",
        "thematic theme anthem",
        "",
        "onetoken",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    ds = ray.data.from_arrow(tbl).repartition(3)
    merges_tbl = bpe_learn_merges(ds, n_merges=12, vocab_size=100,
                                  num_partitions=2)
    merges = list(zip(merges_tbl.column("left").to_pylist(),
                      merges_tbl.column("right").to_pylist()))

    got = (bpe_encode_stats(ds, merges_tbl, batch_size=2)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    for i, text in enumerate(docs):
        words = text.split()
        want_tok = sum(bpe_apply_word(w, merges) for w in words)
        assert int(got.n_words[i]) == len(words)
        assert int(got.n_bpe_tokens[i]) == want_tok
    # merges actually compress: total tokens < total chars for real text
    assert int(got.n_bpe_tokens[0]) < len(docs[0].replace(" ", ""))
