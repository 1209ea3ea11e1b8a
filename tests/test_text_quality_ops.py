"""Gopher-style repetition metrics + PII redaction kernels (the DuckDB
value-exact oracle runs at sf0.01 via tools/check_oracle.py; these pin
hand-computed values and edge cases)."""

import numpy as np
import pyarrow as pa

from apache_datasketches_go_ray.stages.textops import (
    redact_pii_batch,
    repetition_stats_batch,
)


def _rep(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return repetition_stats_batch(t).to_pandas()


def test_repetition_hand_computed():
    out = _rep(["a\na\nb",          # dup lines: 2 of 3; dup chars 2/3
                "x y x y x y",      # top bigram (x,y) 3x2 chars / 6
                "",                 # empty: one empty line, all zeros
                "unique lines\nonly here"])
    assert out["n_lines"].tolist() == [3, 1, 1, 2]
    assert np.isclose(out["dup_line_frac"][0], 1.0 / 3.0)
    assert np.isclose(out["dup_line_char_frac"][0], 2.0 / 3.0)
    # "a a b": bigrams (a,a) and (a,b), both score 1x2 over 3 chars
    assert np.isclose(out["top_bigram_char_frac"][0], 2.0 / 3.0)
    assert out["dup_line_frac"][1] == 0.0
    assert np.isclose(out["top_bigram_char_frac"][1], 1.0)
    assert (out.loc[2, ["dup_line_frac", "dup_line_char_frac",
                        "top_bigram_char_frac"]] == 0).all()
    assert out["dup_line_frac"][3] == 0.0


def test_repetition_counts_all_occurrences():
    # 4 identical lines of 2 chars + 1 distinct of 6 chars:
    # dup_line_frac = (5-2)/5; dup chars = 4*2 / (4*2+6)
    out = _rep(["ab\nab\nab\nab\nlonger"])
    assert np.isclose(out["dup_line_frac"][0], 3.0 / 5.0)
    assert np.isclose(out["dup_line_char_frac"][0], 8.0 / 14.0)


def test_repetition_independent_of_batch_grouping():
    texts = ["a\na\nb", "x y x y x y", "", "q w e r t y q w"]
    whole = _rep(texts)
    parts = [
        repetition_stats_batch(pa.table({
            "doc_id": pa.array([i], type=pa.int64()),
            "text": pa.array([s], type=pa.string())})).to_pandas()
        for i, s in enumerate(texts)]
    import pandas as pd
    split = pd.concat(parts, ignore_index=True)
    for c in ("n_lines", "dup_line_frac", "dup_line_char_frac",
              "top_bigram_char_frac"):
        assert np.allclose(whole[c], split[c]), c


def test_pii_redaction():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "mail bob.smith+x@corp.example.org now",
            "call +1 (555) 010-7788 or 020-7946-0958 today",
            "no pii here",
        ], type=pa.string())})
    out = redact_pii_batch(t).to_pandas()
    assert out["n_emails"].tolist() == [1, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0]
    assert out["redacted_text"][0] == "mail <EMAIL> now"
    assert out["redacted_text"][1] == "call <PHONE> or <PHONE> today"
    assert out["redacted_text"][2] == "no pii here"


def test_pii_email_then_phone_order():
    # digits inside an email are consumed by the email pass first
    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": pa.array(["x 12345678@nums.example.com y"])})
    out = redact_pii_batch(t).to_pandas()
    assert out["n_emails"][0] == 1
    assert out["n_phones"][0] == 0
    assert out["redacted_text"][0] == "x <EMAIL> y"


def test_compression_ratio_batch():
    import zlib

    import pyarrow as pa

    from apache_datasketches_go_ray.stages.textops import (
        compression_ratio_batch)

    rep = "spam ham " * 200          # highly repetitive
    import numpy as np
    rng = np.random.default_rng(42)
    rnd = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 1600))
    b = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([rep, rnd, ""], type=pa.string()),
    })
    out = compression_ratio_batch(b)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["n_raw_bytes"] == len(rep.encode())
    assert rows[1]["n_compressed_bytes"] == len(
        zlib.compress(rep.encode(), 6))
    assert rows[1]["compression_ratio"] < 0.05       # repetitive
    assert rows[2]["compression_ratio"] > 0.5        # high entropy
    assert rows[3]["n_raw_bytes"] == 0
    # sliced-batch (non-zero Arrow offset) parity
    out2 = compression_ratio_batch(b.slice(1))
    assert out2.to_pylist() == out.slice(1).to_pylist()


def test_token_entropy_batch_matches_brute():
    import math

    from apache_datasketches_go_ray.stages.textops import token_entropy_batch

    texts = ["a a a a", "a b c d", "a a b b c", "", "  ", "x"]
    b = pa.table({
        "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = token_entropy_batch(b)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    for i, t in enumerate(texts):
        toks = t.split()
        cnt = {}
        for tok in toks:
            cnt[tok] = cnt.get(tok, 0) + 1
        ent = -sum((c / len(toks)) * math.log(c / len(toks))
                   for c in cnt.values()) if toks else 0.0
        ent = math.floor(ent * 10000 + 0.5) / 10000
        assert rows[i]["n_tokens"] == len(toks)
        assert rows[i]["entropy"] == ent
    # sliced-batch parity
    out2 = token_entropy_batch(b.slice(2))
    assert out2.to_pylist() == out.slice(2).to_pylist()


def test_max_token_run_batch_matches_brute():
    from apache_datasketches_go_ray.stages.textops import max_token_run_batch

    texts = ["a a a b b", "a b a b", "", "z", "q q q q q q", "a a b b b"]
    b = pa.table({
        "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = max_token_run_batch(b)
    rows = {r["doc_id"]: r["max_run"] for r in out.to_pylist()}
    def brute(t):
        toks = t.split()
        best = run = 0
        prev = None
        for x in toks:
            run = run + 1 if x == prev else 1
            best = max(best, run)
            prev = x
        return best
    for i, t in enumerate(texts):
        assert rows[i] == brute(t), (i, t)
    # runs never merge across doc boundaries
    b2 = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["c c", "c c"], type=pa.string()),
    })
    assert [r["max_run"] for r in max_token_run_batch(b2).to_pylist()] \
        == [2, 2]


def _brute_longest_repeat(s: str) -> int:
    """Longest substring occurring at >= 2 distinct positions
    (overlapping occurrences count, as in the suffix-array LCP
    definition)."""
    b = s.encode("utf-8")
    n = len(b)
    best = 0
    for lo in range(n):
        for hi in range(lo + best + 1, n + 1):
            sub = b[lo:hi]
            first = b.find(sub)
            if first < lo or b.find(sub, lo + 1) != -1:
                best = hi - lo
            else:
                break
    return best


def test_longest_repeat_matches_brute(ray_session):
    import pyarrow as pa
    import ray.data

    from apache_datasketches_go_ray.stages.textops import (
        longest_repeat_batch,
    )

    docs = [
        "",                       # 0
        "a",                      # 0
        "abcabc",                 # 3  ("abc")
        "aaaa",                   # 3  ("aaa" at 0 and 1)
        "the cat sat on the mat", # "the " twice -> 4... ("t the"?) brute decides
        "no repeats here!?",
        "xyxyxyxyxy",
        "loop loop loop loop",
        "päällekkäisyys päällekkäisyys",  # multibyte utf-8
    ]
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
        "text": pa.array(docs, type=pa.string()),
    })
    got = ray.data.from_arrow(tbl).repartition(3).map_batches(
        longest_repeat_batch, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas().sort_values(
            "doc_id", ignore_index=True)
    for i, d in enumerate(docs):
        assert int(got.loc[i, "max_repeat_len"]) == \
            _brute_longest_repeat(d), d
