"""Char-trigram LM quality scoring: discrimination, determinism,
kernel-vs-reference parity."""

import math

import numpy as np
import pyarrow as pa

from apache_datasketches_go_ray.stages.lmscore import (
    TrigramLM,
    _byte_views,
    _trigram_keys,
)


def test_trigram_keys_respect_doc_boundaries():
    texts = pa.array(["abcd", "", "xy", "pqr"], type=pa.string())
    data, offs = _byte_views(texts)
    keys, parent = _trigram_keys(data, offs)
    # "abcd" -> abc, bcd; "xy" too short; "pqr" -> pqr
    assert parent.tolist() == [0, 0, 3]
    def k(s):
        return (ord(s[0]) << 16) | (ord(s[1]) << 8) | ord(s[2])
    assert keys.tolist() == [k("abc"), k("bcd"), k("pqr")]


def test_score_matches_python_reference():
    train = pa.array(["the quick brown fox jumps over the lazy dog " * 5])
    lm = TrigramLM.train(train)
    docs = ["the quick fox", "zzqqxx"]
    scores, counts = lm.score(pa.array(docs, type=pa.string()))

    # dict-based reference
    tri, bi = {}, {}
    s = train[0].as_py().encode()
    for i in range(len(s) - 2):
        tri[s[i:i + 3]] = tri.get(s[i:i + 3], 0) + 1
        bi[s[i:i + 2]] = bi.get(s[i:i + 2], 0) + 1
    for d, got_s, got_c in zip(docs, scores, counts):
        b = d.encode()
        lps = [math.log(tri.get(b[i:i + 3], 0) + 1)
               - math.log(bi.get(b[i:i + 2], 0) + 256)
               for i in range(len(b) - 2)]
        assert got_c == len(lps)
        assert abs(got_s - sum(lps) / len(lps)) < 1e-12


def test_lm_discriminates_gibberish(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.lmscore import lm_quality_score

    rng = np.random.default_rng(7)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "and", "runs", "far", "away", "home", "again"]
    clean = [" ".join(rng.choice(words, 12)) for _ in range(300)]
    junk = ["".join(chr(c) for c in rng.integers(33, 127, 60))
            for _ in range(50)]
    tbl = pa.table({
        "doc_id": pa.array(range(350), type=pa.int64()),
        "text": pa.array(clean + junk, type=pa.string()),
    })
    out = lm_quality_score(ray.data.from_arrow(tbl).repartition(4),
                           sample_size=200, concurrency=2) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    clean_mean = out.loc[:299, "lm_score"].mean()
    junk_mean = out.loc[300:, "lm_score"].mean()
    assert clean_mean > junk_mean + 1.0, (clean_mean, junk_mean)
    # deterministic across block layouts (sample = limit in file order)
    out2 = lm_quality_score(ray.data.from_arrow(tbl).repartition(9),
                            sample_size=200, concurrency=2) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert np.allclose(out["lm_score"], out2["lm_score"])
