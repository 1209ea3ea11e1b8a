"""Gopher rule flags, fixed-window chunking, markup strip, grouped
winsorized mean, shard manifest (distributed exact cumsum) and CDC
merge-upsert. Stage kernels are checked against hand-computed /
brute single-process oracles; the shuffling ops additionally across
>=2 partitionings (partition independence)."""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.textops import (
    chunk_text_batch, gopher_flags_batch, strip_markup_batch)


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


# ---------------------------------------------------------------------------
# gopher flags
# ---------------------------------------------------------------------------

def test_gopher_flags_hand_computed():
    b = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "the cat sat on the mat",       # 6 words, 17 chars
            "",                              # empty
            "a a a a",                       # 4 words of len 1
        ]),
    })
    t = gopher_flags_batch(b, min_words=2, min_stop_hits=1)
    d = t.to_pydict()
    assert d["n_words"] == [6, 0, 4]
    # doc0: total_len = 3+3+3+2+3+3 = 17 -> 17*1e4//6 = 28333
    assert d["mean_wlen_e4"] == [28333, 0, 10000]
    assert d["alpha_frac_e4"] == [10000, 0, 10000]
    # stopwords: the, on, the -> 3; 'a' x4 -> 4
    assert d["stop_hits"] == [3, 0, 4]
    assert d["pass_wordcount"] == [True, False, True]
    # mean wlen bounds default [3.0, 10.0] scaled
    assert d["pass_meanlen"] == [False, False, False]
    assert d["keep"] == [False, False, False]


def test_gopher_flags_keep_path():
    text = " ".join(["hello"] * 40 + ["the", "of"])
    t = gopher_flags_batch(pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "text": pa.array([text]),
    }), min_words=10)
    d = t.to_pydict()
    assert d["keep"] == [True]
    assert d["n_words"] == [42]


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def _brute_chunks(texts, size, stride):
    out = []
    for i, s in enumerate(texts):
        if not s:
            continue
        k = 1 + max(0, -(-max(len(s) - size, 0) // stride))
        for c in range(k):
            out.append((i, c, s[c * stride: c * stride + size]))
    return out


@pytest.mark.parametrize("size,stride", [(120, 90), (10, 10), (8, 3)])
def test_chunk_text_matches_brute(size, stride):
    rng = np.random.default_rng(3)
    texts = ["".join(chr(97 + int(c)) for c in
                     rng.integers(0, 26, int(n)))
             for n in rng.integers(0, 300, 50)]
    texts[7] = ""
    b = pa.table({"doc_id": pa.array(np.arange(50, dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())})
    t = chunk_text_batch(b, size=size, stride=stride)
    got = list(zip(t.column("doc_id").to_pylist(),
                   t.column("chunk_idx").to_pylist(),
                   t.column("chunk_text").to_pylist()))
    assert got == _brute_chunks(texts, size, stride)
    assert t.column("chunk_len").to_pylist() == \
        [len(x) for _, _, x in got]


def test_chunk_text_unicode_fallback_matches_brute():
    texts = ["héllo wörld " * 12, "æøå" * 40, ""]
    b = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    t = chunk_text_batch(b, size=20, stride=15)
    got = list(zip(t.column("doc_id").to_pylist(),
                   t.column("chunk_idx").to_pylist(),
                   t.column("chunk_text").to_pylist()))
    assert got == _brute_chunks(texts, 20, 15)


# ---------------------------------------------------------------------------
# markup strip
# ---------------------------------------------------------------------------

def test_strip_markup():
    b = pa.table({"text": pa.array([
        '<div id="3"><span>hdr</span> hello  world <em>ftr</em></div>',
        "no tags at all",
        "a &lt;b&gt; c &amp; d &quot;e&quot; &#39;f&#39;",
        "",
    ])})
    t = strip_markup_batch(b)
    assert t.column("clean_text").to_pylist() == [
        "hdr hello world ftr",
        "no tags at all",
        'a <b> c & d "e" \'f\'',
        "",
    ]


# ---------------------------------------------------------------------------
# winsorized mean (needs Ray)
# ---------------------------------------------------------------------------

def _brute_winsorize(keys, vals, lo_q, hi_q):
    out = {}
    for k in sorted(set(keys)):
        v = np.sort(np.asarray(
            [x for kk, x in zip(keys, vals) if kk == k], dtype=np.int64))
        n = len(v)
        lo = v[max(int(np.ceil(lo_q * n)), 1) - 1]
        hi = v[max(int(np.ceil(hi_q * n)), 1) - 1]
        c = np.clip(v, lo, hi)
        out[k] = (n, int(lo), int(hi), int(c.sum()),
                  int(c.sum()) * 10_000 // n)
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_winsorize_mean_by(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import (
        winsorize_mean_by)

    rng = np.random.default_rng(5)
    keys = [f"k{int(i)}" for i in rng.integers(0, 4, 300)]
    vals = rng.integers(-500, 5000, 300).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    res = winsorize_mean_by(_ds(tbl, blocks), "k", "v",
                            lo_q=0.05, hi_q=0.95).to_pandas()
    res = res.sort_values("k").reset_index(drop=True)
    brute = _brute_winsorize(keys, vals, 0.05, 0.95)
    assert list(res["k"]) == sorted(brute)
    for _, row in res.iterrows():
        n, lo, hi, s, m = brute[row["k"]]
        assert (row["n"], row["lo"], row["hi"], row["winsorized_sum"],
                row["winsorized_mean_e4"]) == (n, lo, hi, s, m)


# ---------------------------------------------------------------------------
# shard manifest (needs Ray)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("blocks,bucket", [(1, 1024), (6, 16), (3, 7)])
def test_shard_manifest(ray_session, blocks, bucket):
    from apache_datasketches_go_ray.stages.mixing import shard_manifest

    rng = np.random.default_rng(9)
    # non-dense, shuffled ids
    ids = rng.permutation(np.arange(0, 600, 3, dtype=np.int64))[:150]
    sizes = rng.integers(1, 900, len(ids)).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(sizes)})
    res = shard_manifest(_ds(tbl, blocks), "doc_id", "n_chars",
                         budget=2_000, bucket_size=bucket).to_pandas()
    res = res.sort_values("doc_id").reset_index(drop=True)
    order = np.argsort(ids)
    cum = np.cumsum(sizes[order])
    assert list(res["doc_id"]) == list(ids[order])
    assert list(res["cum_size"]) == list(cum)
    assert list(res["shard_id"]) == list((cum - sizes[order]) // 2_000)


# ---------------------------------------------------------------------------
# merge upsert (needs Ray)
# ---------------------------------------------------------------------------

def _merge_tables():
    base = pa.table({
        "k": pa.array(np.arange(40, dtype=np.int64)),
        "val": pa.array(np.arange(40, dtype=np.int64) * 10),
        "tag": pa.array([f"b{i}" for i in range(40)]),
    })
    chg = pa.table({
        "k": pa.array([3, 5, 41, 42, 7], type=pa.int64()),
        "op": pa.array(["delete", "upsert", "upsert", "upsert",
                        "delete"]),
        "val": pa.array([0, 999, 410, 420, 0], type=pa.int64()),
        "tag": pa.array(["x", "c5", "c41", "c42", "x"]),
    })
    return base, chg


@pytest.mark.parametrize("blocks", [1, 4])
def test_merge_upsert(ray_session, blocks):
    from apache_datasketches_go_ray.stages.relational import merge_upsert

    base, chg = _merge_tables()
    res = merge_upsert(_ds(base, blocks), _ds(chg, max(1, blocks - 1)),
                       "k").to_pandas().sort_values("k") \
        .reset_index(drop=True)
    expect = {int(k): (int(v), t) for k, v, t in
              zip(base["k"].to_pylist(), base["val"].to_pylist(),
                  base["tag"].to_pylist())}
    del expect[3], expect[7]
    expect[5] = (999, "c5")
    expect[41] = (410, "c41")
    expect[42] = (420, "c42")
    assert list(res["k"]) == sorted(expect)
    for _, row in res.iterrows():
        assert (row["val"], row["tag"]) == expect[int(row["k"])]


def test_merge_upsert_rejects_duplicate_changes(ray_session):
    from apache_datasketches_go_ray.stages.relational import merge_upsert

    base, _ = _merge_tables()
    dup = pa.table({
        "k": pa.array([5, 5], type=pa.int64()),
        "op": pa.array(["upsert", "delete"]),
        "val": pa.array([1, 2], type=pa.int64()),
        "tag": pa.array(["a", "b"]),
    })
    with pytest.raises(Exception, match="multiple change rows"):
        merge_upsert(_ds(base, 2), _ds(dup, 1), "k").materialize()
