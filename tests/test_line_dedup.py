"""C4-style corpus-level unit (line / turn) dedup with document rewrite.

Checked against a brute-force single-process oracle on a synthetic
corpus with planted cross-document duplicate units, at two partition
counts (the output must be partition-independent).
"""

import numpy as np
import pyarrow as pa
import pytest

from apache_datasketches_go_ray.stages.dedup_extras import line_dedup_rewrite


def _turns_table():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    shared = ["dup alpha", "dup beta", "dup gamma"]
    for c in range(40):
        n = int(rng.integers(1, 8))
        for t in range(n):
            if rng.random() < 0.3:
                txt = shared[int(rng.integers(0, len(shared)))]
            else:
                k = int(rng.integers(1, 6))
                txt = " ".join(vocab[int(j)]
                               for j in rng.integers(0, len(vocab), k))
            rows.append((f"conv-{c:03d}", t, txt))
    # one conversation made entirely of duplicates of earlier units
    rows.append(("conv-zzz", 0, shared[0]))
    rows.append(("conv-zzz", 1, shared[1]))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], type=pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
    })


def _brute(tbl):
    rows = sorted(zip(tbl.column("conv_id").to_pylist(),
                      tbl.column("turn_idx").to_pylist(),
                      tbl.column("text").to_pylist()))
    seen = set()
    kept, dropped, texts = {}, {}, {}
    for c, _t, x in rows:
        kept.setdefault(c, 0)
        dropped.setdefault(c, 0)
        texts.setdefault(c, [])
    for c, _t, x in rows:  # corpus order == (conv_id, turn_idx) order
        if x in seen:
            dropped[c] += 1
        else:
            seen.add(x)
            kept[c] += 1
            texts[c].append(x)
    return {c: (kept[c], dropped[c], "\n".join(texts[c])) for c in kept}


@pytest.mark.parametrize("parts", [3, 9])
def test_line_dedup_rewrite_matches_brute(ray_session, parts):
    import ray.data

    tbl = _turns_table()
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = line_dedup_rewrite(ds, num_partitions=parts).to_pandas()
    exp = _brute(tbl)
    assert len(out) == len(exp)
    got = {r.conv_id: (r.n_kept, r.n_dropped, r.text)
           for r in out.itertuples()}
    assert got == exp
    # the all-duplicate conversation survives as a row with empty text
    assert got["conv-zzz"] == (0, 2, "")
