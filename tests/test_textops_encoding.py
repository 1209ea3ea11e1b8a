"""Encoding-QA scan + LSH banding planner."""

import numpy as np
import pyarrow as pa

from apache_datasketches_go_ray.stages.lsh import plan_lsh
from apache_datasketches_go_ray.stages.textops import encoding_qa_batch


def test_encoding_qa_counts():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "clean ascii text",
            "damage � here � and \x01 ctrl",
            "mojibake Ã© artifact â€” twice Â rated",
            "tabs\tand\nnewlines are fine",
        ]),
    })
    out = encoding_qa_batch(t)
    assert out.column("n_replacement").to_pylist() == [0, 2, 0, 0]
    assert out.column("n_ctrl").to_pylist() == [0, 1, 0, 0]
    assert out.column("n_mojibake").to_pylist()[2] >= 3
    assert out.column("is_ascii").to_pylist() == [True, False, False, True]


def test_plan_lsh_balanced_and_recall_weighted():
    bal = plan_lsh(0.5, 128)
    assert (bal["num_bands"], bal["rows_per_band"]) == (25, 5)
    assert abs(bal["threshold_50"] - 0.525306) < 1e-6
    # the flagship's recall-weighted configuration appears at high
    # fn_weight: 42 bands x 3 rows, curve midpoint ~0.29
    rec = plan_lsh(0.5, 128, fn_weight=24.0)
    assert (rec["num_bands"], rec["rows_per_band"]) == (42, 3)
    assert rec["fn_area"] < bal["fn_area"]
    assert rec["fp_area"] > bal["fp_area"]
    # tighter threshold needs longer rows
    hi = plan_lsh(0.8, 128)
    assert hi["rows_per_band"] > bal["rows_per_band"]
    assert hi["num_bands"] * hi["rows_per_band"] <= 128
