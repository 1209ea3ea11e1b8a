"""transcript_turn_gaps query vs a pandas ground-truth computation on
the same deterministic synthetic transcripts."""

import sys

import numpy as np
import ray.data


def test_turn_gaps_matches_pandas(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["transcript_turn_gaps"](
        "/root/testdata/sf0.001").to_pandas() \
        .sort_values("conv_id", ignore_index=True)

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    df = ray.data.read_parquet(tdir).to_pandas() \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    df["ts_us"] = df["ts"].astype("int64")
    rows = []
    for cid, g in df.groupby("conv_id", sort=True):
        gaps = np.diff(g["ts_us"].to_numpy()) / 1e6
        rows.append({
            "conv_id": cid,
            "n_turns": len(g),
            "n_long_gaps": int((gaps > 300).sum()),
            "mean_gap_s": round(float(gaps.mean()), 3) if len(gaps) else 0.0,
        })
    import pandas as pd

    exp = pd.DataFrame(rows)
    assert len(out) == len(exp)
    assert (out["conv_id"] == exp["conv_id"]).all()
    assert (out["n_turns"].to_numpy() == exp["n_turns"].to_numpy()).all()
    assert (out["n_long_gaps"].to_numpy()
            == exp["n_long_gaps"].to_numpy()).all()
    assert np.allclose(out["mean_gap_s"], exp["mean_gap_s"], atol=1e-9)
