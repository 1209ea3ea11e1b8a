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
            "mean_gap_s": np.floor(float(gaps.mean()) * 1000.0 + 0.5)
            / 1000.0 if len(gaps) else 0.0,
        })
    import pandas as pd

    exp = pd.DataFrame(rows)
    assert len(out) == len(exp)
    assert (out["conv_id"] == exp["conv_id"]).all()
    assert (out["n_turns"].to_numpy() == exp["n_turns"].to_numpy()).all()
    assert (out["n_long_gaps"].to_numpy()
            == exp["n_long_gaps"].to_numpy()).all()
    assert np.allclose(out["mean_gap_s"], exp["mean_gap_s"], atol=1e-9)


def test_role_stats_matches_pandas(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["transcript_role_stats"](
        "/root/testdata/sf0.001").to_pandas() \
        .sort_values("conv_id", ignore_index=True)

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    df = ray.data.read_parquet(tdir).to_pandas()
    exp = df.assign(
        n_user=(df["role"] == "user").astype(int),
        n_assistant=(df["role"] == "assistant").astype(int),
        n_tool=(df["role"] == "tool").astype(int),
        n_tool_calls=(df["tool"] != "").astype(int),
        n_chars=df["text"].str.len(),
    ).groupby("conv_id", sort=True, as_index=False)[
        ["n_user", "n_assistant", "n_tool", "n_tool_calls", "n_chars"]
    ].sum()
    assert len(out) == len(exp)
    assert (out["conv_id"] == exp["conv_id"]).all()
    for c in ("n_user", "n_assistant", "n_tool", "n_tool_calls",
              "n_chars"):
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_boilerplate_turns_matches_pandas(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["boilerplate_turns"](
        "/root/testdata/sf0.001").to_pandas()

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    df = ray.data.read_parquet(tdir).to_pandas()
    exp = (df.drop_duplicates(["text", "conv_id"])
           .groupby("text", as_index=False).size()
           .rename(columns={"size": "n_convs"}))
    exp = exp[exp["n_convs"] >= 2].sort_values(
        ["n_convs", "text"], ascending=[False, True],
        ignore_index=True).head(20)
    # exact top-20 under the (n_convs DESC, text ASC) total order —
    # the SQL-oracle-reproducible cut
    assert out["text"].tolist() == exp["text"].tolist()
    assert out["n_convs"].tolist() == exp["n_convs"].tolist()


def test_reply_latency_matches_pandas(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["transcript_reply_latency"](
        "/root/testdata/sf0.001").to_pandas() \
        .sort_values("conv_id", ignore_index=True)

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    df = ray.data.read_parquet(tdir).to_pandas() \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    df["ts_us"] = df["ts"].astype("int64")
    rows = []
    for cid, g in df.groupby("conv_id", sort=True):
        r = g["role"].to_numpy()
        t = g["ts_us"].to_numpy()
        adj = (r[:-1] == "user") & (r[1:] == "assistant")
        lat = (t[1:] - t[:-1])[adj] / 1e6
        rows.append({
            "conv_id": cid,
            "n_replies": int(adj.sum()),
            "mean_reply_s": np.floor(float(lat.mean()) * 1000.0 + 0.5)
            / 1000.0 if len(lat) else 0.0,
            "max_reply_s": np.floor(float(lat.max()) * 1000.0 + 0.5)
            / 1000.0 if len(lat) else 0.0,
        })
    import pandas as pd

    exp = pd.DataFrame(rows)
    assert len(out) == len(exp)
    assert (out["conv_id"] == exp["conv_id"]).all()
    assert (out["n_replies"].to_numpy()
            == exp["n_replies"].to_numpy()).all()
    assert np.allclose(out["mean_reply_s"], exp["mean_reply_s"],
                       atol=1e-9)
    assert np.allclose(out["max_reply_s"], exp["max_reply_s"], atol=1e-9)


def test_fuzzy_boilerplate_matches_pandas(ray_session):
    sys.path.insert(0, "/root/repo")
    import pyarrow as pa

    import __ray_entry__ as entrymod
    from apache_datasketches_go_ray.stages.textops import simhash_batch

    out = entrymod.queries()["fuzzy_boilerplate_turns"](
        "/root/testdata/sf0.001").to_pandas()

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    df = ray.data.read_parquet(tdir).to_pandas()
    sh = simhash_batch(pa.table({
        "conv_id": pa.array(df["conv_id"]),
        "text": pa.array(df["text"].astype(str)),
    })).to_pandas()
    grp = sh.groupby("simhash")["conv_id"].nunique()
    grp = grp[grp >= 2].sort_values(ascending=False)
    exp = sorted(zip(-grp.to_numpy(), grp.index.to_numpy()))[:20]
    got = sorted(zip(-out["n_convs"].to_numpy(),
                     out["simhash"].to_numpy()))
    assert got == [(int(a), int(b)) for a, b in exp]


def test_tool_usage_matches_pandas(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["transcript_tool_usage"](
        "/root/testdata/sf0.001").to_pandas() \
        .sort_values("tool", ignore_index=True)

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    df = ray.data.read_parquet(tdir).to_pandas()
    df = df[df["tool"] != ""]
    rows = []
    for tool, g in df.groupby("tool", sort=True):
        lens = g["text"].str.len()
        rows.append({
            "tool": tool,
            "n_calls": len(g),
            "n_convs": g["conv_id"].nunique(),
            "mean_call_len": np.floor(float(lens.mean()) * 1000.0 + 0.5)
            / 1000.0,
        })
    import pandas as pd

    exp = pd.DataFrame(rows)
    assert len(out) == len(exp) and len(out) > 0
    assert (out["tool"] == exp["tool"]).all()
    assert (out["n_calls"].to_numpy() == exp["n_calls"].to_numpy()).all()
    assert (out["n_convs"].to_numpy() == exp["n_convs"].to_numpy()).all()
    assert np.allclose(out["mean_call_len"], exp["mean_call_len"],
                       atol=1e-9)
