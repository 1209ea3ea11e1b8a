"""Job-entry CLI (`python -m apache_datasketches_go_ray`) smoke: dedup
over a JSONL corpus and curate over Parquet, in-process via main()."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from apache_datasketches_go_ray.__main__ import main
from apache_datasketches_go_ray.sources.readers import (
    write_transcripts_jsonl,
)
from apache_datasketches_go_ray.sources.transcripts import (
    conversations_to_table, generate_conversations, inject_duplicates,
)


def test_cli_dedup_jsonl(ray_session, tmp_path, capsys):
    convs = generate_conversations(40, seed=5)
    convs, _groups = inject_duplicates(convs, seed=6)
    tbl = conversations_to_table(convs)
    src = str(tmp_path / "in.jsonl")
    write_transcripts_jsonl(tbl, src)
    out = str(tmp_path / "clusters")
    rc = main(["dedup", "--input", src, "--format", "jsonl",
               "--output", out, "--partitions", "4",
               "--checkpoint", str(tmp_path / "ck")])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["clusters"] > 0
    clusters = pq.read_table(out)
    assert set(clusters.column_names) == {"conv_id", "cluster_id"}
    assert len(clusters) == rep["clusters"]


def test_cli_curate_parquet(ray_session, tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(31)
    words = ("the quick brown fox jumps over a lazy dog and then runs "
             "back to this forest with some other animals that live "
             "there in big warm dens near an old river bank").split()
    texts = [" ".join(rng.choice(words, size=60)) for _ in range(20)]
    docs = pa.table({
        "doc_id": pa.array(list(range(20)) + [100], type=pa.int64()),
        "text": pa.array(texts + [texts[0]], type=pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    out = str(tmp_path / "curated")
    rc = main(["curate", "--input", src, "--output", out,
               "--partitions", "4", "--min-quality", "0.2"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_in"] == 21
    assert rep["rows_out"] == 20      # the exact dup dropped
    assert len(pq.read_table(out)) == 20


def test_cli_delete(ray_session, tmp_path, capsys):
    convs = generate_conversations(40, seed=7)
    convs, _groups = inject_duplicates(convs, seed=8)
    tbl = conversations_to_table(convs)
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    ck = str(tmp_path / "ck")
    rc = main(["dedup", "--input", src, "--output",
               str(tmp_path / "clusters0"), "--partitions", "4",
               "--checkpoint", ck])
    assert rc == 0
    rep0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep0["clusters"] > 0
    clusters0 = pq.read_table(str(tmp_path / "clusters0"))
    victim = clusters0.column("conv_id")[0].as_py()

    ids_file = str(tmp_path / "ids.txt")
    with open(ids_file, "w") as f:
        f.write(victim + "\n")
    out = str(tmp_path / "clusters1")
    rc = main(["delete", "--against", ck, "--ids-file", ids_file,
               "--output", out, "--partitions", "4",
               "--checkpoint", str(tmp_path / "ck_del")])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["removed"] == 1
    after = pq.read_table(out)
    assert victim not in set(after.column("conv_id").to_pylist())
    assert os.path.isdir(str(tmp_path / "ck_del" / "verified"))


def test_cli_probe_layout(ray_session, tmp_path, capsys):
    from apache_datasketches_go_ray.sources.transcripts import (
        write_transcripts,
    )

    base = str(tmp_path / "t")
    write_transcripts(base, 40, seed=5, shards=2)  # rows shuffled
    rc = main(["probe-layout", "--input",
               os.path.join(base, "transcripts")])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["layout"] == "shuffled"

    # sort-at-rest and re-probe
    tbl = pq.read_table(os.path.join(base, "transcripts"))
    idx = tbl.to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable").index.to_numpy()
    sdir = tmp_path / "sorted"
    sdir.mkdir()
    pq.write_table(tbl.take(pa.array(idx)),
                   str(sdir / "part-0.parquet"))
    rc = main(["probe-layout", "--input", str(sdir)])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["layout"] == "conv_grouped"


def test_cli_sketch_column_build_and_update(ray_session, tmp_path,
                                            capsys):
    import numpy as np

    from apache_datasketches_go_ray.state.serde_compat import read_hll

    rng = np.random.default_rng(9)

    def write(path, n, seed):
        r = np.random.default_rng(seed)
        pq.write_table(pa.table({
            "src": pa.array([f"s{int(x)}" for x in r.integers(0, 3, n)]),
            "val": pa.array(r.integers(0, 40, n).astype("int64")),
        }), path)

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    write(a, 500, 1)
    write(b, 300, 2)
    col_a = str(tmp_path / "colA")
    rc = main(["sketch-column", "--input", a, "--key", "src",
               "--column", "val", "--family", "hll", "--output", col_a])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["groups"] == 3

    col_ab = str(tmp_path / "colAB")
    rc = main(["sketch-column", "--input", b, "--key", "src",
               "--column", "val", "--family", "hll",
               "--update", col_a, "--output", col_ab])
    assert rc == 0
    # blobs parse as reference wire format and cover all 3 groups
    blobs = pq.read_table(col_ab)
    assert blobs.num_rows == 3
    for buf in blobs.column("sketch").to_pylist():
        read_hll(buf)
