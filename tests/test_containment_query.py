"""Standalone containment-dedup query: every planted 60%-prefix copy
must be recovered as a dup pair with its source."""

import sys


def test_containment_query_recovers_planted(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = entrymod.queries()["containment_dups"](
        "/root/testdata/sf0.001").to_pandas()
    pairs = {(r["a"], r["b"]) for _, r in out.iterrows()} | \
            {(r["b"], r["a"]) for _, r in out.iterrows()}
    import pyarrow.parquet as pq

    ids = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()
    missing = [i for i in range(25)
               if (str(ids[i]), str(ids[i] + 3_000_000)) not in pairs]
    assert not missing, f"unrecovered containment plants: {missing}"
    # the 45%-prefix tier resolves via the suffix-array substring pass
    # (Jaccard < tau there), so 'containment' must actually fire
    assert (out["method"] == "containment").sum() >= 10


def test_containment_chunked_resolve_matches_unchunked(ray_session):
    """Phase-2 chunking (containment_chunk_pairs) produces the identical
    verification table: force multiple chunks with a tiny cap and
    compare against the single-broadcast path on the same pairs."""
    import sys

    sys.path.insert(0, "/root/repo")
    import ray.data

    import __ray_entry__ as entrymod
    from apache_datasketches_go_ray.config import DedupConfig
    from apache_datasketches_go_ray.stages.assemble import assemble
    from apache_datasketches_go_ray.stages.lsh import candidate_pairs
    from apache_datasketches_go_ray.stages.signature import sign
    from apache_datasketches_go_ray.stages.verify import verify_pairs

    tdir = entrymod._transcripts_dir("/root/testdata/sf0.001")
    ds = ray.data.read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])
    cfg = DedupConfig(num_partitions=8)
    assembled = assemble(ds, 8).materialize()
    sigs = sign(assembled, cfg, keep_text=False).materialize()
    pairs = candidate_pairs(sigs, cfg, dedup=False).materialize()

    def canon(v):
        return v.to_pandas().sort_values(["a", "b"], ignore_index=True)

    base = canon(verify_pairs(pairs, sigs, cfg, dedup_pairs=True,
                              texts_ds=assembled))
    chunked = canon(verify_pairs(pairs, sigs, cfg, dedup_pairs=True,
                                 texts_ds=assembled,
                                 containment_chunk_pairs=3))
    assert base.equals(chunked)
