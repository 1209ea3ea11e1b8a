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
