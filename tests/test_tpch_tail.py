"""Round-4 TPC-H tail (Q2/Q21 shapes) vs brute single-process oracles on
synthetic skewed inputs, across partitionings (each query also carries a
DuckDB SQL gate in oracle_sql, checked at sf0.001/sf0.01 by
tools/check_oracle.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_tables(tmp, rng, n_orders=180, n_supp=9, n_parts=40,
                  shards=3):
    """A tiny driver-schema corner: lineitem + supplier + part, with
    deliberate shipdate ties so the Q21 'unique last shipper' predicate
    is actually exercised."""
    n = n_orders * 4
    ok = rng.integers(0, n_orders, n).astype(np.int64)
    sk = rng.integers(1, n_supp + 1, n).astype(np.int64)
    pk = rng.integers(1, n_parts + 1, n).astype(np.int64)
    base = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    # coarse day grid => plenty of exact max-shipdate ties
    ts = base + rng.integers(0, 30, n).astype(np.int64) * 86_400_000_000
    qty = rng.integers(1, 50, n).astype(np.float64)
    price = rng.integers(100, 9999, n).astype(np.float64) / 100.0
    line = pa.table({
        "l_orderkey": pa.array(ok),
        "l_partkey": pa.array(pk),
        "l_suppkey": pa.array(sk),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.zeros(n)),
        "l_shipdate": pa.array(ts).cast(pa.timestamp("us")),
    })
    # shard the fact table so block boundaries split orders
    per = (n + shards - 1) // shards
    os.makedirs(os.path.join(tmp, "lineitem.parquet"), exist_ok=True)
    for i in range(shards):
        pq.write_table(line.slice(i * per, per),
                       os.path.join(tmp, "lineitem.parquet",
                                    f"part-{i}.parquet"))
    supp = pa.table({
        "s_suppkey": pa.array(np.arange(1, n_supp + 1, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, n_supp + 1)]),
        "s_acctbal": pa.array(rng.integers(-5000, 10000, n_supp)
                              .astype(np.float64) / 100.0),
    })
    pq.write_table(supp, os.path.join(tmp, "supplier.parquet"))
    part = pa.table({
        "p_partkey": pa.array(np.arange(1, n_parts + 1, dtype=np.int64)),
        "p_name": pa.array([f"part {i}" for i in range(1, n_parts + 1)]),
        "p_size": pa.array(rng.integers(1, 51, n_parts).astype(np.int64)),
    })
    pq.write_table(part, os.path.join(tmp, "part.parquet"))
    return line.to_pandas(), supp.to_pandas(), part.to_pandas()


def _brute_late_sole(line: pd.DataFrame, supp: pd.DataFrame):
    rows = {}
    for okey, g in line.groupby("l_orderkey"):
        if g["l_suppkey"].nunique() < 2:
            continue
        mx = g["l_shipdate"].max()
        at = g.loc[g["l_shipdate"] == mx, "l_suppkey"].unique()
        if len(at) == 1:
            rows[int(at[0])] = rows.get(int(at[0]), 0) + 1
    names = dict(zip(supp["s_suppkey"], supp["s_name"]))
    return sorted((k, names[k], v) for k, v in rows.items())


def _brute_min_cost(line, supp, part):
    p = part[part["p_size"] >= 45]
    pairs = line[line["l_partkey"].isin(p["p_partkey"])][
        ["l_partkey", "l_suppkey"]].drop_duplicates()
    j = pairs.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    j["acctbal_cents"] = np.floor(j["s_acctbal"] * 100 + 0.5).astype(
        np.int64)
    j = j.sort_values(["l_partkey", "acctbal_cents", "s_suppkey"])
    top = j.groupby("l_partkey").first().reset_index()
    names = dict(zip(part["p_partkey"], part["p_name"]))
    return sorted(
        (int(r.l_partkey), names[int(r.l_partkey)], int(r.s_suppkey),
         r.s_name, int(r.acctbal_cents)) for r in top.itertuples())


@pytest.mark.parametrize("seed", [3, 11])
def test_late_sole_suppliers_matches_brute(ray_session, tmp_path, seed):
    import __ray_entry__ as entry

    rng = np.random.default_rng(seed)
    line, supp, part = _write_tables(str(tmp_path), rng)
    got = entry._q_late_sole_suppliers(str(tmp_path)).to_pandas()
    got_rows = sorted((int(r.s_suppkey), r.s_name, int(r.numwait))
                      for r in got.itertuples())
    assert got_rows == _brute_late_sole(line, supp)


def test_part_min_cost_supplier_matches_brute(ray_session, tmp_path):
    import __ray_entry__ as entry

    rng = np.random.default_rng(5)
    line, supp, part = _write_tables(str(tmp_path), rng)
    got = entry._q_part_min_cost_supplier(str(tmp_path)).to_pandas()
    got_rows = sorted(
        (int(r.p_partkey), r.p_name, int(r.s_suppkey), r.s_name,
         int(r.acctbal_cents)) for r in got.itertuples())
    assert got_rows == _brute_min_cost(line, supp, part)
