"""Driver-style correctness harness: run every queries() entry at
sf0.01 and compare against its oracle_sql() twin via DuckDB —
row-count, sorted-column schema, and order-insensitive value equality
(mirrors the driver's CORRECTNESS gate so mismatches surface here
first)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract

SF_DIR = "/root/testdata/sf0.01"

_QUERIES = contract.queries()
_ORACLES = contract.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")
    return con


def _normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("nan")
                else:
                    norm.append(round(v, 6))
            elif isinstance(v, bool):
                norm.append(int(v))
            else:
                norm.append(v)
        out.append(tuple(norm))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_query_matches_oracle(spark, name, duck):
    q = _QUERIES[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    got = _normalize([tuple(r[c] for c in cols) for r in sdf.collect()])
    odf = duck.execute(_ORACLES[name]).fetch_arrow_table()
    ocols = sorted(odf.column_names)
    assert cols == ocols, f"{name}: column mismatch {cols} vs {ocols}"
    want = _normalize(
        [tuple(row[c] for c in ocols) for row in odf.to_pylist()])
    assert len(got) == len(want), \
        f"{name}: row count {len(got)} vs oracle {len(want)}"
    assert got == want, f"{name}: value mismatch (first diff: " \
        f"{next(((a, b) for a, b in zip(got, want) if a != b), None)})"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = contract.entry(spark)
    assert df.count() > 0
