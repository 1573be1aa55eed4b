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
    """Type-STRICT normalization: floats and ints canonicalize to
    distinct tokens ('f:0.0' vs 'i:0'), mirroring the driver's
    value-hash, which distinguishes 0.0 from 0 (round-1
    sn_feature_snap lesson: a DuckDB HUGEINT column reaching pandas as
    float64 must fail here, not only in CORRECTNESS_r{N}.json)."""
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, bool):
                norm.append(f"i:{int(v)}")
            elif isinstance(v, float):
                norm.append("nan" if math.isnan(v) else f"f:{round(v, 6)}")
            elif isinstance(v, int):
                norm.append(f"i:{v}")
            else:
                norm.append(v)
        out.append(tuple(norm))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_query_matches_oracle(spark, name, duck):
    q = _QUERIES[name]
    # both sides through pandas (like the driver): dtype coercions
    # (e.g. int64+nulls -> float64) must apply identically to both
    spdf = q(spark, SF_DIR).toPandas()
    cols = sorted(spdf.columns)
    got = _normalize([tuple(row[c] for c in cols)
                      for row in spdf.to_dict(orient="records")])
    # .df() (pandas), not fetch_arrow_table(): the driver goes through
    # pandas, where DuckDB HUGEINT becomes float64 — the Arrow path
    # yields Python ints and masks exactly that class of mismatch.
    odf = duck.execute(_ORACLES[name]).df()
    ocols = sorted(odf.columns)
    assert cols == ocols, f"{name}: column mismatch {cols} vs {ocols}"
    want = _normalize(
        [tuple(row[c] for c in ocols)
         for row in odf.to_dict(orient="records")])
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
