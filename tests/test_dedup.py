"""Dedup skew behavior: hot LSH/SimHash buckets switch to
representative pairing (n-1 edges) instead of n^2/2 — the 100 TB
boilerplate-text guard. 300 identical docs blow past MAX_BUCKET=256 in
every band on both algorithms."""

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.operators.dedup import (
    minhash_lsh_pairs, simhash_pairs,
)


@pytest.fixture(scope="module")
def hot_docs(spark):
    text = "the same boilerplate sentence repeated in every document body"
    rows = [(i, text) for i in range(300)]
    # plus two near-identical outliers that must still pair normally:
    # one changed word in a 200-word text flips only ~3 of ~198
    # shingles, keeping the SimHash Hamming distance tiny
    words = [f"token{i % 37}word{i % 11}" for i in range(200)]
    rows.append((1000, " ".join(words)))
    words[100] = "changedword"
    rows.append((1001, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _edges(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def _clusters(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return [g for g in groups.values() if len(g) >= 2]


def test_minhash_hot_bucket_representative_pairing(spark, hot_docs):
    out = minhash_lsh_pairs(hot_docs)
    edges = _edges(out)
    # representative pairing: every member pairs with the bucket min —
    # 299 edges, not 300*299/2
    hot_edges = {(a, b) for a, b in edges if a < 1000 and b < 1000}
    assert hot_edges == {(0, i) for i in range(1, 300)}
    # connected components still recover the one duplicate cluster
    clusters = _clusters(hot_edges, set(range(300)))
    assert clusters == [set(range(300))]


def test_simhash_hot_bucket_representative_pairing(spark, hot_docs):
    out = simhash_pairs(hot_docs)
    edges = _edges(out)
    hot_edges = {(a, b) for a, b in edges if a < 1000 and b < 1000}
    assert hot_edges == {(0, i) for i in range(1, 300)}
    assert _clusters(hot_edges, set(range(300))) == [set(range(300))]
    # the near-identical outlier pair is found with a small distance
    tail = {(a, b): h for a, b, h in
            ((r["doc_a"], r["doc_b"], r["hamming"]) for r in out.collect())
            if a >= 1000}
    assert (1000, 1001) in tail
    assert tail[(1000, 1001)] <= 3
