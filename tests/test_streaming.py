"""Structured Streaming: incremental document conversion with
checkpoint/resume, and watermarked event windows."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.streaming.stream import (
    stream_street_network, stream_event_windows,
)


@pytest.fixture()
def tmpdirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def test_stream_street_network_incremental(spark, fixture_dir, tmpdirs):
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    first = docs.limit(6)
    first.write.mode("overwrite").parquet(f"{tmpdirs['in']}/batch1")

    q = stream_street_network(spark, f"{tmpdirs['in']}/*", tmpdirs["out"],
                              tmpdirs["ckpt"])
    q.awaitTermination(300)
    out1 = spark.read.parquet(tmpdirs["out"])
    docs1 = {r.doc_id for r in out1.select("doc_id").distinct().collect()}
    assert len(docs1) == 6

    # new files arrive → restart from checkpoint processes ONLY the delta
    docs.write.mode("overwrite").parquet(f"{tmpdirs['in']}/batch2")
    q = stream_street_network(spark, f"{tmpdirs['in']}/*", tmpdirs["out"],
                              tmpdirs["ckpt"])
    q.awaitTermination(300)
    out2 = spark.read.parquet(tmpdirs["out"])
    docs2 = {r.doc_id for r in out2.select("doc_id").distinct().collect()}
    assert docs2 > docs1  # delta processed, prior output retained


def test_stream_event_windows(spark, tmpdirs):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.mode("overwrite").parquet(f"{tmpdirs['in']}/ev")
    q = stream_event_windows(spark, f"{tmpdirs['in']}/ev", tmpdirs["ckpt"])
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) as n from event_windows").collect()
    # append mode emits only watermark-closed windows; at least the bulk
    # of the historical hours must be present
    batch = src.count()
    assert got[0].n is None or got[0].n <= batch
    windows = spark.sql(
        "select count(*) as n from event_windows").collect()[0].n
    assert windows > 0
