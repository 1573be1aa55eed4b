"""Bounded-memory group streaming (stream_groups): per-task pandas
footprint is one Arrow batch + one carried group, not the partition.
Forcing tiny Arrow batches must not change any result."""

import pandas as pd
import pytest

from osm2streets_spark.operators.geometry_update import stream_groups


def test_stream_groups_complete_and_bounded():
    # 10 groups of 7 rows, key-sorted, delivered in 6-row batches —
    # every batch boundary splits a group
    rows = [{"k": g, "v": i} for g in range(10) for i in range(7)]
    pdf = pd.DataFrame(rows)
    batches = [pdf.iloc[i:i + 6] for i in range(0, len(pdf), 6)]

    seen_sizes = []
    seen_groups = []

    def process(chunk):
        seen_sizes.append(len(chunk))
        out = chunk.groupby("k")["v"].sum().reset_index()
        # every group handed to process must be COMPLETE
        counts = chunk.groupby("k").size()
        assert (counts == 7).all(), counts
        seen_groups.extend(counts.index.tolist())
        return out

    outs = list(stream_groups(iter(batches), ["k"], process))
    got = pd.concat(outs, ignore_index=True).sort_values("k")
    assert got["v"].tolist() == [21] * 10
    assert sorted(seen_groups) == list(range(10))
    # bounded: one batch (6) + one carried group (<=7) minus the held key
    assert max(seen_sizes) <= 6 + 7


def test_tiny_arrow_batches_identical_pipeline_output(spark, fixture_dir):
    """The flagship network must be byte-identical when Arrow batches
    are forced down to 64 records (maximum batch-boundary group
    splitting in run_t6 / run_transforms)."""
    from pyspark.sql import functions as F

    from osm2streets_spark.plans.pipeline import (
        load_documents, build_street_network,
    )

    def snapshot():
        docs = load_documents(spark, fixture_dir)
        net = build_street_network(spark, docs)
        roads = net["roads"].select(
            "doc_id", "way_id",
            F.array_join(F.transform("osm_way_ids",
                                     lambda x: x.cast("string")),
                         ",").alias("w"),
            F.round("trimmed_length", 2).alias("t")).collect()
        return sorted((r["doc_id"], r["way_id"], r["w"], r["t"])
                      for r in roads)

    spark.catalog.clearCache()
    base = snapshot()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        spark.catalog.clearCache()
        tiny = snapshot()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base == tiny


@pytest.mark.parametrize("qname", [
    "g_shortest_dists", "g_simple_paths", "s_multipolygons",
    "g_blocks", "sn_dc_side_lengths",
])
def test_tiny_batches_identical_per_doc_operators(spark, qname):
    """The per-doc graph operators (pathfinding, multipolygon assembly,
    block walk, DC sides) stream key-sorted groups instead of
    materializing the partition; forcing 64-record Arrow batches
    (maximum group splitting across batch boundaries) must not change
    a single row."""
    from osm2streets_spark.plans import registry

    q = registry.queries()[qname]
    sf = "/root/testdata/sf0.001"

    def snapshot():
        pdf = q(spark, sf).toPandas()
        pdf = pdf[sorted(pdf.columns)]
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    spark.catalog.clearCache()
    base = snapshot()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        spark.catalog.clearCache()
        tiny = snapshot()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pd.testing.assert_frame_equal(base, tiny)
