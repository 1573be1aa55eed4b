"""G5 end-to-end: blocks of the grid fixture through the Spark wiring."""

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.plans.pipeline import load_documents, build_street_network
from osm2streets_spark.operators.blocks_op import extract_blocks


def test_grid_blocks(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    grid = docs.where(F.col("doc_id").startswith("grid_3x3"))
    net = build_street_network(spark, grid)
    roads = net["roads"].withColumn("length_m", F.col("trimmed_length"))
    blocks = extract_blocks(roads).collect()
    # 3x3 grid → 4 interior city blocks, each bounded by 4 roads
    assert len(blocks) == 4
    for b in blocks:
        assert b.n_roads == 4
        assert b.kind == "LandUse"  # H* and V* names differ
        assert 5500 < b.area_m2 < 7500  # ~80m grid spacing, jittered
