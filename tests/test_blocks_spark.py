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


def test_block_membership_pip(spark, fixture_dir):
    """J11: the grid's center intersection lies in no block (it's a
    corner of all four); features strictly inside a block are assigned
    via the cell-prefilter + PIP-refine join."""
    from osm2streets_spark.operators.blocks_op import (
        assign_features_to_blocks,
    )
    from osm2streets_spark.sources.osm_xml import doc_bounds

    docs = load_documents(spark, fixture_dir)
    grid = docs.where(F.col("doc_id").startswith("grid_3x3"))
    net = build_street_network(spark, grid)
    roads = net["roads"].withColumn("length_m", F.col("trimmed_length"))
    blocks = extract_blocks(roads)
    anchors = doc_bounds(net["nodes"])
    # synthetic probe features: one at a block center (inside), one far
    # outside any block
    doc = grid.select("doc_id").first().doc_id
    a = anchors.where(F.col("doc_id") == doc).first()
    probe = spark.createDataFrame(
        [(doc, "probe", 1, a.min_lon + 40 / 95000.0,
          a.min_lat + 40 / 111000.0),
         (doc, "probe", 2, a.min_lon - 0.01, a.min_lat - 0.01)],
        "doc_id string, feature_type string, feature_id long, "
        "c_lon double, c_lat double")
    from osm2streets_spark.operators.tiles import with_tile
    probe = with_tile(probe, "c_lon", "c_lat", 16)
    hits = assign_features_to_blocks(probe, blocks, anchors).collect()
    ids = {h.feature_id for h in hits}
    assert 1 in ids      # inside the SW block
    assert 2 not in ids  # outside everything


def test_simple_path_lane_type_restriction(spark):
    """G2 (pathfinding.rs:31-69): a footway-only path must differ from
    the driving path when the shortcut is a footway."""
    from osm2streets_spark.operators.pathfinding import simple_paths

    # triangle: 1 -> 3 direct is a FOOTWAY (100 m); driving must detour
    # 1 -> 2 -> 3 (300 m); all roads bidirectional
    rows = [
        {"doc_id": "d", "way_id": 10, "src_i": 1, "dst_i": 2,
         "length_m": 150.0, "lane_chars": "dd", "dir_chars": "^v"},
        {"doc_id": "d", "way_id": 11, "src_i": 2, "dst_i": 3,
         "length_m": 150.0, "lane_chars": "dd", "dir_chars": "^v"},
        {"doc_id": "d", "way_id": 12, "src_i": 1, "dst_i": 3,
         "length_m": 100.0, "lane_chars": "f", "dir_chars": "^"},
    ]
    roads = spark.createDataFrame(rows)
    got = {r["profile"]: r for r in simple_paths(roads).collect()}
    assert got["foot"]["way_path"] == "12"
    assert got["foot"]["dist_m"] == 100.0
    assert got["drive"]["way_path"] == "10,11"
    assert got["drive"]["dist_m"] == 300.0


def test_simple_path_respects_oneway_lanes(spark):
    """A oneway road (all lanes forward) is only traversable src->dst."""
    from osm2streets_spark.operators.pathfinding import simple_paths

    rows = [
        # 1 -> 3 oneway TOWARD 1 (backward lanes only): unusable 1->3
        {"doc_id": "d", "way_id": 20, "src_i": 1, "dst_i": 3,
         "length_m": 100.0, "lane_chars": "dd", "dir_chars": "vv"},
        {"doc_id": "d", "way_id": 21, "src_i": 1, "dst_i": 2,
         "length_m": 200.0, "lane_chars": "d", "dir_chars": "^"},
        {"doc_id": "d", "way_id": 22, "src_i": 2, "dst_i": 3,
         "length_m": 200.0, "lane_chars": "d", "dir_chars": "^"},
    ]
    roads = spark.createDataFrame(rows)
    got = {r["profile"]: r for r in simple_paths(roads).collect()}
    assert got["drive"]["way_path"] == "21,22"
