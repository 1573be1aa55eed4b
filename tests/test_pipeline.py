"""End-to-end pipeline tests: T6 geometry, transforms, render, tiles,
span passthrough."""

import json

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.plans.pipeline import (
    load_documents, build_street_network,
)


@pytest.fixture(scope="module")
def net(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    n = build_street_network(spark, docs)
    n["roads"] = n["roads"].cache()
    n["intersections"] = n["intersections"].cache()
    n["features"] = n["features"].cache()
    n["docs"] = docs
    return n


def test_roads_have_trimmed_centers(net):
    rows = net["roads"].select("doc_id", "road_id", "center_xy",
                               "trimmed_length").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.center_xy is not None and len(r.center_xy) >= 4
        assert r.trimmed_length >= 0


def test_four_way_kind_and_control(net):
    ints = net["intersections"].where(
        F.col("doc_id") == "four_way_signal:2").collect()
    # 5 junction points: 4 termini + 1 four-way
    kinds = sorted(i.kind for i in ints)
    assert kinds.count("Terminus") == 4
    four = [i for i in ints if i.kind == "Intersection"]
    assert len(four) == 1
    assert four[0].control == "Signalled"
    movements = json.loads(four[0].movements_json)
    # 4 bidirectional roads, no restrictions: 4*3 = 12 movements
    assert len(movements) == 12


def test_t_junction_movements(net):
    ints = net["intersections"].where(
        (F.col("doc_id") == "t_junction:1") & (F.col("kind") != "Terminus")
    ).collect()
    assert len(ints) == 1
    assert ints[0].kind == "Intersection"
    assert len(json.loads(ints[0].movements_json)) == 6


def test_restricted_turn_blocks_movement(net):
    """no_left_turn from way 100 to way 103: that (from,to) movement must
    be absent at the 4-way."""
    doc = "restricted_turn:7"
    roads = {r.way_id: r.road_id
             for r in net["roads"].where(F.col("doc_id") == doc).collect()}
    ints = net["intersections"].where(
        (F.col("doc_id") == doc) & (F.col("movements_json").isNotNull())
    ).collect()
    center = [i for i in ints if i.kind != "Terminus"]
    assert len(center) == 1
    movements = {tuple(m) for m in json.loads(center[0].movements_json)}
    assert (roads[100], roads[103]) not in movements
    assert (roads[100], roads[101]) in movements  # straight is allowed


def test_sausage_link_collapsed(net):
    """T1: the junction=intersection road must be merged away."""
    doc = "sausage_link:4"
    ways = [r.way_id for r in
            net["roads"].where(F.col("doc_id") == doc).collect()]
    assert 101 not in ways  # the internal junction road is gone
    assert set(ways) >= {100, 102}


def test_degenerate_chain_collapsed(net):
    """T2: ways 101+102 share specs (lanes=4) → spliced into one road;
    way 100 (lanes=2) stays separate."""
    doc = "degenerate_chain:3"
    rows = net["roads"].where(F.col("doc_id") == doc).collect()
    assert len(rows) == 2
    merged = [r for r in rows if len(r.osm_way_ids) == 2]
    assert len(merged) == 1
    assert sorted(merged[0].osm_way_ids) == [101, 102]


def test_disconnected_removed(net):
    """T4: the detached service fragment is dropped."""
    doc = "disconnected_fragment:6"
    ways = sorted(r.way_id for r in
                  net["roads"].where(F.col("doc_id") == doc).collect())
    assert ways == [100, 100, 101]  # main grid only (way 100 splits in 2)


def test_features_valid_geojson_with_tiles(net):
    rows = net["features"].limit(50).collect()
    assert rows
    for r in rows:
        feat = json.loads(r.feature_json)
        assert feat["type"] == "Feature"
        ring = feat["geometry"]["coordinates"][0]
        assert len(ring) >= 4
        assert r.tile_z == 16
        assert len(r.quadkey) == 16
        assert 0 <= r.tile_x < 2 ** 16


def test_span_passthrough(net):
    """north_rule per-row invariant: output spans identical to input."""
    inp = {r.doc_id: r.spans for r in net["docs"].collect()}
    out = {r.doc_id: r.spans for r in net["output_documents"].collect()}
    assert inp == out


def test_terminus_polygons_exist(net):
    t = net["intersections"].where(F.col("kind") == "Terminus")
    missing = t.where(F.col("polygon_xy").isNull()).count()
    assert missing == 0
