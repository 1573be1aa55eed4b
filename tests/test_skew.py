"""Skew handling: the dense_cell starburst doc carries one junction of
degree 60 — orders of magnitude above the median — and must flow
through the T6 kernel, movements enumeration and render unharmed."""

import json

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.plans.pipeline import load_documents, build_street_network


@pytest.fixture(scope="module")
def dense_net(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    dense = docs.where(F.col("doc_id").startswith("dense_cell"))
    return build_street_network(spark, dense)


def test_starburst_hub(dense_net):
    # With exact pass-1 trims, 11 of the 60 spokes are trim-annihilated
    # at the degree-60 hub (adjacent spokes ~6 deg apart -> facing-edge
    # trims ~ w/sin(6 deg) exceed spoke length) and collapse, exactly as
    # the reference does (update_geometry.rs:58-63 -> collapse). 49
    # spokes survive; their outer termini remain. (r6: the haversine
    # M_PER_DEG flipped one borderline spoke's annihilation margin.)
    ints = dense_net["intersections"].collect()
    assert len(ints) == 50  # hub + 49 surviving spoke termini
    hub = [i for i in ints if i.kind == "Intersection"]
    assert len(hub) == 1
    movements = json.loads(hub[0].movements_json)
    assert len(movements) == 49 * 48
    termini = [i for i in ints if i.kind == "Terminus"]
    assert len(termini) == 49


def test_starburst_roads_render(dense_net):
    feats = dense_net["features"]
    assert feats.where(F.col("feature_type") == "road").count() == 49
    # every feature lands in exactly one tile cell
    assert feats.where(F.col("quadkey").isNull()).count() == 0


def test_adaptive_cell_split(dense_net):
    """north_rule adaptive resolution: the starburst's ~121 features all
    land in one-ish z16 cell; with threshold 16 the dense cells must be
    re-assigned at deeper zooms while sparse cells stay at base."""
    from osm2streets_spark.operators.tiles import adaptive_cells

    feats = dense_net["features"].select("doc_id", "feature_id",
                                         "c_lon", "c_lat")
    out = adaptive_cells(feats, "c_lon", "c_lat", base_zoom=16,
                         threshold=16, max_zoom=20)
    assert out.count() == feats.count()  # nothing lost
    zooms = {r.tile_z for r in out.select("tile_z").distinct().collect()}
    assert max(zooms) > 16  # dense cells split deeper
    counts = out.groupBy("tile_z", "tile_x", "tile_y").count().collect()
    over = [c for c in counts if c["count"] > 16 and c.tile_z < 20]
    assert over == []  # every non-max-zoom cell is under threshold


def test_dense_doc_transform_split(spark):
    """north_rule skew handling: a single doc with more roads than the
    split threshold must fan out across multiple (doc, cell) transform
    groups — bounded per-task payload — while a sparse doc keeps
    exactly the single-group semantics (bit-identical output)."""
    import numpy as np
    from osm2streets_spark.operators.transforms import run_transforms

    rng = np.random.RandomState(7)
    rows = []
    # 300 disconnected 2-point roads spread over ~100 km: many zoom-12
    # cells. No collapse candidates (all distinct endpoints, no
    # junction=intersection tags, no too_short flags).
    for k in range(300):
        cx = float(rng.uniform(0, 90000))
        cy = float(rng.uniform(0, 90000))
        rows.append({
            "doc_id": "dense", "road_id": k, "way_id": k,
            "src_i": 2 * k, "dst_i": 2 * k + 1,
            "xy": [cx, cy, cx + 50.0, cy + 40.0],
            "highway_type": "residential", "name": "", "layer": 0,
            "speed_kph": 0.0, "oneway_dir": "",
            "lane_specs_json": "[]", "lane_chars": "dd",
            "dir_chars": "^v", "total_width": 7.0, "driveable": True,
            "internal_junction_road": False, "too_short": False,
            "osm_way_ids": [k], "lon0": 0.0, "lat0": 0.0,
        })
    roads = spark.createDataFrame(rows)

    split = run_transforms(roads, split_threshold=100, split_zoom=12)
    whole = run_transforms(roads, split_threshold=0)
    got_split = {r.road_id for r in
                 split.where("row_kind = 'road'").collect()}
    got_whole = {r.road_id for r in
                 whole.where("row_kind = 'road'").collect()}
    # T4 keeps only the largest component in the unsplit path; the
    # split path skips T4 (documented) — compare without T4 instead
    split_noT4 = run_transforms(roads, with_remove_disconnected=False,
                                split_threshold=100, split_zoom=12)
    whole_noT4 = run_transforms(roads, with_remove_disconnected=False,
                                split_threshold=0)
    ids_a = {r.road_id for r in
             split_noT4.where("row_kind = 'road'").collect()}
    ids_b = {r.road_id for r in
             whole_noT4.where("row_kind = 'road'").collect()}
    assert ids_a == ids_b == set(range(300))
    # T4-on: the whole-doc path keeps one component (these 300 roads
    # are all singleton components, so exactly one survives); the split
    # path skips T4 entirely and keeps all 300 (documented semantics)
    assert len(got_whole) == 1
    assert got_split == set(range(300))
