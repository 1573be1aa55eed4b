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
    ints = dense_net["intersections"].collect()
    assert len(ints) == 61  # hub + 60 spoke termini
    hub = [i for i in ints if i.kind == "Intersection"]
    assert len(hub) == 1
    movements = json.loads(hub[0].movements_json)
    assert len(movements) == 60 * 59
    termini = [i for i in ints if i.kind == "Terminus"]
    assert len(termini) == 60


def test_starburst_roads_render(dense_net):
    feats = dense_net["features"]
    assert feats.where(F.col("feature_type") == "road").count() == 60
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
