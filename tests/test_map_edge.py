"""S3 boundary clip end-to-end: MapEdge intersections + way slicing."""

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.plans.pipeline import load_documents, build_street_network


@pytest.fixture(scope="module")
def me_net(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    me = docs.where(F.col("doc_id").startswith("map_edge"))
    return build_street_network(spark, me)


def test_map_edge_kinds(me_net):
    ints = me_net["intersections"].collect()
    kinds = sorted(i.kind for i in ints)
    # junction points: synthetic -1/-2 (MapEdge), node 2 (ways 100+102),
    # node 4 (ways 101+102), node 5 (terminus of 101)
    assert kinds.count("MapEdge") == 2
    assert kinds.count("Terminus") == 1
    assert len(ints) == 5


def test_clipped_geometry_inside(me_net):
    """Clipped pieces render; way 100 contributes two road segments
    (split at node 2), plus ways 101 and 102."""
    import json
    feats = me_net["features"].where(F.col("feature_type") == "road").collect()
    assert len(feats) == 4
    for f in feats:
        ring = json.loads(f.feature_json)["geometry"]["coordinates"][0]
        assert len(ring) >= 4
