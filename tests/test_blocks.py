"""G5 block finding: planar faces of small street graphs."""

from osm2streets_spark.geom.blocks import find_blocks


def road(rid, src, dst, xy, name="X", hw="residential"):
    return {"road_id": rid, "src_i": src, "dst_i": dst,
            "xy": [float(v) for v in xy], "name": name, "highway_type": hw}


def test_single_square_block():
    # 4 roads forming a unit square: one interior face
    roads = [
        road(1, 10, 11, [0, 0, 100, 0], name="South St"),
        road(2, 11, 12, [100, 0, 100, 100], name="East Ave"),
        road(3, 12, 13, [100, 100, 0, 100], name="North St"),
        road(4, 13, 10, [0, 100, 0, 0], name="West Ave"),
    ]
    blocks = find_blocks(roads)
    assert len(blocks) == 1
    b = blocks[0]
    assert b["n_roads"] == 4
    assert abs(b["area_m2"] - 10000.0) < 1.0
    assert b["kind"] == "LandUse"  # 4 distinct names


def test_grid_two_blocks():
    # 2x1 grid of squares: two interior faces
    roads = [
        road(1, 1, 2, [0, 0, 100, 0]),
        road(2, 2, 3, [100, 0, 200, 0]),
        road(3, 1, 4, [0, 0, 0, 100]),
        road(4, 2, 5, [100, 0, 100, 100]),
        road(5, 3, 6, [200, 0, 200, 100]),
        road(6, 4, 5, [0, 100, 100, 100]),
        road(7, 5, 6, [100, 100, 200, 100]),
    ]
    blocks = find_blocks(roads)
    assert len(blocks) == 2
    for b in blocks:
        assert abs(b["area_m2"] - 10000.0) < 1.0
        assert b["n_roads"] == 4
        assert b["kind"] == "RoadBundle"  # all same name "X"


def test_no_block_in_tree():
    roads = [
        road(1, 1, 2, [0, 0, 100, 0]),
        road(2, 2, 3, [100, 0, 200, 0]),
        road(3, 2, 4, [100, 0, 100, 100]),
    ]
    assert find_blocks(roads) == []
