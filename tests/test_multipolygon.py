"""S4 multipolygon ring assembly (pure kernel + Spark wiring)."""

from osm2streets_spark.operators.multipolygon import assemble_rings


def test_two_way_outer_ring():
    # square split across two ways, second reversed
    w1 = [[0, 0], [1, 0], [1, 1]]
    w2 = [[0, 0], [0, 1], [1, 1]]
    rings = assemble_rings([(w1, "outer"), (w2, "outer")])
    assert len(rings["outer"]) == 1
    ring = rings["outer"][0]
    assert ring[0] == ring[-1]
    assert len(ring) == 5


def test_outer_with_inner():
    outer = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    inner = [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]
    rings = assemble_rings([(outer, "outer"), (inner, "inner")])
    assert len(rings["outer"]) == 1
    assert len(rings["inner"]) == 1


def test_broken_chain_dropped():
    w1 = [[0, 0], [1, 0]]
    rings = assemble_rings([(w1, "outer")])
    assert rings["outer"] == []
