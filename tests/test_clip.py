import numpy as np

from osm2streets_spark.geom.clip import clip_polyline_to_ring


SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)


def test_fully_inside():
    pl = np.array([[2, 2], [8, 8]], dtype=float)
    out = clip_polyline_to_ring(pl, SQUARE)
    assert len(out) == 1
    assert np.allclose(out[0], pl)


def test_fully_outside():
    pl = np.array([[20, 20], [30, 30]], dtype=float)
    assert clip_polyline_to_ring(pl, SQUARE) == []


def test_crossing_out():
    pl = np.array([[5, 5], [15, 5]], dtype=float)
    out = clip_polyline_to_ring(pl, SQUARE)
    assert len(out) == 1
    assert np.allclose(out[0][0], [5, 5])
    assert np.allclose(out[0][-1], [10, 5])  # synthetic boundary point


def test_crossing_through():
    pl = np.array([[-5, 5], [15, 5]], dtype=float)
    out = clip_polyline_to_ring(pl, SQUARE)
    assert len(out) == 1
    assert np.allclose(out[0][0], [0, 5])
    assert np.allclose(out[0][-1], [10, 5])


def test_in_out_in():
    # dips outside and comes back: two clipped pieces
    pl = np.array([[2, 5], [12, 5], [12, 8], [2, 8]], dtype=float)
    out = clip_polyline_to_ring(pl, SQUARE)
    assert len(out) == 2
    assert np.allclose(out[0][0], [2, 5])
    assert np.allclose(out[0][-1], [10, 5])
    assert np.allclose(out[1][0], [10, 8])
    assert np.allclose(out[1][-1], [2, 8])
