"""K3/K5 placement parsing + offsets (placement.rs:96-169 analogues)."""

import pytest

from osm2streets_spark.lanes import get_lane_specs_ltr
from osm2streets_spark.lanes.placement import (
    parse_placement, left_edge_offset, placement_shift,
)


def test_parse_variants():
    assert parse_placement({})["kind"] == "consistent"
    assert parse_placement({})["start"]["type"] == "center"
    assert parse_placement({"placement": "transition"})["kind"] == "transition"
    p = parse_placement({"placement": "right_of:1"})
    assert p["start"] == {"type": "right_of", "lane": 1, "fwd": True}
    p = parse_placement({"placement:backward": "left_of:2"})
    assert p["start"] == {"type": "left_of", "lane": 2, "fwd": False}
    p = parse_placement({"placement:start": "separation",
                         "placement:end": "middle_of:1"})
    assert p["kind"] == "varying"
    assert p["start"]["type"] == "separation"
    assert p["end"]["type"] == "middle_of"


def test_offsets_two_way_street():
    # s|dd|s: widths 1.5, 0.1, 3, 3, 0.1, 1.5 (total 9.2)
    specs = get_lane_specs_ltr({"highway": "residential"})
    total = sum(s.width for s in specs)
    # carriageway center == full center (symmetric)
    assert left_edge_offset({"type": "center"}, specs) == pytest.approx(total / 2)
    # separation = between the backward and forward driving lanes
    assert left_edge_offset({"type": "separation"}, specs) == pytest.approx(1.5 + 0.1 + 3.0)
    # middle of forward lane 1 (the right-hand driving lane)
    off = left_edge_offset({"type": "middle_of", "lane": 1, "fwd": True}, specs)
    assert off == pytest.approx(1.5 + 0.1 + 3.0 + 1.5)
    # untagged placement → zero shift
    assert placement_shift({}, specs) == pytest.approx(0.0, abs=1e-9)


def test_shift_for_offset_way():
    # way drawn at the separation of an asymmetric road shifts right
    specs = get_lane_specs_ltr(
        {"highway": "secondary", "lanes": "3", "lanes:forward": "2",
         "sidewalk": "none"})
    shift = placement_shift({"placement": "separation"}, specs)
    # lanes: d(back) d d(fwd); separation at 3.0; center at 4.5
    assert shift == pytest.approx(1.5)
