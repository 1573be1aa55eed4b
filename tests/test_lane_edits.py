"""E3 lane-edit operators (edit/add_bike_lanes.rs, edit/one_ways.rs)."""

import json

from osm2streets_spark.lanes import get_lane_specs_ltr, lanes_to_chars
from osm2streets_spark.lanes.edits import (
    maybe_add_bike_lanes, add_new_lane, toggle_road_direction,
)


def specs_json(tags):
    specs = get_lane_specs_ltr(tags)
    return json.dumps([s.as_dict() for s in specs])


def chars(j):
    return "".join({
        "driving": "d", "parking": "p", "sidewalk": "s", "shoulder": "S",
        "biking": "b", "bus": "B", "shared_left_turn": "C",
        "construction": "x", "light_rail": "l", "buffer": "|",
        "footway": "f", "shared_use": "F"}[s["lt"]]
        for s in json.loads(j))


def test_add_bike_lanes_four_lane():
    j = specs_json({"highway": "secondary", "lanes": "4", "sidewalk": "both"})
    assert chars(j) == "s|dddd|s"
    out = maybe_add_bike_lanes(j)
    # outermost driving lane each side becomes bike + buffer
    assert chars(out) == "s|b|dd|b|s"


def test_add_bike_lanes_keeps_single_lane():
    j = specs_json({"highway": "residential"})  # s|dd|s — 1 per direction
    assert chars(maybe_add_bike_lanes(j)) == chars(j)


def test_add_new_lane_bus():
    j = specs_json({"highway": "secondary", "lanes": "2", "sidewalk": "none"})
    out = add_new_lane(j, "bus", "forward")
    assert chars(out) == "ddB"


def test_toggle_direction():
    j = specs_json({"highway": "tertiary", "lanes": "2", "oneway": "yes",
                    "sidewalk": "none"})
    specs = json.loads(j)
    assert all(s["dir"] == "forward" for s in specs)
    out = json.loads(toggle_road_direction(j))
    assert all(s["dir"] == "backward" for s in out)
    # toggling twice is identity
    assert json.loads(toggle_road_direction(toggle_road_direction(j))) == specs
