"""Lane-inference parity with the reference unit table
(osm2lanes/src/tests.rs:14-101 char-code cases)."""

from osm2streets_spark.lanes import get_lane_specs_ltr, lanes_to_chars, dirs_to_chars


def run(tags_list, side="right"):
    tags = {}
    for t in tags_list:
        k, v = t.split("=", 1)
        tags[k] = v
    specs = get_lane_specs_ltr(tags, driving_side=side)
    return lanes_to_chars(specs), dirs_to_chars(specs)


# (reference url comment, tags, side, lanes, dirs) — mirrors tests.rs cases
CASES = [
    # way/428294122
    (["lanes=2", "oneway=yes", "sidewalk=both", "cycleway:left=lane"],
     "right", "s|bdd|s", "vv^^^^^"),
    # way/8591383 variant with cycleway:left:oneway=no
    (["lanes=1", "oneway=yes", "sidewalk=both", "cycleway:left=track",
      "cycleway:left:oneway=no"],
     "right", "sbb|d|s", "vv^^^^^"),
    # way/353690151
    (["lanes=4", "sidewalk=both", "parking:lane:both=parallel",
      "cycleway:right=track", "cycleway:right:oneway=no"],
     "right", "s|pddddp|bbs", "vvvvv^^^^v^^"),
    # way/389654080
    (["lanes=2", "sidewalk=both", "parking:lane:left=parallel",
      "parking:lane:right=no_stopping", "centre_turn_lane=yes",
      "cycleway:right=track", "cycleway:right:oneway=no"],
     "right", "s|pdCd|bbs", "vvvv^^^v^^"),
    # way/534549104
    (["lanes=2", "oneway=yes", "sidewalk=both", "cycleway:right=track",
      "cycleway:right:oneway=no", "oneway:bicycle=no"],
     "right", "s|dd|bbs", "vv^^^v^^"),
    # way/777565028 (left-hand driving)
    (["highway=residential", "oneway=no", "sidewalk=both"],
     "left", "s|dd|s", "^^^vvv"),
]


def test_reference_cases():
    for tags, side, want_lanes, want_dirs in CASES:
        lanes, dirs = run(tags, side)
        assert lanes == want_lanes, f"{tags}: {lanes} != {want_lanes}"
        assert dirs == want_dirs, f"{tags}: {dirs} != {want_dirs}"


def test_basic_residential():
    lanes, dirs = run(["highway=residential"])
    # inferred sidewalk=both, 2 driving lanes, kerbs
    assert lanes == "s|dd|s"
    assert dirs == "vvv^^^"


def test_oneway_sidewalk_inference():
    # oneway residential infers sidewalk=both (algorithm.rs:360-366)
    lanes, dirs = run(["highway=residential", "oneway=yes"])
    assert lanes == "s|d|s"
    # oneway tertiary infers sidewalk=right only
    lanes, dirs = run(["highway=tertiary", "oneway=yes"])
    assert lanes == "d|s"


def test_service_and_motorway_no_sidewalk():
    # bidirectional service roads default to 2 narrow lanes (muv lane
    # count is direction-based; golden service polygons measure 4.0 m)
    lanes, _ = run(["highway=service"])
    assert lanes == "dd"
    lanes, _ = run(["highway=service", "oneway=yes"])
    assert lanes == "d"
    lanes, _ = run(["highway=motorway", "lanes=3", "oneway=yes"])
    assert lanes == "ddd"


def test_standalone_types():
    assert run(["highway=footway"])[0] == "f"
    assert run(["highway=steps"])[0] == "f"
    assert run(["highway=path"])[0] == "F"
    # a BARE highway=cycleway defaults to oneway in muv (the leeds
    # golden renders untagged 566234612 at one 1.5 m lane); two lanes
    # require explicit oneway=no
    assert run(["highway=cycleway"])[0] == "b"
    assert run(["highway=cycleway", "oneway=yes"])[0] == "b"
    assert run(["highway=cycleway", "oneway=no"])[0] == "bb"
    # osm2lanes tests.rs way/414489468 and way/705809125 (LHT):
    # standalone cycleway with explicit sidewalk tags
    assert run(["highway=cycleway", "oneway=no", "segregated=yes",
                "sidewalk=right"], "left") == ("bb|s", "^vvv")
    assert run(["highway=cycleway", "oneway=yes", "segregated=yes",
                "sidewalk=left"], "left") == ("s|b", "^^^")
    lanes, dirs = run(["railway=light_rail"])
    assert lanes == "ll"


def test_construction():
    lanes, _ = run(["highway=construction", "construction=residential"])
    assert set(lanes) == {"x"}


def test_turn_lanes():
    tags = {"highway": "secondary", "lanes": "2", "oneway": "yes",
            "turn:lanes": "left|through;right", "sidewalk": "none"}
    specs = get_lane_specs_ltr(tags)
    driving = [s for s in specs if s.lt == "driving"]
    assert driving[0].allowed_turns == ["left"]
    assert driving[1].allowed_turns == ["through", "right"]


def test_widths():
    specs = get_lane_specs_ltr({"highway": "residential"})
    total = sum(s.width for s in specs)
    # s(1.5) |(0.1) d(3) d(3) |(0.1) s(1.5)
    assert abs(total - 9.2) < 1e-9
