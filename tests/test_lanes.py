"""Lane-inference parity with the reference unit table
(osm2lanes/src/tests.rs:14-345 char-code cases).

ALL 24 active reference cases are ported below (the table upstream has
26 entries of which 2 are commented out with /* */ — ways 369623526 and
539534598; both excluded here for the same reason they are excluded
upstream). Harness mirrors the Rust one: MapConfig::default semantics
(inferred_sidewalks=False) and `highway=residential` pushed when the
case has no highway tag."""

from osm2streets_spark.lanes import get_lane_specs_ltr, lanes_to_chars, dirs_to_chars


def run(tags_list, side="right", inferred_sidewalks=True,
        default_highway=None):
    tags = {}
    for t in tags_list:
        k, v = t.split("=", 1)
        tags[k] = v
    if default_highway:
        tags.setdefault("highway", default_highway)
    specs = get_lane_specs_ltr(tags, driving_side=side,
                               inferred_sidewalks=inferred_sidewalks)
    return lanes_to_chars(specs), dirs_to_chars(specs)


def run_ref(tags_list, side):
    """tests.rs harness: MapConfig::default (no sidewalk inference) and
    `highway=residential` pushed when the case has no highway tag."""
    return run(tags_list, side, inferred_sidewalks=False,
               default_highway="residential")


# (tags, side, lanes, dirs) — tests.rs cases in file order; the way id
# comment is the reference's own citation
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
    # way/224637155
    (["lanes=2", "oneway=yes", "sidewalk=left"], "left", "s|dd", "^^^^"),
    # way/4188078
    (["lanes=2", "cycleway:left=lane", "oneway=yes", "sidewalk=left"],
     "left", "s|bdd", "^^^^^"),
    # way/49207928
    (["cycleway:right=lane", "sidewalk=both"],
     "left", "s|ddb|s", "^^^vvvv"),
    # way/898731283
    (["lanes=3", "sidewalk=both"], "left", "s|ddd|s", "^^^^vvv"),
    # way/898731283 (lanes=5 hypothetical from tests.rs)
    (["lanes=5", "sidewalk=none"], "right", "ddddd", "vv^^^"),
    # way/335668924
    (["lanes=1", "sidewalk=none"], "right", "d", "^"),
    # way/632329263
    (["bus:lanes:backward=designated|yes", "lanes=3", "lanes:backward=2",
      "lanes:bus:backward=1", "lanes:forward=1", "psv=yes"],
     "left", "ddB", "^vv"),
    # way/4013378
    (["busway:left=lane", "cycleway:left=lane", "oneway=yes"],
     "left", "bBd", "^^^"),
    # way/312855494
    (["busway:right=lane"], "left", "ddB", "^vv"),
    # way/228767989
    (["busway:both=lane", "sidewalk=both"], "left", "s|BddB|s", "^^^^vvvv"),
    # way/905830125
    (["highway=cycleway", "oneway=yes"], "left", "b", "^"),
    # way/414489468
    (["highway=cycleway", "oneway=no", "segregated=yes", "sidewalk=right"],
     "left", "bb|s", "^vvv"),
    # way/705809125
    (["highway=cycleway", "oneway=yes", "segregated=yes", "sidewalk=left"],
     "left", "s|b", "^^^"),
    # way/280732115
    (["highway=cycleway", "foot=yes", "segregated=no"], "left", "F", "^"),
    # way/523882355 (sidewalk tag on a footway is invalid and ignored)
    (["bicycle=yes", "foot=yes", "highway=footway", "sidewalk=both"],
     "right", "F", "^"),
    # way/148338681 (sidewalk:left:width does NOT imply sidewalk:left)
    (["highway=residential", "lanes=1", "oneway=yes",
      "sidewalk:left:width=0.9"],
     "right", "d", "^"),
    # way/23806634
    (["highway=secondary_link", "lanes=2", "oneway=yes",
      "turn:lanes=reverse;left|left"],
     "right", "dd", "^^"),
    # way/528310266
    (["highway=motorway", "lanes=5", "oneway=yes", "bicycle=no"],
     "right", "ddddd", "^^^^^"),
]


def test_reference_cases():
    assert len(CASES) == 24, "all 24 active tests.rs cases stay ported"
    for tags, side, want_lanes, want_dirs in CASES:
        lanes, dirs = run_ref(tags, side)
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
    # one track lane regardless of oneway (oneway_loop golden:
    # railway=rail tracks=4 renders 3.0 m wide, its MapEdge squares
    # are 3.0 m — a single LightRail lane)
    lanes, dirs = run(["railway=light_rail"])
    assert lanes == "l"
    assert run(["railway=rail", "tracks=4"])[0] == "l"


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


def _total(tags, side="right"):
    specs = get_lane_specs_ltr(tags, driving_side=side,
                               inferred_sidewalks=False)
    return (lanes_to_chars(specs),
            round(sum(s.width for s in specs), 3))


def test_round7_golden_width_rules():
    """Round-7 golden-pinned rules (see the area cited per case)."""
    # st_georges lanes:psv=1 primaries: one kerb-side 3.048 bus lane
    assert _total({"highway": "primary", "lanes": "3", "lanes:psv": "1",
                   "oneway": "yes", "sidewalk": "left"}, "left") \
        == ("s|Bdd", 10.648)
    # leeds 39597033: busway:left + psv:lanes list = ONE bus lane
    assert _total({"highway": "tertiary", "lanes": "2", "lanes:bus": "1",
                   "busway:left": "lane", "oneway": "yes",
                   "psv:lanes": "designated|yes"}, "left") == ("Bd", 6.048)
    # neukolln: explicit per-lane widths pin; width= covers the rest
    assert _total({"highway": "secondary", "lanes": "2", "width": "13",
                   "cycleway:both": "lane", "cycleway:both:width": "1.8",
                   "width:lanes:forward": "3.3",
                   "width:lanes:backward": "3.3"}) == ("bddb", 10.2)
    # leeds Regent St: bare cycleway side values are ignored
    assert _total({"highway": "trunk", "lanes": "2", "oneway": "yes",
                   "cycleway": "left"}, "left") == ("dd", 6.0)
    # leeds 363049230: foot=designated = 3.0 shared-use
    assert _total({"highway": "cycleway", "bicycle": "designated",
                   "foot": "designated"}) == ("F", 3.0)
    # leeds access=no parking aisles: NORMAL 3.0 m lanes, not alley 2.0
    assert _total({"highway": "service", "service": "parking_aisle",
                   "access": "no"}) == ("dd", 6.0)
    # ...but private/customers service ways keep the 2.0 alley width
    assert _total({"highway": "service", "access": "private"}) \
        == ("dd", 4.0)
    # borough 1164020779: segregated=yes alone implies the footpath
    assert _total({"highway": "cycleway", "oneway": "no",
                   "segregated": "yes"}, "left") == ("fbb", 5.0)
    # st_georges 414489468: a sidewalk tag carries the pedestrians
    chars, total = _total({"highway": "cycleway", "oneway": "no",
                           "segregated": "yes", "sidewalk": "right"},
                          "left")
    assert chars == "bb|s"
    # aurora 792024858: a 3-entry directional bus list trumps lanes=2
    assert _total({"highway": "primary", "lanes": "2", "oneway": "yes",
                   "bus:lanes:forward": "yes|yes|designated"}) \
        == ("ddB", 9.048)
    # ...with suffix-counted bike lanes subtracted (st_georges
    # 967715653 shape: 4-entry bicycle list + cycleway:left=lane keeps
    # three travel lanes)
    assert _total({"highway": "trunk", "lanes": "4", "lanes:forward": "3",
                   "oneway": "yes", "cycleway:left": "lane",
                   "bicycle:lanes:forward": "yes|designated|yes|yes"},
                  "left") == ("bddd", 10.5)


def test_round7_track_roadway_placement():
    """Tracks are roadway for Center placement unless segregated=no
    (kingsway vs taipei goldens)."""
    from osm2streets_spark.lanes.placement import placement_shift
    # kingsway 1003081552: LHT trunk, cycleway:left=track -> shift 0
    tags = {"highway": "trunk", "lanes": "2", "oneway": "yes",
            "cycleway:left": "track"}
    specs = get_lane_specs_ltr(tags, driving_side="left",
                               inferred_sidewalks=False)
    assert abs(placement_shift(tags, specs, "left")) < 1e-9
    # taipei 506351786: segregated=no track is footpath-zone ->
    # driving-lanes-only center (1.55 m shift with the sidewalk)
    tags2 = {"highway": "secondary", "lanes": "3", "oneway": "yes",
             "cycleway:right": "track", "cycleway:right:segregated": "no",
             "sidewalk": "right"}
    specs2 = get_lane_specs_ltr(tags2, driving_side="right",
                                inferred_sidewalks=False)
    assert abs(placement_shift(tags2, specs2, "right") - 1.55) < 1e-6


def test_round8_advice_fixes():
    """r7 ADVICE correctness fixes, pinned."""
    # lanes:psv=N count form appends N kerb-side bus lanes — the
    # driving count already subtracted N, so N=2 must render ddBB
    # (4 lanes wide), not ddB (a silently lost lane)
    assert _total({"highway": "primary", "lanes": "4", "lanes:psv": "2",
                   "oneway": "yes"}) == ("ddBB", 12.096)
    # N=1 (the st_georges golden form) is unchanged
    assert _total({"highway": "primary", "lanes": "3", "lanes:psv": "1",
                   "oneway": "yes"}) == ("ddB", 9.048)
    # cycleway:both is explicit like cycleway:<side>: the blanket
    # oneway:bicycle=no doubling must not turn one-lane-per-side into
    # two-per-side (neukolln golden 6.0 m carriageway = bdb)
    assert _total({"highway": "residential", "cycleway:both": "lane",
                   "oneway": "yes", "oneway:bicycle": "no"}) == ("bdb", 6.0)
    # ...while the bare cycleway key still doubles on both sides
    # (unchanged r7 behavior: contraflow keeps both sides, each twoway)
    assert _total({"highway": "residential", "cycleway": "lane",
                   "oneway": "yes", "oneway:bicycle": "no"}) == ("bbdbb", 9.0)


def test_round8_reverse_oneway_lane_list_bike_subtraction():
    """_fwd_bike_lanes counts the street's actual travel direction: a
    reverse-oneway with a per-lane list and an explicit side bike lane
    must subtract that lane from the boost exactly like the forward
    form (aurora/st_georges rules mirrored)."""
    fwd = _total({"highway": "trunk", "lanes": "4", "lanes:forward": "3",
                  "oneway": "yes", "cycleway:left": "lane",
                  "bicycle:lanes:forward": "yes|designated|yes|yes"},
                 "left")
    rev = _total({"highway": "trunk", "lanes": "4", "lanes:backward": "3",
                  "oneway": "-1", "cycleway:left": "lane",
                  "bicycle:lanes:backward": "yes|designated|yes|yes"},
                 "left")
    assert fwd == ("bddd", 10.5)
    assert rev[1] == fwd[1]
