"""K3/K5: OSM `placement` scheme parsing and lane-offset resolution.

Reference: osm2lanes/src/placement.rs:14-88 (tag parsing incl. the
forward/backward/start/end variants), RoadPosition/Placement enums
osm2lanes/src/lib.rs:497-538, and left_edge_offset_of
osm2streets/src/road.rs:311-425 (position → meters from the left road
edge given the lane list).

The way's `placement` describes where the mapped line sits within the
road width; the center line is the reference line shifted by
(full-width-center − placement offset) (road.rs:166-193).
"""

from __future__ import annotations

from .inference import LaneSpec, DRIVING, BIKING, BUS, SHARED_LEFT_TURN, \
    LIGHT_RAIL, CONSTRUCTION, SHOULDER, PARKING, BUFFER, FWD, BACK

# is_roadway (osm2lanes lib.rs:131-148): buffers count as roadway
# EXCEPT curb and verge; sidewalk/footway/shared-use do not
ROADWAY = {DRIVING, BIKING, BUS, SHARED_LEFT_TURN, LIGHT_RAIL,
           CONSTRUCTION, SHOULDER, PARKING}
_NON_ROADWAY_BUFFERS = {"curb", "verge"}


def _is_roadway(s) -> bool:
    if s.lt == BUFFER:
        return s.subtype not in _NON_ROADWAY_BUFFERS
    if s.lt == BIKING and s.subtype == "track_shared":
        # ONLY a cycle track tagged segregated=no (sharing the
        # footpath zone with its sidewalk — taipei 506351786's 1.55 m
        # golden center shift) sits outside the roadway; plain tracks
        # ARE roadway per lib.rs:133 (Biking always true — the
        # kingsway cycleway:left=track trunks center on the full
        # b|dd width, shift 0)
        return False
    return s.lt in ROADWAY
TRAVEL = {DRIVING, BIKING, BUS, LIGHT_RAIL}


def _parse_position(value: str):
    """RoadPosition::parse (placement.rs:14-35). Returns dict or None
    on unknown values (reference errors; we fall back to center)."""
    if value == "":
        return {"type": "center"}
    if value == "separation":
        return {"type": "separation"}
    if ":" in value:
        kind, lane_str = value.split(":", 1)
        if kind in ("left_of", "middle_of", "right_of") and lane_str.isdigit():
            return {"type": kind, "lane": int(lane_str), "fwd": True}
    return None


def parse_placement(tags: dict):
    """Placement::parse (placement.rs:38-88). Returns
    {"kind": consistent|varying|transition, "start": pos, "end": pos}."""
    def rev(pos):
        if pos and pos["type"] in ("left_of", "middle_of", "right_of"):
            return dict(pos, fwd=not pos["fwd"])
        return pos

    center = {"type": "center"}
    if "placement" in tags:
        v = tags["placement"]
        if v == "transition":
            return {"kind": "transition", "start": center, "end": center}
        pos = _parse_position(v) or center
        return {"kind": "consistent", "start": pos, "end": pos}
    if "placement:start" in tags or "placement:end" in tags:
        return {"kind": "varying",
                "start": _parse_position(tags.get("placement:start", "")) or center,
                "end": _parse_position(tags.get("placement:end", "")) or center}
    if "placement:forward" in tags:
        pos = _parse_position(tags["placement:forward"]) or center
        return {"kind": "consistent", "start": pos, "end": pos}
    if "placement:forward:start" in tags or "placement:forward:end" in tags:
        return {"kind": "varying",
                "start": _parse_position(
                    tags.get("placement:forward:start", "")) or center,
                "end": _parse_position(
                    tags.get("placement:forward:end", "")) or center}
    if "placement:backward" in tags:
        pos = rev(_parse_position(tags["placement:backward"]) or center)
        return {"kind": "consistent", "start": pos, "end": pos}
    if "placement:backward:start" in tags or "placement:backward:end" in tags:
        return {"kind": "varying",
                "start": rev(_parse_position(
                    tags.get("placement:backward:start", "")) or center),
                "end": rev(_parse_position(
                    tags.get("placement:backward:end", "")) or center)}
    return {"kind": "consistent", "start": center, "end": center}


def left_edge_offset(pos: dict, specs: list[LaneSpec],
                     driving_side: str = "right") -> float:
    """Meters from the LEFT edge of the full road width to the given
    RoadPosition (road.rs:311-425)."""
    total = sum(s.width for s in specs)
    if pos["type"] == "center":
        # center of the carriageway (roadway lanes), lib.rs:499-501
        left = 0.0
        first = last = None
        acc = 0.0
        for s in specs:
            if _is_roadway(s):
                if first is None:
                    first = acc
                last = acc + s.width
            acc += s.width
        if first is None:
            return total / 2.0
        return (first + last) / 2.0
    if pos["type"] == "separation":
        # boundary between backward and forward travel (lib.rs:505-508)
        left_dir = BACK if driving_side == "right" else FWD
        acc = 0.0
        boundary = None
        started = False
        for s in specs:
            if s.lt in TRAVEL:
                if s.dir == left_dir:
                    boundary = acc + s.width
                    started = True
                elif not started:
                    boundary = acc
                    started = True
                elif boundary is None:
                    boundary = acc
            acc += s.width
        return boundary if boundary is not None else total / 2.0
    if pos["type"] in ("left_of", "middle_of", "right_of"):
        # nth lane of the given direction; forward lanes number 1..k in
        # LTR order, backward lanes in reverse (LtrLaneNum semantics)
        want_dir = FWD if pos["fwd"] else BACK
        lanes = [(i, s) for i, s in enumerate(specs)
                 if s.lt in TRAVEL and s.dir == want_dir]
        if not lanes:
            return total / 2.0
        if want_dir == BACK:
            lanes = lanes[::-1]
        n = min(max(pos["lane"], 1), len(lanes)) - 1
        idx, lane = lanes[n]
        left = sum(s.width for s in specs[:idx])
        # left/right are from the named lane's own direction of travel
        if pos["type"] == "middle_of":
            return left + lane.width / 2.0
        at_left_ltr = (pos["type"] == "left_of") == (want_dir == FWD)
        return left if at_left_ltr else left + lane.width
    return total / 2.0


def placement_shift(tags: dict, specs: list[LaneSpec],
                    driving_side: str = "right") -> float:
    """Signed meters to shift the reference line RIGHT to obtain the
    full-width center line (road.rs:166-193). Varying placements use
    the START position — NOT an approximation: the reference does the
    same (road.rs:174-176 warns "varying placement not yet supported,
    using placement:start"); transition pretends default placement
    (road.rs:178-182)."""
    p = parse_placement(tags)
    off = left_edge_offset(p["start"], specs, driving_side)
    total = sum(s.width for s in specs)
    return total / 2.0 - off
