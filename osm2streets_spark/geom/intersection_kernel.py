"""Per-intersection geometry + movement kernel (pure Python/numpy).

Runs inside an ``applyInPandas`` group — one intersection at a time, with
its incident road end-geometries. This is the Spark re-expression of the
reference's update_geometry / update_movements dispatch
(osm2streets/src/operations/update_geometry.rs:8-65,
 geometry/mod.rs:103-168, intersection.rs:286-447).

Each incident road arrives as a polyline pointing AWAY from the
intersection (the reference orients them TOWARD it; reversed here so
``dist along`` = distance from the junction, which is what trims mean).

Semantics reproduced (cited), algorithms re-derived:
  * clockwise road ordering via walk-back-by-shortest-road sorting points
    (intersection.rs:224-276, incl. the `as i64` angle-key truncation)
  * terminus square ≈ road width (geometry/terminus.rs:8-64)
  * degenerate 2-road trim: 1.0 m ideal, 0.1 m min (geometry/degenerate.rs)
  * general case: adjacent-edge collision → deepest hit wins per road
    (geometry/general_case.rs:11-128) — our corner polygon orders all
    end-cap corners by angle (the reference walks per-road corner arcs;
    equivalent for convex junctions, divergence documented)
  * movements + kind classification and the traffic-conflict lattice
    Uncontested < Diverge < Merge < Cross (intersection.rs:297-447)
"""

from __future__ import annotations

import math

import numpy as np

from .core import (
    cumulative_lengths, interpolate_along, first_intersection,
    normalized_degrees, polyline_length, shift_polyline, circle_ring,
    dedupe_consecutive,
)

UNCONTESTED, DIVERGE, MERGE, CROSS = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# clockwise ordering (intersection.rs:224-276)
# ---------------------------------------------------------------------------

def sort_roads_cw(roads: list[dict]) -> list[dict]:
    """roads: dicts with 'xy' (np.ndarray pointing away from intersection).
    Returns the list sorted clockwise, matching sort_roads semantics:
    sorting point = each polyline walked out by the shortest incident
    road's length; key = int(normalized_degrees(angle from sorting point
    to the intersection center))."""
    if len(roads) < 2:
        return list(roads)
    # center = mean of the incident endpoints (intersection.rs:244-251)
    endpoints = np.array([r["xy"][0] for r in roads])
    center = endpoints.mean(axis=0)
    shortest = min(polyline_length(r["xy"]) for r in roads)
    keyed = []
    for r in roads:
        sorting_pt = interpolate_along(r["xy"], shortest)
        ang = math.degrees(math.atan2(center[1] - sorting_pt[1],
                                      center[0] - sorting_pt[0]))
        # reference angles measure clockwise-positive (screen coords,
        # y-down); our plane is y-up, so negate to sort clockwise.
        keyed.append((int(normalized_degrees(-ang)), r))
    keyed.sort(key=lambda t: t[0])
    return [r for _, r in keyed]


# ---------------------------------------------------------------------------
# trims (T6 dispatch by arity — update_geometry.rs:8-65)
# ---------------------------------------------------------------------------

def compute_trims(roads_cw: list[dict]) -> dict:
    """→ {road_key: trim_meters}. road_key = (road_id, is_src_end)."""
    n = len(roads_cw)
    trims = {r["key"]: 0.0 for r in roads_cw}
    if n == 1:
        return trims
    if n == 2:
        # degenerate (geometry/degenerate.rs:8-61): 1.0 m ideal, 0.1 min
        for r in roads_cw:
            length = polyline_length(r["xy"])
            trims[r["key"]] = max(0.1, min(1.0, length / 2.0))
        return trims
    # J9 on/off-ramp branch (geometry/on_off_ramp.rs:13-179): 3 roads
    # where exactly one is a *_link — the two mainline roads are
    # continuous pavement, so their mutual collision must NOT trim them
    # (the reference trims the thin road + one thick and extends the
    # other; we approximate by skipping the thick-thick pair).
    ramp_links = [r for r in roads_cw if r.get("is_link")]
    skip_pair = None
    if n == 3 and len(ramp_links) == 1:
        thick = [r["key"] for r in roads_cw if not r.get("is_link")]
        skip_pair = frozenset(thick)
    # general case (general_case.rs:11-128): for each adjacent clockwise
    # pair, collide the thickened edges; each road's trim = deepest
    # collision across its pairs, clamped to its length. Edge polylines
    # are computed once per road and reused across both adjacent pairs.
    edges = []
    lengths = []
    for r in roads_cw:
        half = r["width"] / 2.0
        edges.append((shift_polyline(r["xy"], half),
                      shift_polyline(r["xy"], -half)))
        lengths.append(polyline_length(r["xy"]))
    for i in range(n):
        j = (i + 1) % n
        a, b = roads_cw[i], roads_cw[j]
        if skip_pair is not None and frozenset((a["key"], b["key"])) == skip_pair:
            continue
        best_a = best_b = 0.0
        for ea in edges[i]:
            for eb in edges[j]:
                hit = first_intersection(ea, eb)
                if hit is None:
                    continue
                _, da, db = hit
                best_a = max(best_a, da)
                best_b = max(best_b, db)
        for road, best, length in ((a, best_a, lengths[i]),
                                   (b, best_b, lengths[j])):
            trims[road["key"]] = max(trims[road["key"]], min(best, length))
    return trims


# ---------------------------------------------------------------------------
# intersection polygon (geometry/mod.rs:172-229; terminus.rs; degenerate.rs)
# ---------------------------------------------------------------------------

def _end_cap_corners(xy: np.ndarray, trim: float, width: float):
    """Corners of the road's trimmed end cap: point at ``trim`` along the
    away-pointing polyline, offset ±width/2 along the perpendicular."""
    pt = interpolate_along(xy, trim)
    # tangent at trim
    cl = cumulative_lengths(xy)
    i = min(int(np.searchsorted(cl, max(trim, 1e-9), side="left")), len(xy) - 1)
    t = xy[i] - xy[i - 1] if i > 0 else xy[1] - xy[0]
    norm = math.hypot(t[0], t[1]) or 1.0
    t = t / norm
    perp = np.array([t[1], -t[0]])
    return pt + perp * width / 2.0, pt - perp * width / 2.0, pt, t


def intersection_polygon(roads_cw: list[dict], trims: dict) -> np.ndarray:
    """Closed ring for the junction area."""
    if len(roads_cw) == 1:
        r = roads_cw[0]
        w = max(r["width"], 1.0)
        c_r, c_l, pt, t = _end_cap_corners(r["xy"], 0.0, w)
        half = w / 2.0
        ring = np.array([
            c_r, c_l, c_l - t * half * 2, c_r - t * half * 2, c_r,
        ])
        return ring
    corners = []
    for r in roads_cw:
        trim = trims.get(r["key"], 0.0)
        c_r, c_l, _, _ = _end_cap_corners(r["xy"], trim, max(r["width"], 0.5))
        corners.append(c_r)
        corners.append(c_l)
    pts = np.array(corners)
    center = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    order = np.argsort(-ang)  # clockwise in y-up plane
    ring = pts[order]
    ring = np.vstack([ring, ring[0][None, :]])
    ring = dedupe_consecutive(ring)
    if len(ring) < 4:  # fallback: reference's 3 m circle (intersection.rs:208)
        return circle_ring(center, 3.0)
    return ring


# ---------------------------------------------------------------------------
# movements + kind (intersection.rs:286-447)
# ---------------------------------------------------------------------------

def _is_between(num: int, rng: tuple[int, int]) -> bool:
    bot, top = min(rng), max(rng)
    return bot < num < top


def calc_conflict(a, b, driving_side: str) -> int:
    """Faithful reimplementation of calc_conflict (intersection.rs:381-441):
    movements are (src_idx, dst_idx) into the clockwise road list."""
    if a[0] == b[0] and a[1] == b[1]:
        return UNCONTESTED
    if a[0] == b[0]:
        return DIVERGE
    if a[1] == b[1]:
        return MERGE
    is_driving_side_between = (driving_side == "left") ^ (a[0] < a[1])
    if a[0] == b[1]:
        return CROSS if (is_driving_side_between ^ _is_between(b[0], a)) \
            else UNCONTESTED
    if a[1] == b[0]:
        return CROSS if (is_driving_side_between ^ _is_between(b[1], a)) \
            else UNCONTESTED
    if _is_between(a[0], b) ^ _is_between(a[1], b):
        return CROSS
    return UNCONTESTED


def movements_and_kind(roads_cw: list[dict], driving_side: str = "right"):
    """→ (movements: list[(road_id, road_id)], kind: str).

    roads_cw dicts need: road_id, driveable(bool), can_out(bool),
    can_in(bool), banned_to(set[road_id]), only_to(set[road_id]).
    can_out/can_in are precomputed per end from oneway_for_driving
    (road.rs:232-254).
    """
    droads = [r for r in roads_cw if r["driveable"]]
    # a terminus is characterised by a single connected DRIVEABLE road
    # (intersection.rs:305-308); zero driveable roads falls through to
    # the empty-connections path → Connection, exactly like the
    # reference (a footway dead-end is a Connection there too)
    if len(droads) == 1:
        return [], "Terminus"

    connections = []
    for s in range(len(droads)):
        if not droads[s]["can_out"]:
            continue
        for d in range(len(droads)):
            if s == d:
                continue
            if not droads[d]["can_in"]:
                continue
            # turn restrictions (road.rs:256-274)
            src = droads[s]
            dst_id = droads[d]["road_id"]
            if dst_id in src["banned_to"]:
                continue
            if src["only_to"] and dst_id not in src["only_to"]:
                continue
            connections.append((s, d))

    worst = UNCONTESTED
    for i in range(len(connections)):
        for j in range(i + 1, len(connections)):
            worst = max(worst, calc_conflict(connections[i], connections[j],
                                             driving_side))
            if worst == CROSS:
                break
        if worst == CROSS:
            break

    kind = {UNCONTESTED: "Connection", DIVERGE: "Fork", MERGE: "Fork",
            CROSS: "Intersection"}[worst]
    movements = [(droads[s]["road_id"], droads[d]["road_id"])
                 for s, d in connections]
    return movements, kind
