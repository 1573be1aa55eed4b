"""T1/T2/T4 network simplification passes.

Reference: transform/mod.rs:22-29 applies [CollapseShortRoads,
CollapseDegenerateIntersections, CollapseShortRoads] to clipped areas;
RemoveDisconnectedRoads (transform/remove_disconnected.rs) keeps the
largest connected component.

Spark shape (SURVEY.md §2.10): these rewrites have sequential
dependencies between nearby collapses, so each document's graph is
rewritten locally inside ONE applyInPandas group — a doc is small by
construction (dense docs are split by cell upstream), and documents are
the unit of parallelism. A pure-SQL iterate-to-fixpoint would shuffle
the whole corpus once per round; the per-doc kernel does the fixpoint
in-memory in a single shuffle. The kernel is pure Python below
(unit-testable without Spark).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..geom.core import simplify_rdp, polyline_length


def _recompute_trims_at(roads: list[dict], i_ids: set) -> None:
    """Eager per-junction trim refresh, mirroring the reference's
    update_i calls from insert_road/remove_road (lib.rs:99-121): after a
    T2 splice, both endpoints of the new road get their geometry
    recomputed, which can flag newly trim-annihilated roads for the
    SECOND CollapseShortRoads pass (the cascade the goldens encode:
    bristol/taipei crossing stubs only annihilate after their
    neighbors splice). Runs the same pure kernel as T6."""
    import math

    import numpy as np

    from ..geom.intersection_kernel import (
        sort_roads_cw, compute_trims_ex, terminus_geometry,
    )

    incident: dict[int, list] = {}
    for r in roads:
        if r["src_i"] in i_ids:
            incident.setdefault(r["src_i"], []).append((r, True))
        if r["dst_i"] in i_ids:
            incident.setdefault(r["dst_i"], []).append((r, False))

    def _pre(r, is_src):
        v = r.get("pretrim_src") if is_src else r.get("pretrim_dst")
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return float(v)

    def _set(r, is_src, t):
        if is_src:
            r["trim_start"] = float(t)
        else:
            r["trim_end"] = float(t)

    touched: dict[int, dict] = {}
    for i, ends in incident.items():
        if len(ends) == 1:
            r, is_src = ends[0]
            pre = _pre(r, is_src)
            if pre is not None:
                _set(r, is_src, pre)
            else:
                xy = np.asarray(r["xy"], dtype=float).reshape(-1, 2)
                if not is_src:
                    xy = xy[::-1]
                is_edge = bool((r.get("src_is_edge") if is_src
                                else r.get("dst_is_edge")) or False)
                t, _ = terminus_geometry(
                    xy, max(float(r["total_width"]), 1.0), is_edge)
                _set(r, is_src, t)
            touched[id(r)] = r
            continue
        kends = []
        for r, is_src in ends:
            xy = np.asarray(r["xy"], dtype=float).reshape(-1, 2)
            hw = str(r.get("highway_type") or "")
            kends.append({
                "key": (r["road_id"], is_src), "road_id": r["road_id"],
                "is_src_end": is_src, "xy": xy if is_src else xy[::-1],
                "width": float(r["total_width"]),
                "is_link": hw.endswith("_link") or hw == "motorway",
                "pretrim": _pre(r, is_src),
                "other_i": r["dst_i"] if is_src else r["src_i"],
            })
            touched[id(r)] = r
        cw = sort_roads_cw(kends)
        if any(e["pretrim"] is not None for e in cw):
            trims = {e["key"]: float(e["pretrim"] or 0.0) for e in cw}
        else:
            trims, _mode = compute_trims_ex(cw)
        for r, is_src in ends:
            _set(r, is_src, trims[(r["road_id"], is_src)])

    for r in touched.values():
        length = polyline_length(
            np.asarray(r["xy"], dtype=float).reshape(-1, 2))
        t0 = float(r.get("trim_start") or 0.0)
        t1 = float(r.get("trim_end") or 0.0)
        r["too_short"] = bool(t0 + t1 >= length)


# ---------------------------------------------------------------------------
# pure-python per-doc kernel
# ---------------------------------------------------------------------------

def _components(roads: list[dict]) -> list[set]:
    """Union-find connected components over intersection ids (A6/G4,
    remove_disconnected.rs:10-42)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for r in roads:
        union(r["src_i"], r["dst_i"])
    groups: dict[int, set] = {}
    for r in roads:
        groups.setdefault(find(r["src_i"]), set()).add(r["road_id"])
    return list(groups.values())


def remove_disconnected(roads: list[dict]) -> list[dict]:
    """T4: keep the largest component by road count; light rail does not
    seed its own component (remove_disconnected.rs:7-50). Deterministic
    tie-break by smallest member road_id."""
    if not roads:
        return roads
    seedable = [r for r in roads if r["highway_type"] not in ("light_rail", "rail")]
    comp_source = seedable if seedable else roads
    comps = _components(comp_source)
    best = max(comps, key=lambda c: (len(c), -min(c)))
    # light-rail roads survive if they touch the kept component's
    # intersections
    kept_is = set()
    by_id = {r["road_id"]: r for r in roads}
    for rid in best:
        kept_is.add(by_id[rid]["src_i"])
        kept_is.add(by_id[rid]["dst_i"])
    out = []
    for r in roads:
        if r["road_id"] in best:
            out.append(r)
        elif r["highway_type"] in ("light_rail", "rail") and (
                r["src_i"] in kept_is or r["dst_i"] in kept_is):
            out.append(r)
    return out


def collapse_short_roads(roads: list[dict],
                         imerges: dict[int, int] | None = None) -> list[dict]:
    """T1 (operations/collapse_short_road.rs:12-161): for each candidate
    (tagged junction=intersection, or trim-annihilated), merge its dst
    intersection into its src, rewrite endpoints, drop new self-loops.

    Faithful details added for golden parity:
      * a candidate touching a MapEdge is skipped
        (collapse_short_road.rs:24-28)
      * at each collapse, every surviving road incident to either
        merged intersection memoizes its CURRENT trim at that end
        (`trim_roads_for_merging`, :44-58) — consumed by the T6 kernel
        as the pretrimmed-geometry path (geometry/pretrimmed.rs:13-65)
      * absorbed→survivor intersection ids are recorded in `imerges`
        (caller-provided dict) for control/crossing upgrade and
        osm_node_id union (:66-84)
    """
    merged: dict[int, int] = {}

    def resolve(i):
        while i in merged:
            i = merged[i]
        return i

    candidates = sorted(
        (r for r in roads
         if r.get("internal_junction_road") or r.get("too_short")),
        key=lambda r: r["road_id"],
    )
    # incident index for the trim memo
    incident: dict[int, list[dict]] = {}
    for r in roads:
        incident.setdefault(r["src_i"], []).append(r)
        incident.setdefault(r["dst_i"], []).append(r)

    cand_ids = set()
    edge_is = {r["src_i"] for r in roads if r.get("src_is_edge")} | \
              {r["dst_i"] for r in roads if r.get("dst_is_edge")} | \
              {r["src_i"] for r in roads if r.get("src_frozen")} | \
              {r["dst_i"] for r in roads if r.get("dst_frozen")}
    for r in candidates:
        src, dst = resolve(r["src_i"]), resolve(r["dst_i"])
        if src in edge_is or dst in edge_is:
            continue  # MapEdge guard (collapse_short_road.rs:24-28)
        cand_ids.add(r["road_id"])
        if src == dst:
            continue  # became a loop via another candidate → just remove
        # memo current trims of surviving incident roads at both ends
        for i in (src, dst):
            for other in incident.get(i, []):
                if (other["road_id"] in cand_ids
                        or other.get("internal_junction_road")):
                    continue
                if other["src_i"] == i or resolve(other["src_i"]) == i:
                    other["pretrim_src"] = float(
                        other.get("trim_start") or 0.0)
                if other["dst_i"] == i or resolve(other["dst_i"]) == i:
                    other["pretrim_dst"] = float(other.get("trim_end") or 0.0)
        merged[dst] = src
        # re-home the absorbed junction's incident list onto the
        # survivor so chained collapses (dual-carriageway junctions)
        # still find those roads for the memo — the reference iterates
        # the LIVE roads_per_intersection at each collapse
        # (collapse_short_road.rs:44-58)
        if dst != src:
            incident.setdefault(src, []).extend(incident.pop(dst, []))

    out = []
    for r in roads:
        if r["road_id"] in cand_ids:
            continue
        src, dst = resolve(r["src_i"]), resolve(r["dst_i"])
        if src == dst:
            continue  # new self-loop → drop (collapse_short_road.rs:107)
        r = dict(r, src_i=src, dst_i=dst)
        out.append(r)
    if imerges is not None:
        for absorbed in merged:
            imerges[absorbed] = resolve(absorbed)
    return out


def collapse_degenerate(roads: list[dict], rdp_eps: float = 1.0,
                        touched_is: set | None = None) -> list[dict]:
    """T2 (transform/collapse_intersections.rs:9-87): splice the two
    roads of a 2-road intersection into one when lane specs, name,
    highway type, layer and placement all match, neither road carries a
    turn restriction, the junction has no pedestrian crossing, and they
    aren't opposing oneways. Keeps the first road's id; geometry
    concatenated + RDP ε=1.0."""
    by_id = {r["road_id"]: r for r in roads}
    incident: dict[int, list[int]] = {}
    crossing_is: set[int] = set()
    for r in roads:
        incident.setdefault(r["src_i"], []).append(r["road_id"])
        incident.setdefault(r["dst_i"], []).append(r["road_id"])
        if r.get("src_has_crossing") or r.get("src_frozen"):
            crossing_is.add(r["src_i"])
        if r.get("dst_has_crossing") or r.get("dst_frozen"):
            crossing_is.add(r["dst_i"])

    for i_id in sorted(incident):
        if i_id in crossing_is:
            continue  # collapse_intersections.rs:12-14
        rids = incident.get(i_id, [])
        rids = [rid for rid in rids if rid in by_id]
        if len(rids) != 2 or rids[0] == rids[1]:
            continue
        a, b = by_id[rids[0]], by_id[rids[1]]
        if a.get("has_restriction") or b.get("has_restriction"):
            continue  # collapse_intersections.rs:41-47
        if (a["lane_specs_json"] != b["lane_specs_json"]
                # the reference LaneSpec embeds the raw muv Lane
                # (osm2lanes lib.rs:289), so ANY lane-relevant tag
                # difference (surface, smoothness, explicit oneway,
                # service subtype, width…) breaks equality — the
                # fingerprint mirrors that (goldens: neukolln sidewalk
                # pair differing only in surface is NOT merged; tunnel
                # difference IS merged)
                or a.get("lane_fingerprint") != b.get("lane_fingerprint")
                or a.get("name") != b.get("name")
                or a["highway_type"] != b["highway_type"]
                or a.get("layer", 0) != b.get("layer", 0)
                # placement must be consistent and equal
                # (collapse_intersections.rs:74-85; shift is our
                # Consistent-placement scalar)
                or (a.get("placement_shift") or 0.0)
                != (b.get("placement_shift") or 0.0)):
            continue
        # opposing oneways can't splice (collapse_intersection.rs:24-32:
        # endpoint multiset must have 3 distinct, i.e. not a loop pair)
        ends = {a["src_i"], a["dst_i"], b["src_i"], b["dst_i"]}
        if len(ends) != 3:
            continue
        ow_a, ow_b = a.get("oneway_dir", ""), b.get("oneway_dir", "")

        def _flipped(r):
            # reversing a road swaps every per-end attribute
            return dict(
                r, src_i=r["dst_i"], dst_i=r["src_i"],
                src_is_edge=r.get("dst_is_edge"),
                dst_is_edge=r.get("src_is_edge"),
                src_has_crossing=r.get("dst_has_crossing"),
                dst_has_crossing=r.get("src_has_crossing"),
                trim_start=r.get("trim_end"), trim_end=r.get("trim_start"),
                pretrim_src=r.get("pretrim_dst"),
                pretrim_dst=r.get("pretrim_src"),
            )

        # orient: a must END at i, b must START at i (flip as needed);
        # flipping a oneway road reverses its traffic — only allowed for
        # bidirectional roads, else require compatible orientation.
        xy_a = np.asarray(a["xy"], dtype=float).reshape(-1, 2)
        xy_b = np.asarray(b["xy"], dtype=float).reshape(-1, 2)
        if a["dst_i"] != i_id:
            if ow_a:
                # oneway pointing out of i on the a side: traffic flow
                # must continue b→a; swap roles instead of flipping
                a, b = b, a
                xy_a, xy_b = xy_b, xy_a
                if a["dst_i"] != i_id:
                    continue
            else:
                xy_a = xy_a[::-1]
                a = _flipped(a)
        if b["src_i"] != i_id:
            if ow_b:
                continue
            xy_b = xy_b[::-1]
            b = _flipped(b)
        if ow_a != ow_b and not (ow_a == "" or ow_b == ""):
            continue
        new_xy = np.vstack([xy_a, xy_b[1:]])
        new_xy = simplify_rdp(new_xy, rdp_eps)
        merged = dict(a)
        merged["dst_i"] = b["dst_i"]
        # the merged road's dst end is b's dst end — carry its
        # per-end attributes
        merged["dst_is_edge"] = b.get("dst_is_edge")
        merged["dst_has_crossing"] = b.get("dst_has_crossing")
        merged["trim_end"] = b.get("trim_end")
        merged["pretrim_dst"] = b.get("pretrim_dst")
        merged["xy"] = new_xy.ravel().tolist()
        if touched_is is not None:
            # insert_road(lib.rs:99-108) refreshes geometry at both
            # endpoints of the spliced road
            touched_is.add(merged["src_i"])
            touched_is.add(merged["dst_i"])
        # MULTISET union, like the reference's osm_ids.extend — a way
        # split by an interior loop and re-spliced legitimately lists
        # its id twice (quad_intersection golden: [6390208, 6390208])
        merged["osm_way_ids"] = sorted(
            list(a.get("osm_way_ids", [a["way_id"]]))
            + list(b.get("osm_way_ids", [b["way_id"]]))
        )
        del by_id[b["road_id"]]
        by_id[a["road_id"]] = merged
        # update adjacency for future iterations
        for lst in incident.values():
            if b["road_id"] in lst:
                lst[:] = [a["road_id"] if x == b["road_id"] else x for x in lst]
    return list(by_id.values())


def zip_sidepaths(roads: list[dict], connector_max_m: float = 10.0) -> list[dict]:
    """T3 (operations/zip_sidepath.rs:28-202), faithful connector walk:

    1. a separately-mapped cycleway is a zip candidate when EACH of its
       endpoints has exactly one OTHER road shorter than 10 m (the
       connector); the connector's far side is a main-road intersection
       (zip_sidepath.rs:29-49)
    2. the main road segments "parallel to" the sidepath are found by
       driving-lane pathfinding between those two intersections, trying
       both directions (:57-63 simple_path with LaneType::Driving)
    3. the sidepath is removed; its lanes (shoulders stripped, :94-101)
       plus a Planters buffer are spliced into EVERY main segment on
       the nearer side, inside an existing outer walkable lane, with
       directions flipped when anti-parallel (:120-190)

    The reference does not merge osm_ids (its own TODO, :90) and keeps
    the connectors — CollapseDegenerateIntersections cleans up after
    (:196-199)."""
    import json as _json
    import math

    WALKABLE = {"sidewalk", "shoulder", "footway", "shared_use"}
    TO_CHAR = {"driving": "d", "parking": "p", "sidewalk": "s",
               "shoulder": "S", "biking": "b", "bus": "B",
               "shared_left_turn": "C", "construction": "x",
               "light_rail": "l", "buffer": "|", "footway": "f",
               "shared_use": "F"}

    by_id = {r["road_id"]: r for r in roads}
    incident: dict[int, list[dict]] = {}
    for r in roads:
        incident.setdefault(r["src_i"], []).append(r)
        incident.setdefault(r["dst_i"], []).append(r)

    def length(r):
        return polyline_length(np.asarray(r["xy"], float).reshape(-1, 2))

    def mid_angle(r):
        pl = np.asarray(r["xy"], float).reshape(-1, 2)
        v = pl[-1] - pl[0]
        return pl[len(pl) // 2], math.degrees(math.atan2(v[1], v[0]))

    def drive_path(frm, to):
        """Dijkstra over driving-lane directed edges (simple_path with
        zero heuristic). Returns road dicts along the path or None."""
        import heapq
        adj: dict[int, list] = {}
        for r in by_id.values():
            fwd = back = False
            for l in _json.loads(r["lane_specs_json"]):
                if l["lt"] == "driving":
                    if l["dir"] == "forward":
                        fwd = True
                    else:
                        back = True
            w = length(r)
            if fwd:
                adj.setdefault(r["src_i"], []).append((r["dst_i"], w, r))
            if back:
                adj.setdefault(r["dst_i"], []).append((r["src_i"], w, r))
        dist = {frm: 0.0}
        prev = {}
        heap = [(0.0, frm)]
        while heap:
            d, i = heapq.heappop(heap)
            if i == to:
                break
            if d > dist.get(i, float("inf")):
                continue
            for j, w, r in adj.get(i, ()):
                nd = d + w
                if nd < dist.get(j, float("inf")):
                    dist[j] = nd
                    prev[j] = (i, r)
                    heapq.heappush(heap, (nd, j))
        if to not in prev and to != frm:
            return None
        path = []
        i = to
        while i != frm:
            i, r = prev[i]
            path.append(r)
        return path[::-1] or None

    sidepaths = [r for r in roads
                 if r["highway_type"] == "cycleway" and not r["driveable"]]
    for sp in sorted(sidepaths, key=lambda r: r["road_id"]):
        if sp["road_id"] not in by_id:
            continue
        main_ends = []
        for i in (sp["src_i"], sp["dst_i"]):
            cands = [o for o in incident.get(i, ())
                     if o["road_id"] != sp["road_id"]
                     and o["road_id"] in by_id
                     and length(o) < connector_max_m]
            if len(cands) == 1:
                c = cands[0]
                main_ends.append(c["dst_i"] if c["src_i"] == i
                                 else c["src_i"])
        if len(main_ends) != 2:
            continue
        path = drive_path(main_ends[0], main_ends[1])             or drive_path(main_ends[1], main_ends[0])
        if path is None:
            continue

        sp_lanes = _json.loads(sp["lane_specs_json"])
        while sp_lanes and sp_lanes[0]["lt"] == "shoulder":
            sp_lanes.pop(0)
        while sp_lanes and sp_lanes[-1]["lt"] == "shoulder":
            sp_lanes.pop()
        if not sp_lanes:
            continue
        sp_mid, sp_ang = mid_angle(sp)

        for main in path:
            m_mid, m_ang = mid_angle(main)
            pl = np.asarray(main["xy"], float).reshape(-1, 2)
            v = pl[-1] - pl[0]
            w = sp_mid - pl[0]
            snap_to_left = (v[0] * w[1] - v[1] * w[0]) > 0
            oriented_same_way = \
                abs((sp_ang - m_ang + 180) % 360 - 180) <= 90

            insert = []
            for l in sp_lanes:
                l = dict(l)
                if not oriented_same_way:
                    l["dir"] = ("backward" if l["dir"] == "forward"
                                else "forward")
                insert.append(l)
            buffer_lane = {"lt": "buffer", "dir": insert[-1]["dir"]
                           if snap_to_left else insert[0]["dir"],
                           "width": 2.0, "subtype": "planters",
                           "allowed_turns": []}
            if snap_to_left:
                insert.append(buffer_lane)
            else:
                insert.insert(0, buffer_lane)

            lanes = _json.loads(main["lane_specs_json"])
            if snap_to_left:
                idx = 1 if lanes and lanes[0]["lt"] in WALKABLE else 0
            else:
                idx = (len(lanes) - 1
                       if lanes and lanes[-1]["lt"] in WALKABLE
                       else len(lanes))
            lanes[idx:idx] = insert
            merged = dict(main)
            merged["lane_specs_json"] = _json.dumps(
                lanes, separators=(",", ":"))
            merged["lane_chars"] = "".join(TO_CHAR[l["lt"]] for l in lanes)
            merged["dir_chars"] = "".join(
                "^" if l["dir"] == "forward" else "v" for l in lanes)
            merged["total_width"] = round(
                sum(l["width"] for l in lanes), 6)
            by_id[main["road_id"]] = merged
        del by_id[sp["road_id"]]
    return list(by_id.values())


def apply_standard_transforms(roads: list[dict],
                              with_sidepath_zip: bool = False,
                              imerges: dict[int, int] | None = None,
                              with_remove_disconnected: bool = True,
                              steps: list | None = None,
                              ) -> list[dict]:
    """The standard list T1, T2, T1 (transform/mod.rs:21-29 —
    standard_for_clipped_areas deliberately does NOT remove
    disconnected roads); T4 removal and T3 sidepath zipping are opt-in
    extras (RemoveDisconnectedRoads exists as a separate Transformation;
    zipping matches osm2streets-py/src/lib.rs:90-99). `imerges`
    (optional dict) collects absorbed→survivor intersection merges
    across both T1 passes.

    `steps` (optional list) is the stepwise-debugging sink
    (apply_transformations_stepwise_debugging, transform/mod.rs:94-109:
    "original" first, then a snapshot after each transformation, named
    per Transformation::name()): (step_name, n_roads, n_intersections)
    appended per pass, where n_intersections counts distinct live road
    endpoints."""
    def _snap(name, rs):
        if steps is not None:
            live = {r["src_i"] for r in rs} | {r["dst_i"] for r in rs}
            steps.append((name, len(rs), len(live)))

    _snap("original", roads)
    # a cell-split dense doc must not run T4 per cell: components span
    # cells. (At scale, component pruning for split docs is a separate
    # doc-level pass over the edge list — cheap relative to geometry.)
    doc_split = any(r.get("src_frozen") or r.get("dst_frozen")
                    for r in roads)
    if with_remove_disconnected and not doc_split:
        roads = remove_disconnected(roads)
        _snap("remove disconnected roads", roads)
    if with_sidepath_zip:
        roads = zip_sidepaths(roads)
        _snap("zip parallel sidepaths", roads)
    roads = collapse_short_roads(roads, imerges)
    _snap("collapse short roads", roads)
    touched: set = set()
    roads = collapse_degenerate(roads, touched_is=touched)
    if touched:
        # the reference recomputes junction geometry eagerly after each
        # splice; newly trim-annihilated roads become candidates for
        # the SECOND CollapseShortRoads pass
        _recompute_trims_at(roads, touched)
    _snap("collapse degenerate intersections", roads)
    roads = collapse_short_roads(roads, imerges)
    _snap("collapse short roads", roads)
    if imerges is not None:
        # close chains across the two passes (dst of pass 1 may itself
        # be absorbed in pass 2)
        def _resolve(i):
            seen = set()
            while i in imerges and i not in seen:
                seen.add(i)
                i = imerges[i]
            return i
        for k in list(imerges):
            imerges[k] = _resolve(imerges[k])
    return roads


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

_ROAD_FIELDS = [
    ("road_id", LongType()), ("way_id", LongType()),
    ("src_i", LongType()), ("dst_i", LongType()),
    ("xy", ArrayType(DoubleType())),
    ("highway_type", StringType()), ("name", StringType()),
    ("layer", LongType()), ("speed_kph", DoubleType()),
    ("oneway_dir", StringType()), ("lane_specs_json", StringType()),
    ("lane_chars", StringType()), ("dir_chars", StringType()),
    ("total_width", DoubleType()), ("driveable", BooleanType()),
    ("internal_junction_road", BooleanType()),
    ("too_short", BooleanType()),
    ("osm_way_ids", ArrayType(LongType())),
    ("lon0", DoubleType()), ("lat0", DoubleType()),
    # per-end metadata consumed by the kernels (all nullable):
    # MapEdge guard, T2 crossing guard, T2 placement guard, pass-1
    # trims feeding the trim_roads_for_merging memo
    ("src_is_edge", BooleanType()), ("dst_is_edge", BooleanType()),
    ("src_has_crossing", BooleanType()),
    ("dst_has_crossing", BooleanType()),
    ("has_restriction", BooleanType()),
    ("placement_shift", DoubleType()),
    ("trim_start", DoubleType()), ("trim_end", DoubleType()),
    ("lane_fingerprint", StringType()),
    # dense-doc cell split: frozen-seam flags (an intersection whose
    # incident roads span transform cells must not be collapsed — its
    # other-cell roads are invisible to this kernel group)
    ("src_frozen", BooleanType()), ("dst_frozen", BooleanType()),
]

# output = roads (+pretrim memos) UNION intersection-merge records:
# row_kind='road' carries road fields; row_kind='imerge' carries
# src_i=survivor, dst_i=absorbed and nulls elsewhere
_OUT_EXTRA = [
    ("row_kind", StringType()),
    ("pretrim_src", DoubleType()), ("pretrim_dst", DoubleType()),
]

TRANSFORM_SCHEMA = StructType(
    [StructField("doc_id", StringType())]
    + [StructField(n, t) for n, t in _ROAD_FIELDS + _OUT_EXTRA]
)


def _transform_doc_core(doc_id: str, rows: list[dict],
                        with_sidepath_zip: bool = False,
                        with_remove_disconnected: bool = True,
                        doc_split: bool = False):
    """One document's transform fixpoint over plain dict rows →
    (surviving road dicts, imerges). Dict rows, not a pandas frame: the
    per-doc to_dict("records") + per-doc output-frame construction was
    the majority of the whole transforms stage's CPU at sf0.1."""
    # Arrow batch row order is nondeterministic; kernels must not depend
    # on it (e.g. T2 keeps the FIRST road's id) — sort by road_id first
    rows.sort(key=lambda r: r["road_id"])
    if doc_split:
        # a cell of a split doc must never run T4: components span
        # cells, and a cell with no frozen seam (fully disconnected
        # interior roads) would otherwise prune per-cell
        with_remove_disconnected = False
    for r in rows:
        r["xy"] = list(r["xy"])
        if r.get("osm_way_ids") is None:
            r["osm_way_ids"] = [r["way_id"]]
        else:
            r["osm_way_ids"] = list(r["osm_way_ids"])
    imerges: dict[int, int] = {}
    roads = apply_standard_transforms(rows, with_sidepath_zip, imerges,
                                      with_remove_disconnected)
    return roads, imerges


def _transform_batch(pdf: pd.DataFrame, with_sidepath_zip: bool,
                     with_remove_disconnected: bool) -> pd.DataFrame:
    """One Arrow batch of complete (doc_id, _tcell) groups → one output
    frame. The batch is decomposed ONCE into native-Python column lists
    and dispatched with vectorized group codes (first-occurrence order,
    matching the old groupby(sort=False))."""
    from .geometry_update import _group_codes
    out_cols = ["doc_id"] + [n for n, _ in _ROAD_FIELDS + _OUT_EXTRA]
    long_cols = {n for n, t in _ROAD_FIELDS if isinstance(t, LongType)}
    col = {c: pdf[c].tolist() for c in pdf.columns if c != "_tcell"}
    names = list(col)
    tcell = pdf["_tcell"].to_numpy()
    gidx = _group_codes(pdf["doc_id"].to_numpy(), tcell)
    order = np.argsort(gidx, kind="stable")
    gvals = gidx[order]
    starts = np.nonzero(np.r_[True, gvals[1:] != gvals[:-1]])[0]
    bounds = np.r_[starts, len(order)]
    data: dict[str, list] = {c: [] for c in out_cols}
    for s0, e0 in zip(bounds[:-1], bounds[1:]):
        run = order[s0:e0]
        rows = [{c: col[c][j] for c in names} for j in run]
        doc_id = rows[0]["doc_id"]
        roads, imerges = _transform_doc_core(
            doc_id, rows, with_sidepath_zip, with_remove_disconnected,
            doc_split=bool(tcell[run[0]]))
        nr, ni = len(roads), len(imerges)
        data["doc_id"].extend([doc_id] * (nr + ni))
        im = sorted(imerges.items())
        for c in out_cols[1:]:
            lst = data[c]
            if c == "row_kind":
                lst.extend(["road"] * nr)
                lst.extend(["imerge"] * ni)
                continue
            lst.extend(r.get(c) for r in roads)
            if c == "src_i":
                lst.extend(surv for _, surv in im)
            elif c == "dst_i":
                lst.extend(absd for absd, _ in im)
            else:
                lst.extend([None] * ni)
    for c in long_cols:
        # nullable Int64: mixing None (imerge rows) with int64 ids in
        # an object->float64 column silently mangles xxhash64 ids
        # beyond 2^53
        data[c] = pd.array(data[c], dtype="Int64")
    return pd.DataFrame(data)


M_PER_DEG = 111_194.92664455873


def run_transforms(roads: DataFrame,
                   with_sidepath_zip: bool = False,
                   with_remove_disconnected: bool = True,
                   split_threshold: int = 4000,
                   split_zoom: int = 12) -> DataFrame:
    """Per-doc T4[+T3]+T1+T2+T1. Input needs the columns in _ROAD_FIELDS
    (per-end metadata columns optional — filled with nulls). Output has
    row_kind='road' rows (the surviving roads, with pretrim memos) and
    row_kind='imerge' rows (src_i=surviving i, dst_i=absorbed i).

    Skew: documents are the unit of parallelism, so a single megacity
    doc would otherwise pin one task. Docs with more than
    ``split_threshold`` roads split into ~10 km quadkey cells
    (zoom ``split_zoom``) and the kernel runs per (doc, cell);
    intersections whose incident roads span cells are FROZEN — no
    collapse may touch them (their other-cell roads are invisible to
    the group), and T4 is skipped for split docs (components span
    cells). Same mapInPandas-with-in-batch-groupby shape as run_t6."""
    src = _prep_transform_cells(roads, split_threshold, split_zoom)
    cols = ["doc_id", "_tcell"] + [n for n, _ in _ROAD_FIELDS]

    from ..session import kernel_partitions
    spark = src.sparkSession
    n = kernel_partitions(spark)

    def _process(pdf):
        return _transform_batch(pdf, with_sidepath_zip,
                                with_remove_disconnected)

    def batched(batches):
        from .geometry_update import stream_groups
        yield from stream_groups(batches, ["doc_id", "_tcell"], _process)

    # sortWithinPartitions makes (doc, cell) groups contiguous so
    # stream_groups bounds per-task memory to one Arrow batch + one
    # group instead of the whole partition
    return src.select(*cols).repartition(n, "doc_id", "_tcell") \
        .sortWithinPartitions("doc_id", "_tcell") \
        .mapInPandas(batched, schema=TRANSFORM_SCHEMA)


def _prep_transform_cells(roads: DataFrame, split_threshold: int,
                          split_zoom: int) -> DataFrame:
    """Shared input prep for run_transforms / run_transform_steps:
    default-fill optional per-end metadata columns, assign dense docs
    their quadkey transform cell (_tcell; 0 = unsplit sentinel) and
    flag frozen seam intersections."""
    src = roads
    if "osm_way_ids" not in src.columns:
        src = src.withColumn("osm_way_ids", F.array("way_id"))
    defaults = {
        "too_short": F.lit(False),
        "src_is_edge": F.lit(None).cast("boolean"),
        "dst_is_edge": F.lit(None).cast("boolean"),
        "src_has_crossing": F.lit(None).cast("boolean"),
        "dst_has_crossing": F.lit(None).cast("boolean"),
        "has_restriction": F.lit(None).cast("boolean"),
        "placement_shift": F.lit(None).cast("double"),
        "trim_start": F.lit(None).cast("double"),
        "trim_end": F.lit(None).cast("double"),
        "lane_fingerprint": F.lit(None).cast("string"),
        "src_frozen": F.lit(None).cast("boolean"),
        "dst_frozen": F.lit(None).cast("boolean"),
    }
    for name, default in defaults.items():
        if name not in src.columns:
            src = src.withColumn(name, default)

    if split_threshold:
        from .tiles import tile_xy

        counts = src.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nd"))
        src = src.join(counts, "doc_id")  # small agg side — AQE broadcasts
        # road midpoint → lon/lat → zoom-12 tile cell (dense docs only)
        n_pts = (F.size("xy") / 2).cast("int")
        midi = (F.floor(n_pts / 2) * 2 + 1).cast("int")  # 1-based x idx
        lat = F.col("lat0") + F.element_at("xy", midi + 1) / M_PER_DEG
        lon = F.col("lon0") + F.element_at("xy", midi) \
            / (M_PER_DEG * F.cos(F.radians(F.col("lat0"))))
        tx, ty = tile_xy(lon, lat, split_zoom)
        # +1 keeps split cells strictly positive: cell 0 is reserved as
        # the unsplit sentinel, so tile (0,0) at clamped extremes can
        # never be mistaken for "unsplit" by the doc_split inference
        src = src.withColumn(
            "_tcell",
            F.when(F.col("_nd") > split_threshold,
                   (tx.cast("long") * F.lit(1 << 22) + ty.cast("long")
                    + F.lit(1)))
             .otherwise(F.lit(0))).drop("_nd")
        # frozen seams: intersections whose incident roads span cells
        endcells = src.select("doc_id", F.explode(F.array(
            F.struct(F.col("src_i").alias("i"), F.col("_tcell").alias("c")),
            F.struct(F.col("dst_i").alias("i"), F.col("_tcell").alias("c")),
        )).alias("e")).select("doc_id", "e.i", "e.c")
        frozen = endcells.groupBy("doc_id", "i").agg(
            F.count_distinct("c").alias("_nc")).where(F.col("_nc") > 1)
        for side, col in (("src", "src_i"), ("dst", "dst_i")):
            src = src.drop(f"{side}_frozen").join(
                frozen.select("doc_id", F.col("i").alias(col),
                              F.lit(True).alias(f"{side}_frozen")),
                ["doc_id", col], "left")
    else:
        src = src.withColumn("_tcell", F.lit(0))
    return src


STEPS_SCHEMA = StructType(
    [StructField("doc_id", StringType()),
     StructField("step_idx", IntegerType()),
     StructField("step_name", StringType()),
     StructField("n_roads", LongType()),
     StructField("n_intersections", LongType())])


def run_transform_steps(roads: DataFrame,
                        with_sidepath_zip: bool = False,
                        with_remove_disconnected: bool = True,
                        split_threshold: int = 4000,
                        split_zoom: int = 12) -> DataFrame:
    """Stepwise transformation debugging — the Spark counterpart of the
    reference's apply_transformations_stepwise_debugging
    (transform/mod.rs:94-109): a network-size snapshot per
    transformation pass, "original" first, step names per
    Transformation::name(). Like the reference's, a separate (more
    expensive) entry point from run_transforms — it re-runs the
    transform kernels to record the per-pass states.

    Output: (doc_id, step_idx, step_name, n_roads, n_intersections).
    For quadkey-split dense docs the counts are summed over cells
    (frozen seam intersections count once per cell they touch — the
    sequential replay aggregates identically)."""
    src = _prep_transform_cells(roads, split_threshold, split_zoom)
    cols = ["doc_id", "_tcell"] + [n for n, _ in _ROAD_FIELDS]

    from ..session import kernel_partitions
    n = kernel_partitions(src.sparkSession)

    def _steps_doc(doc_id, pdf, doc_split):
        pdf = pdf.sort_values("road_id")
        rec = pdf.to_dict("records")
        for r in rec:
            r["xy"] = list(r["xy"])
            if r.get("osm_way_ids") is None:
                r["osm_way_ids"] = [r["way_id"]]
            else:
                r["osm_way_ids"] = list(r["osm_way_ids"])
        steps: list = []
        apply_standard_transforms(
            rec, with_sidepath_zip, None,
            with_remove_disconnected and not doc_split, steps=steps)
        return pd.DataFrame({
            "doc_id": [doc_id] * len(steps),
            "step_idx": list(range(len(steps))),
            "step_name": [s[0] for s in steps],
            "n_roads": [s[1] for s in steps],
            "n_intersections": [s[2] for s in steps],
        })

    def _process(pdf):
        outs = [
            _steps_doc(doc_id, g.drop(columns=["_tcell"]), bool(cell))
            for (doc_id, cell), g in pdf.groupby(["doc_id", "_tcell"],
                                                 sort=False)
        ]
        return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    def batched(batches):
        from .geometry_update import stream_groups
        yield from stream_groups(batches, ["doc_id", "_tcell"], _process)

    per_cell = src.select(*cols).repartition(n, "doc_id", "_tcell") \
        .sortWithinPartitions("doc_id", "_tcell") \
        .mapInPandas(batched, schema=STEPS_SCHEMA)
    return per_cell.groupBy("doc_id", "step_idx", "step_name").agg(
        F.sum("n_roads").alias("n_roads"),
        F.sum("n_intersections").alias("n_intersections"))
