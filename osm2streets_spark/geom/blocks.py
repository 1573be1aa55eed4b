"""G5: block (planar face) finding.

Reference osm2streets/src/block.rs: find_all_blocks walks clockwise-
sorted road-sides around each face of the planar street graph
(:87-115, walk :155-229), traces the face polygon from shifted sides
(:231-267) and classifies it by the distinct non-service road names
inside (:269-373, A8 name census).

Standard half-edge face extraction: every road contributes two directed
half-edges; at each node incident half-edges are ordered by angle; the
successor of a half-edge is the next-clockwise edge after its twin.
Faces = orbits of the successor permutation. The outer face is the one
with the most-negative signed area.

Pure Python per document (reference is equally per-map); the Spark axis
is documents via the usual mapInPandas shape.
"""

from __future__ import annotations

import math

import numpy as np


def find_blocks(roads: list[dict]) -> list[dict]:
    """roads: dicts with road_id, src_i, dst_i, xy (flat list), name,
    highway_type. Returns one dict per interior face: {block_id,
    road_sides: [(road_id, is_fwd)], ring: [[x,y]...], n_roads,
    kind} — kind per the A8 census (block.rs:316-334): LandUse if ≥2
    distinct non-service names, RoadBundle if 1, IntersectionBundle if 0.
    """
    # half-edge id: (road_id, True) = src→dst, (road_id, False) = dst→src
    pts: dict[int, list] = {}       # node -> [(angle, halfedge)]
    geom: dict[int, np.ndarray] = {}
    info: dict[int, dict] = {}
    for r in roads:
        xy = np.asarray(r["xy"], dtype=float).reshape(-1, 2)
        if len(xy) < 2:
            continue
        geom[r["road_id"]] = xy
        info[r["road_id"]] = r
        a_out = math.atan2(xy[1][1] - xy[0][1], xy[1][0] - xy[0][0])
        a_in = math.atan2(xy[-2][1] - xy[-1][1], xy[-2][0] - xy[-1][0])
        pts.setdefault(r["src_i"], []).append((a_out, (r["road_id"], True)))
        pts.setdefault(r["dst_i"], []).append((a_in, (r["road_id"], False)))
    for node in pts:
        pts[node].sort()

    def twin(he):
        return (he[0], not he[1])

    def head(he):
        r = info[he[0]]
        return r["dst_i"] if he[1] else r["src_i"]

    def successor(he):
        """Next half-edge counterclockwise after twin(he) around head(he)
        — yields counterclockwise (interior-left) face orbits."""
        node = head(he)
        edges = pts[node]
        t = twin(he)
        idx = next(i for i, (_, e) in enumerate(edges) if e == t)
        return edges[(idx - 1) % len(edges)][1]

    visited = set()
    blocks = []
    for node in sorted(pts):
        for _, start in pts[node]:
            if start in visited:
                continue
            orbit = []
            he = start
            ring_pts = []
            while he not in visited:
                visited.add(he)
                orbit.append(he)
                g = geom[he[0]]
                seg = g if he[1] else g[::-1]
                ring_pts.extend(seg[:-1].tolist())
                he = successor(he)
            if he != start:
                continue  # merged into an earlier orbit
            if len(ring_pts) < 3:
                continue
            ring = np.asarray(ring_pts + [ring_pts[0]])
            # signed area: positive = counterclockwise = interior face
            x, y = ring[:, 0], ring[:, 1]
            area = 0.5 * float(np.dot(x, np.roll(y, -1))
                               - np.dot(y, np.roll(x, -1)))
            if area <= 0:
                continue  # outer face (or degenerate)
            names = {
                info[r]["name"] for r, _ in orbit
                if info[r].get("name")
                and info[r].get("highway_type") not in ("service", "footway",
                                                        "path", "cycleway")
            }
            kind = ("LandUse" if len(names) >= 2
                    else "RoadBundle" if len(names) == 1
                    else "IntersectionBundle")
            blocks.append({
                "block_id": min((r for r, _ in orbit)),
                "road_sides": orbit,
                "ring": ring.tolist(),
                "n_roads": len({r for r, _ in orbit}),
                "n_names": len(names),
                "kind": kind,
                "area_m2": round(area, 3),
            })
    return blocks
