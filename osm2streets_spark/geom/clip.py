"""S3: boundary clipping kernels.

Reference streets_reader/src/osm_reader/clip.rs:13-78: drop nodes
outside the boundary polygon; drop ways with no inside node; slice ways
that cross the boundary into ≥1 clipped pieces whose boundary-crossing
endpoints are synthetic (no OSM node id → the intersection built there
is a MapEdge, split_ways.rs:39-52). Polyline↔ring splitting mirrors
clip_polyline_to_ring (clip.rs:84-114).

Pure numpy; called from the clip stage's pandas UDF.
"""

from __future__ import annotations

import math

import numpy as np

from .core import point_in_ring, _seg_seg_intersection, dedupe_consecutive


def ring_crossings(p0: np.ndarray, p1: np.ndarray, ring: np.ndarray):
    """All crossing points of segment p0→p1 with the ring, ordered by
    distance from p0."""
    hits = []
    for i in range(len(ring) - 1):
        p = _seg_seg_intersection(p0, p1, ring[i], ring[i + 1])
        if p is not None:
            hits.append((float(math.hypot(p[0] - p0[0], p[1] - p0[1])), p))
    hits.sort(key=lambda t: t[0])
    out = []
    for d, p in hits:
        if not out or abs(d - out[-1][0]) > 1e-9:
            out.append((d, p))
    return out


def apply_boundary_clip(nodes: dict, ways: list, ring: np.ndarray):
    """Shared S3 implementation used by BOTH the Spark parser and the
    fixture generator (same code → ground-truth tables match the
    pipeline bit-for-bit; the kernel itself is unit-tested separately).

    nodes: {node_id: (lon, lat, tags_json)}; ways: [(way_id, refs,
    tags_json)]. Returns (nodes, ways) after the clip; synthetic
    boundary-crossing nodes get negative ids; a way sliced into k>1
    pieces gets piece ids -(way_id*100 + i + 1)."""
    inside = {
        nid for nid, (lon, lat, _) in nodes.items()
        if point_in_ring(np.array([lon, lat]), ring)
    }
    syn_counter = [0]
    coord_to_id = {(lon, lat): nid for nid, (lon, lat, _) in nodes.items()}

    def _syn_id(lon: float, lat: float) -> int:
        key = (lon, lat)
        if key in coord_to_id:
            return coord_to_id[key]
        syn_counter[0] -= 1
        nid = syn_counter[0]
        coord_to_id[key] = nid
        nodes[nid] = (lon, lat, "{}")
        inside.add(nid)
        return nid

    new_ways = []
    for way_id, refs, tags_json in ways:
        if len(refs) < 2:
            continue
        pts = np.array([[nodes[r][0], nodes[r][1]] for r in refs])
        if all(r in inside for r in refs):
            new_ways.append((way_id, refs, tags_json))
            continue
        pieces = clip_polyline_to_ring(pts, ring)
        for k, piece in enumerate(pieces):
            piece_refs = []
            for x, y in piece:
                nid = coord_to_id.get((float(x), float(y)))
                if nid is None:
                    # quantize the synthetic crossing to ~0.1 mm
                    # (1e-9 deg), mirroring the reference's Pt2D
                    # trim_f64 grid — the old 1e-7 deg rounding (a
                    # 1.1 cm quantum) displaced clipped termini by up
                    # to ±0.8 cm and pushed their MapEdge squares just
                    # past the 1 cm exactness gate (quad/arizona
                    # forensics: rigid ~1 cm square displacements)
                    nid = _syn_id(float(f"{x:.9f}"), float(f"{y:.9f}"))
                piece_refs.append(nid)
            if len(piece_refs) >= 2:
                pid = way_id if len(pieces) == 1 else -(way_id * 100 + k + 1)
                new_ways.append((pid, piece_refs, tags_json))
    nodes = {nid: v for nid, v in nodes.items() if nid in inside}
    return nodes, new_ways


def clip_polyline_to_ring(pl: np.ndarray, ring: np.ndarray) -> list[np.ndarray]:
    """Split a polyline at ring crossings and keep the inside pieces.
    Returns a list of polylines; crossing endpoints are synthetic points
    exactly on the boundary. (clip.rs:84-114 semantics.)"""
    pieces: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    inside = point_in_ring(pl[0], ring)
    if inside:
        cur.append(pl[0])
    for i in range(len(pl) - 1):
        p0, p1 = pl[i], pl[i + 1]
        for _, x in ring_crossings(p0, p1, ring):
            if inside:
                cur.append(x)
                if len(cur) >= 2:
                    pieces.append(cur)
                cur = []
                inside = False
            else:
                cur = [x]
                inside = True
        if inside:
            cur.append(p1)
    if inside and len(cur) >= 2:
        pieces.append(cur)
    out = []
    for piece in pieces:
        arr = dedupe_consecutive(np.asarray(piece))
        if len(arr) >= 2:
            out.append(arr)
    return out
