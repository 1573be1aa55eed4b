"""Measure the REFERENCE's per-road-end trims from a golden area's
road polygons and compare them with our pass-1 kernel trims.

The golden road polygon is thicken(trimmed_center, width); walking the
untrimmed center from the junction end, the first point inside the
polygon pins the reference trim to ~cm.  Printing (our_trim,
golden_trim, delta) per road end at general-case junctions gives the
dataset the oblique-corner arithmetic fix must reproduce.

Usage: PYTHONPATH=. python scripts/golden_corner_fit.py <area> [area...]
       [--all]  include |delta| <= 0.15 rows too
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from osm2streets_spark.config import MapConfig
from osm2streets_spark.geom.core import (
    cumulative_lengths, interpolate_along, lonlat_to_xy, point_in_ring,
    polyline_length,
)
from osm2streets_spark.plans.sequential import convert_document
from osm2streets_spark.sources.reference_fixtures import (
    area_document, area_driving_side, load_golden,
)


def _center(xy_flat):
    return np.asarray(xy_flat, dtype=float).reshape(-1, 2)


def golden_trim_along(center: np.ndarray, ring: np.ndarray,
                      max_d: float) -> float | None:
    """Smallest arclength d (from center[0]) whose point lies inside
    ``ring``; None when even the far end is outside (no containment —
    unmatched polygon or annihilated road)."""
    n = 160
    ds = np.linspace(0.0, max_d, n)
    inside = [point_in_ring(interpolate_along(center, d), ring) for d in ds]
    first = next((i for i, v in enumerate(inside) if v), None)
    if first is None:
        return None
    lo = ds[first - 1] if first > 0 else 0.0
    hi = ds[first]
    for _ in range(24):
        mid = 0.5 * (lo + hi)
        if point_in_ring(interpolate_along(center, mid), ring):
            hi = mid
        else:
            lo = mid
    return float(hi)


def fit_area(area: str, show_all: bool = False):
    doc = area_document(area)
    side = area_driving_side(area)
    cfg = MapConfig(driving_side=side, inferred_sidewalks=False,
                    remove_disconnected=False)
    roads, ints, *_ = convert_document(doc["doc_id"], doc["spans"], cfg)
    if not roads:
        return []
    lon0 = min(min(_center(r["xy"])[:, 0]) for r in roads)  # placeholder
    lon0, lat0 = roads[0].get("lon0"), roads[0].get("lat0")
    if lon0 is None:
        sink: dict = {}
        convert_document(doc["doc_id"], doc["spans"], cfg,
                         debug_sink=sink)
        lon0 = sink["pass1"][0]["lon0"]
        lat0 = sink["pass1"][0]["lat0"]

    golden = load_golden(area)
    g_by_way = defaultdict(list)
    for f in golden["roads"]:
        ring = lonlat_to_xy(np.asarray(f["ring"], dtype=float), lon0, lat0)
        for w in f.get("osm_way_ids") or []:
            g_by_way[w].append(ring)

    deg = defaultdict(int)
    for r in roads:
        deg[r["src_i"]] += 1
        deg[r["dst_i"]] += 1

    rows = []
    for r in roads:
        center = _center(r["xy"])
        length = polyline_length(center)
        ways = r.get("osm_way_ids") or [r["way_id"]]
        rings = []
        for w in set(ways):
            rings.extend(g_by_way.get(w, []))
        if not rings:
            continue
        # the golden feature for THIS piece is the one containing the
        # midpoint of our trimmed center
        mid_d = (float(r.get("trim_start", 0.0))
                 + (length - float(r.get("trim_end", 0.0)))) / 2.0
        mid = interpolate_along(center, mid_d)
        owned = [g for g in rings if point_in_ring(mid, g)]
        probe = owned if owned else rings
        for is_src in (True, False):
            cl = center if is_src else center[::-1]
            i_id = r["src_i"] if is_src else r["dst_i"]
            ours = float(r["trim_start"] if is_src else r["trim_end"])
            best = None
            for ring in probe:
                g = golden_trim_along(cl, ring, min(length, 60.0))
                if g is not None and (best is None or g < best):
                    best = g
            if best is None:
                continue
            delta = ours - best
            if show_all or abs(delta) > 0.15:
                rows.append({
                    "area": area, "way_id": r["way_id"],
                    "seg_idx": r["seg_idx"], "end": "src" if is_src
                    else "dst", "deg": deg[i_id], "i_id": i_id,
                    "len": length, "width": r["total_width"],
                    "ours": ours, "golden": best, "delta": delta,
                    "matched": bool(owned)})
    return rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    for area in args:
        rows = fit_area(area, show_all)
        rows.sort(key=lambda r: -abs(r["delta"]))
        print(f"\n=== {area} — our pass-1 trim vs golden-pinned trim ===")
        print(f"{'way_id':>12} seg end deg {'len':>7} {'width':>6} "
              f"{'ours':>7} {'golden':>7} {'delta':>7}")
        for r in rows[:40]:
            print(f"{r['way_id']:>12} {r['seg_idx']:>3} {r['end']} "
                  f"{r['deg']:>3} {r['len']:>7.2f} {r['width']:>6.2f} "
                  f"{r['ours']:>7.2f} {r['golden']:>7.2f} "
                  f"{r['delta']:>+7.2f}")
        n_big = sum(1 for r in rows if abs(r["delta"]) > 0.15)
        print(f"[{area}] rows>|0.15m|: {n_big} / measured {len(rows)}")


if __name__ == "__main__":
    main()
