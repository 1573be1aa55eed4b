"""Classify WHY matched intersection/road rings fail the 1 cm
byte-exactness check (int_geom_exact in FIXTURES_PARITY.json).

For each matched golden/ours pair that is NOT ring-exact, bucket it:
  * count:   vertex counts differ (before any cleanup)
  * count-collinear: counts differ, but equal after dropping exact
    duplicates + collinear vertices (< 1 cm deviation) on BOTH rings —
    i.e. same shape, different vertex emission
  * offset:  same count, some vertex further than 1 cm — prints the
    max/median vertex deviation so the error magnitude is visible

Pure Python (sequential replay), no Spark. Usage:
  PYTHONPATH=. python scripts/exactness_forensics.py <area> [area ...]
"""

from __future__ import annotations

import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, ".")

from osm2streets_spark.config import MapConfig
from osm2streets_spark.plans.parity import (
    _centroid, _dist_m, _features_to_lists, _greedy_match,
    _ring_geom_exact,
)
from osm2streets_spark.plans.sequential import convert_document, feature_rows
from osm2streets_spark.sources.reference_fixtures import (
    area_document, area_driving_side, load_golden,
)


def _canon(ring):
    pts = [tuple(p) for p in ring]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if not pts:
        return pts
    k = min(range(len(pts)), key=lambda i: pts[i])
    return pts[k:] + pts[:k]


def _drop_collinear(ring, tol_m=0.01):
    """Drop exact-duplicate and near-collinear vertices (deviation from
    the chord < tol_m)."""
    pts = _canon(ring)
    if len(pts) < 4:
        return pts
    lat0 = pts[0][1]
    kx = 111_194.92664455873 * np.cos(np.radians(lat0))
    ky = 111_194.92664455873
    xy = np.array([(p[0] * kx, p[1] * ky) for p in pts])
    keep = []
    n = len(xy)
    for i in range(n):
        a, b, c = xy[(i - 1) % n], xy[i], xy[(i + 1) % n]
        ab = c - a
        L = np.hypot(*ab)
        if L < 1e-9:
            dev = np.hypot(*(b - a))
        else:
            dev = abs(ab[0] * (b[1] - a[1]) - ab[1] * (b[0] - a[0])) / L
        if dev > tol_m:
            keep.append(i)
    return [pts[i] for i in keep]


def _vertex_devs(g_ring, o_ring):
    """Best-alignment per-vertex deviations (same count only)."""
    a = _canon(g_ring)
    best = None
    for cand in (o_ring, list(reversed(o_ring))):
        b = _canon(cand)
        if len(a) != len(b) or not a:
            continue
        devs = [_dist_m(p, q) for p, q in zip(a, b)]
        if best is None or max(devs) < max(best):
            best = devs
    return best


def match_pairs(golden, our_ints):
    g_by_key, g_rest = defaultdict(list), []
    for g in golden:
        ids = frozenset(g.get("osm_node_ids") or [])
        (g_by_key[ids] if ids else g_rest).append(g)
    pairs, o_rest = [], []
    for o in our_ints:
        ids = frozenset(o.get("osm_node_ids") or [])
        if ids and g_by_key.get(ids):
            pairs.append((g_by_key[ids].pop(0), o))
        else:
            o_rest.append(o)
    for lst in g_by_key.values():
        g_rest.extend(lst)
    pairs += [(g, o) for g, o, _ in _greedy_match(g_rest, o_rest, 15.0)]
    return pairs


def run(area: str, verbose: bool = False):
    doc = area_document(area)
    side = area_driving_side(area)
    cfg = MapConfig(driving_side=side, inferred_sidewalks=False,
                    remove_disconnected=False)
    roads, ints, *_ = convert_document(doc["doc_id"], doc["spans"], cfg)
    feats = feature_rows(doc["doc_id"], roads, ints)
    our_roads, our_ints = _features_to_lists(
        [f["feature_json"] for f in feats])
    golden = load_golden(area)
    for f in (golden["roads"] + golden["intersections"]
              + our_roads + our_ints):
        f["_c"] = _centroid(f["ring"])

    for kind, g_feats, o_feats in (
            ("int", golden["intersections"], our_ints),
            ("road", golden["roads"], our_roads)):
        pairs = match_pairs(g_feats, o_feats)
        buckets = Counter()
        offs = []
        details = []
        for g, o in pairs:
            if _ring_geom_exact(g["ring"], o["ring"]):
                buckets["exact"] += 1
                continue
            a, b = _canon(g["ring"]), _canon(o["ring"])
            if len(a) != len(b):
                ca, cb = _drop_collinear(g["ring"]), _drop_collinear(o["ring"])
                if len(ca) == len(cb):
                    devs = _vertex_devs([list(p) for p in ca] + [list(ca[0])],
                                        [list(p) for p in cb] + [list(cb[0])])
                    if devs and max(devs) <= 0.01:
                        buckets["count-collinear-exact"] += 1
                    else:
                        buckets["count-collinear-offset"] += 1
                        if devs:
                            offs.append(max(devs))
                else:
                    buckets["count"] += 1
                    details.append((kind, g.get("osm_node_ids") or
                                    g.get("osm_way_ids"), len(a), len(b),
                                    len(ca), len(cb)))
            else:
                devs = _vertex_devs(g["ring"], o["ring"])
                buckets["offset"] += 1
                offs.append(max(devs))
        print(f"{area} [{kind}] matched={len(pairs)} {dict(buckets)}")
        if offs:
            offs = np.array(offs)
            print(f"  offset max-dev: median={np.median(offs):.4f}m "
                  f"p90={np.percentile(offs, 90):.4f}m max={offs.max():.4f}m"
                  f"  <2cm={int((offs <= 0.02).sum())} "
                  f"<5cm={int((offs <= 0.05).sum())}/{len(offs)}")
        if verbose:
            for d in details[:15]:
                print("  count-mismatch", d)


if __name__ == "__main__":
    areas = [a for a in sys.argv[1:] if not a.startswith("-")]
    for a in areas:
        run(a, verbose="-v" in sys.argv)
