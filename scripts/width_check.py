"""Width forensics: for matched-but-not-exact road rings, compare the
GOLDEN-implied total width (ring area / PCA length — reliable on the
longest piece of a way, see FIXTURES_PARITY.md) against OUR computed
total width, and print the way's tags. A consistent ±2x delta across
rings sharing a tag pins a lane-width rule divergence; ~0 width delta
with an offset failure points at trim/corner arithmetic instead.

Pure Python (sequential replay), no Spark. Usage:
  PYTHONPATH=. python scripts/width_check.py <area> [--min-delta M]
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from osm2streets_spark.config import MapConfig
from osm2streets_spark.plans.parity import (
    _centroid, _features_to_lists, _ring_geom_exact,
)
from osm2streets_spark.plans.sequential import convert_document, feature_rows
from osm2streets_spark.sources.reference_fixtures import (
    area_document, area_driving_side, load_golden,
)
from osm2streets_spark.sources.osm_xml import _parse_one_doc
from scripts.exactness_forensics import match_pairs

M_PER_DEG = 111_194.92664455873


def _xy(ring):
    pts = np.asarray(ring, dtype=float)
    lat0 = pts[:, 1].mean()
    kx = M_PER_DEG * np.cos(np.radians(lat0))
    return np.column_stack([pts[:, 0] * kx, pts[:, 1] * M_PER_DEG])


def ring_width(ring):
    """area / PCA-length of the ring (total width estimate)."""
    xy = _xy(ring)
    if xy.shape[0] < 4:
        return None, 0.0
    x, y = xy[:, 0], xy[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    c = xy - xy.mean(axis=0)
    cov = c.T @ c / len(c)
    evals, evecs = np.linalg.eigh(cov)
    axis = evecs[:, -1]
    proj = c @ axis
    length = proj.max() - proj.min()
    if length < 1e-6:
        return None, 0.0
    return area / length, length


def run(area: str, min_delta: float = 0.02):
    doc = area_document(area)
    side = area_driving_side(area)
    cfg = MapConfig(driving_side=side, inferred_sidewalks=False,
                    remove_disconnected=False)
    roads, ints, *_ = convert_document(doc["doc_id"], doc["spans"], cfg)
    feats = feature_rows(doc["doc_id"], roads, ints)
    our_roads, our_ints = _features_to_lists(
        [f["feature_json"] for f in feats])
    golden = load_golden(area)
    for f in golden["roads"] + our_roads:
        f["_c"] = _centroid(f["ring"])

    # our computed width + tags per way id (widest surviving piece)
    width_by_way = {}
    for r in roads:
        for wid in r.get("osm_way_ids") or [r.get("way_id")]:
            w = r.get("total_width") or 0.0
            if w > width_by_way.get(wid, (0.0,))[0]:
                width_by_way[wid] = (w, r)
    tags_by_way = {}
    rows: list = []
    _parse_one_doc(doc["doc_id"], doc["spans"], rows)
    import json as _json
    for r in rows:
        if r[1] == "way":
            tags_by_way[r[2]] = _json.loads(r[7]) if r[7] else {}

    pairs = match_pairs(golden["roads"], our_roads)
    # keep only the LONGEST golden piece per way-id-set (width estimate
    # is unreliable on short pieces)
    best = {}
    for g, o in pairs:
        key = tuple(sorted(g.get("osm_way_ids") or []))
        gw, glen = ring_width(g["ring"])
        if gw is None:
            continue
        if key not in best or glen > best[key][2]:
            best[key] = (g, o, glen, gw)
    rows = []
    for key, (g, o, glen, gw) in best.items():
        if glen < 15.0:   # too short for a stable estimate
            continue
        ow, _ = ring_width(o["ring"])
        exact = _ring_geom_exact(g["ring"], o["ring"])
        wid = key[0] if key else None
        ours_decl = width_by_way.get(wid, (None,))[0]
        delta = (gw - ow) if ow else None
        if delta is None or abs(delta) < min_delta and exact:
            continue
        rows.append((abs(delta), delta, gw, ow, ours_decl, glen, exact, key))
    rows.sort(key=lambda r: -r[0])
    for ad, d, gw, ow, decl, glen, exact, key in rows[:40]:
        tags = tags_by_way.get(key[0] if key else -1, {})
        ts = " ".join(f"{k}={v}" for k, v in sorted(tags.items())
                      if k not in ("name",))[:110]
        print(f"  d={d:+7.3f}m golden={gw:6.3f} ours_ring={ow:6.3f} "
              f"decl={decl if decl is None else round(decl,3)} len={glen:5.0f} "
              f"{'EXACT' if exact else 'DIFF '} ways={list(key)[:3]} {ts}")


if __name__ == "__main__":
    areas = [a for a in sys.argv[1:] if not a.startswith("-")]
    md = 0.02
    if "--min-delta" in sys.argv:
        md = float(sys.argv[sys.argv.index("--min-delta") + 1])
    for a in areas:
        print(f"== {a}")
        run(a, md)
