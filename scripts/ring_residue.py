"""Per-failing-ring residue detail: for each matched-but-not-exact
intersection/road ring, print ids, vertex count, max/mean deviation and
the SHAPE of the deviation (uniform whole-ring shift vs a few bad
corners). Uniform small shifts point at a lane-width/offset rule; a
few bad vertices point at corner-collision arithmetic on one edge.

Pure Python (sequential replay), no Spark. Usage:
  PYTHONPATH=. python scripts/ring_residue.py <area> [--roads] [--max N]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from osm2streets_spark.config import MapConfig
from osm2streets_spark.plans.parity import (
    _centroid, _dist_m, _features_to_lists, _ring_geom_exact,
)
from osm2streets_spark.plans.sequential import convert_document, feature_rows
from osm2streets_spark.sources.reference_fixtures import (
    area_document, area_driving_side, load_golden,
)
from scripts.exactness_forensics import _canon, _vertex_devs, match_pairs


def run(area: str, kind: str = "int", max_rows: int = 40):
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
    g_feats, o_feats = ((golden["intersections"], our_ints)
                        if kind == "int" else (golden["roads"], our_roads))
    pairs = match_pairs(g_feats, o_feats)
    rows = []
    for g, o in pairs:
        if _ring_geom_exact(g["ring"], o["ring"]):
            continue
        a, b = _canon(g["ring"]), _canon(o["ring"])
        devs = _vertex_devs(g["ring"], o["ring"]) if len(a) == len(b) else None
        ids = (g.get("osm_node_ids") or g.get("osm_way_ids") or [])
        if devs is None:
            rows.append((float("inf"), ids, len(a), len(b), None))
            continue
        d = np.array(devs)
        rows.append((d.max(), ids, len(a), len(b), d))
    rows.sort(key=lambda r: r[0])
    for mx, ids, na, nb, d in rows[:max_rows]:
        if d is None:
            print(f"  {str(ids)[:40]:42s} count {na} vs {nb}")
            continue
        frac_bad = (d > 0.01).mean()
        mean = d.mean()
        shape = ("UNIFORM" if frac_bad > 0.8 and d.max() < 3 * max(mean, 1e-9)
                 else f"{int((d > 0.01).sum())}/{len(d)}v")
        print(f"  {str(ids)[:42]:44s} n={na:3d} max={mx:8.4f}m "
              f"mean={mean:7.4f}m bad={frac_bad:4.0%} {shape}")


if __name__ == "__main__":
    areas = [a for a in sys.argv[1:] if not a.startswith("-")]
    kind = "road" if "--roads" in sys.argv else "int"
    mx = 40
    if "--max" in sys.argv:
        mx = int(sys.argv[sys.argv.index("--max") + 1])
    for a in areas:
        print(f"== {a} [{kind}]")
        run(a, kind, mx)
