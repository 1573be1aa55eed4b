"""Sweep the ring adjacent-fold tolerance (RING_FOLD_EPS) and score
int ring-exactness per area — measures whether the reference's
Ring::deduping_new folds at ~1 cm (round-6 reading) or only at its
0.1 mm quantization grid (the leeds count-6-vs-5 family suggests the
latter: goldens KEEP vertices ~2-9 mm apart that our 1 cm fold drops).

Pure Python, no Spark. Usage:
  PYTHONPATH=. python scripts/fold_sweep.py <eps> [area ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import osm2streets_spark.geom.intersection_kernel as ik


def score(area: str):
    from osm2streets_spark.config import MapConfig
    from osm2streets_spark.plans.parity import (
        _centroid, _features_to_lists, _ring_geom_exact)
    from osm2streets_spark.plans.sequential import (
        convert_document, feature_rows)
    from osm2streets_spark.sources.reference_fixtures import (
        area_document, area_driving_side, load_golden)
    from scripts.exactness_forensics import match_pairs

    doc = area_document(area)
    cfg = MapConfig(driving_side=area_driving_side(area),
                    inferred_sidewalks=False, remove_disconnected=False)
    roads, ints, *_ = convert_document(doc["doc_id"], doc["spans"], cfg)
    feats = feature_rows(doc["doc_id"], roads, ints)
    our_roads, our_ints = _features_to_lists(
        [f["feature_json"] for f in feats])
    golden = load_golden(area)
    out = []
    for kind, g, o in (("int", golden["intersections"], our_ints),
                       ("road", golden["roads"], our_roads)):
        for f in g + o:
            f["_c"] = _centroid(f["ring"])
        pairs = match_pairs(g, o)
        ex = sum(_ring_geom_exact(a["ring"], b["ring"]) for a, b in pairs)
        out.append((ex, len(pairs)))
    return out


if __name__ == "__main__":
    eps = float(sys.argv[1])
    areas = sys.argv[2:] or ["leeds_cycleway", "st_georges_cycletrack",
                             "borough_sausage_links", "kingsway_junction",
                             "arizona_highways", "i5_exit_ramp"]
    ik.RING_FOLD_EPS = eps
    ti = tn = 0
    for a in areas:
        (ie, im), (re_, rm) = score(a)
        ti += ie
        tn += im
        print(f"  eps={eps}: {a:30s} int {ie}/{im} road {re_}/{rm}")
    print(f"eps={eps}: TOTAL int {ti}/{tn} = {ti / max(tn, 1) * 100:.2f}%")
