"""Per-area parity diagnosis: unmatched features and property
mismatches with OSM ids, for burning down gate failures.

Usage: PYTHONPATH=. python scripts/parity_diff.py <area> [area ...]
"""

import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")

from osm2streets_spark.session import get_spark
from osm2streets_spark.config import MapConfig
from osm2streets_spark.plans.parity import (
    _centroid, _dist_m, _greedy_match, _features_to_lists,
)
from osm2streets_spark.sources.reference_fixtures import (
    area_driving_side, load_golden, reference_documents,
)
from osm2streets_spark.plans.pipeline import build_street_network


def diff_area(spark, area):
    docs = reference_documents(spark, [area]).repartition(8, "doc_id")
    side = area_driving_side(area)
    net = build_street_network(
        spark, docs, cfg=MapConfig(driving_side=side,
                                   inferred_sidewalks=False,
                                   remove_disconnected=False))
    rows = [r["feature_json"] for r in
            net["features"].select("feature_json").collect()]
    our_roads, our_ints = _features_to_lists(rows)
    golden = load_golden(area)
    for f in golden["roads"] + golden["intersections"] \
            + our_roads + our_ints:
        f["_c"] = _centroid(f["ring"])

    print(f"\n=== {area} (driving {side}) ===")

    # ---- intersections ----
    g_by_key, g_rest = defaultdict(list), []
    for g in golden["intersections"]:
        ids = frozenset(g.get("osm_node_ids") or [])
        (g_by_key[ids] if ids else g_rest).append(g)
    pairs, o_rest = [], []
    for o in our_ints:
        ids = frozenset(o.get("osm_node_ids") or [])
        if ids and g_by_key.get(ids):
            pairs.append((g_by_key[ids].pop(0), o, 0.0))
        else:
            o_rest.append(o)
    for lst in g_by_key.values():
        g_rest.extend(lst)
    loc = _greedy_match(g_rest, o_rest, 15.0)
    pairs += loc
    used_g = {id(g) for g, _, _ in pairs}
    used_o = {id(o) for _, o, _ in pairs}
    for g in golden["intersections"]:
        if id(g) not in used_g:
            print(f"  INT only-golden nodes={g.get('osm_node_ids')} "
                  f"kind={g.get('intersection_kind')} "
                  f"ctrl={g.get('control')} at {g['_c']}")
    for o in our_ints:
        if id(o) not in used_o:
            print(f"  INT only-ours   nodes={o.get('osm_node_ids')} "
                  f"kind={o.get('intersection_kind')} "
                  f"ctrl={o.get('control')} at {o['_c']}")
    for g, o, d in pairs:
        gk, ok = g.get("intersection_kind"), o.get("intersection_kind")
        gc, oc = g.get("control"), o.get("control")
        if gk != ok or gc != oc:
            print(f"  INT mismatch nodes={g.get('osm_node_ids')}"
                  f"/{o.get('osm_node_ids')} kind {gk}->{ok} "
                  f"ctrl {gc}->{oc}")

    # ---- roads ----
    g_key, g_rest = defaultdict(list), []
    for g in golden["roads"]:
        g_key[tuple(sorted(g.get("osm_way_ids") or []))].append(g)
    rp, o_rest = [], []
    for o in our_roads:
        key = tuple(sorted(o.get("osm_way_ids") or []))
        cands = g_key.get(key)
        if cands:
            best = min(range(len(cands)),
                       key=lambda i: _dist_m(cands[i]["_c"], o["_c"]))
            rp.append((cands.pop(best), o))
        else:
            o_rest.append(o)
    for lst in g_key.values():
        g_rest.extend(lst)
    loc = _greedy_match(g_rest, o_rest, 10.0)
    rp += [(g, o) for g, o, _ in loc]
    used_g = {id(g) for g, _ in rp}
    used_o = {id(o) for _, o in rp}
    for g in golden["roads"]:
        if id(g) not in used_g:
            print(f"  ROAD only-golden ways={g.get('osm_way_ids')} "
                  f"at {g['_c']}")
    for o in our_roads:
        if id(o) not in used_o:
            print(f"  ROAD only-ours   ways={o.get('osm_way_ids')} "
                  f"at {o['_c']}")


def main():
    spark = get_spark(cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    for a in sys.argv[1:]:
        diff_area(spark, a)


if __name__ == "__main__":
    main()
