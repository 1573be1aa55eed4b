"""Junction-level trim forensics for the waived parity areas.

For an area, runs the sequential replay with the pass-1 debug sink and
prints, for every road whose way id diverges from the golden (or for
explicitly given way ids), the annihilation inputs: geometry length,
trim at each end, the margin, and which engine collapsed it. The
golden's surviving/absent stub set pins the sign of the reference's
decision, so a row printed here with a small |margin| is a borderline
junction where our kernel and the Rust geom crate disagree.

Usage: PYTHONPATH=. python scripts/trim_forensics.py <area> [way_id ...]
"""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, ".")

from osm2streets_spark.config import MapConfig
from osm2streets_spark.plans.sequential import convert_document
from osm2streets_spark.sources.reference_fixtures import (
    area_document, area_driving_side, load_golden,
)


def forensics(area: str, way_ids: set[int] | None = None):
    doc = area_document(area)
    side = area_driving_side(area)
    cfg = MapConfig(driving_side=side, inferred_sidewalks=False,
                    remove_disconnected=False)
    sink: dict = {}
    roads, ints, *_ = convert_document(doc["doc_id"], doc["spans"], cfg,
                                       debug_sink=sink)

    golden = load_golden(area)
    golden_ways = defaultdict(int)
    for f in golden["roads"]:
        for w in f.get("osm_way_ids") or []:
            golden_ways[w] += 1
    our_ways = defaultdict(int)
    for r in roads:
        for w in r.get("osm_way_ids") or [r["way_id"]]:
            our_ways[w] += 1

    if way_ids is None:
        way_ids = {w for w in set(golden_ways) | set(our_ways)
                   if golden_ways[w] != our_ways[w]}

    print(f"=== {area} (driving {side}) — pass-1 annihilation forensics ===")
    print(f"{'way_id':>12} seg {'len_m':>8} {'t_src':>7} {'t_dst':>7} "
          f"{'margin':>8} ours golden#/ours#")
    for rec in sorted(sink["pass1"], key=lambda r: (r["way_id"],
                                                    r["seg_idx"])):
        w = rec["way_id"]
        if w not in way_ids:
            continue
        margin = rec["geom_length"] - rec["trim_start"] - rec["trim_end"]
        print(f"{w:>12} {rec['seg_idx']:>3} {rec['geom_length']:>8.3f} "
              f"{rec['trim_start']:>7.3f} {rec['trim_end']:>7.3f} "
              f"{margin:>8.3f} "
              f"{'COLLAPSE' if rec['too_short'] else 'keep    '} "
              f"{golden_ways[w]}/{our_ways[w]} {rec['highway_type']}")
    return sink, roads


if __name__ == "__main__":
    area = sys.argv[1]
    ways = {int(w) for w in sys.argv[2:]} or None
    forensics(area, ways)
