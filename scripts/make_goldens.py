#!/usr/bin/env python
"""Write golden GeoJSON snapshots of the sf0.001 fixture networks —
the engine's analogue of the reference's committed geometry.json files
(tests/src/*/geometry.json, harness tests/src/lib.rs:17-90).

Goldens are validated by eye/tests once, then committed; the regression
test (tests/test_goldens.py) compares future runs feature-by-feature
with coordinate tolerance (SURVEY.md §5: byte-exactness is replaced by
ε-tolerance because numpy vs Rust-geom differ in low-order bits).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import ensure_fixtures
from osm2streets_spark.plans.pipeline import flagship_query

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def main() -> None:
    spark = get_spark("goldens", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    fix = ensure_fixtures("sf0.001")
    feats = flagship_query(spark, fix).collect()
    by_doc: dict[str, list] = {}
    for r in feats:
        by_doc.setdefault(r.doc_id, []).append({
            "feature_type": r.feature_type,
            "feature_id": r.feature_id,
            "feature": json.loads(r.feature_json),
            "tile": [r.tile_z, r.tile_x, r.tile_y],
        })
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for doc_id, items in sorted(by_doc.items()):
        items.sort(key=lambda x: (x["feature_type"], x["feature_id"]))
        name = doc_id.replace(":", "_")
        with open(os.path.join(GOLDEN_DIR, f"{name}.json"), "w") as f:
            json.dump(items, f, indent=1, sort_keys=True)
    print(f"wrote {len(by_doc)} golden files to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
