"""Split the flagship wall time into DAG-construction vs execution.

Construction = wall from load_documents() until the features DataFrame
object exists (driver-side Python + Catalyst analysis, fully serial).
Execution = first count() after that. Gotcha: a lazy localCheckpoint
pays its toRdd at call time (construction side) but its job at first
action (execution side).

Usage: PYTHONPATH=. python scripts/flagship_profile.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import fixture_dir_for
from osm2streets_spark.plans.pipeline import (
    build_street_network, load_documents,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    fix = fixture_dir_for(sf_dir)
    spark = get_spark("flagship-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warm JIT + python workers on the tiny corpus
    from osm2streets_spark.sources.fixtures import ensure_fixtures
    tiny = ensure_fixtures("sf0.001")
    net = build_street_network(spark, load_documents(spark, tiny))
    net["features"].count()

    for i in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        docs = load_documents(spark, fix)
        net = build_street_network(spark, docs)
        feats = net["features"].select(
            "doc_id", "feature_type", "feature_id", "feature_json",
            "tile_z", "tile_x", "tile_y", "quadkey")
        t1 = time.time()
        n = feats.count()
        t2 = time.time()
        print(f"run {i}: construct={t1 - t0:.2f}s execute={t2 - t1:.2f}s "
              f"total={t2 - t0:.2f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
