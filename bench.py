#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: wall seconds for the full street-network conversion of the
interleaved-documents corpus at the given scale (driver metric is
documents/sec — also reported as docs_per_sec). Plus per-query timings
for representative operators (dedup LSH, ANN top-k, text quality,
fingerprints, windowed events) on the driver's tables.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import fixture_dir_for, SF_DOCS
from osm2streets_spark.plans.pipeline import flagship_query
from osm2streets_spark.plans import registry


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    fix = fixture_dir_for(sf_dir)
    n_docs = SF_DOCS.get(sf_name, 180)

    spark = get_spark("osm2streets-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM JIT + python worker pool on the smallest corpus so
    # the timed numbers measure the pipeline, not process spin-up; the
    # timed run below starts from a cleared cache (full execution)
    from osm2streets_spark.sources.fixtures import ensure_fixtures
    flagship_query(spark, ensure_fixtures("sf0.001")).count()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.time()
        n = fn().count()
        timings[name] = round(time.time() - t0, 3)
        return n

    # headline: full street-network conversion
    run("q_street_pipeline", lambda: flagship_query(spark, fix))

    q = registry.queries()
    for name in ["dd_minhash_lsh", "sim_ann_topk", "ta_quality",
                 "ta_fingerprint", "ev_window", "dd_exact"]:
        if name in q:
            run(name, lambda name=name: q[name](spark, sf_dir))

    street_sec = timings["q_street_pipeline"]
    out = {
        "metric": "street_network_conversion_wall_sec",
        "value": street_sec,
        "unit": "sec",
        "queries": timings,
        "sf": sf_name,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / street_sec, 2) if street_sec else None,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
