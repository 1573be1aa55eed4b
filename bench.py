#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: wall seconds for the full street-network conversion of the
interleaved-documents corpus at the given scale (driver metric is
documents/sec — also reported as docs_per_sec). Plus per-query timings
for representative operators (dedup LSH, ANN top-k, text quality,
fingerprints, windowed events) on the driver's tables.

Measurement protocol (round 4): every query gets 1 warm-up run plus
N_TIMED timed runs with spark.catalog.clearCache() before each, and the
reported number is the MEDIAN. A single timed run on a shared box is
noise (round 3's driver artifact said 33.6 s for a query a quiet-box
rerun measured at 20.5 s); the median of three with the full run list
printed makes the artifact trustworthy in either direction. All per-run
times are emitted under "runs" so variance is visible.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     SPARK_GRAFT_BENCH_RUNS (default 3 timed runs per query).
"""

from __future__ import annotations

import json
import os
import statistics
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
    n_timed = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    fix = fixture_dir_for(sf_dir)
    n_docs = SF_DOCS.get(sf_name, 180)

    spark = get_spark("osm2streets-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM JIT + python worker pool on the smallest corpus so
    # the timed numbers measure the pipeline, not process spin-up
    from osm2streets_spark.sources.fixtures import ensure_fixtures
    flagship_query(spark, ensure_fixtures("sf0.001")).count()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    all_loads: dict[str, list[list[float]]] = {}

    def cpu_counters() -> tuple[float, float]:
        """(busy_jiffies, total_jiffies) across all cpus (/proc/stat);
        the delta over a run interval gives the box busy fraction
        DURING the run."""
        with open("/proc/stat") as f:
            parts = [float(x) for x in f.readline().split()[1:]]
        idle = parts[3] + (parts[4] if len(parts) > 4 else 0.0)
        total = sum(parts)
        return total - idle, total

    def cold_start():
        """clearCache drops cached relations but NOT localCheckpoint
        RDD blocks — those are freed by ContextCleaner only after the
        JVM GCs the dead plan references from the previous run. Force
        it, or a multi-run loop at a large corpus accumulates
        checkpoint blocks until the heap OOMs (observed at 9,600
        docs / 8 g heap)."""
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    def run(name, fn):
        # warm-up (untimed), then n_timed full executions from a cold cache
        cold_start()
        fn().count()
        runs, loads = [], []
        for _ in range(n_timed):
            cold_start()
            la0 = os.getloadavg()[0]
            b0, tot0 = cpu_counters()
            t0 = time.time()
            fn().count()
            dt = time.time() - t0
            b1, tot1 = cpu_counters()
            # box-load context per timed run (round-4 verdict #4): a
            # loaded driver box is identifiable from the artifact alone
            # — [loadavg before, loadavg after, box CPU busy fraction
            # during the run]
            runs.append(round(dt, 3))
            loads.append([round(la0, 2), round(os.getloadavg()[0], 2),
                          round((b1 - b0) / max(tot1 - tot0, 1.0), 4)])
        all_runs[name] = runs
        all_loads[name] = loads
        timings[name] = round(statistics.median(runs), 3)

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
        "runs": all_runs,
        "run_loads": all_loads,
        "protocol": f"1 warm-up + {n_timed} timed (clearCache each), median",
        "sf": sf_name,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / street_sec, 2) if street_sec else None,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
