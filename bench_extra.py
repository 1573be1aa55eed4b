#!/usr/bin/env python
"""Round-8 measurement sidecar (bench.py is FROZEN for the driver).

Modes (first CLI arg):
  time   [queries...]        — per-query median-of-N wall (same protocol
                               as bench.py: warm-up + N timed, clearCache
                               + System.gc between runs, .count() sink)
  noop   [queries...]        — same but noop-sink (computes EVERY column;
                               guide §1.4) to decouple from count pruning
  ab     [queries...]        — interleaved A/B over conf variants taken
                               from SPARK_GRAFT_AB (json list of dicts of
                               runtime confs), per-query medians per
                               variant printed side by side
  plan   [queries...]        — write .explain("formatted") to
                               plans/r08/<q>_<suffix>.txt
                               (suffix from SPARK_GRAFT_PLAN_SUFFIX,
                               default "before")

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import ensure_fixtures
from osm2streets_spark.plans.pipeline import flagship_query
from osm2streets_spark.plans import registry

DEFAULT_QUERIES = ["q_street_pipeline", "dd_minhash_lsh", "sim_ann_topk",
                   "ta_quality", "ta_fingerprint", "ev_window", "dd_exact"]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    n_timed = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    spark = get_spark("osm2streets-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    fix = ensure_fixtures(os.path.basename(os.path.normpath(sf_dir)))

    q = registry.queries()
    q["q_street_pipeline"] = lambda s, d: flagship_query(spark, fix)

    def cold_start():
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    def sink_count(df):
        df.count()

    def sink_noop(df):
        df.write.format("noop").mode("overwrite").save()

    sink = sink_noop if mode == "noop" else sink_count

    def timed(name, variant_confs=None):
        spark.sparkContext.setJobDescription(f"r08:{name}")
        if variant_confs:
            for k, v in variant_confs.items():
                spark.conf.set(k, v)
        cold_start()
        fn = q[name]
        sink(fn(spark, sf_dir))            # warm-up
        runs = []
        for _ in range(n_timed):
            cold_start()
            t0 = time.time()
            sink(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        return runs

    if mode in ("time", "noop"):
        out = {}
        for name in names:
            runs = timed(name)
            out[name] = {"median": round(statistics.median(runs), 3),
                         "runs": runs}
            print(f"{name}: {out[name]}", flush=True)
        print(json.dumps({"mode": mode, "sf_dir": sf_dir, "cpus": cpus,
                          "loadavg": os.getloadavg()[0], "results": out}))
    elif mode == "ab":
        variants = json.loads(os.environ.get(
            "SPARK_GRAFT_AB",
            '[{"spark.sql.shuffle.partitions": "32"},'
            ' {"spark.sql.shuffle.partitions": "64"}]'))
        acc = {name: [[] for _ in variants] for name in names}
        rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
        for r in range(rounds):
            for vi, conf in enumerate(variants):
                for name in names:
                    runs = timed(name, conf)
                    acc[name][vi].extend(runs)
                    print(f"round {r} variant {vi} {conf}: {name} {runs}",
                          flush=True)
        print(json.dumps({
            "mode": "ab", "variants": variants,
            "medians": {name: [round(statistics.median(v), 3)
                               for v in acc[name]]
                        for name in names},
            "all": acc}))
    elif mode == "plan":
        suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
        os.makedirs("plans/r08", exist_ok=True)
        for name in names:
            df = q[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            path = f"plans/r08/{name}_{suffix}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
