"""Stage-timeline audit of one flagship build: where does wall time go?

Runs the flagship once at sf0.1, then reads the Spark REST API stage
list and prints each stage's [submission, completion] interval plus the
DRIVER GAPS — wall intervals covered by no running stage. Gaps are the
serial driver-side cost (Catalyst analysis, toRdd, py4j round-trips);
stage-covered time is distributed execution.

Usage: PYTHONPATH=. python scripts/stage_timeline.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import (
    ensure_fixtures, fixture_dir_for,
)
from osm2streets_spark.plans.pipeline import (
    build_street_network, load_documents,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import os
    os.environ["SPARK_GRAFT_UI"] = "1"  # read by session.py (added r7)
    spark = get_spark("stage-timeline")
    spark.sparkContext.setLogLevel("ERROR")

    tiny = ensure_fixtures("sf0.001")
    build_street_network(spark, load_documents(spark, tiny))[
        "features"].count()
    spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}

    t0 = time.time()
    docs = load_documents(spark, fixture_dir_for(sf_dir))
    net = build_street_network(spark, docs)
    net["features"].count()
    t1 = time.time()
    print(f"wall: {t1 - t0:.2f}s")

    import datetime as dt

    def ts(s):
        return dt.datetime.strptime(
            s, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp()

    rows = []
    for s in stages():
        if s["stageId"] in seen or s["status"] != "COMPLETE":
            continue
        sub, comp = ts(s["submissionTime"]), ts(s["completionTime"])
        rows.append((sub, comp, s["stageId"], s["numTasks"], s["name"]))
    rows.sort()
    base = rows[0][0]
    covered = 0.0
    gaps = []
    cursor = rows[0][0]
    for sub, comp, sid, nt, name in rows:
        if sub > cursor:
            gaps.append((cursor - base, sub - base, sub - cursor))
        cursor = max(cursor, comp)
    total_span = cursor - base
    byid = {s["stageId"]: s for s in stages()}
    for sub, comp, sid, nt, name in rows:
        s = byid[sid]
        run = s.get("executorRunTime", 0) / 1e3
        cpu = s.get("executorCpuTime", 0) / 1e9
        ser = (s.get("executorDeserializeTime", 0)
               + s.get("resultSerializationTime", 0)) / 1e3
        gc = s.get("jvmGcTime", 0) / 1e3
        shr = (s.get("shuffleReadBytes", 0)
               + s.get("shuffleWriteBytes", 0)) / 1e6
        print(f"  stage {sid:4d} [{sub - base:6.2f},{comp - base:6.2f}] "
              f"{comp - sub:5.2f}s {nt:3d}t run={run:6.1f} cpu={cpu:6.1f} "
              f"ser={ser:4.1f} gc={gc:4.1f} shMB={shr:6.1f}")
    gap_total = sum(g[2] for g in gaps)
    print(f"stage span: {total_span:.2f}s  gap total: {gap_total:.2f}s "
          f"({len(gaps)} gaps)")
    for g0, g1, d in sorted(gaps, key=lambda g: -g[2])[:15]:
        print(f"  gap [{g0:6.2f},{g1:6.2f}] {d:5.2f}s")


if __name__ == "__main__":
    main()
