#!/usr/bin/env python
"""Physical-plan audit: .explain("formatted") for the key operators,
checking the properties that matter at 100 TB:

* parquet scans show PushedFilters / pruned ReadSchema
* relational stages sit inside WholeStageCodegen spans
* joins pick broadcast for small dims, hash/SMJ for big equi-joins
* no unexpected extra Exchanges

Writes PLANS.md with the formatted plans + audit notes.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2streets_spark.session import get_spark
from osm2streets_spark.sources.fixtures import ensure_fixtures
from osm2streets_spark.plans import registry


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("explain-audit", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_fixtures("sf0.01")
    sf_dir = "/root/testdata/sf0.01"
    q = registry.queries()

    audit = [
        ("sn_way_filter",
         "Filter must reach the scan of the parsed frame; tags_json "
         "predicates are json_tuple-style gets (no Python)."),
        ("sn_intersections",
         "J1 = two-level hash aggregation over the window; expect "
         "partial aggregation before the exchange."),
        ("sn_roads",
         "W1 windows + final hash agg; one exchange per window key "
         "change only."),
        ("sim_ann_topk",
         "Expect BroadcastHashJoin (query side broadcast) + "
         "WindowExec top-k."),
        ("dd_exact",
         "Pure hash aggregate with partial_count before the exchange."),
        ("ev_window",
         "date_trunc group-by: partial agg + single exchange; "
         "PushedFilters/ReadSchema pruning on the parquet scan."),
    ]

    out = ["# PLANS — physical-plan audit (explain formatted)\n"]
    for name, note in audit:
        df = q[name](spark, sf_dir)
        plan = formatted(df)
        out.append(f"## {name}\n\n_Audit: {note}_\n\n```\n{plan}\n```\n")
        checks = []
        if "ReadSchema" in plan:
            checks.append("column pruning visible (ReadSchema)")
        if "PushedFilters" in plan:
            checks.append("filter pushdown visible")
        if "WholeStageCodegen" in plan:
            checks.append("whole-stage codegen spans present")
        if "BroadcastHashJoin" in plan:
            checks.append("broadcast join chosen")
        out.append("Observed: " + "; ".join(checks) + "\n")
    # flagship: the one query whose physical plan actually matters.
    # PLANS.md gets the executed-plan TREE (no per-op detail blocks) for
    # each returned stage plus shape counts; tests/test_plan_shape.py
    # pins the same counts as regression ceilings.
    from osm2streets_spark.plans.pipeline import (
        load_documents, build_street_network,
    )
    spark.catalog.clearCache()
    net = build_street_network(
        spark, load_documents(spark, ensure_fixtures("sf0.001")))
    out.append("## q_street_pipeline (flagship)\n\n"
               "_Audit: single cached parse; J1/W1 as window+agg; T6 as "
               "one exchange + sorted streaming mapInPandas; trims "
               "pivoted before join-back; lazy localCheckpoints at "
               "silver boundaries. No CartesianProduct / "
               "BroadcastNestedLoopJoin anywhere; exchange and "
               "checkpoint-boundary counts pinned by "
               "tests/test_plan_shape.py._\n")
    summary = ["| stage | Exchange nodes | checkpoint scans | cartesian/BNLJ |",
               "|---|---|---|---|"]
    plans = {}
    for name in ["features", "roads", "trims", "intersections"]:
        p = net[name]._jdf.queryExecution().executedPlan().toString()
        plans[name] = p
        bad = ("CartesianProduct" in p) or ("BroadcastNestedLoopJoin" in p)
        summary.append(f"| {name} | {p.count('Exchange')} | "
                       f"{p.count('Scan ExistingRDD')} | "
                       f"{'PRESENT' if bad else 'none'} |")
    out.append("\n".join(summary) + "\n")
    out.append("### features — executed plan tree\n\n```\n"
               + plans["features"] + "```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
