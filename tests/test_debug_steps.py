"""Stepwise transformation debugging (S11 debug layers): the Spark
run_transform_steps sink vs the sequential replay's gt twin — the
counterpart of the reference's apply_transformations_stepwise_debugging
(transform/mod.rs:94-109)."""
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2streets_spark.plans import registry
from osm2streets_spark.sources.fixtures import ensure_debug_steps_gt


def test_debug_steps_match_sequential_replay(spark, fixture_dir):
    gt_path = ensure_debug_steps_gt(fixture_dir)
    gt = pd.read_parquet(gt_path)
    got = (registry.queries()["s_debug_steps"](spark, fixture_dir)
           .toPandas())

    key = ["doc_id", "step_idx"]
    gt = gt.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)
    assert len(gt) == len(got) > 0
    for col in ("doc_id", "step_name", "n_roads", "n_intersections"):
        assert list(gt[col]) == list(got[col]), col

    # shape invariants mirroring the reference's stepwise contract:
    # every doc starts at "original", step names follow the standard
    # list, and sizes never grow across collapse passes
    for _, g in got.groupby("doc_id"):
        g = g.sort_values("step_idx")
        names = list(g["step_name"])
        assert names[0] == "original"
        assert names[-3:] == ["collapse short roads",
                              "collapse degenerate intersections",
                              "collapse short roads"]
        n_roads = list(g["n_roads"])
        assert all(a >= b for a, b in zip(n_roads, n_roads[1:]))
