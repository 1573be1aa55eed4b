"""E1 edit API: overwrite a way's tags, delta-recompute one doc,
splice into the snapshot."""

import json

import pytest
from pyspark.sql import functions as F

from osm2streets_spark.plans.pipeline import load_documents, flagship_query
from osm2streets_spark.plans.edits import (
    overwrite_way_tags, recompute_doc_features, splice_features,
)

DOC = "t_junction:1"


def test_overwrite_and_delta_recompute(spark, fixture_dir):
    docs = load_documents(spark, fixture_dir)
    before = recompute_doc_features(spark, docs, DOC).collect()
    lanes_before = {
        r.feature_id: json.loads(r.feature_json)["properties"]["lanes_ltr"]
        for r in before if r.feature_type == "road"}

    # way 100 (Main St, secondary): bump to 4 lanes, no sidewalks
    edited = overwrite_way_tags(
        docs, DOC, 100,
        {"highway": "secondary", "name": "Main St", "lanes": "4",
         "sidewalk": "none"})
    after_rows = recompute_doc_features(spark, edited, DOC).collect()
    lanes_after = {
        r.feature_id: json.loads(r.feature_json)["properties"]["lanes_ltr"]
        for r in after_rows if r.feature_type == "road"}

    changed = {k for k in lanes_before
               if lanes_after.get(k) != lanes_before[k]}
    assert changed, "edited way's lane string must change"
    assert any(v == "dddd" for v in lanes_after.values())
    # untouched way 101 keeps its lanes
    same = [k for k in lanes_before if lanes_after.get(k) == lanes_before[k]]
    assert same

    # splice into the full snapshot: only this doc's rows replaced
    full = flagship_query(spark, fixture_dir)
    spliced = splice_features(full, recompute_doc_features(
        spark, edited, DOC), DOC)
    assert spliced.count() == full.where(F.col("doc_id") != DOC).count() \
        + len(after_rows)
