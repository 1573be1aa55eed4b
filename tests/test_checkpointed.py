"""Resumable checkpointed runs with per-partition lineage."""

import json
import os

from osm2streets_spark.plans.checkpointed import run_checkpointed


def test_checkpoint_and_resume(spark, fixture_dir, tmp_path):
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet").limit(8)
    out = str(tmp_path / "ckpt")

    m1 = run_checkpointed(spark, docs, out, fingerprint="fp1")
    assert set(m1) == {"roads", "intersections", "features"}
    assert all(m["rows"] > 0 for m in m1.values())
    # lineage recorded per partition
    lin = spark.read.parquet(m1["features"]["lineage_path"])
    assert lin.count() == m1["features"]["n_partitions"]
    assert {r.partition_id for r in lin.collect()} is not None

    # resume: same fingerprint → snapshots reused verbatim (no recompute)
    m2 = run_checkpointed(spark, docs, out, fingerprint="fp1")
    assert m2 == m1

    # snapshots are readable tables
    feats = spark.read.parquet(os.path.join(out, "features"))
    assert feats.count() == m1["features"]["rows"]
    row = feats.first()
    assert json.loads(row.feature_json)["type"] == "Feature"
