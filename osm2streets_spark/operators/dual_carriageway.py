"""T5/J12: dual-carriageway endpoint detection.

Reference transform/dual_carriageways.rs:38-98: an intersection is a DC
endpoint when its incident roads of one name are exactly {2 oneways +
1 bidirectional}. The reference's merge() is detection/debug only — it
emits labels and breaks after the first candidate (dual_carriageways.rs:
7-26) — so, like the reference, we detect and do not merge.

Unlike the reference's per-intersection loop this is a single groupBy:
incident road-ends × (name, oneway) → counts → filter. Fully
SQL-expressible → DuckDB oracle twin in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def detect_dual_carriageway_endpoints(roads: DataFrame) -> DataFrame:
    """roads needs: doc_id, src_qx/qy, dst_qx/qy, name, oneway (bool).
    → (doc_id, qx, qy, name, n_oneway, n_bidi)."""
    src = roads.select(
        "doc_id", F.col("src_qx").alias("qx"), F.col("src_qy").alias("qy"),
        "name", "oneway")
    dst = roads.select(
        "doc_id", F.col("dst_qx").alias("qx"), F.col("dst_qy").alias("qy"),
        "name", "oneway")
    ends = src.unionAll(dst)
    g = ends.where(F.col("name").isNotNull() & (F.col("name") != "")) \
        .groupBy("doc_id", "qx", "qy", "name").agg(
            F.sum(F.col("oneway").cast("int")).alias("n_oneway"),
            F.sum((~F.col("oneway")).cast("int")).alias("n_bidi"),
        )
    return g.where((F.col("n_oneway") == 2) & (F.col("n_bidi") == 1))
