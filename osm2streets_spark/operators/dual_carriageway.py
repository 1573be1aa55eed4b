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


def trace_dual_carriageway_sides(roads: DataFrame) -> DataFrame:
    """A7 (dual_carriageways.rs:166-198 trace, :263-281 side lengths):
    between a pair of DC endpoints of one street name, the two oneway
    chains are the carriageway sides; walk each following its oneway
    direction and sum untrimmed lengths. Per-doc kernel (the walk is a
    sequential graph traversal, like the reference)."""
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    SIDE_SCHEMA = StructType([
        StructField("doc_id", StringType()),
        StructField("name", StringType()),
        StructField("side_idx", LongType()),
        StructField("n_segments", LongType()),
        StructField("length_m", DoubleType()),
    ])

    src = roads.select("doc_id", "road_id", "src_i", "dst_i", "name",
                       "oneway", "length_m")

    def batched(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        rows = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            by_name = {}
            bidi_nodes = {}
            for r in g.sort_values("road_id").itertuples(index=False):
                if not r.name:
                    continue
                if r.oneway:
                    by_name.setdefault(r.name, []).append(r)
                else:
                    bidi_nodes.setdefault(r.name, set()).update(
                        (r.src_i, r.dst_i))
            for name, edges in sorted(by_name.items()):
                if len(edges) < 2:
                    continue
                # DC endpoints: where the same-name bidirectional road
                # attaches (dual_carriageways.rs:38-98), plus any
                # degree-imbalance start of the oneway subgraph
                out_deg, in_deg = {}, {}
                for e in edges:
                    out_deg[e.src_i] = out_deg.get(e.src_i, 0) + 1
                    in_deg[e.dst_i] = in_deg.get(e.dst_i, 0) + 1
                starts = {n for n in out_deg
                          if out_deg.get(n, 0) > in_deg.get(n, 0)}
                starts |= {n for n in bidi_nodes.get(name, set())
                           if n in out_deg}
                start_set = set(starts)
                starts = sorted(starts)
                used = set()
                side = 0
                for start in starts:
                    # walk forward along the oneway direction, stopping
                    # at the next DC endpoint (each side traced
                    # separately, dual_carriageways.rs:166-198)
                    chain, total, node = [], 0.0, start
                    while True:
                        nxt = next(
                            (e for e in edges if e.src_i == node
                             and e.road_id not in used), None)
                        if nxt is None:
                            break
                        used.add(nxt.road_id)
                        chain.append(nxt)
                        total += float(nxt.length_m or 0.0)
                        node = nxt.dst_i
                        if node in start_set:
                            break
                    if chain:
                        rows.append((doc_id, name, side, len(chain),
                                     round(total, 3)))
                        side += 1
        yield pd.DataFrame(rows, columns=[f.name for f in SIDE_SCHEMA.fields])

    spark = src.sparkSession
    n = spark.sparkContext.defaultParallelism
    return src.repartition(n, "doc_id").mapInPandas(batched, SIDE_SCHEMA)


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
