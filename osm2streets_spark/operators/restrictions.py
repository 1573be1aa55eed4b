"""J4: simple turn-restriction resolution.

Reference split_ways.rs:123-160: (from_way, via_node, to_way) resolves
to (from_road, to_road) at the via intersection; silently skipped when
either way was filtered out or doesn't touch the via node.

Spark expression: two hash joins — restriction×nodes (via coords →
i_id), then restriction×roads twice (from / to side), each constrained
to roads incident to the via intersection. All equi-joins on
(doc_id, key); the restrictions side is tiny → broadcast.

Via-way restrictions (J6, split_ways.rs:163-213) are resolved by
``resolve_via_way_restrictions`` below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

QUANTUM = 1e7


def resolve_restrictions(restrictions: DataFrame, nodes: DataFrame,
                         roads: DataFrame,
                         imerges: DataFrame | None = None) -> DataFrame:
    """→ (doc_id, i_id, restriction_type, from_road, to_road).

    Works pre- OR post-transform: when `roads` carries `osm_way_ids`
    (post-T2 splices), a road matches every constituent way; when
    `imerges` is given (post-T1 merges, columns doc_id / surviving_i /
    absorbed_i), a via node whose intersection was absorbed resolves to
    the surviving intersection."""
    r = restrictions.where(F.col("via_node").isNotNull())
    # broadcast the (sparse) restriction side: the nodes table is never
    # shuffled for the via lookup
    r = nodes.select(
        "doc_id", F.col("node_id").alias("via_node"),
        F.round(F.col("lon") * QUANTUM).cast("long").alias("qx"),
        F.round(F.col("lat") * QUANTUM).cast("long").alias("qy"),
    ).join(r, ["doc_id", "via_node"]) \
     .withColumn("i_id", F.xxhash64("doc_id", "qx", "qy"))
    if imerges is not None:
        r = r.join(
            imerges.withColumnRenamed("absorbed_i", "i_id"),
            ["doc_id", "i_id"], "left",
        ).withColumn(
            "i_id", F.coalesce("surviving_i", "i_id")
        ).drop("surviving_i")

    if "osm_way_ids" in roads.columns:
        incident = roads.select(
            "doc_id", "road_id",
            F.explode("osm_way_ids").alias("way_id"),
            F.array("src_i", "dst_i").alias("_is"),
        ).select("doc_id", "road_id", "way_id",
                 F.explode("_is").alias("i_id"))
    else:
        incident = roads.select(
            "doc_id", "road_id", "way_id",
            F.explode(F.array("src_i", "dst_i")).alias("i_id"),
        )
    frm = incident.select(
        "doc_id", "i_id", F.col("way_id").alias("from_way"),
        F.col("road_id").alias("from_road"))
    to = incident.select(
        "doc_id", "i_id", F.col("way_id").alias("to_way"),
        F.col("road_id").alias("to_road"))

    # restrictions are a sparse relation class: broadcast that side so
    # the exploded incident frame (corpus-sized) is never shuffled —
    # both joins run map-side over `incident`. (At 100 TB:
    # doc_id-bucketed co-partitioned join instead.)
    half = frm.join(r, ["doc_id", "i_id", "from_way"])
    out = (
        to.join(half, ["doc_id", "i_id", "to_way"])
        .select("doc_id", "i_id", "restriction_type", "from_road", "to_road")
        .dropDuplicates()
    )
    return out


def resolve_via_way_restrictions(restrictions: DataFrame,
                                 roads: DataFrame) -> DataFrame:
    """J6 (split_ways.rs:163-213): (from_way, via_way, to_way) resolves
    when exactly ONE road carries the via way; from/to roads must touch
    the via road's endpoints. → (doc_id, restriction_type, from_road,
    via_road, to_road) — the reference stores these as 'complicated'
    restrictions on the from-road (road.rs:58)."""
    r = restrictions.where(F.col("via_way").isNotNull())

    via_counts = roads.groupBy("doc_id", "way_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("road_id").alias("via_road"),
        F.min("src_i").alias("via_src"),
        F.min("dst_i").alias("via_dst"),
    ).where(F.col("n") == 1).drop("n")

    r = r.join(
        via_counts.withColumnRenamed("way_id", "via_way"),
        ["doc_id", "via_way"],
    )

    incident = roads.select(
        "doc_id", "road_id", "way_id",
        F.explode(F.array("src_i", "dst_i")).alias("i_id"),
    )
    frm = incident.select(
        "doc_id", F.col("way_id").alias("from_way"),
        F.col("road_id").alias("from_road"), F.col("i_id").alias("from_i"))
    to = incident.select(
        "doc_id", F.col("way_id").alias("to_way"),
        F.col("road_id").alias("to_road"), F.col("i_id").alias("to_i"))

    out = (
        r.join(frm, ["doc_id", "from_way"])
        .where((F.col("from_i") == F.col("via_src"))
               | (F.col("from_i") == F.col("via_dst")))
        .join(to, ["doc_id", "to_way"])
        .where(((F.col("to_i") == F.col("via_src"))
                | (F.col("to_i") == F.col("via_dst")))
               & (F.col("to_i") != F.col("from_i")))
        .select("doc_id", "restriction_type", "from_road", "via_road",
                "to_road")
        .dropDuplicates()
    )
    return out


def restrictions_by_intersection(resolved: DataFrame) -> DataFrame:
    """Aggregate to one JSON payload per intersection for the T6 kernel."""
    return resolved.groupBy("doc_id", "i_id").agg(
        F.to_json(
            F.collect_list(
                F.struct(
                    F.col("restriction_type").alias("rt"),
                    F.col("from_road").alias("frm"),
                    F.col("to_road").alias("to"),
                )
            )
        ).alias("restrictions_json")
    )
