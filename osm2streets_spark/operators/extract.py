"""F1-F4 + F7/F8: projections, filters, tag parses — all plain Catalyst
expressions (predicate pushdown + whole-stage codegen; no Python).

Reference: streets_reader/src/extract.rs (way whitelist :106-129, node
features :42-71, restriction relations :154-205); maxspeed parse
osm2streets/src/road.rs:604-616; layer parse road.rs:111-122.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import HIGHWAY_WHITELIST, RAILWAY_WHITELIST


def tag(name: str) -> F.Column:
    """Extract one tag from the sorted-key tags_json column."""
    return F.get_json_object(F.col("tags_json"), f"$['{name}']")


def filter_ways(ways: DataFrame,
                inferred_sidewalks: bool = True) -> DataFrame:
    """F2 way filter (extract.rs:74-151): highway/railway whitelist,
    drop area=yes, construction without detail, golf cartpaths.
    Separately-mapped sidewalks/crossings (highway=footway +
    footway=sidewalk|crossing) are dropped ONLY when sidewalks are
    inferred onto roads (extract.rs:134-143); the reference's
    MapConfig::default() sets inferred_sidewalks=false and keeps them."""
    hw = tag("highway")
    rw = tag("railway")
    keep = (
        hw.isin(HIGHWAY_WHITELIST)
        | (rw.isin(RAILWAY_WHITELIST) & hw.isNull())
        | ((hw == "construction") & tag("construction").isNotNull())
    )
    keep = keep & (F.coalesce(tag("area"), F.lit("no")) != "yes")
    # NB: tag() is NULL when absent — comparisons must coalesce, or the
    # whole `keep` conjunction goes NULL and where() drops the row
    if inferred_sidewalks:
        keep = keep & ~(
            (F.coalesce(hw, F.lit("")) == "footway")
            & F.coalesce(tag("footway"), F.lit("")).isin(
                "sidewalk", "crossing")
        )
    keep = keep & ~((F.coalesce(hw, F.lit("")) == "service")
                    & (F.coalesce(tag("golf"), F.lit("")) == "cartpath"))
    keep = keep & (F.size("node_ids") >= 2)
    return ways.where(keep)


def node_features(nodes: DataFrame) -> DataFrame:
    """F1 (extract.rs:42-71): tagged nodes → traffic signals / crossings /
    cycleway ASLs, with kind columns for the snap join J3."""
    hw = tag("highway")
    feats = nodes.where(
        (hw == "traffic_signals") | (hw == "crossing") | (tag("cycleway") == "asl")
    )
    return feats.select(
        "doc_id", "node_id", "lon", "lat",
        F.when(hw == "traffic_signals", F.lit("traffic_signals"))
         .when(hw == "crossing", F.lit("crossing"))
         .otherwise(F.lit("asl")).alias("feature"),
        F.coalesce(tag("traffic_signals:direction"), F.lit("")).alias("signal_dir"),
        F.when(tag("crossing") == "traffic_signals", F.lit("Signalized"))
         .when(tag("crossing") == "unmarked", F.lit("Unmarked"))
         .when(hw == "crossing", F.lit("Marked"))
         .otherwise(F.lit("")).alias("crossing_kind"),
        (F.coalesce(tag("crossing:island"), F.lit("no")) == "yes").alias("crossing_island"),
    )


def restriction_relations(relations: DataFrame) -> DataFrame:
    """F3+F4 (extract.rs:154-205, lib.rs:210-225): type=restriction
    relations → (from_way, via_node|via_way, to_way, Ban|Only)."""
    r = relations.where(tag("type") == "restriction")
    r = r.where(tag("restriction").isNotNull())
    m = r.select(
        "doc_id", "rel_id", tag("restriction").alias("restriction"),
        F.explode("members").alias("mem"),
    )
    pivoted = m.groupBy("doc_id", "rel_id", "restriction").agg(
        F.max(F.when((F.col("mem.role") == "from") & (F.col("mem.type") == "way"),
                     F.col("mem.ref"))).alias("from_way"),
        F.max(F.when((F.col("mem.role") == "via") & (F.col("mem.type") == "node"),
                     F.col("mem.ref"))).alias("via_node"),
        F.max(F.when((F.col("mem.role") == "via") & (F.col("mem.type") == "way"),
                     F.col("mem.ref"))).alias("via_way"),
        F.max(F.when((F.col("mem.role") == "to") & (F.col("mem.type") == "way"),
                     F.col("mem.ref"))).alias("to_way"),
    )
    rt = (
        F.when(F.col("restriction").startswith("no_"), F.lit("Ban"))
        .when(F.col("restriction").startswith("only_"), F.lit("Only"))
        .otherwise(F.lit(None))
    )
    return (
        pivoted.withColumn("restriction_type", rt)
        .where(F.col("restriction_type").isNotNull())
        .where(F.col("from_way").isNotNull() & F.col("to_way").isNotNull())
    )


def with_parsed_road_tags(roads: DataFrame) -> DataFrame:
    """F7 maxspeed (road.rs:604-616: plain number = km/h, 'X mph' = mph),
    F8 layer (road.rs:111-122: parse int, drop halves, default 0), plus
    name/highway_type/oneway/junction projections."""
    ms = tag("maxspeed")
    num = F.regexp_extract(ms, r"^(\d+(?:\.\d+)?)(?:\s*(mph))?$", 1)
    unit = F.regexp_extract(ms, r"^(\d+(?:\.\d+)?)(?:\s*(mph))?$", 2)
    speed_kph = F.when(
        num != "", F.when(unit == "mph", num.cast("double") * 1.609344)
                    .otherwise(num.cast("double"))
    )
    layer = F.coalesce(
        F.regexp_extract(tag("layer"), r"^(-?\d+)", 1).cast("int"), F.lit(0)
    )
    hw = tag("highway")
    rw = tag("railway")
    return roads.select(
        "*",
        F.coalesce(hw, rw).alias("highway_type"),
        tag("name").alias("name"),
        F.round(speed_kph, 3).alias("speed_kph"),
        layer.alias("layer"),
        (F.coalesce(tag("oneway"), F.lit("")) == "yes").alias("oneway"),
        (F.coalesce(tag("junction"), F.lit("")) == "intersection")
        .alias("internal_junction_road"),
    )
