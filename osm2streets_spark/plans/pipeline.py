"""The end-to-end street-network pipeline (SURVEY.md §3.1 re-expressed).

documents ──parse──▶ nodes/ways/relations
  ─F2 filter─▶ ways ─K1 lanes─▶ way attrs
  ─J1 point agg─▶ intersections(v0)   ─W1 window split─▶ roads(v0)
  ─T6 pass 1 (trims only)─▶ too_short flags
  ─T4/T1/T2/T1 per-doc rewrite─▶ roads(v1)
  ─T6 pass 2─▶ trims + polygons + movements/kind
  ─K9 join-back─▶ roads(v2, trimmed center lines)
  ─S5 render─▶ features + tile assignment + span passthrough

The reference recomputes intersection geometry eagerly after every
mutation (lib.rs:99-121); we batch per pass — the final per-intersection
state is what snapshot parity checks (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import MapConfig, DEFAULT_CONFIG
from ..sources.osm_xml import parse_documents, split_entities, doc_bounds
from ..operators.extract import (
    filter_ways, node_features, restriction_relations, with_parsed_road_tags,
)
from ..operators.split_ways import build_network_v0
from ..operators.lanes_udf import with_lanes
from ..operators.restrictions import (
    resolve_restrictions, restrictions_by_intersection,
)
from ..operators.geometry_update import (
    with_projected_geometry, build_road_ends, run_t6, apply_trims,
    finalize_intersections,
)
from ..operators.transforms import run_transforms
from ..operators.render import render_roads, render_intersections
from ..operators.tiles import with_tile, quadkey


def load_documents(spark: SparkSession, fixture_dir: str) -> DataFrame:
    """Read + spread documents across the cluster. A fixture is one
    small parquet file (1 input split); the pipeline's cost is Python
    geometry CPU per doc, so parallelism must come from an explicit
    doc_id repartition, not input size. (At 100 TB the Iceberg table is
    bucketed by doc_id and this becomes a no-op read-time distribution.)"""
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet")
    n = spark.sparkContext.defaultParallelism * 2
    return docs.repartition(n, "doc_id")


def parse_stage(docs: DataFrame):
    parsed = parse_documents(docs)
    nodes, ways, relations = split_entities(parsed)
    return nodes, ways, relations


def graph_stage(nodes: DataFrame, ways: DataFrame, cfg: MapConfig = DEFAULT_CONFIG):
    """F2 + K1 + J1 + W1: filtered ways with lanes, split into the v0
    road/intersection graph."""
    fways = filter_ways(ways, cfg.inferred_sidewalks)
    fways = with_parsed_road_tags(fways)
    fways = with_lanes(fways, cfg.driving_side, cfg.inferred_sidewalks)
    roads_v0, ints_v0, flagged = build_network_v0(fways, nodes)
    way_attrs = fways.select(
        "doc_id", "way_id", "tags_json", "highway_type", "name", "layer",
        "speed_kph", "oneway", "internal_junction_road", "lane_specs_json",
        "lane_chars", "dir_chars", "total_width", "driveable", "oneway_dir",
        "placement_shift",
    )
    roads = roads_v0.join(way_attrs, ["doc_id", "way_id"])
    return roads, ints_v0, flagged


def build_street_network(spark: SparkSession, docs: DataFrame,
                         cfg: MapConfig = DEFAULT_CONFIG,
                         transforms: bool = True,
                         two_pass_t6: bool = True) -> dict:
    """Returns a dict of DataFrames: roads, intersections, road_features,
    intersection_features, features (union), output_documents (span
    passthrough)."""
    nodes, ways, relations = parse_stage(docs)
    # nodes feed bounds, way-points, features and restrictions — persist
    # so the XML parse (the one full-corpus Python pass) runs ONCE.
    # (On a real deployment this is the bronze parquet/Iceberg table.)
    nodes = nodes.persist()
    roads, ints_v0, _ = graph_stage(nodes, ways, cfg)

    anchors = doc_bounds(nodes)
    roads = with_projected_geometry(roads, anchors)
    roads = roads.withColumn("osm_way_ids", F.array("way_id")) \
                 .withColumn("too_short", F.lit(False))
    # roads feeds T6 pass 1 (×2 ends), restrictions resolution and the
    # transforms — persist to stop the split/lane chain recomputing per
    # consumer (this was the dominant cost before caching).
    roads = roads.persist()

    feats = node_features(nodes)
    restr = restriction_relations(relations)
    resolved = resolve_restrictions(restr, nodes, roads)

    # per-end metadata for the T6 terminus rule and the transform kernel
    # guards (terminus.rs:16-29 MapEdge extension,
    # collapse_short_road.rs:24-28 MapEdge, collapse_intersections.rs
    # :12-14 crossing, :41-47 restrictions)
    edge_flag = ints_v0.select(
        "doc_id", "i_id", (F.col("kind_hint") == "MapEdge").alias("_e"))
    crossing_flag = feats.where(F.col("feature") == "crossing").select(
        "doc_id", F.col("node_id").alias("osm_node_id"),
        F.lit(True).alias("_x"),
    ).join(ints_v0.select("doc_id", "i_id", "osm_node_id"),
           ["doc_id", "osm_node_id"]).select("doc_id", "i_id", "_x")
    for side, col in (("src", "src_i"), ("dst", "dst_i")):
        roads = roads.join(
            edge_flag.select("doc_id", F.col("i_id").alias(col),
                             F.col("_e").alias(f"{side}_is_edge")),
            ["doc_id", col], "left")
        roads = roads.join(
            crossing_flag.select("doc_id", F.col("i_id").alias(col),
                                 F.col("_x").alias(f"{side}_has_crossing")),
            ["doc_id", col], "left")
    roads = roads.persist()

    imerges = None
    if transforms:
        if two_pass_t6:
            # pass 1: trims only, to find trim-annihilated roads
            # (update_geometry.rs:58-63 → CollapseShortRoads candidates)
            # and to feed the trim_roads_for_merging memo — keep
            # trim_start/trim_end for the transform kernel
            ends1 = build_road_ends(roads, None, cfg.driving_side)
            trims1 = run_t6(ends1, trims_only=True)
            roads = apply_trims(roads, trims1).drop(
                "center_xy", "trimmed_length")
        restricted_roads = resolved.select(
            "doc_id", F.explode(F.array("from_road", "to_road"))
            .alias("road_id")).distinct() \
            .withColumn("has_restriction", F.lit(True))
        roads = roads.join(restricted_roads, ["doc_id", "road_id"], "left")

        tout = run_transforms(roads, cfg.zip_sidepaths,
                              cfg.remove_disconnected).persist()
        roads = tout.where(F.col("row_kind") == "road").drop("row_kind")
        imerges = tout.where(F.col("row_kind") == "imerge").select(
            "doc_id", F.col("src_i").alias("surviving_i"),
            F.col("dst_i").alias("absorbed_i"))

        # re-resolve turn restrictions AFTER the transforms: T2 splices
        # roads (from/to ids change), T1 merges intersections (via ids
        # change) — resolving against the pre-transform graph silently
        # drops them (round-1 VERDICT "What's wrong" #4)
        resolved = resolve_restrictions(restr, nodes, roads,
                                        imerges=imerges)
    restr_by_i = restrictions_by_intersection(resolved)
    ends = build_road_ends(roads, restr_by_i, cfg.driving_side)
    # pass-2 trims feed both the road rebuild and the intersections
    # table; roads_final feeds the render and the live-intersection
    # semi-join — persist both to keep every UDF stage single-execution
    trims = run_t6(ends).persist()
    roads_final = apply_trims(roads, trims).persist()

    # intersections surviving the transforms = endpoints of final roads
    live_is = roads_final.select(
        "doc_id", F.explode(F.array("src_i", "dst_i")).alias("i_id")
    ).distinct()
    ints = ints_v0.join(live_is, ["doc_id", "i_id"], "left_semi")
    ints = ints.join(
        anchors.select("doc_id", F.col("min_lon").alias("lon0"),
                       F.col("min_lat").alias("lat0")),
        "doc_id",
    )
    ints_final = finalize_intersections(ints, trims, feats,
                                        imerges=imerges, ints_v0=ints_v0)

    road_feats = render_roads(roads_final)
    int_feats = render_intersections(ints_final)
    features = road_feats.unionByName(int_feats)
    features = quadkey(with_tile(features, "c_lon", "c_lat", cfg.cell_zoom))

    # span passthrough (north_rule per-row invariant): the output document
    # table carries the input span sequence untouched
    out_docs = docs.select("doc_id", "spans")

    return {
        "nodes": nodes, "ways": ways, "relations": relations,
        "roads": roads_final, "intersections": ints_final,
        "features": features, "output_documents": out_docs,
        "trims": trims,
    }


def flagship_query(spark: SparkSession, fixture_dir: str) -> DataFrame:
    """The headline query: full network build, returning the rendered
    feature table (one row per road/intersection polygon with tile
    assignment)."""
    docs = load_documents(spark, fixture_dir)
    net = build_street_network(spark, docs)
    return net["features"].select(
        "doc_id", "feature_type", "feature_id", "feature_json",
        "tile_z", "tile_x", "tile_y", "quadkey",
    )
