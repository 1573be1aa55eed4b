"""G1-G4: per-document graph algorithms.

Reference osm2streets/src/pathfinding.rs: Dijkstra distance (:14-27),
A* simple path with zero heuristic = Dijkstra (:31-69), r-hop BFS
(:72-93). Per-doc graphs are tiny, so these run inside one batched
mapInPandas per doc-partition (networkx), like the reference's petgraph
usage — the distribution axis is documents.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

DIST_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("src_i", LongType()),
    StructField("dst_i", LongType()),
    StructField("dist_m", DoubleType()),
])


def _doc_graph(pdf: pd.DataFrame):
    import networkx as nx

    g = nx.Graph()
    for row in pdf.itertuples(index=False):
        # oneway roads are still bidirectional for distance queries in
        # the reference default (pathfinding.rs:14-27 builds Undirected
        # unless oneway — we keep the undirected simplification and
        # document it). Parallel edges keep the MIN weight so the graph
        # is deterministic regardless of row arrival order.
        a, b, w = int(row.src_i), int(row.dst_i), float(row.length_m)
        if g.has_edge(a, b):
            w = min(w, g[a][b]["weight"])
        g.add_edge(a, b, weight=w)
    return g


def shortest_dists_from_hubs(roads: DataFrame, max_hubs: int = 2) -> DataFrame:
    """G1: single-source Dijkstra from the first max_hubs intersections
    (by id) of each doc to every reachable intersection."""
    src = roads.select("doc_id", "src_i", "dst_i", "length_m")
    spark = roads.sparkSession
    n = spark.sparkContext.defaultParallelism * 2

    def _process(pdf):
        import networkx as nx

        rows = []
        for doc_id, g_pdf in pdf.groupby("doc_id", sort=False):
            g = _doc_graph(g_pdf)
            hubs = sorted(g.nodes())[:max_hubs]
            for hub in hubs:
                # distance only — the reference's path_dist_to returns a
                # Distance (pathfinding.rs:14-27); hop counts are
                # tie-unstable across equal-length paths
                dist = nx.single_source_dijkstra_path_length(g, hub)
                for node, d in dist.items():
                    rows.append((doc_id, hub, int(node),
                                 round(float(d), 3)))
        return pd.DataFrame(rows, columns=[f.name for f in DIST_SCHEMA.fields])

    def batched(batches):
        from .geometry_update import stream_groups
        yield from stream_groups(batches, ["doc_id"], _process)

    # sorted doc groups + streaming bounds per-task memory to one Arrow
    # batch + one doc instead of the whole shuffled partition
    return src.repartition(n, "doc_id").sortWithinPartitions("doc_id") \
        .mapInPandas(batched, DIST_SCHEMA)


def r_hop_neighborhood(roads: DataFrame, rounds: int = 3) -> DataFrame:
    """G3 find_nearby_roads (pathfinding.rs:72-93) expressed
    relationally: r iterated self-joins frontier⨝edges — the Spark-native
    BFS (bounded r, default 3 as at collapse_intersection.rs:21)."""
    edges = roads.select("doc_id", "src_i", "dst_i").distinct()
    back = edges.select("doc_id", F.col("dst_i").alias("src_i"),
                        F.col("src_i").alias("dst_i"))
    undirected = edges.unionByName(back).distinct()

    # seed: minimum intersection id per doc
    seed = undirected.groupBy("doc_id").agg(F.min("src_i").alias("i_id")) \
        .withColumn("hop", F.lit(0))
    frontier = seed
    visited = seed
    for r in range(1, rounds + 1):
        nxt = (
            frontier.join(
                undirected,
                (frontier.doc_id == undirected.doc_id)
                & (frontier.i_id == undirected.src_i))
            .select(undirected.doc_id, F.col("dst_i").alias("i_id"))
            .distinct()
            .withColumn("hop", F.lit(r))
        )
        nxt = nxt.join(visited.select("doc_id", "i_id"),
                       ["doc_id", "i_id"], "left_anti") \
                 .withColumn("hop", F.lit(r))
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


PATH_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("profile", StringType()),
    StructField("from_i", LongType()),
    StructField("to_i", LongType()),
    StructField("dist_m", DoubleType()),
    StructField("n_roads", LongType()),
    StructField("way_path", StringType()),
])

# lane-char sets for simple_path profiles (reference simple_path takes
# a &[LaneType]; chars per lanes/inference.TO_CHAR)
PROFILES = {
    "drive": set("dB"),
    "foot": set("sfF"),
    "bike": set("bF"),
}


def simple_paths(roads: DataFrame,
                 profiles: dict[str, set] | None = None) -> DataFrame:
    """G2 simple_path (pathfinding.rs:31-69): A* (zero heuristic ⇒
    Dijkstra) over a DIRECTED graph that only includes a road direction
    when one of the requested lane types travels that way — a
    footway-only profile routes through footways a driving profile
    cannot use. One deterministic (min-id → max-id) path per doc per
    profile; way_path records the way ids crossed."""
    profiles = profiles or PROFILES
    src = roads.select("doc_id", "way_id", "src_i", "dst_i", "length_m",
                       "lane_chars", "dir_chars")
    spark = roads.sparkSession
    n = spark.sparkContext.defaultParallelism * 2

    def _process(pdf):
        import networkx as nx

        rows = []
        for doc_id, g_pdf in pdf.groupby("doc_id", sort=False):
            for prof, lane_set in sorted(profiles.items()):
                g = nx.DiGraph()
                for row in g_pdf.itertuples(index=False):
                    fwd = back = False
                    for lt, d in zip(row.lane_chars or "",
                                     row.dir_chars or ""):
                        if lt in lane_set:
                            if d == "^":
                                fwd = True
                            else:
                                back = True
                    w = float(row.length_m)
                    if fwd:
                        g.add_edge(int(row.src_i), int(row.dst_i),
                                   weight=w, way=int(row.way_id))
                    if back:
                        g.add_edge(int(row.dst_i), int(row.src_i),
                                   weight=w, way=int(row.way_id))
                if not g.nodes:
                    continue
                frm, to = min(g.nodes), max(g.nodes)
                try:
                    # astar with h=0 ≡ dijkstra (the reference's zero
                    # heuristic, pathfinding.rs:62)
                    path = nx.astar_path(g, frm, to, heuristic=None,
                                         weight="weight")
                except (nx.NetworkXNoPath, nx.NodeNotFound):
                    continue
                dist = sum(g[a][b]["weight"]
                           for a, b in zip(path, path[1:]))
                ways = [str(g[a][b]["way"])
                        for a, b in zip(path, path[1:])]
                rows.append((doc_id, prof, frm, to, round(dist, 3),
                             len(ways), ",".join(ways)))
        return pd.DataFrame(
            rows, columns=[f.name for f in PATH_SCHEMA.fields])

    def batched(batches):
        from .geometry_update import stream_groups
        yield from stream_groups(batches, ["doc_id"], _process)

    return src.repartition(n, "doc_id").sortWithinPartitions("doc_id") \
        .mapInPandas(batched, PATH_SCHEMA)
