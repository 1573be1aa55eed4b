"""S4: multipolygon relation assembly.

Reference streets_reader/src/osm_reader/multipolygon.rs:11-60+: glue a
relation's way members (roles outer/inner) end-to-end into closed
rings, then build polygons (outers with inner holes). Optional for the
road pipeline; used for boundaries/landuse.

Spark shape: explode members → join member ways' point lists → one
grouped pass per relation assembling rings (classic polygonize:
repeatedly append the way whose endpoint matches the open ring's end,
reversing as needed).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)


def assemble_rings(way_pts: list[tuple[list, str]]) -> dict:
    """way_pts: [(points [[lon,lat]...], role)] → {'outer': [rings],
    'inner': [rings]}; unclosed chains are dropped (reference bails on
    broken multipolygons)."""
    out = {"outer": [], "inner": []}
    for role in ("outer", "inner"):
        segs = [list(map(tuple, pts)) for pts, r in way_pts if r == role]
        while segs:
            ring = segs.pop(0)
            progress = True
            while ring[0] != ring[-1] and progress:
                progress = False
                for i, s in enumerate(segs):
                    if s[0] == ring[-1]:
                        ring.extend(s[1:])
                    elif s[-1] == ring[-1]:
                        ring.extend(reversed(s[:-1]))
                    elif s[-1] == ring[0]:
                        ring[0:0] = s[:-1]
                    elif s[0] == ring[0]:
                        ring[0:0] = list(reversed(s[1:]))
                    else:
                        continue
                    segs.pop(i)
                    progress = True
                    break
            if ring[0] == ring[-1] and len(ring) >= 4:
                out[role].append([list(p) for p in ring])
    return out


MP_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("rel_id", LongType()),
    StructField("n_outer", LongType()),
    StructField("n_inner", LongType()),
    StructField("area_deg2", DoubleType()),
    StructField("geojson", StringType()),
])


def assemble_multipolygons(relations: DataFrame, ways: DataFrame,
                           nodes: DataFrame) -> DataFrame:
    """relations with type=multipolygon → one polygon feature per
    relation (rings assembled per assemble_rings)."""
    from .extract import tag

    mp = relations.where(tag("type") == "multipolygon")
    members = mp.select(
        "doc_id", "rel_id", F.posexplode("members").alias("m_idx", "mem")
    ).where(F.col("mem.type") == "way").select(
        "doc_id", "rel_id", "m_idx",
        F.col("mem.ref").alias("way_id"), F.col("mem.role").alias("role"))
    way_geoms = ways.select(
        "doc_id", "way_id", F.explode(F.arrays_zip(
            F.sequence(F.lit(0), F.size("node_ids") - 1).alias("pos"),
            F.col("node_ids").alias("node_id"))).alias("z")
    ).select("doc_id", "way_id", F.col("z.pos").alias("pos"),
             F.col("z.node_id").alias("node_id"))
    way_geoms = way_geoms.join(
        nodes.select("doc_id", "node_id", "lon", "lat"),
        ["doc_id", "node_id"])
    joined = members.join(way_geoms, ["doc_id", "way_id"])

    def _process(pdf):
        rows = []
        for (doc_id, rel_id), g in pdf.groupby(["doc_id", "rel_id"],
                                               sort=False):
            way_pts = []
            for (way_id, role), wg in sorted(
                    g.groupby(["way_id", "role"], sort=False),
                    key=lambda t: t[0][0]):
                wg = wg.sort_values("pos")
                pts = [[round(float(a), 9), round(float(b), 9)]
                       for a, b in zip(wg["lon"], wg["lat"])]
                way_pts.append((pts, role))
            rings = assemble_rings(way_pts)
            if not rings["outer"]:
                continue
            area = 0.0
            for ring in rings["outer"]:
                arr = np.asarray(ring)
                x, y = arr[:, 0], arr[:, 1]
                area += abs(0.5 * float(np.dot(x, np.roll(y, -1))
                                        - np.dot(y, np.roll(x, -1))))
            feat = {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon" if len(rings["outer"]) == 1
                    else "MultiPolygon",
                    "coordinates": (
                        [rings["outer"][0]] + rings["inner"]
                        if len(rings["outer"]) == 1
                        else [[o] for o in rings["outer"]]),
                },
                "properties": {"type": "multipolygon", "rel_id": int(rel_id)},
            }
            rows.append((doc_id, int(rel_id), len(rings["outer"]),
                         len(rings["inner"]), round(area, 12),
                         json.dumps(feat, separators=(",", ":"))))
        return pd.DataFrame(rows, columns=[f.name for f in MP_SCHEMA.fields])

    def batched(batches):
        from .geometry_update import stream_groups
        yield from stream_groups(batches, ["doc_id", "rel_id"], _process)

    spark = joined.sparkSession
    n = spark.sparkContext.defaultParallelism
    return joined.repartition(n, "doc_id", "rel_id") \
        .sortWithinPartitions("doc_id", "rel_id").mapInPandas(
        batched, MP_SCHEMA)
