"""S8: intersection markings — crossing outlines and sidewalk corners.

Reference osm2streets/src/render/intersection_markings.rs:10-39
(zebra / unmarked crossing outlines across the junction) and
make_sidewalk_corners (:43+). Arrow-batched pandas UDF over the
finalized intersections table; pure per-row geometry.

Round-1 scope: crossing outlines (zebra bars for Marked/Signalized, edge
dashes for Unmarked) across the intersection polygon's minor axis;
sidewalk corner filling is approximated by the polygon ring itself
(divergence noted in STATUS.md).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from ..geom.core import ring_centroid, xy_to_lonlat

ZEBRA_BAR_WIDTH = 0.5
ZEBRA_GAP = 0.5


def crossing_markings_row(raw, kind, lo, la) -> list[str]:
    """S8 per-junction kernel — pure, shared by the Spark UDF and the
    sequential replay."""
    if True:
        feats: list[str] = []
        if raw is None or not isinstance(kind, str) or not kind:
            return feats
        ring = np.asarray(raw, dtype=float).reshape(-1, 2)
        c = ring_centroid(ring)
        # principal axis of the junction polygon via covariance
        pts = ring[:-1] - c
        cov = pts.T @ pts
        evals, evecs = np.linalg.eigh(cov)
        major = evecs[:, int(np.argmax(evals))]
        minor = np.array([-major[1], major[0]])
        half_len = float(np.abs(pts @ major).max())
        half_w = float(np.abs(pts @ minor).max())
        style = {"Marked": "zebra", "Signalized": "zebra",
                 "Unmarked": "edge"}.get(kind, "edge")
        if style == "zebra":
            step = ZEBRA_BAR_WIDTH + ZEBRA_GAP
            d = -half_len + step
            while d < half_len - step / 2:
                p0 = c + major * d - minor * half_w
                p1 = c + major * d + minor * half_w
                ll = xy_to_lonlat(np.array([p0, p1]), lo, la)
                feats.append(json.dumps({
                    "type": "Feature",
                    "geometry": {"type": "LineString", "coordinates": [
                        [round(float(x), 9), round(float(y), 9)]
                        for x, y in ll]},
                    "properties": {"type": "zebra bar"},
                }, separators=(",", ":")))
                d += step
        else:
            for sgn in (-1.0, 1.0):
                p0 = c - major * half_len + minor * half_w * sgn
                p1 = c + major * half_len + minor * half_w * sgn
                ll = xy_to_lonlat(np.array([p0, p1]), lo, la)
                feats.append(json.dumps({
                    "type": "Feature",
                    "geometry": {"type": "LineString", "coordinates": [
                        [round(float(x), 9), round(float(y), 9)]
                        for x, y in ll]},
                    "properties": {"type": "crossing edge"},
                }, separators=(",", ":")))
        return feats


@F.pandas_udf(ArrayType(StringType()))
def _crossing_markings(polygon_xy: pd.Series, crossing_kind: pd.Series,
                       lon0: pd.Series, lat0: pd.Series) -> pd.Series:
    return pd.Series([
        crossing_markings_row(raw, kind, lo, la)
        for raw, kind, lo, la in zip(polygon_xy, crossing_kind,
                                     lon0, lat0)
    ])


def render_intersection_markings(ints: DataFrame) -> DataFrame:
    src = ints.where(F.col("polygon_xy").isNotNull()
                     & F.col("crossing_kind").isNotNull())
    out = src.withColumn(
        "_m", _crossing_markings("polygon_xy", "crossing_kind",
                                 "lon0", "lat0"))
    return out.select(
        "doc_id", "i_id",
        F.posexplode("_m").alias("marking_idx", "feature_json"),
    )


CORNER_SCHEMA = "doc_id string, i_id long, marking_idx int, " \
    "feature_json string"


def render_sidewalk_corners(roads_final: DataFrame,
                            ints: DataFrame) -> DataFrame:
    """S8 sidewalk corners (make_sidewalk_corners,
    render/intersection_markings.rs:43-135): per junction, corner
    polygons where two sidewalk-edged roads meet. Same per-junction
    mapInPandas shape as run_t6 — fine-grained group key, Arrow
    batched, in-batch groupby."""
    both = F.array(
        F.struct(F.col("src_i").alias("i_id"), F.lit(True).alias("is_src_end")),
        F.struct(F.col("dst_i").alias("i_id"), F.lit(False).alias("is_src_end")),
    )
    ends = roads_final.select(
        "doc_id", "road_id", "center_xy", "total_width",
        "lane_specs_json", F.explode(both).alias("_e"),
    ).select(
        "doc_id", F.col("_e.i_id").alias("i_id"), "road_id",
        F.col("_e.is_src_end").alias("is_src_end"),
        "center_xy", "total_width", "lane_specs_json",
    )
    polys = ints.where(F.col("polygon_xy").isNotNull()).select(
        "doc_id", "i_id", "polygon_xy", "lon0", "lat0")
    src = ends.join(polys, ["doc_id", "i_id"])
    spark = src.sparkSession
    n = spark.sparkContext.defaultParallelism * 4

    def batched(batches):
        from ..geom.intersection_kernel import sidewalk_corners

        for pdf in batches:
            rows = []
            for (doc_id, i_id), g in pdf.groupby(["doc_id", "i_id"],
                                                 sort=False):
                ring = np.asarray(g["polygon_xy"].iloc[0],
                                  dtype=float).reshape(-1, 2)
                lo = float(g["lon0"].iloc[0])
                la = float(g["lat0"].iloc[0])
                ends_k = []
                for row in g.sort_values("road_id").itertuples(index=False):
                    xy = np.asarray(row.center_xy,
                                    dtype=float).reshape(-1, 2)
                    if len(xy) < 2:
                        continue
                    if not bool(row.is_src_end):
                        xy = xy[::-1]
                    ends_k.append({
                        "key": (int(row.road_id), bool(row.is_src_end)),
                        "road_id": int(row.road_id),
                        "is_src_end": bool(row.is_src_end),
                        "xy": xy,
                        "width": float(row.total_width),
                        "specs": json.loads(row.lane_specs_json),
                    })
                if len(ends_k) < 2:
                    continue
                for idx, ring_out in enumerate(
                        sidewalk_corners(ends_k, ring)):
                    ll = xy_to_lonlat(ring_out, lo, la)
                    feat = json.dumps({
                        "type": "Feature",
                        "geometry": {"type": "Polygon", "coordinates": [[
                            [round(float(x), 9), round(float(y), 9)]
                            for x, y in ll]]},
                        "properties": {"type": "sidewalk corner"},
                    }, separators=(",", ":"))
                    rows.append((doc_id, int(i_id), idx, feat))
            yield pd.DataFrame(
                rows, columns=["doc_id", "i_id", "marking_idx",
                               "feature_json"])

    return src.repartition(n, "doc_id", "i_id").mapInPandas(
        batched, schema=CORNER_SCHEMA)
