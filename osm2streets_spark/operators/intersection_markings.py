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


@F.pandas_udf(ArrayType(StringType()))
def _crossing_markings(polygon_xy: pd.Series, crossing_kind: pd.Series,
                       lon0: pd.Series, lat0: pd.Series) -> pd.Series:
    out = []
    for raw, kind, lo, la in zip(polygon_xy, crossing_kind, lon0, lat0):
        feats: list[str] = []
        if raw is None or not isinstance(kind, str) or not kind:
            out.append(feats)
            continue
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
                        [round(float(x), 7), round(float(y), 7)]
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
                        [round(float(x), 7), round(float(y), 7)]
                        for x, y in ll]},
                    "properties": {"type": "crossing edge"},
                }, separators=(",", ":")))
        out.append(feats)
    return pd.Series(out)


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
