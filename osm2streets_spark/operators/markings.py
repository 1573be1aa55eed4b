"""S7: lane-marking render — dashed lane separators, stop lines, lane
arrows, buffer stripes.

Reference osm2streets/src/render/lane_markings.rs:12-270: dashed white
lines between same-direction lanes, solid center line between opposing
directions, arrows every 20 m (with 5 m end buffer, render/output.rs:
264-273), perpendicular stop lines. Pure per-road geometry → one
Arrow-batched pandas UDF pass; dash generation = stepping along the
separator polyline (W4 step_along).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from ..geom.core import (
    shift_polyline, step_along, slice_between, polyline_length,
    cumulative_lengths, xy_to_lonlat,
)

DASH_LEN = 1.0       # reference lane_markings.rs dashed pattern
DASH_GAP = 1.5
ARROW_STEP = 20.0
ARROW_BUFFER = 5.0


def _linestring_feature(pl, lon0, lat0, props):
    ll = xy_to_lonlat(pl, lon0, lat0)
    coords = [[round(float(x), 7), round(float(y), 7)] for x, y in ll]
    return json.dumps({
        "type": "Feature",
        "geometry": {"type": "LineString", "coordinates": coords},
        "properties": props,
    }, separators=(",", ":"))


def _point_feature(pt, lon0, lat0, props):
    ll = xy_to_lonlat(pt[None, :], lon0, lat0)[0]
    return json.dumps({
        "type": "Feature",
        "geometry": {"type": "Point",
                     "coordinates": [round(float(ll[0]), 7),
                                     round(float(ll[1]), 7)]},
        "properties": props,
    }, separators=(",", ":"))


@F.pandas_udf(ArrayType(StringType()))
def _lane_markings(center_xy: pd.Series, total_width: pd.Series,
                   lane_specs_json: pd.Series, lon0: pd.Series,
                   lat0: pd.Series) -> pd.Series:
    out = []
    for raw, tw, lj, lo, la in zip(center_xy, total_width, lane_specs_json,
                                   lon0, lat0):
        pl = np.asarray(raw, dtype=float).reshape(-1, 2)
        specs = json.loads(lj)
        feats = []
        if polyline_length(pl) < 1e-6 or len(specs) < 1:
            out.append(feats)
            continue
        # separators between adjacent lanes (W2 adjacent-pair iteration)
        acc = 0.0
        for i in range(len(specs) - 1):
            acc += float(specs[i]["width"])
            a, b = specs[i], specs[i + 1]
            offset = acc - float(tw) / 2.0
            sep = shift_polyline(pl, offset)
            both_travel = (a["lt"] in ("driving", "bus", "biking")
                           and b["lt"] in ("driving", "bus", "biking"))
            if not both_travel:
                continue
            if a["dir"] != b["dir"]:
                # solid center line between opposing flows
                feats.append(_linestring_feature(
                    sep, lo, la, {"type": "center line", "style": "solid"}))
            else:
                # dashed separator: step along, emit dashes
                total = polyline_length(sep)
                d = 0.0
                while d + DASH_LEN <= total:
                    feats.append(_linestring_feature(
                        slice_between(sep, d, d + DASH_LEN), lo, la,
                        {"type": "lane separator", "style": "dashed"}))
                    d += DASH_LEN + DASH_GAP
        # lane arrows every 20 m in each travel lane (W4 step sampling)
        acc = 0.0
        for s in specs:
            w = float(s["width"])
            offset = acc + w / 2.0 - float(tw) / 2.0
            acc += w
            if s["lt"] not in ("driving", "bus", "biking"):
                continue
            lane_c = shift_polyline(pl, offset)
            for pt in step_along(lane_c, ARROW_STEP, ARROW_BUFFER):
                feats.append(_point_feature(
                    pt, lo, la, {"type": "lane arrow", "dir": s["dir"],
                                 "lane": s["lt"]}))
        out.append(feats)
    return pd.Series(out)


@F.pandas_udf(StringType())
def _stop_line_feature(center_xy: pd.Series, total_width: pd.Series,
                       pct_along: pd.Series, lon0: pd.Series,
                       lat0: pd.Series) -> pd.Series:
    """Perpendicular stop line across the roadway at the snapped
    position (render/lane_markings.rs draw_stop_lines :192, perp_line
    :390)."""
    from ..geom.core import cumulative_lengths, interpolate_along

    out = []
    for raw, tw, pct, lo, la in zip(center_xy, total_width, pct_along,
                                    lon0, lat0):
        pl = np.asarray(raw, dtype=float).reshape(-1, 2)
        total = polyline_length(pl)
        d = max(0.0, min(float(pct), 1.0)) * total
        pt = interpolate_along(pl, d)
        cl = cumulative_lengths(pl)
        i = min(int(np.searchsorted(cl, max(d, 1e-9))), len(pl) - 1)
        t = pl[i] - pl[i - 1] if i > 0 else pl[1] - pl[0]
        n = np.hypot(t[0], t[1]) or 1.0
        perp = np.array([t[1], -t[0]]) / n
        half = float(tw) / 2.0
        seg = np.array([pt + perp * half, pt - perp * half])
        out.append(_linestring_feature(seg, lo, la,
                                       {"type": "stop line"}))
    return pd.Series(out)


def render_stop_lines(stop_lines: DataFrame, roads: DataFrame) -> DataFrame:
    """stop_lines: output of features.road_stop_lines (road_id,
    pct_along, feature kind); joined to road geometry → one LineString
    feature per signal/crossing position."""
    j = stop_lines.join(
        roads.select("doc_id", "road_id", "center_xy", "total_width",
                     "lon0", "lat0"),
        ["doc_id", "road_id"])
    return j.select(
        "doc_id", "road_id", "node_id", "feature",
        _stop_line_feature("center_xy", "total_width", "pct_along",
                           "lon0", "lat0").alias("feature_json"),
    )


def render_lane_markings(roads: DataFrame) -> DataFrame:
    out = roads.withColumn(
        "_m", _lane_markings("center_xy", "total_width", "lane_specs_json",
                             "lon0", "lat0"))
    return out.select(
        "doc_id", "road_id",
        F.posexplode("_m").alias("marking_idx", "feature_json"),
    )
