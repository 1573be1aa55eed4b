"""The last named reference binding APIs, re-expressed as DataFrame
functions (reference osm2streets-py/src/lib.rs:196-314):

* way_to_xml (lib.rs:290-314) — XML string per way, pure Catalyst;
* get_osm_tags_for_way (lib.rs:229-236) — tags lookup, pure Catalyst;
* get_geometry_for_way (lib.rs:250-288) — raw way buffered to
  1.5x road width + direction chevrons every ~50 m;
* debug_movements_from_lane_geojson (lib.rs:196-203 →
  render/mod.rs:179-273) — movement arrows leaving one road/lane;
* debug_roads_connected_to_intersection_geojson (lib.rs:210-221) —
  each incident road's center line buffered by its total width.

The reference computes these on demand for ONE id; the DataFrame
analogue computes the table for ALL ids (scans stay distributed,
filters push down) and the per-id accessor is a `.where`. Semantics
reproduced (cited), algorithms re-derived — no reference code copied.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..geom.core import (
    cumulative_lengths, interpolate_along, polyline_length,
    thicken_polyline, xy_to_lonlat,
)

# ---------------------------------------------------------------------------
# way_to_xml (lib.rs:290-314)
# ---------------------------------------------------------------------------


def way_xml(ways: DataFrame) -> DataFrame:
    """One XML string per way, mirroring way_to_xml BYTE-FOR-BYTE —
    including the reference's raw-string quirk: the ``<nd>``/``<tag>``
    lines are formatted with Rust raw strings (lib.rs:299,302), so the
    two characters ``\\n`` are emitted LITERALLY (no newline); only the
    ``>`` after the way id is followed by a real newline (lib.rs:297).
    Tags iterate in BTreeMap (sorted-key) order. The fixture parse
    carries no ``version`` attribute, so the optional version clause
    (lib.rs:294-296) never fires here.

    Pure Catalyst: string concat over the node_ids array and the
    sorted tag entries — no UDF, no shuffle."""
    nd = F.array_join(
        F.transform(
            "node_ids",
            lambda n: F.concat(F.lit('  <nd ref="'), n.cast("string"),
                               F.lit('"/>\\n'))),
        "")
    tags = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(
                F.from_json("tags_json", "map<string,string>"))),
            lambda e: F.concat(F.lit('  <tag k="'), e["key"],
                               F.lit('" v="'), e["value"],
                               F.lit('"/>\\n'))),
        "")
    return ways.select(
        "doc_id", "way_id",
        F.concat(F.lit('<way id="'), F.col("way_id").cast("string"),
                 F.lit('">\n'), nd, tags, F.lit("</way>")).alias("xml"))


def osm_tags_for_way(ways: DataFrame) -> DataFrame:
    """get_osm_tags_for_way (lib.rs:229-236): the way's OSM tags as a
    JSON string (ours is compact sorted-key JSON where the reference
    pretty-prints; same content). Unknown ids simply yield no row —
    the DataFrame analogue of the PyValueError."""
    return ways.select("doc_id", "way_id", "tags_json")


# ---------------------------------------------------------------------------
# get_geometry_for_way (lib.rs:250-288)
# ---------------------------------------------------------------------------

_FEATURE = StructType([StructField("feature_json", StringType())])


def _rot(v: np.ndarray, deg: float) -> np.ndarray:
    rad = np.deg2rad(deg)
    c, s = np.cos(rad), np.sin(rad)
    return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1]])


def _dir_at_dist(pl: np.ndarray, dist: float) -> np.ndarray:
    """Unit direction of the segment containing ``dist`` along pl."""
    cum = cumulative_lengths(pl)
    i = int(np.searchsorted(cum[1:], dist, side="left"))
    i = min(i, len(pl) - 2)
    seg = pl[i + 1] - pl[i]
    n = float(np.hypot(*seg))
    return seg / n if n > 0 else np.array([1.0, 0.0])


def _chevrons(pl: np.ndarray, width: float) -> list[np.ndarray]:
    """Direction chevrons (lib.rs:263-281): max(1, floor(len/50)) of
    them at fractions i/(n+1) along the way; each is the polyline
    [tip + (w/2 at +135 deg), tip, tip + (w/2 at -135 deg)] buffered to
    0.2*width."""
    total = polyline_length(pl)
    n = max(1, int(total / 50.0))
    out = []
    for i in range(1, n + 1):
        d = (i / (n + 1.0)) * total
        tip = interpolate_along(pl, d)
        heading = _dir_at_dist(pl, d)
        arm_a = tip + _rot(heading, 135.0) * (width / 2.0)
        arm_b = tip + _rot(heading, -135.0) * (width / 2.0)
        out.append(thicken_polyline(
            np.array([arm_a, tip, arm_b]), width * 0.2))
    return out


def _polygon_feature(ring: np.ndarray, lo: float, la: float,
                     props: dict) -> dict:
    ll = xy_to_lonlat(np.asarray(ring, dtype=float), lo, la)
    coords = [[round(float(x), 9), round(float(y), 9)] for x, y in ll]
    return {"type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [coords]},
            "properties": props}


def way_geometry(ways: DataFrame, nodes: DataFrame, roads: DataFrame,
                 anchors: DataFrame) -> DataFrame:
    """get_geometry_for_way (lib.rs:250-288): the RAW way polyline
    (streets_reader ways — pre-split, pre-trim) buffered to 1.5x the
    road's total width, plus direction chevrons. → (doc_id, way_id,
    feature_json) where feature_json is a FeatureCollection: body
    polygon first, then the chevrons.

    DIVERGENCE (documented): the reference SUBTRACTS each chevron from
    the body polygon (lib.rs:281-283, a full polygon-clipping pass);
    we emit body + chevrons as separate features — the same debug
    visual (chevrons drawn over the body) without a polygon boolean
    kernel. Width comes from the minimum-road_id road derived from the
    way (reference: first road in BTreeMap order, lib.rs:253-258);
    ways that produced no road carry no row, like the unwrap panic."""
    width_per_way = roads.select(
        F.col("doc_id"), F.element_at("osm_way_ids", 1).alias("way_id"),
        "road_id", "total_width",
    ).groupBy("doc_id", "way_id").agg(
        F.min_by("total_width", "road_id").alias("total_width"))

    pts = ways.select(
        "doc_id", "way_id", F.posexplode("node_ids").alias("pos", "node_id"),
    ).join(nodes.select("doc_id", "node_id", "lon", "lat"),
           ["doc_id", "node_id"])
    pts = pts.join(width_per_way, ["doc_id", "way_id"]) \
             .join(anchors.select("doc_id",
                                  F.col("min_lon").alias("lon0"),
                                  F.col("min_lat").alias("lat0")),
                   "doc_id")

    from ..geom.core import lonlat_to_xy

    def _build(batches):
        for pdf in batches:
            rows = []
            for (doc_id, way_id), g in pdf.groupby(["doc_id", "way_id"],
                                                   sort=True):
                g = g.sort_values("pos")
                lo, la = float(g["lon0"].iloc[0]), float(g["lat0"].iloc[0])
                w = float(g["total_width"].iloc[0])
                pl = lonlat_to_xy(
                    np.column_stack([g["lon"].to_numpy(),
                                     g["lat"].to_numpy()]), lo, la)
                if len(pl) < 2:
                    continue
                feats = [_polygon_feature(
                    thicken_polyline(pl, 1.5 * w), lo, la,
                    {"type": "way_body", "way_id": int(way_id)})]
                feats += [
                    _polygon_feature(c, lo, la,
                                     {"type": "chevron", "way_id":
                                      int(way_id), "idx": ci})
                    for ci, c in enumerate(_chevrons(pl, w))]
                rows.append((doc_id, int(way_id), json.dumps(
                    {"type": "FeatureCollection", "features": feats},
                    separators=(",", ":"))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "way_id", "feature_json"])

    schema = "doc_id string, way_id long, feature_json string"
    return pts.repartition("doc_id") \
              .sortWithinPartitions("doc_id", "way_id", "pos") \
              .mapInPandas(_build, schema=schema)


# ---------------------------------------------------------------------------
# movement arrows (render/mod.rs:179-273)
# ---------------------------------------------------------------------------


def _arrow_ring(a: np.ndarray, b: np.ndarray, thickness: float = 0.5
                ) -> np.ndarray | None:
    """Straight arrow a→b, triangle cap at b (make_arrow semantics
    re-derived: shaft ``thickness`` wide, head 2x as wide and 2x
    ``thickness`` long)."""
    v = b - a
    length = float(np.hypot(*v))
    if length < 1e-9:
        return None
    d = v / length
    n = np.array([d[1], -d[0]])  # right-hand normal
    head_len = min(2.0 * thickness, 0.5 * length)
    base = b - d * head_len
    t2, h2 = thickness / 2.0, thickness
    ring = np.array([
        a + n * t2, base + n * t2, base + n * h2, b,
        base - n * h2, base - n * t2, a - n * t2, a + n * t2,
    ])
    return ring


def movement_arrows(roads_final: DataFrame, ints_final: DataFrame,
                    anchors: DataFrame,
                    driving_side: str = "right") -> DataFrame:
    """One arrow polygon per movement per intersection
    (render/mod.rs:218-273): the arrow runs from where it LEAVES the
    source road to where it ENTERS the destination road — the at-
    junction endpoint of each road's first center-line segment, offset
    1.3 m to the appropriate side for bidirectional roads so opposing
    arrows don't overlap (mod.rs:226-259).

    → (doc_id, i_id, from_road, to_road, arrow_json)."""
    ends = roads_final.select(
        "doc_id", "road_id", "center_xy", "oneway_dir", "driveable",
        F.explode(F.array(
            F.struct(F.col("src_i").alias("i_id"),
                     F.lit(True).alias("is_src_end")),
            F.struct(F.col("dst_i").alias("i_id"),
                     F.lit(False).alias("is_src_end")),
        )).alias("_e"),
    ).select("doc_id", "road_id", "center_xy", "oneway_dir", "driveable",
             F.col("_e.i_id").alias("i_id"),
             F.col("_e.is_src_end").alias("is_src_end"))
    ends = ends.join(
        ints_final.where(F.col("movements_json").isNotNull()).select(
            "doc_id", "i_id", "movements_json"),
        ["doc_id", "i_id"]) \
        .join(anchors.select("doc_id", F.col("min_lon").alias("lon0"),
                             F.col("min_lat").alias("lat0")), "doc_id")

    off = -1.3 if driving_side == "right" else 1.3

    def _build(batches):
        for pdf in batches:
            rows = []
            for (doc_id, i_id), g in pdf.groupby(["doc_id", "i_id"],
                                                 sort=True):
                lo, la = float(g["lon0"].iloc[0]), float(g["lat0"].iloc[0])
                road_pts = {}
                for row in g.itertuples(index=False):
                    xy = np.asarray(row.center_xy,
                                    dtype=float).reshape(-1, 2)
                    if len(xy) < 2:
                        continue
                    # first center-line segment pointing AWAY from i
                    p0, p1 = ((xy[0], xy[1]) if row.is_src_end
                              else (xy[-1], xy[-2]))
                    seg = p1 - p0
                    sl = float(np.hypot(*seg))
                    if sl < 1e-9:
                        continue
                    d = seg / sl
                    n = np.array([d[1], -d[0]])
                    bidi = not (bool(row.driveable)
                                and row.oneway_dir in ("forward",
                                                       "backward"))
                    if bidi:
                        road_pts[int(row.road_id)] = (p0 + n * off,
                                                      p0 - n * off)
                    else:
                        road_pts[int(row.road_id)] = (p0, p0)
                movements = json.loads(g["movements_json"].iloc[0])
                for frm, to in movements:
                    if frm == to or frm not in road_pts \
                            or to not in road_pts:
                        continue
                    ring = _arrow_ring(road_pts[frm][0], road_pts[to][1])
                    if ring is None:
                        continue
                    feat = _polygon_feature(
                        ring, lo, la,
                        {"type": "movement", "from": frm, "to": to})
                    rows.append((doc_id, int(i_id), frm, to,
                                 json.dumps(feat, separators=(",", ":"))))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "i_id", "from_road", "to_road", "arrow_json"])

    schema = ("doc_id string, i_id long, from_road long, to_road long, "
              "arrow_json string")
    return ends.repartition("doc_id") \
               .sortWithinPartitions("doc_id", "i_id", "road_id") \
               .mapInPandas(_build, schema=schema)


def movements_from_lane(arrows: DataFrame, roads_final: DataFrame,
                        road_id: int, lane_index: int) -> DataFrame:
    """debug_movements_from_lane_geojson (render/mod.rs:179-194): pick
    the intersection the lane FEEDS (dst_i for a forward lane, src_i
    for a backward one — dir_chars '^'=forward) and keep the arrows
    leaving this road there."""
    tgt = roads_final.where(F.col("road_id") == road_id).select(
        "doc_id",
        F.when(F.substring("dir_chars", lane_index + 1, 1) == "^",
               F.col("dst_i")).otherwise(F.col("src_i")).alias("i_id"),
        F.col("road_id").alias("from_road"))
    return arrows.join(F.broadcast(tgt),
                       ["doc_id", "i_id", "from_road"])


# ---------------------------------------------------------------------------
# debug_roads_connected_to_intersection_geojson (lib.rs:210-221)
# ---------------------------------------------------------------------------


def roads_connected_to_intersections(roads_final: DataFrame,
                                     anchors: DataFrame) -> DataFrame:
    """Every (intersection, incident road) with the road's center line
    buffered by its total width (lib.rs:213-218: center_line
    .make_polygons(total_width) per road of the intersection). The
    per-id accessor is `.where(i_id = ...)`. Reuses the same
    thicken_polyline buffering as the S5 road render."""
    ends = roads_final.select(
        "doc_id", "road_id", "center_xy", "total_width",
        F.explode(F.array("src_i", "dst_i")).alias("i_id"),
    ).join(anchors.select("doc_id", F.col("min_lon").alias("lon0"),
                          F.col("min_lat").alias("lat0")), "doc_id")

    def _build(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                xy = np.asarray(row.center_xy, dtype=float).reshape(-1, 2)
                if len(xy) < 2:
                    continue
                feat = _polygon_feature(
                    thicken_polyline(xy, float(row.total_width)),
                    float(row.lon0), float(row.lat0),
                    {"type": "road", "road_id": int(row.road_id)})
                rows.append((row.doc_id, int(row.i_id), int(row.road_id),
                             json.dumps(feat, separators=(",", ":"))))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "i_id", "road_id", "feature_json"])

    schema = "doc_id string, i_id long, road_id long, feature_json string"
    return ends.mapInPandas(_build, schema=schema)
