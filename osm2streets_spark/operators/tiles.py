"""Cell index + raster↔vector tile assignment.

The north_star calls for H3/S2-style cell encoding for partition-local
work and tile assignment of rendered output. Neither h3 nor s2 bindings
are available in this environment, so we use web-mercator slippy tiles
(quadkeys) — the same public hierarchical spatial index used by every
map tile stack. Same role: equal-area-ish buckets, parent/child
relations by bit-shift, deterministic from (lon, lat, zoom).

All of this is pure Catalyst arithmetic — no UDFs, fully codegen'd, and
identically expressible in ANSI SQL for the DuckDB oracle.

Adaptive resolution (north_rule skew handling): cells whose feature
count exceeds a threshold are re-assigned at zoom+1, repeatedly until
max_zoom — dense urban cores split into smaller cells so per-cell
payloads stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tile_xy(lon, lat, zoom: int):
    """Slippy tile x/y columns (public OSM wiki formula)."""
    n = F.lit(float(2 ** zoom))
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    lat_r = F.radians(lat)
    # ln(tan + sec) form of asinh(tan(lat)) — written identically in the
    # DuckDB oracle so the floating-point expression matches bitwise
    y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r))
         / float(3.141592653589793)) / 2.0 * n
    ).cast("long")
    # clamp at the poles
    x = F.greatest(F.lit(0), F.least(x, (n - 1).cast("long")))
    y = F.greatest(F.lit(0), F.least(y, (n - 1).cast("long")))
    return x, y


def with_tile(df: DataFrame, lon_col: str, lat_col: str, zoom: int) -> DataFrame:
    x, y = tile_xy(F.col(lon_col), F.col(lat_col), zoom)
    return df.withColumn("tile_z", F.lit(zoom)) \
             .withColumn("tile_x", x).withColumn("tile_y", y)


def quadkey(df: DataFrame) -> DataFrame:
    """Bing-style quadkey string from (tile_z, tile_x, tile_y) — gives a
    prefix-ordered cell id so parent = prefix (public algorithm)."""
    expr = """
      concat_ws('',
        transform(sequence(cast(tile_z as int), 1, -1), i ->
          cast(((tile_x >> (i - 1)) & 1) + 2 * ((tile_y >> (i - 1)) & 1)
               as string)))
    """
    return df.withColumn("quadkey", F.expr(expr))


def adaptive_cells(df: DataFrame, lon_col: str, lat_col: str,
                   base_zoom: int = 16, threshold: int = 512,
                   max_zoom: int = 20) -> DataFrame:
    """'Adaptive H3 resolution splitting' of the north_star, expressed
    as a SINGLE relational pass: each row's candidate cells at every
    zoom in [base_zoom, max_zoom] are counted at once; the row takes
    the shallowest zoom whose cell is under the threshold (children of
    a dense cell share its parent, so global per-zoom counts equal the
    iterative refine-dense-cells-only counts). One explode + one agg +
    one join — no iterative plan growth, no N-round shuffles."""
    zooms = list(range(base_zoom, max_zoom + 1))
    cand = df
    for z in zooms:
        x, y = tile_xy(F.col(lon_col), F.col(lat_col), z)
        cand = cand.withColumn(f"_x{z}", x).withColumn(f"_y{z}", y)
    tall = cand.select(
        "*",
        F.explode(F.array(*[
            F.struct(F.lit(z).alias("tile_z"),
                     F.col(f"_x{z}").alias("tile_x"),
                     F.col(f"_y{z}").alias("tile_y"))
            for z in zooms
        ])).alias("_cell"),
    ).select("*", "_cell.tile_z", "_cell.tile_x", "_cell.tile_y") \
     .drop("_cell", *[c for z in zooms for c in (f"_x{z}", f"_y{z}")])
    counts = tall.groupBy("tile_z", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("_n"))
    joined = tall.join(counts, ["tile_z", "tile_x", "tile_y"])
    ok = joined.where((F.col("_n") <= threshold)
                      | (F.col("tile_z") == max_zoom))
    from pyspark.sql import Window
    key_cols = [c for c in df.columns]
    w = Window.partitionBy(*key_cols).orderBy("tile_z")
    return (
        ok.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_n")
    )
