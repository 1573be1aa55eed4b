"""osm2streets_spark — a from-scratch PySpark-native street-network engine.

Reproduces the semantics of a-b-street/osm2streets (OSM ways → simplified
street network: intersection detection, way splitting, lane inference,
road thickening, trim-back at junctions, GeoJSON rendering) re-expressed
as an idiomatic Spark spatial-join + tiling pipeline over a table of
interleaved text+media documents.

Reference behavior cited throughout as ``file:line`` under /root/reference.
No reference code is copied; geometry kernels are implemented from public
algorithms (Douglas-Peucker, miter-join offset, ray casting, slippy tiles).
"""

__version__ = "0.1.0"
