"""G5/E5 Spark wiring: per-doc block extraction (geom/blocks.py kernel)
+ J11 membership assignment (point-in-block PIP) + A8 census columns.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..geom.blocks import find_blocks

BLOCK_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("block_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_roads", LongType()),
    StructField("n_names", LongType()),
    StructField("area_m2", DoubleType()),
    StructField("ring_json", StringType()),
])


def extract_blocks(roads: DataFrame) -> DataFrame:
    """roads needs doc_id, road_id, src_i, dst_i, xy, name,
    highway_type (post-transform network)."""
    src = roads.select("doc_id", "road_id", "src_i", "dst_i", "xy",
                       "name", "highway_type")
    spark = src.sparkSession
    n = spark.sparkContext.defaultParallelism * 2

    def batched(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        rows = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            rs = g.to_dict("records")
            for r in rs:
                r["xy"] = list(r["xy"])
            for b in find_blocks(rs):
                rows.append((doc_id, int(b["block_id"]), b["kind"],
                             b["n_roads"], b["n_names"], b["area_m2"],
                             json.dumps(b["ring"], separators=(",", ":"))))
        yield pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return src.repartition(n, "doc_id").mapInPandas(batched, BLOCK_SCHEMA)
