"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship street-network build on sf0.001 fixtures.
queries()     — one entry per implemented operator family (SURVEY.md §2
                + training-data-pipeline additions); see
                osm2streets_spark/plans/registry.py.
oracle_sql()  — DuckDB twins. Street-network oracles read the fixture
                generator's ground-truth parquet (absolute paths); the
                dedup/text/similarity/events oracles use the
                pre-registered driver views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm2streets_spark.plans import registry  # noqa: E402
from osm2streets_spark.sources.fixtures import ensure_fixtures  # noqa: E402
from osm2streets_spark.plans.pipeline import flagship_query  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full street-network build (parse → split → lanes →
    trim geometry → transforms → render → tiles) on the sf0.001
    interleaved-documents fixtures."""
    fix = ensure_fixtures("sf0.001")
    return flagship_query(spark, fix)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
