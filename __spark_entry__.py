"""Driver contract for the spark-graft builder (PySpark target).

Thin projection of ``catenae_kafka_spark.registry``: every operator in
SURVEY.md §2B registers one QuerySpec (Spark callable + DuckDB oracle SQL
side by side), and this module exposes them in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from catenae_kafka_spark.flagship import flagship
from catenae_kafka_spark.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query; weak-check ops
    (streaming/stateful/approximate) intentionally omit an entry."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
