"""Table catalog: named parquet tables under a scale-factor directory.

The engine's batch inputs are the driver-generated star schema
(FIXTURES.md). At 100 TB these would be partitioned parquet/Delta
directories; the access path is identical (``spark.read.parquet`` on a
directory prunes partitions and pushes filters/column projection down to
the scan — verify with ``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from catenae_kafka_spark.session import tune

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins against
# fact tables: even at 100 TB, region/nation are O(10-100) rows and
# supplier/part/customer scale far slower than lineitem/orders/events.
BROADCAST_DIMS: frozenset[str] = frozenset(
    {"region", "nation", "supplier", "part", "customer"}
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@dataclass
class Catalog:
    """Lazy accessor for the tables under one sf_dir.

    ``cat.lineitem`` returns the DataFrame (reader is lazy; nothing is
    scanned until an action). Attribute access keeps query code terse.
    """

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLES:
                raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
            self._cache[name] = self._read(name)
        return self._cache[name]

    def _read(self, name: str) -> DataFrame:
        path = table_path(self.sf_dir, name)
        if name == "events":
            # The fixture's events.ts encoding has DRIFTED between driver
            # runs: TIMESTAMP(NANOS) in round 1 (Spark 4 refuses; read as
            # int64 ns and truncate), timezone-naive timestamp[us] in
            # round 2 (Spark 4 reads TIMESTAMP_NTZ by default, which
            # withWatermark rejects — this broke all round-2 streaming).
            # Normalize EVERY encoding to TIMESTAMP (LTZ) here, the one
            # chokepoint all batch + replay-staging reads go through.
            import pyspark.sql.functions as F

            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            raw = self.spark.read.parquet(path)
            ts_type = dict(raw.dtypes).get("ts")
            if ts_type == "bigint":
                # integer division: float division of epoch-ns int64s
                # carries ~2^-53 relative error (~200 ns) — enough to
                # flip a value sitting just below a second boundary and
                # break seconds-formatted oracle parity
                return raw.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            if ts_type == "timestamp_ntz":
                # belt-and-braces: inferTimestampNTZ=false in RUNTIME_CONF
                # already prevents this, but the conf can be locked by a
                # host session. Under the pinned UTC session timezone the
                # cast is value-identical.
                return raw.withColumn("ts", F.col("ts").cast("timestamp"))
            return raw
        return self.spark.read.parquet(path)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)


def catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    """Entry point used by every query callable: tune + table access."""
    tune(spark)
    return Catalog(spark=spark, sf_dir=sf_dir)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    cat = catalog(spark, sf_dir)
    return {name: cat.table(name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view (for the SQL entry point)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
