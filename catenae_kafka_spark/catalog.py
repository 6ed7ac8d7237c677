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


# Per-process cache of INFERRED parquet schemas (optimization r12,
# guide §5: the driver should do almost no data work). A bare
# ``spark.read.parquet(path)`` pays ~70-90 ms of driver-side schema
# inference (file listing + footer reads) at PLAN-BUILD time, every
# time a query callable touches a table — the flagship's five tables
# made build time ~50% of its sf0.1 wall. Production engines resolve
# table schemas from a metastore/catalog; this dict is that catalog's
# in-process stand-in: infer once per (app, path, dir-mtime), then
# ``spark.read.schema(s).parquet(path)`` (~14 ms) for every later read.
#
# This caches METADATA only, never data or results — every query still
# scans the parquet files. Invalidation: the key includes the table
# directory's st_mtime_ns, so a rewritten fixture (overwrite mode
# recreates the directory) re-infers; a fresh driver process starts
# empty.
_SCHEMA_CACHE: dict[tuple, object] = {}
_SCHEMA_CACHE_MAX = 4096  # fuzz suites touch many tmp dirs; bound it

# Reader-DataFrame memo layered over the schema cache (optimization
# r12, guide §5 — driver plan-build work): even with the schema known,
# ``spark.read.schema(s).parquet(path)`` is ~20 ms of py4j round trips
# per table per query BUILD (the flagship touches five tables → ~80 ms
# per bench rep). A DataFrame is an immutable logical plan — handing
# the same object to every query is metadata reuse, exactly like the
# schema cache: no data, no results, and every action still scans the
# parquet files. Keyed identically (applicationId, abspath, dir-mtime),
# so a rewritten fixture or a new session rebuilds. Values are the
# FINAL per-table DataFrames (events: after its ts normalization).
_DF_CACHE: dict[tuple, DataFrame] = {}


def _schema_key(spark: SparkSession, path: str) -> tuple | None:
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return None  # nonexistent/remote path: let the reader handle it
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — context torn down mid-call
        return None
    return (app, os.path.abspath(path), mtime)


def _read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the inferred schema memoized per
    (application, path, dir-mtime) — see ``_SCHEMA_CACHE``."""
    key = _schema_key(spark, path)
    schema = _SCHEMA_CACHE.get(key) if key is not None else None
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    df = spark.read.parquet(path)
    if key is not None:
        if len(_SCHEMA_CACHE) >= _SCHEMA_CACHE_MAX:
            _SCHEMA_CACHE.clear()
        _SCHEMA_CACHE[key] = df.schema
    return df


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
        key = _schema_key(self.spark, path)
        if key is not None:
            cached = _DF_CACHE.get(key)
            if cached is not None:
                return cached
        df = self._read_uncached(name, path)
        if key is not None:
            if len(_DF_CACHE) >= _SCHEMA_CACHE_MAX:
                _DF_CACHE.clear()
            _DF_CACHE[key] = df
        return df

    def _read_uncached(self, name: str, path: str) -> DataFrame:
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
            raw = _read_parquet_cached(self.spark, path)
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
        return _read_parquet_cached(self.spark, path)

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
