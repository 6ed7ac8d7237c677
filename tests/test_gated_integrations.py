"""Auto-activating integration tests for environment-gated edges.

Each dependency gate (Kafka connector jar, spark-avro jar, protobuf for
transformWithState) gets one test that SKIPS when the dependency is
absent from the image and RUNS THE REAL PATH when present — so a future
image upgrade converts gated → proven with zero code changes.

Run just these with ``pytest -m gated`` (green-or-skipped is the
contract; a hard failure means a gate's live path rotted).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.sources.scans import avro_available
from catenae_kafka_spark.streaming.sources import KafkaSource, kafka_available
from catenae_kafka_spark.streaming.stateful import tws_available

SF = "/root/testdata/sf0.001"


@pytest.mark.gated
def test_kafka_source_real_path_when_jar_present(spark):
    """With the spark-sql-kafka jar on the classpath the source must
    build a streaming DataFrame with the fixed Kafka schema (no broker
    contact happens until the query starts, so this exercises the real
    provider without needing a broker)."""
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector jar absent from image")
    df = KafkaSource("localhost:9092", "probe_topic").load(spark)
    assert df.isStreaming
    assert {"key", "value", "topic", "partition", "offset", "timestamp"} <= set(
        df.columns
    )


@pytest.mark.gated
def test_kafka_roundtrip_when_broker_configured(spark):
    """Full produce/consume round-trip — needs a real broker, opted in
    via CKS_KAFKA_BOOTSTRAP (never assumed in CI)."""
    bootstrap = os.environ.get("CKS_KAFKA_BOOTSTRAP")
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector jar absent from image")
    if not bootstrap:
        pytest.skip("no broker configured (set CKS_KAFKA_BOOTSTRAP to enable)")
    topic = "cks_gated_roundtrip"
    (
        spark.range(100)
        .select(
            F.col("id").cast("string").alias("key"),
            F.col("id").cast("string").alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    assert back.count() >= 100


@pytest.mark.gated
def test_avro_roundtrip_when_jar_present(spark):
    """spark-avro round-trip: write the nation dim as avro, read it
    back, values identical."""
    if not avro_available(spark):
        pytest.skip("spark-avro connector jar absent from image")
    c = catalog(spark, SF)
    out = tempfile.mkdtemp(prefix="cks_avro_")
    c.nation.write.mode("overwrite").format("avro").save(out)
    back = spark.read.format("avro").load(out)
    assert sorted(back.collect()) == sorted(c.nation.collect())


@pytest.mark.gated
def test_tws_ema_matches_applyinpandas_when_protobuf_present(spark):
    """transformWithStateInPandas EMA must equal the
    applyInPandasWithState EMA (identical recurrence) when protobuf is
    importable; the registry only lists q_stream_ema_tws then."""
    if not tws_available():
        pytest.skip("protobuf absent from image (TWS state-server protocol)")
    from catenae_kafka_spark.registry import all_specs

    specs = all_specs()
    assert "q_stream_ema_tws" in specs
    tws = {
        (r.user_id, r.ema, r.n_seen)
        for r in specs["q_stream_ema_tws"].fn(spark, SF).collect()
    }
    aip = {
        (r.user_id, r.ema, r.n_seen)
        for r in specs["q_stream_ema"].fn(spark, SF).collect()
    }
    assert tws == aip
