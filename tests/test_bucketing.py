"""Bucketed co-located join: pre-bucketing both sides on the join key
must eliminate the shuffle (no Exchange in the join's physical plan) —
the shuffle-once-at-write-time layout for repeated 100 TB fact joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    c = catalog(spark, SF)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    # the in-memory catalog forgets tables between sessions but their
    # managed locations persist — clear them or saveAsTable fails with
    # LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        c.lineitem.select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        c.orders.select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
    )
    li = spark.table("li_bucketed")
    od = spark.table("ord_bucketed")
    joined = li.join(od, li.l_orderkey == od.o_orderkey)
    # fixtures are tiny → Spark would broadcast; disable it so the plan
    # shows the bucket property (SMJ reading co-located buckets)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it is not just planless: results match the plain join
        n_plain = c.lineitem.join(
            c.orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compaction_reduces_file_count_and_preserves_rows(spark):
    import glob
    import os

    from catenae_kafka_spark.operators.layout import q_compact_small_files
    from catenae_kafka_spark.sources.scans import _work_dir

    sf = "/root/testdata/sf0.001"
    n = q_compact_small_files(spark, sf).count()
    base = _work_dir(sf, "compact")
    frag = glob.glob(os.path.join(base, "fragmented", "part-*"))
    comp = glob.glob(os.path.join(base, "compacted", "part-*"))
    assert len(comp) <= 4 < len(frag)
    assert n == spark.read.parquet(os.path.join(sf, "events.parquet")).count()
