"""Fixture-drift guard (hard-won fact: driver fixture encodings DRIFT
between rounds — events.ts was int64-nanos in r1, naive-µs NTZ in r2,
and the r2 drift broke every watermarked streaming query plus the
bench). This test pins the ENGINE-NORMALIZED schema of every table at
every sf dir: if a future fixture regeneration changes a column name,
type family, or timestamp encoding in a way the catalog doesn't
normalize, the suite fails here at build time with an exact diff,
instead of 150 queries failing cryptically at driver time."""

from __future__ import annotations

import pytest

from catenae_kafka_spark.catalog import catalog

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # NEVER timestamp_ntz/bigint post-catalog
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize(
    "sf_path",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_catalog_schemas_are_stable(spark, sf_path):
    c = catalog(spark, sf_path)
    diffs = {}
    for table, expected in EXPECTED.items():
        got = dict(c.table(table).dtypes)
        if got != expected:
            diffs[table] = {
                "missing": {k: v for k, v in expected.items() if k not in got},
                "extra": {k: v for k, v in got.items() if k not in expected},
                "retyped": {
                    k: (expected[k], got[k])
                    for k in expected
                    if k in got and got[k] != expected[k]
                },
            }
    assert not diffs, f"fixture schema drift at {sf_path}: {diffs}"
