"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_flagship_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns and "n_name" in df.columns


def test_queries_oracle_contract():
    mod = _load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) > 0
    # every oracle key must have a matching query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    """Every registered query must at least execute at sf0.001."""
    mod = _load_entry()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        # limit(5) keeps the smoke fast; correctness is tools/check.py's job
        assert df.limit(5).collect() is not None, name


def test_oracle_column_names_match_spark_schema(spark, sf_dir):
    """Alias-drift guard: the driver's compare sorts columns BY NAME
    before hashing, so a Spark result named (sum_qty) and an oracle
    named (sum(l_quantity)) hash-mismatch even with identical values.
    Catch it statically: DuckDB DESCRIBE of each oracle vs the Spark
    DataFrame's analyzed schema — no data execution on the oracle side,
    LIMIT-0 semantics."""
    import duckdb

    from catenae_kafka_spark.catalog import TABLES, table_path

    mod = _load_entry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    qs, oracles = mod.queries(), mod.oracle_sql()
    mismatches = {}
    for name, sql in oracles.items():
        oracle_cols = sorted(
            r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall()
        )
        spark_cols = sorted(qs[name](spark, sf_dir).columns)
        if oracle_cols != spark_cols:
            mismatches[name] = (spark_cols, oracle_cols)
    assert not mismatches, f"column-name drift: {mismatches}"
