"""Parity pin for the r12 knn_cosine Arrow kernel.

knn_cosine's scoring moved from interpreted JVM higher-order functions
(aggregate/zip_with) into a mapInArrow NumPy kernel (guide §4.2). The
HOF form is kept as `_knn_cosine_hof` — the executable reference
semantics — and these tests assert the two paths agree EXACTLY
(values, null propagation, NaN ordering, ANSI divide-by-zero) on the
input classes the HOF expression tree distinguishes:

- clean fixed-length vectors (the fixture shape);
- null vectors, vectors with null elements (pair scores null);
- ragged lengths (zip_with pads with null -> dot null -> score null);
- NaN elements (NaN propagates; Spark sorts NaN greatest in DESC);
- empty query sets / empty corpus;
- zero-norm vectors: both paths must RAISE (ANSI divide-by-zero);
- hostile (dotted) id column names, float32 input arrays.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from catenae_kafka_spark.operators.llm_similarity import (
    _knn_cosine_hof,
    knn_cosine,
)


def _rowset(df):
    """Order-insensitive, NaN-tolerant set of result tuples."""
    out = []
    for r in df.collect():
        t = tuple(
            "NaN" if isinstance(v, float) and math.isnan(v) else v for v in r
        )
        out.append(t)
    return sorted(out, key=str)


ADVERSARIAL = [
    (1, [1.0, 0.0, 0.5]),
    (2, [0.9, 0.1, 0.2]),
    (3, None),  # null vector
    (4, [0.1, None, 0.3]),  # null element
    (5, [1.0, 2.0]),  # ragged length
    (6, [float("nan"), 1.0, 0.0]),  # NaN element
    (9, [2.0, -1.0, 4.0]),
]


def test_arrow_matches_hof_on_adversarial_inputs(spark):
    df = spark.createDataFrame(ADVERSARIAL, "vec_id long, embedding array<double>")
    new = knn_cosine(df, df, k=3)
    old = _knn_cosine_hof(df, df, k=3)
    assert new.schema == old.schema
    assert _rowset(new) == _rowset(old)


def test_arrow_matches_hof_on_fixture(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    new = knn_cosine(q, emb, k=5)
    old = _knn_cosine_hof(q, emb, k=5)
    assert new.schema == old.schema
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_empty_query_set(spark):
    df = spark.createDataFrame(ADVERSARIAL, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 0)
    assert knn_cosine(q, df, k=3).count() == 0
    assert _knn_cosine_hof(q, df, k=3).count() == 0


def test_empty_corpus(spark):
    df = spark.createDataFrame(ADVERSARIAL, "vec_id long, embedding array<double>")
    empty = df.filter(F.col("vec_id") < 0)
    assert knn_cosine(df, empty, k=3).count() == 0


def test_zero_norm_raises_like_ansi_divide(spark):
    rows = ADVERSARIAL + [(8, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for impl in (knn_cosine, _knn_cosine_hof):
        with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            impl(df, df, k=3).collect()


def test_hostile_id_col_and_float32(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "`v.id` long, emb array<float>",
    )
    new = knn_cosine(df.limit(1), df, k=2, id_col="v.id", vec_col="emb")
    old = _knn_cosine_hof(df.limit(1), df, k=2, id_col="v.id", vec_col="emb")
    assert _rowset(new) == _rowset(old)
    got = {(r.query_id, r.match_id) for r in new.collect()}
    assert got == {(1, 2), (1, 3)}


def test_string_ids_pass_through(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    new = knn_cosine(df.filter(F.col("vec_id") == "a"), df, k=2)
    old = _knn_cosine_hof(df.filter(F.col("vec_id") == "a"), df, k=2)
    assert new.schema == old.schema
    assert _rowset(new) == _rowset(old)
