"""functions/hof.bind semantics (r12 opt): binding an expression to a
lambda variable must be observationally identical to inlining it —
including null propagation — while evaluating the expression once."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from catenae_kafka_spark.functions.hof import bind


def _shingles_inline(toks, L=3):
    n_sh = F.greatest(F.size(toks) - (L - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + k) for k in range(L)]
            ),
        )
    )


def test_bind_matches_inline_on_shingles(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text="x"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text=None),
            Row(doc_id=5, text="p q p q p"),
        ]
    )
    toks = F.split(F.col("text"), " ")
    inline = df.select("doc_id", _shingles_inline(toks).alias("sh"))
    bound = df.select(
        "doc_id", bind(toks, lambda t: _shingles_inline(t)).alias("sh")
    )
    # bind widens containsNull (element_at is nullable-typed) — a
    # metadata-only difference; names, types, and every value must match
    assert [(f.name, f.dataType.simpleString()) for f in inline.schema] == [
        (f.name, f.dataType.simpleString()) for f in bound.schema
    ]
    assert sorted(inline.collect()) == sorted(bound.collect())


def test_bind_scalar_body(spark):
    df = spark.createDataFrame([Row(x="1 2 3"), Row(x=None)])
    arr = F.split(F.col("x"), " ")
    got = df.select(
        bind(arr, lambda t: F.size(t) * 10).alias("n"),
        (F.size(arr) * 10).alias("n_inline"),
    ).collect()
    for r in got:
        assert r.n == r.n_inline
