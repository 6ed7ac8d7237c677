"""Shared lineage-truncation policy for iterative operators.

Both iterative helpers (connected_components' label propagation and
pagerank's rank refresh) grow two joins of plan per round; truncating
the lineage every few rounds keeps compilation flat. The policy is one
decision made once: ``localCheckpoint`` by default (executor-block
backed — fine for local/driver runs, dies with executors), a RELIABLE
storage-backed ``checkpoint`` when the caller passes a directory (the
right choice on a real cluster, where a lost executor would otherwise
kill every downstream round).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def make_checkpointer(
    spark, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Return a df -> df lineage truncator per the policy above."""
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    return ckpt
