"""Shared lineage-truncation policy for iterative operators.

Both iterative helpers (connected_components' label propagation and
pagerank's rank refresh) grow two joins of plan per round; truncating
the lineage every few rounds keeps compilation flat. The policy is one
decision made once: ``localCheckpoint`` by default (executor-block
backed — fine for local/driver runs, dies with executors), a RELIABLE
storage-backed ``checkpoint`` when the caller passes a directory (the
right choice on a real cluster, where a lost executor would otherwise
kill every downstream round).

The checkpoint directory is SESSION-GLOBAL state
(``SparkContext.setCheckpointDir``): Spark has one checkpoint root per
context, not one per operator. ``make_checkpointer`` therefore sets it
only when unset and raises when a different root is already active —
last-writer-wins here would silently redirect the FIRST caller's
subsequent checkpoints to the second caller's directory (VERDICT r9).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def _same_root(active: str, requested: str) -> bool:
    """True when the context's active checkpoint path lives under the
    requested root. ``setCheckpointDir(d)`` stores ``d/<uuid>`` (a
    fresh subdirectory per context), possibly scheme-qualified
    (``file:/...``), so compare the PARENT of the active path against
    the requested root, scheme-insensitively for local paths."""

    def norm(p: str) -> str:
        for prefix in ("file://", "file:"):
            if p.startswith(prefix):
                p = p[len(prefix):]
                break
        return os.path.normpath(p)

    return norm(os.path.dirname(active)) == norm(os.path.abspath(requested))


def make_checkpointer(
    spark, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Return a df -> df lineage truncator per the policy above.

    Raises ``ValueError`` if ``checkpoint_dir`` is given while the
    context already checkpoints to a DIFFERENT root — the conflict must
    surface at setup, not as checkpoints silently landing in the other
    caller's directory.
    """
    if checkpoint_dir is not None:
        sc = spark.sparkContext
        active = sc.getCheckpointDir()
        if active is None:
            sc.setCheckpointDir(checkpoint_dir)
        elif not _same_root(active, checkpoint_dir):
            raise ValueError(
                "SparkContext already has checkpoint root "
                f"{os.path.dirname(active)!r} (session-global, one per "
                f"context); refusing to redirect it to {checkpoint_dir!r}. "
                "Reuse the active root or build the second pipeline on its "
                "own SparkContext."
            )

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    return ckpt
