"""Bounded-retention localCheckpoint chains for iterative operators.

``DataFrame.localCheckpoint(eager=True)`` is the right lineage cut for
power iteration (pagerank) and label propagation (connected
components): it materializes the iterate and truncates the plan so
analysis cost stays flat across iterations.  But the checkpointed RDD
blocks it pins are never released by ``DataFrame.unpersist()`` (the
cache-manager path doesn't know about checkpoint RDDs), so a 30-
iteration loop accumulates up to 30 iterates of executor storage for
the life of the job (ADVICE r4: components.py:107).

``LocalCheckpointChain`` fixes the leak without giving up the lineage
cut: each ``step(df)`` eagerly checkpoints ``df``, records which
persistent-RDD ids the checkpoint created (diff of
``sc.getPersistentRDDs()`` around the call — the loop is driver-
sequential, so the diff is exactly this checkpoint's blocks), and
releases every iterate older than the last ``keep`` (default 2 — the
newest iterate plus its predecessor, which convergence checks still
read).  ``close()`` releases everything except the newest, which the
caller returns to user code.

Releasing uses the JVM-side persistent-RDD registry directly because
that is the only handle to a local-checkpoint RDD PySpark exposes;
a released iterate is UNRECOVERABLE (lineage was truncated), which is
why the chain never releases the two live generations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _release_ids(sc, ids) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)


class LocalCheckpointChain:
    """Eager localCheckpoint with bounded checkpoint-block retention.

    ``keep=2`` holds the newest iterate and its predecessor (the
    predecessor feeds convergence checks); every older iterate's
    checkpoint blocks are unpersisted as soon as a new one
    materializes, so executor storage stays O(2 iterates) instead of
    O(max_iter iterates)."""

    def __init__(self, spark, keep: int = 2):
        self._sc = spark.sparkContext
        self._keep = max(1, keep)
        self._live: list[set[int]] = []

    def step(self, df: DataFrame) -> DataFrame:
        before = _persistent_ids(self._sc)
        out = df.localCheckpoint(eager=True)
        self._live.append(_persistent_ids(self._sc) - before)
        while len(self._live) > self._keep:
            _release_ids(self._sc, self._live.pop(0))
        return out

    def close(self) -> None:
        """Release every retained iterate except the newest (the one
        the caller hands back to user code)."""
        while len(self._live) > 1:
            _release_ids(self._sc, self._live.pop(0))
        self._live.clear()

    def live_generations(self) -> int:
        return len(self._live)
