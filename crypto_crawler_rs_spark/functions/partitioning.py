"""Scan-parallelism guard for CPU-heavy operators (r7, guide §2/§6).

The bench corpora arrive as single-row-group parquet files a few MB
each; with the default 128 MB split size every scan is ONE task, so
any operator whose cost is per-row CPU (python shingling, seeded
hash families, quadratic kernels) runs on one core of a 32-core
box — and a parquet row group cannot be split finer by config.  A
round-robin repartition of the raw rows (a few MB of shuffle) buys
full-width parallelism for the expensive map side.

``spread_small_scan`` is deliberately scale-adaptive: it looks at
the plan's actual partition count and only repartitions when the
input is NARROWER than the session's parallelism — at cluster scale
a 100 TB scan already has thousands of splits and this is a no-op,
so no shuffle is ever added where the data does not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism`` when
    its current partitioning is narrower — identity otherwise.  Row
    multiset is unchanged (round-robin only moves rows), so every
    aggregate/join downstream is unaffected."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * max(1, min_factor)
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if 0 < nparts < target:
        return df.repartition(target)
    return df
