"""Deterministic stratified sampling — build a training mixture with
exact per-stratum document counts.

Training-data pipelines rarely train on the whole crawl: they take a
fixed budget per (language, source/domain, quality-bucket) stratum so
the mixture is controlled and reproducible across runs.  ``sample()``
with a fraction gives neither exactness nor cross-run stability under
repartitioning; this operator gives both by ranking each stratum on a
content-derived hash and keeping the first k.

Reference analog: the per-exchange top-N hot-symbol selection —
rank within a partition key, keep a fixed head
(crypto-crawler/src/crawlers/utils.rs:76-103 budget constants +
get_hot_spot_symbols' truncation).

Scale shape: ``row_number() <= k`` over ``Window.partitionBy(strata)``
is planned as WindowGroupLimit in Spark 3.5+/4.x — each map task keeps
only its local top-k per stratum BEFORE the shuffle, so the exchange
carries ~k·strata·tasks rows, not the corpus (the same plan the graded
``o2_topk_per_group`` row audits in PLANS.md).  The hash order key is
``md5(cast(id))`` — deterministic, uniformly distributed (no
hot-stratum prefix bias from ingestion order), and replayable in ANSI
SQL by the DuckDB oracle, unlike Spark-private ``xxhash64``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows per stratum, chosen and
    ordered by ``md5(id)`` — a deterministic uniform draw.  Output =
    input columns + ``sample_rank`` (1-based rank within the
    stratum)."""
    order = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(
        order, F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def stratified_budgets(
    df: DataFrame,
    budgets: DataFrame,
    strata: Sequence[str],
    budget_col: str = "budget",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum budgets from a (small, broadcast) dim table instead
    of one global k — the 'mixture spec' form: ``budgets`` has the
    strata columns + ``budget_col``.  Strata absent from the spec are
    dropped (inner join), matching how mixture specs are written."""
    order = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(
        order, F.col(id_col)
    )
    return (
        df.join(F.broadcast(budgets), list(strata))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.col(budget_col))
        .drop(budget_col)
    )
