"""Per-host budgeted pop — the declarative politeness rate limiter.

The reference enforces per-endpoint rate limits with a token bucket
in the socket writer (crypto-ws-client/src/common/connect_async.rs:72-77)
plus cross-process lock files (crypto-crawler/src/utils/lock.rs:33-134).
With a single logical scheduler those become one declarative rule:
*each round, each host may schedule at most ``budget_per_round``
URLs, best-priority first* (SURVEY.md §2.9 T5/T6).

Skew: the reference special-cases its hottest source (binance) with
bespoke delays (ws_client_internal.rs:321-335).  Here a hot host
(~30% of the frontier) would funnel one window partition.  We use a
two-phase salted window:

  phase 1: partition by (host, salt) where salt = pmod(xxhash64(url),
           n_salts) for hot hosts (salt=0 otherwise); keep the best
           ``budget`` rows per salt bucket — a partition-local prune
           that is CORRECT because the global top-``budget`` of a
           host is contained in the union of per-salt top-``budget``s;
  phase 2: re-rank the ≤ budget×n_salts survivors per host — tiny.

Ordering within a host is the total order (priority, url) — ties
MUST break on url for run-to-run determinism (SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pop_per_host(
    candidates: DataFrame,
    budget_col: str = "budget_per_round",
    priority_col: str = "priority",
    url_col: str = "url",
    host_col: str = "host",
    hot_col: str = "is_hot",
    n_salts: int = 16,
) -> DataFrame:
    """Return candidates with ``scheduled`` boolean — True for the
    per-host top-``budget`` by (priority, url)."""
    salt = F.when(
        F.coalesce(F.col(hot_col), F.lit(False)),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    df = candidates.withColumn("_salt", salt)

    w1 = Window.partitionBy(host_col, "_salt").orderBy(
        F.col(priority_col).asc(), F.col(url_col).asc()
    )
    df = df.withColumn("_r1", F.row_number().over(w1))
    survivors = df.filter(F.col("_r1") <= F.col(budget_col))
    pruned = df.filter(F.col("_r1") > F.col(budget_col)).withColumn(
        "scheduled", F.lit(False)
    )

    w2 = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).asc(), F.col(url_col).asc()
    )
    survivors = survivors.withColumn("_r2", F.row_number().over(w2)).withColumn(
        "scheduled", F.col("_r2") <= F.col(budget_col)
    )
    out_cols = candidates.columns + ["scheduled"]
    return survivors.select(*out_cols).unionByName(pruned.select(*out_cols))
