"""Adaptive per-host politeness from observed fetch latency.

The reference hard-codes its politeness envelope as per-exchange
constants (crypto-crawler/src/crawlers/utils.rs:76-103 — one rate
limit per REST endpoint, chosen by hand).  A web crawler facing
millions of unknown hosts derives the delay instead: track an EWMA of
each host's response latency and set crawl-delay proportional to it
(the classic "be no more than k× the server's own speed" rule used by
Heritrix's politeness policy).

Spark shape: one ``applyInPandas`` per host group — the EWMA
recursion is inherently sequential per key, but pandas' ``ewm`` is a
vectorized C kernel, so the per-group work is Arrow-batched, never a
per-row Python loop (the north-rule constraint).  The shuffle is a
single hash partition on host; output is host-cardinality (policy
table sized), broadcastable into the frontier's policy join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_ewma_delay(
    fetches: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    order_cols: tuple[str, ...] = ("ts", "fetch_id"),
    alpha: float = 0.3,
    delay_unit_ms: float = 100.0,
    max_delay: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """Per-host EWMA latency → adaptive ``crawl_delay_rounds``.

    EWMA follows pandas ``ewm(alpha, adjust=False)`` semantics
    (e₀ = x₀, eᵢ = α·xᵢ + (1-α)·eᵢ₋₁) over rows ordered by
    ``order_cols`` — a total order per host is required for
    determinism.  Returns one row per host:
    ``(host, n_fetches, ewma_ms, crawl_delay_rounds)`` with
    ``crawl_delay_rounds = clamp(ceil(ewma / delay_unit_ms),
    1, max_delay)`` — the column the frontier's policy join consumes
    (plans/frontier.py _with_policy).

    ``ewma_ms`` is rounded so the closed-form SQL oracle (a
    pow-weighted sum — same recursion, different summation order)
    agrees at the driver's 9-significant-digit float comparison.
    """
    order = list(order_cols)
    cols = [host_col, latency_col, *order]
    out_schema = (
        f"{host_col} string, n_fetches long, ewma_ms double, "
        "crawl_delay_rounds long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        e = float(
            pdf[latency_col].ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        )
        e = round(e, round_digits)
        import math

        delay = max(1, min(max_delay, math.ceil(e / delay_unit_ms)))
        return pd.DataFrame(
            {
                host_col: [pdf[host_col].iloc[0]],
                "n_fetches": [len(pdf)],
                "ewma_ms": [e],
                "crawl_delay_rounds": [delay],
            }
        )

    return (
        fetches.select(*cols)
        .groupBy(host_col)
        .applyInPandas(fold, schema=out_schema)
    )


def ewma_policy(
    delays: DataFrame,
    base_policy: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Overlay adaptive delays onto a frontier policy table: hosts
    with an observed EWMA get their ``crawl_delay_rounds`` replaced,
    static-only hosts keep their default, and observed hosts ABSENT
    from the static table still get a policy row (full-outer join) —
    on the open web most hosts are discovered, not pre-listed, and
    dropping their adaptive delay would hammer exactly the slow hosts
    the EWMA flagged.  Their other policy columns stay null;
    ``FrontierScheduler._with_policy`` coalesces those to engine
    defaults.  Both sides are host-cardinality — the join stays
    broadcast-sized."""
    adaptive = delays.select(
        host_col, F.col("crawl_delay_rounds").alias("_adaptive_delay")
    )
    return (
        base_policy.join(adaptive, host_col, "full")
        .withColumn(
            "crawl_delay_rounds",
            F.coalesce("_adaptive_delay", "crawl_delay_rounds"),
        )
        .drop("_adaptive_delay")
    )
