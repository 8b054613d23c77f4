"""Crawler-trap detection — URL-pattern explosion per host.

Real crawls die in calendar pages, session-id permutations and
faceted-search grids: infinitely many DISTINCT urls that all collapse
to one template.  The reference sidesteps this because its "url"
universe is a closed symbol catalog (crypto-crawler/src/crawlers/
utils.rs symbol discovery); an open-web frontier must detect and
suppress the pattern itself — this is the standard digit-masking
heuristic (IRLbot's "spam mass" cousin): replace digit runs in the
path with a placeholder, count distinct urls per (host, mask), and
flag masks whose fanout explodes.

Everything is whole-stage-codegen JVM expressions (regexp_replace +
one groupBy); the single shuffle is on (host, mask) — bounded by the
template count, orders of magnitude below the url count, and
map-side combine collapses each template's urls before the exchange.
The output is a broadcast-sized suppression table the frontier can
left-anti join discovery against, the same shape as its robots
policy table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a digit RUN collapses to one N: /2024/01/03/ and /1999/12/31/ are
# the same calendar template
_DIGITS = "[0-9]+"
_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"


def host_of(url_col) -> F.Column:
    """Authority (host[:port]) of a url column."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(col, _AUTHORITY.replace("[^/]*", "([^/]*)"), 1)


def mask_pattern(url_col) -> F.Column:
    """Digit-masked path+query template of a url column — THE trap
    key.  One definition shared by the batch operator, the frontier
    round-loop suppression, and the streaming trap_gate, so a change
    to the masking rule cannot silently diverge between them."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_replace(F.regexp_replace(col, _AUTHORITY, ""), _DIGITS, "N")


def trap_patterns(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 50,
) -> DataFrame:
    """Group urls by (host, digit-masked path template) and flag
    templates with ``>= min_urls`` distinct urls as traps.

    Returns ``(host, pattern, n_urls, is_trap)`` sorted nowhere —
    callers broadcast the ``is_trap`` slice against discovery.

    Scheme-less / non-canonical urls (``host_of`` yields ``''``) are
    DROPPED, not grouped: collapsing them into host ``''`` would both
    mis-key the template table vs the frontier loop's engine host
    column and let unrelated malformed urls vote each other into a
    fake trap (ADVICE r4).  Canonicalize first
    (functions/urls.canonicalize_udf) if such rows must count.
    """
    from ..functions.partitioning import spread_small_scan

    u = F.col(url_col)
    # r7: the per-url regexp masking is map-side CPU — spread a
    # narrow input first (no-op at real scan widths)
    return (
        spread_small_scan(urls)
        .select(
            host_of(u).alias("host"),
            mask_pattern(u).alias("pattern"),
            u.alias("_url"),
        )
        .where(F.col("host") != F.lit(""))
        .groupBy("host", "pattern")
        .agg(F.count_distinct("_url").alias("n_urls"))
        .withColumn("is_trap", (F.col("n_urls") >= F.lit(min_urls)).cast("boolean"))
    )


def suppress_traps(
    candidates: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop candidate urls whose (host, masked pattern) is a flagged
    trap — a broadcast left-anti join (the trap table is template-
    sized, naturally broadcastable)."""
    u = F.col(url_col)
    keyed = candidates.withColumn("_host", host_of(u)).withColumn(
        "_pattern", mask_pattern(u)
    )
    trap_keys = traps.where("is_trap").select(
        F.col("host").alias("_host"), F.col("pattern").alias("_pattern")
    )
    return keyed.join(
        F.broadcast(trap_keys), ["_host", "_pattern"], "left_anti"
    ).drop("_host", "_pattern")
