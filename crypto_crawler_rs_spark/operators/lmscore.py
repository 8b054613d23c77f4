"""Corpus-derived unigram LM quality scoring — the CCNet
perplexity-bucket stage without an external model.

CCNet ranks documents by language-model perplexity and keeps the
head/middle buckets; the engine's stand-in trains the simplest LM
that needs no shipped artifact — add-k-smoothed unigram
log-probabilities derived from the corpus ITSELF — and scores each
document by mean per-token surprisal.  Deterministic, self-contained,
and the Spark shape is the interesting part at 100 TB:

    explode tokens         (codegen, no UDF)
    groupBy(token).count   (map-side combined — 'the' collapses to ONE
                            row per partition before the exchange)
    scalar totals          (N tokens, V vocab — one row to the driver)
    tokens ⋈ logp          (hash equi-join; the probe side is skewed
                            on stopwords but AQE skew-split handles a
                            join, unlike a window)
    groupBy(doc).avg       (map-side combined)

Reference analog: the reference classifies payloads row-by-row
(MiscMessage, message_handler.rs:14-22); this is the corpus-level
generalization a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_unigram_logprobs(
    docs: DataFrame,
    text_col: str = "text",
    k: float = 1.0,
) -> tuple[DataFrame, float, int]:
    """Token -> add-k-smoothed natural-log probability over the whole
    corpus.  Returns (logp_df(token, logp), n_tokens, vocab_size) —
    the two scalars feed the unknown-token probability
    ``ln(k / (N + k·V))`` when scoring a different corpus."""
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # two scalars: total token mass and vocabulary size (one driver row)
    row = counts.agg(
        F.sum("cnt").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    n, v = int(row["n"] or 0), int(row["v"] or 0)
    denom = float(n) + k * float(v)
    logp = counts.select(
        "token",
        F.log((F.col("cnt") + F.lit(k)) / F.lit(denom)).alias("logp"),
    )
    return logp, n, v


def unigram_surprisal_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """One row per doc — INCLUDING docs with no scoreable tokens
    (empty/whitespace-only text: ``n_scored_tokens = 0``,
    ``surprisal`` null), which are exactly the junk a quality gate
    wants to see flagged rather than silently missing.  ``surprisal``
    is the mean negative log-probability of the doc's tokens under
    the corpus's own add-k unigram LM — low = typical text, high =
    rare-token soup (the CCNet tail bucket).  Rounded so a SQL twin's
    different summation order agrees at the driver's
    9-significant-digit float comparison."""
    logp, _, _ = train_unigram_logprobs(docs, text_col=text_col, k=k)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    scored = (
        toks.join(logp, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_scored_tokens"),
            F.round(-F.avg("logp"), round_digits).alias("surprisal"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .withColumn(
            "n_scored_tokens",
            F.coalesce("n_scored_tokens", F.lit(0)).cast("long"),
        )
    )
