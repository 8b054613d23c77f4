"""K2 — TSV envelope serialization (lossy by design).

The reference serializes messages to a 3-column TSV that DROPS the
constant envelope fields to save space: ``received_at \\t symbol \\t
json`` (crypto-crawler/src/msg.rs:65-68), recovered by
``from_tsv_string`` with the constants re-supplied (msg.rs:71-87).
Our analog drops the constant crawl context and keeps
``fetched_ms \\t url \\t text``.  Parquet/state snapshots remain the
primary sink (SURVEY.md §2.2); this exists for interchange parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TSV_OPTS = {"sep": "\t", "header": "false", "escape": '"', "nullValue": ""}


def fetched_to_tsv(df: DataFrame, path: str) -> None:
    """Write the lossy 3-col TSV form of a fetched log."""
    out = df.select(
        F.unix_millis(F.col("warc_ts").cast("timestamp")).alias("fetched_ms")
        if "warc_ts" in df.columns
        else F.lit(0).alias("fetched_ms"),
        "url",
        "text",
    )
    w = out.write.mode("overwrite")
    for k, v in TSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def tsv_to_fetched(spark: SparkSession, path: str) -> DataFrame:
    """Recover the envelope (constants re-supplied by the caller,
    like msg.rs:71-87).  ``multiLine`` is required: extracted text
    contains newlines, which the writer quotes."""
    r = spark.read.option("multiLine", "true")
    for k, v in TSV_OPTS.items():
        r = r.option(k, v)
    return r.schema("fetched_ms long, url string, text string").csv(path)
