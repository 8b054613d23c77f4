"""Structured Streaming variant of the ingest path.

The reference is push-based realtime: websocket frames flow through
per-connection tokio tasks into mpsc channels
(crypto-ws-client/src/common/ws_client_internal.rs:594-942), with
liveness watermarks (unanswered-ping counters, :505-531) and an
hourly discovery tick (crypto-crawler/src/crawlers/utils.rs:520-606).
The Spark-idiomatic restatement is Structured Streaming:

* the page/message feed is a file-source stream (``readStream`` on
  the landing directory an upstream fetcher appends to; on a real
  deployment, Kafka);
* the liveness/health counters become a watermarked windowed
  aggregation (late frames beyond the watermark are dropped exactly
  like frames after a dead ping window);
* the reference's grow-only subscribed-set dedup
  (crawlers/utils.rs:543-555) becomes the built-in stateful
  ``dropDuplicates`` over the canonical URL with a watermark
  bounding state;
* ``foreachBatch`` bridges micro-batches into the batch engine —
  each micro-batch of discovered URLs runs the same canonicalize ->
  seen anti-join -> append used by the round loop (T8 analog).

All triggers in tests use ``availableNow`` so runs are deterministic
and terminate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_udf, host_udf

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, landing_dir: str, schema: str = PAGES_DDL) -> DataFrame:
    """File-source stream over a landing directory of parquet pages.
    maxFilesPerTrigger bounds micro-batch size (backpressure, the
    analog of the reference's uplink token bucket)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(landing_dir)
    )


def windowed_page_metrics(pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window per-lang counters — the streaming
    form of the metrics emission (K3) with late-data semantics (T1)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("chars"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages", "chars")
    )


def streaming_url_dedup(pages: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Stateful streaming dedup on the canonical URL (J1/A5 analog).
    The watermark bounds dedup state exactly like the reference's
    bounded reconnect-replay log."""
    return (
        pages.withColumn("url", canonicalize_udf(F.col("url")))
        .withColumn("host", host_udf(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicates(["url"])
    )


def rate_requests(
    spark: SparkSession,
    rows_per_second: int = 200,
    n_hosts: int = 4,
    num_partitions: int = 2,
) -> DataFrame:
    """LIVE unbounded ingest: the built-in rate source stands in for
    the reference's websocket firehose (one row per frame), mapped to
    deterministic synthetic fetch requests — messy urls so the
    canonicalizer runs, value-derived hosts/priorities so semantics
    are a pure function of ``value`` (replayable across restarts: the
    rate source checkpoints its offsets and resumes the value
    sequence)."""
    r = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )
    h = F.pmod("value", F.lit(n_hosts))
    return r.select(
        F.col("timestamp").alias("event_ts"),
        "value",
        F.concat(F.lit("host"), h, F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("HTTPS://Host"), h, F.lit(".Example.COM:443/P/"), F.col("value"),
            F.lit("?b=2&a=1"),
        ).alias("raw_url"),
        F.pmod(F.xxhash64("value"), F.lit(1000)).alias("priority"),
    )


def run_rate_ingest(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    budget: int = 5,
    rows_per_second: int = 200,
    n_hosts: int = 4,
):
    """Rate-source variant of :func:`run_streaming_ingest`: live
    micro-batches -> canonicalize -> the SAME stateful per-host
    budget gate as the batch pop path (streaming/stateful.py) ->
    append parquet.  Returns the StreamingQuery (caller stops it);
    restarting with the same checkpoint RESUMES both the rate-source
    offsets and the gate's GroupState — a saturated host stays
    saturated across restarts (pinned by
    tests/test_rate_ingest.py)."""
    from .stateful import budget_gate

    req = (
        rate_requests(spark, rows_per_second, n_hosts)
        .withColumn("url", canonicalize_udf(F.col("raw_url")))
        .select("host", "url", "priority")
    )
    gated = budget_gate(req, budget=budget)
    return (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def run_streaming_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seen: DataFrame | None = None,
) -> None:
    """availableNow ingest: stream pages -> canonicalize+dedup ->
    (optional) anti-join a static seen table (stream-static join,
    the reference's J5 stream-enrichment shape) -> append parquet.
    Blocks until the available data is drained; restart-safe via the
    streaming checkpoint (T3 analog)."""
    deduped = streaming_url_dedup(stream_pages(spark, landing_dir))
    if seen is not None:
        deduped = deduped.join(seen.select("url"), "url", "left_anti")
    q = (
        deduped.select("url", "host", "warc_ts", "lang", F.sha2("text", 256).alias("text_sha256"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
