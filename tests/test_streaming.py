"""Structured Streaming ingest path: results must equal the batch
computation over the same files (micro-batch = batch semantics)."""

import os

import pytest
from pyspark.sql import functions as F

from crypto_crawler_rs_spark.sources.fixtures import corpus_to_parquet, gen_corpus
from crypto_crawler_rs_spark.streaming.stream import (
    run_streaming_ingest,
    stream_pages,
    windowed_page_metrics,
)


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    corpus = gen_corpus(n_pages=300, n_hosts=10, n_seeds=10, seed=5)
    # split into several files so maxFilesPerTrigger yields >1 micro-batch
    for i in range(3):
        part = corpus["pages"].iloc[i * 100 : (i + 1) * 100]
        corpus_to_parquet({"pages": part}, str(d / f"f{i}"))
        os.rename(d / f"f{i}" / "pages.parquet", d / f"part{i}.parquet")
        os.rmdir(d / f"f{i}")
    return str(d), corpus["pages"]


def test_windowed_metrics_match_batch(spark, landing, tmp_path):
    d, pages_pd = landing
    stream = windowed_page_metrics(stream_pages(spark, d))
    q = (
        stream.writeStream.format("memory")
        .queryName("m1")
        .outputMode("complete")  # append would withhold windows the
        # final watermark hasn't passed; complete emits all state
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from m1").toPandas()

    batch = spark.createDataFrame(pages_pd[["warc_ts", "lang", "text"]])
    exp = (
        batch.groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("text")).alias("chars"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages", "chars")
        .toPandas()
    )
    key = ["window_start", "lang", "n_pages", "chars"]
    g = sorted(map(tuple, got[key].itertuples(index=False)))
    e = sorted(map(tuple, exp[key].itertuples(index=False)))
    assert g == e


def test_streaming_ingest_dedup_and_resume(spark, landing, tmp_path):
    d, pages_pd = landing
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    seen = spark.createDataFrame(
        [(u,) for u in pages_pd.url.head(20)], "url string"
    )
    run_streaming_ingest(spark, d, out, ckpt, seen=seen)
    got = spark.read.parquet(out)
    n = got.count()
    assert n == len(set(pages_pd.url)) - 20  # dedup + seen anti-join
    assert got.select("url").distinct().count() == n
    # restart with no new data -> no duplicates appended (checkpoint)
    run_streaming_ingest(spark, d, out, ckpt, seen=seen)
    assert spark.read.parquet(out).count() == n
