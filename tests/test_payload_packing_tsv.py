"""C11 decompression dispatch, C13 signing, O4 greedy packing (the
applyInPandas pack_commands), K2 TSV round-trip, F2 quarantine, U3
seen-set deletion (forget)."""

import gzip
import hashlib
import hmac
import zlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crypto_crawler_rs_spark.functions.payload import (
    decompress_payload,
    decompress_udf,
    hmac_sign_udf,
    sign_hmac_sha256,
)
from crypto_crawler_rs_spark.operators.packing import pack_commands
from crypto_crawler_rs_spark.sources.tsv import fetched_to_tsv, tsv_to_fetched


def test_decompress_dispatch_pure():
    s = "hello {\"x\": 1} world"
    assert decompress_payload(gzip.compress(s.encode())) == s
    assert decompress_payload(zlib.compress(s.encode())) == s
    assert decompress_payload(s.encode()) == s
    assert decompress_payload(None) is None


def test_decompress_udf_mixed_batch(spark):
    rows = [
        (1, gzip.compress(b"gzip payload")),
        (2, zlib.compress(b"zlib payload")),
        (3, b"plain payload"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {
        r.id: r.txt
        for r in df.select("id", decompress_udf("payload").alias("txt")).collect()
    }
    assert got == {1: "gzip payload", 2: "zlib payload", 3: "plain payload", 4: None}


def test_hmac_matches_stdlib(spark):
    # golden vector mirroring the reference's signing tests
    # (crypto-rest-client/src/exchanges/utils.rs:24-68)
    sig = sign_hmac_sha256("secret", "symbol=BTCUSDT&limit=1000")
    assert sig == hmac.new(
        b"secret", b"symbol=BTCUSDT&limit=1000", hashlib.sha256
    ).hexdigest()
    df = spark.createDataFrame([("a=1",), ("b=2",)], "msg string")
    got = [r.sig for r in df.select(hmac_sign_udf("secret")("msg").alias("sig")).collect()]
    assert got == [sign_hmac_sha256("secret", "a=1"), sign_hmac_sha256("secret", "b=2")]


def test_pack_commands_budgets(spark):
    # urls of known byte length; byte budget forces breaks
    rows = [("h1", f"url{i:04d}", i % 3) for i in range(250)]
    df = spark.createDataFrame(rows, "host string, url string, priority long")
    packed = pack_commands(
        df, byte_budget=100, max_items=20, overhead_per_item=3
    ).toPandas()
    assert len(packed) == 250
    # per-bin invariants
    for (_, b), grp in packed.groupby(["host", "bin_id"]):
        assert len(grp) <= 20
        assert sum(len(u) + 3 for u in grp.url) <= 100
    # greedy order: bins follow (priority, url) order
    packed = packed.sort_values(["priority", "url"]).reset_index(drop=True)
    bins = packed.bin_id.tolist()
    assert bins == sorted(bins)


def test_pack_commands_oversize_item(spark):
    df = spark.createDataFrame(
        [("h", "x" * 500, 0), ("h", "small", 1)], "host string, url string, priority long"
    )
    packed = pack_commands(df, byte_budget=100, max_items=10).toPandas()
    assert packed.bin_id.nunique() == 2  # oversize item isolated


def test_tsv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a/b", "2020-01-01 00:00:00", "text one"),
         ("https://a/c", "2020-01-02 00:00:00", "tab\ttext"),
         ("https://a/d", "2020-01-03 00:00:00", "multi\nline\ntext")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    path = str(tmp_path / "tsv")
    fetched_to_tsv(df, path)
    back = tsv_to_fetched(spark, path).toPandas().sort_values("url")
    assert back.url.tolist() == ["https://a/b", "https://a/c", "https://a/d"]
    assert back.text.tolist()[0] == "text one"
    assert back.text.tolist()[2] == "multi\nline\ntext"  # quoted newlines survive


def test_seed_quarantine_and_fail(spark, tmp_path):
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus

    corpus = gen_corpus(n_pages=60, n_hosts=4, n_seeds=5, seed=11)
    sdfs = corpus_to_spark(spark, corpus)
    bad_seeds = spark.createDataFrame(
        [("not a url", 0), ("https://ok.example.com/p/0", 0), ("::garbage::", 0)],
        "url string, depth int",
    )
    eng = FrontierScheduler(
        spark, sdfs["pages"], sdfs["host_policy"], str(tmp_path / "q"),
        FrontierConfig(max_rounds=1),
    )
    m = eng.init_state(bad_seeds)
    q = spark.read.parquet(m["quarantine"]).toPandas()
    assert sorted(q.url) == ["::garbage::", "not a url"]

    eng2 = FrontierScheduler(
        spark, sdfs["pages"], sdfs["host_policy"], str(tmp_path / "f"),
        FrontierConfig(max_rounds=1, seed_validation="fail"),
    )
    with pytest.raises(ValueError, match="unparseable seed"):
        eng2.init_state(bad_seeds)


def test_forget_allows_recrawl(spark, tmp_path):
    """U3: forgotten urls leave the seen set and re-enter the frontier
    via discovery on the next round."""
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus

    corpus = gen_corpus(n_pages=80, n_hosts=4, n_seeds=8, seed=13)
    sdfs = corpus_to_spark(spark, corpus)
    eng = FrontierScheduler(
        spark, sdfs["pages"], sdfs["host_policy"], str(tmp_path / "s"),
        FrontierConfig(max_rounds=3),
    )
    m = eng.run(seeds=sdfs["seeds"], max_rounds=3)
    seen_before = {r["url"] for r in eng.seen(m).select("url").collect()}
    victim = sorted(seen_before)[0]
    m2 = eng.forget(spark.createDataFrame([(victim,)], "url string"), m)
    seen_after = {r["url"] for r in eng.seen(m2).select("url").collect()}
    assert victim not in seen_after
    assert seen_after == seen_before - {victim}
