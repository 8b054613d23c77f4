"""Gzip-compressed html payloads (the Common-Crawl WARC reality,
and the reference's per-frame decompression,
ws_client_internal.rs:629-668): a crawl over a gzipped corpus must
produce IDENTICAL ordering, seen set, and extracted text as the same
corpus stored plain."""

import gzip

from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus


def _run(spark, sdfs, state):
    eng = FrontierScheduler(
        spark, sdfs["pages"], sdfs["host_policy"], state,
        FrontierConfig(max_rounds=4, n_seen_buckets=4),
    )
    m = eng.run(seeds=sdfs["seeds"], max_rounds=4)
    got = eng.fetched(m).toPandas()
    seen = {r["url"] for r in eng.seen(m).select("url").collect()}
    return got, seen


def test_gzipped_corpus_identical_crawl(spark, tmp_path):
    corpus = gen_corpus(n_pages=90, n_hosts=5, n_seeds=8, seed=31)
    plain = corpus_to_spark(spark, corpus)
    gz = dict(corpus)
    gz["pages"] = corpus["pages"].copy()
    gz["pages"]["html"] = gz["pages"]["html"].map(
        lambda b: gzip.compress(b, mtime=0)
    )
    gzs = corpus_to_spark(spark, gz)

    a, seen_a = _run(spark, plain, str(tmp_path / "plain"))
    b, seen_b = _run(spark, gzs, str(tmp_path / "gz"))
    cols = ["round", "rank_in_round", "url", "status", "text", "text_sha256"]
    a = a.sort_values(["round", "url"]).reset_index(drop=True)
    b = b.sort_values(["round", "url"]).reset_index(drop=True)
    assert a[cols].equals(b[cols])
    assert seen_a == seen_b
    assert (a.status == "ok").sum() > 10
