"""Bucket-pruned seen membership: exact equality with the shuffle
anti-join path, including tombstone/forget semantics and the
kitchen-sink combination with the sharded bloom probe."""

import datetime as dt

from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
from crypto_crawler_rs_spark.plans.oracle import OracleCrawler
from crypto_crawler_rs_spark.sources.fixtures import _render_html, corpus_to_spark, gen_corpus


def test_bucket_pruned_crawl_matches_oracle(spark, tmp_path):
    corpus = gen_corpus(n_pages=110, n_hosts=6, n_seeds=9, seed=43)
    sdfs = corpus_to_spark(spark, corpus)
    eng = FrontierScheduler(
        spark, sdfs["pages"], sdfs["host_policy"], str(tmp_path / "s"),
        FrontierConfig(
            max_rounds=5,
            n_seen_buckets=8,
            seen_anti_join="bucket_pruned",
            bloom_probe_mode="sharded",
            compact_seen_every=3,  # exercise bucketed compaction too
        ),
    )
    m = eng.run(seeds=sdfs["seeds"], max_rounds=5)
    exp = OracleCrawler(corpus["pages"], corpus["host_policy"]).run(
        corpus["seeds"], max_rounds=5
    )
    got = eng.fetched(m).toPandas()
    gs = got[got.status.isin(["ok", "missing"])].sort_values(["round", "rank_in_round"])
    es = exp.fetched[exp.fetched.status.isin(["ok", "missing"])].sort_values(
        ["round", "rank_in_round"]
    )
    assert gs["url"].tolist() == es["url"].tolist()
    assert gs["rank_in_round"].astype(int).tolist() == es["rank_in_round"].astype(int).tolist()
    assert {r["url"] for r in eng.seen(m).select("url").collect()} == exp.seen
    # the seen deltas really are hive-bucketed on disk
    import os

    assert any(
        d.startswith("bucket=")
        for d in os.listdir(m["seen"][0])
        if not d.startswith("_")
    )


def test_bucket_pruned_forget_recrawl(spark, tmp_path):
    """The round-scoped tombstone semantics of test_advice_fixes, in
    bucket_pruned mode: forgotten url re-fetched exactly once."""
    host = "a.example.com"
    n = 10
    urls = [f"https://{host}/p/{i}" for i in range(n)]
    rows = []
    for i in range(n):
        links = [urls[i + 1]] if i + 1 < n else []
        if i >= 1:
            links.append(urls[0])
        rows.append(
            (urls[i], dt.datetime(2020, 1, 1),
             _render_html(f"t{i}", [f"body {i}"], links), f"t{i}\nbody {i}", "en")
        )
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    policy = spark.createDataFrame(
        [(host, 0, 1, [], 1, False)],
        "host string, host_rank long, budget_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean",
    )
    seeds = spark.createDataFrame([(urls[0], 0)], "url string, depth int")
    eng = FrontierScheduler(
        spark, pages, policy, str(tmp_path / "s"),
        FrontierConfig(
            max_rounds=8, emit_deferred=False, n_seen_buckets=4,
            seen_anti_join="bucket_pruned",
        ),
    )
    m = eng.run(seeds=seeds, max_rounds=3)
    m = eng.forget(spark.createDataFrame([(urls[0],)], "url string"), m)
    m = eng.run(max_rounds=8)
    f = eng.fetched(m).toPandas()
    p0 = f[(f.url == urls[0]) & (f.status == "ok")]
    assert sorted(p0["round"]) == [0, 4]
    assert urls[0] in {r["url"] for r in eng.seen(m).select("url").collect()}
