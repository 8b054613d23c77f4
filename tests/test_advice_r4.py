"""Round-4 advisor regressions (ADVICE.md r3).

#1 (medium): resuming a state dir whose seen deltas were written in
'shuffle' layout (no bucket=K dirs) under seen_anti_join=
'bucket_pruned' must NOT treat the previously-seen set as empty —
operators/seenjoin.py now falls back to whole-root reads for flat
seen roots, exactly like the tombstone legacy fallback.

#3 (low): a second forget() in one round writes its counting filter
to a FRESH path — the path a committed manifest references is never
overwritten (write-immutable-then-commit).
"""

import os

import pytest


def _mk(spark, tmp_path, cfg, corpus):
    from crypto_crawler_rs_spark.plans.frontier import FrontierScheduler
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark

    sdfs = corpus_to_spark(spark, corpus)
    return (
        FrontierScheduler(
            spark, sdfs["pages"], sdfs["host_policy"], str(tmp_path / "s"), cfg
        ),
        sdfs,
    )


def test_resume_shuffle_layout_under_bucket_pruned_keeps_seen_set(spark, tmp_path):
    """Crawl 2 rounds in shuffle layout, resume bucket_pruned for the
    rest: the fetch log must equal the oracle's uninterrupted run
    (flat seen deltas readable => nothing re-crawled) and no url may
    be fetched ok twice."""
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
    from crypto_crawler_rs_spark.plans.oracle import OracleCrawler
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus

    corpus = gen_corpus(n_pages=150, n_hosts=6, n_seeds=10, seed=31)
    sdfs = corpus_to_spark(spark, corpus)
    state = str(tmp_path / "s")

    eng1 = FrontierScheduler(
        spark,
        sdfs["pages"],
        sdfs["host_policy"],
        state,
        FrontierConfig(max_rounds=2, seen_anti_join="shuffle"),
    )
    m2 = eng1.run(seeds=sdfs["seeds"], max_rounds=2)
    # precondition: the round-1/2 seen deltas really are flat
    for p in m2["seen"]:
        assert not any(e.startswith("bucket=") for e in os.listdir(p))

    eng2 = FrontierScheduler(
        spark,
        sdfs["pages"],
        sdfs["host_policy"],
        state,
        FrontierConfig(max_rounds=5, seen_anti_join="bucket_pruned"),
    )
    m = eng2.run(max_rounds=5)

    oracle = OracleCrawler(corpus["pages"], corpus["host_policy"]).run(
        corpus["seeds"], max_rounds=5
    )
    got = eng2.fetched(m).toPandas()
    gs = (
        got[got.status.isin(["ok", "missing"])]
        .sort_values(["round", "rank_in_round"])
        .reset_index(drop=True)
    )
    es = (
        oracle.fetched[oracle.fetched.status.isin(["ok", "missing"])]
        .sort_values(["round", "rank_in_round"])
        .reset_index(drop=True)
    )
    assert gs["url"].tolist() == es["url"].tolist()
    # the sharpest symptom of the bug: re-crawled urls
    assert gs["url"].is_unique
    seen = {r["url"] for r in eng2.seen(m).select("url").collect()}
    assert seen == oracle.seen


def test_second_forget_same_round_uses_fresh_bloom_path(spark, tmp_path):
    """Two forgets in one round must reference two distinct immutable
    filter files, and both forgotten urls must be re-crawlable."""
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig
    from crypto_crawler_rs_spark.sources.fixtures import gen_corpus

    corpus = gen_corpus(n_pages=120, n_hosts=6, n_seeds=10, seed=23)
    cfg = FrontierConfig(max_rounds=3, bloom_counting=True)
    eng, sdfs = _mk(spark, tmp_path, cfg, corpus)
    m = eng.run(seeds=sdfs["seeds"], max_rounds=3)

    seen_urls = [r["url"] for r in eng.seen(m).select("url").limit(4).collect()]
    assert len(seen_urls) >= 2
    f1 = spark.createDataFrame([(seen_urls[0],)], "url string")
    f2 = spark.createDataFrame([(seen_urls[1],)], "url string")
    m1 = eng.forget(f1, m)
    b1 = m1["bloom"]
    m2 = eng.forget(f2, m1)
    b2 = m2["bloom"]
    assert b1 != b2, "second forget overwrote the committed filter path"
    assert os.path.exists(os.path.join(b1, "meta.json")) or os.listdir(b1)
    # both tombstones recorded
    assert len(m2["tombstones"]) == len(m["tombstones"]) + 2
    # neither forgotten url is in the effective seen set any more
    left = {r["url"] for r in eng.seen(m2).select("url").collect()}
    assert seen_urls[0] not in left and seen_urls[1] not in left
