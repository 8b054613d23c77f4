"""Storage-adapter contract: the round loop must be storage-agnostic.

plans/state.py claims the Iceberg swap changes nothing about the
engine.  This suite proves the claim mechanically: the same crawl
through the default StateStore and through FlatStateStore (different
directory scheme AND manifest filename) must be identical — results,
seen set, AND crash-resume behavior, since resume reads only the
manifest the adapter committed.
"""

from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
from crypto_crawler_rs_spark.plans.state import FlatStateStore, StateStore
from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus


def _crawl(spark, sdfs, state_dir, store_cls, rounds=4, **cfg_kw):
    store = store_cls(spark, state_dir)
    eng = FrontierScheduler(
        spark, sdfs["pages"], sdfs["host_policy"], state_dir,
        FrontierConfig(max_rounds=rounds, n_seen_buckets=4, **cfg_kw),
        store=store,
    )
    m = eng.run(seeds=sdfs["seeds"], max_rounds=rounds)
    f = eng.fetched(m).toPandas()
    sched = f[f.status.isin(["ok", "missing"])].sort_values(["round", "rank_in_round"])
    return (
        eng,
        m,
        sched[["round", "url", "status", "text_sha256"]]
        .to_records(index=False)
        .tolist(),
        {r["url"] for r in eng.seen(m).select("url").collect()},
    )


def test_flat_adapter_equals_default(spark, tmp_path):
    corpus = gen_corpus(n_pages=80, n_hosts=4, n_seeds=8, seed=61)
    sdfs = corpus_to_spark(spark, corpus)
    _, _, sched_a, seen_a = _crawl(spark, sdfs, str(tmp_path / "a"), StateStore)
    _, _, sched_b, seen_b = _crawl(spark, sdfs, str(tmp_path / "b"), FlatStateStore)
    assert sched_a == sched_b
    assert seen_a == seen_b
    # the layouts really are different (the test has teeth)
    import os

    assert os.path.isdir(tmp_path / "a" / "rounds")
    assert not os.path.isdir(tmp_path / "b" / "rounds")
    assert (tmp_path / "b" / "snapshot-manifest.json").exists()


def test_flat_adapter_forget_resume_equals_default(spark, tmp_path):
    """The full forget + fresh-engine resume flow (covers commit /
    read_manifest / read_union, and the bucket-partitioned tombstone
    path) must be identical through both adapters."""
    corpus = gen_corpus(n_pages=80, n_hosts=4, n_seeds=8, seed=61)
    sdfs = corpus_to_spark(spark, corpus)
    results = {}
    for label, store_cls in (("default", StateStore), ("flat", FlatStateStore)):
        state = str(tmp_path / label)
        eng, m, _, seen_full = _crawl(
            spark, sdfs, state, store_cls, rounds=2,
            seen_anti_join="bucket_pruned",
        )
        victim = sorted(seen_full)[0]
        m = eng.forget(spark.createDataFrame([(victim,)], "url string"), m)
        seen_after_forget = {
            r["url"] for r in eng.seen(m).select("url").collect()
        }
        assert victim not in seen_after_forget
        # a FRESH engine over the same dir resumes from the committed
        # manifest and keeps crawling
        eng2 = FrontierScheduler(
            spark, sdfs["pages"], sdfs["host_policy"], state,
            FrontierConfig(max_rounds=5, n_seen_buckets=4,
                           seen_anti_join="bucket_pruned"),
            store=store_cls(spark, state),
        )
        m2 = eng2.run(max_rounds=5)
        assert m2["round"] > m["round"]
        f = eng2.fetched(m2).toPandas()
        sched = f[f.status.isin(["ok", "missing"])].sort_values(
            ["round", "rank_in_round"]
        )
        results[label] = (
            sched[["round", "url", "status"]].to_records(index=False).tolist(),
            {r["url"] for r in eng2.seen(m2).select("url").collect()},
        )
    assert results["default"] == results["flat"]
