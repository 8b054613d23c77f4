"""Engine-vs-oracle e2e: the Spark FrontierScheduler must reproduce
the sequential oracle exactly — crawl ordering by (round, priority,
url), final seen-set, byte-identical text — per BASELINE.json.

This replaces the reference's live-API smoke tests
(crypto-crawler/tests/utils/mod.rs:39-146) with deterministic
fixture-vs-oracle comparison (SURVEY.md §5).
"""

import pandas as pd
import pytest

from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
from crypto_crawler_rs_spark.plans.oracle import OracleCrawler
from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus

MAX_ROUNDS = 6


@pytest.fixture(scope="module")
def corpus():
    return gen_corpus(n_pages=150, n_hosts=8, n_seeds=10, links_per_page=3)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    return OracleCrawler(corpus["pages"], corpus["host_policy"]).run(
        corpus["seeds"], max_rounds=MAX_ROUNDS
    )


@pytest.fixture(scope="module")
def engine(spark, corpus, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("state"))
    sdfs = corpus_to_spark(spark, corpus)
    eng = FrontierScheduler(
        spark,
        sdfs["pages"],
        sdfs["host_policy"],
        state,
        FrontierConfig(max_rounds=MAX_ROUNDS, n_seen_buckets=8),
    )
    manifest = eng.run(seeds=sdfs["seeds"], max_rounds=MAX_ROUNDS)
    return eng, manifest


def _engine_fetched(engine) -> pd.DataFrame:
    eng, manifest = engine
    return eng.fetched(manifest).toPandas()


def test_crawl_ordering_exact_match(engine, oracle_result):
    got = _engine_fetched(engine)
    got_sched = (
        got[got.status.isin(["ok", "missing"])]
        .sort_values(["round", "rank_in_round"])
        .reset_index(drop=True)
    )
    exp = oracle_result.fetched
    exp_sched = (
        exp[exp.status.isin(["ok", "missing"])]
        .sort_values(["round", "rank_in_round"])
        .reset_index(drop=True)
    )
    assert len(got_sched) > 20, "crawl did not progress"
    assert got_sched["url"].tolist() == exp_sched["url"].tolist()
    assert got_sched["round"].tolist() == exp_sched["round"].tolist()
    assert (
        got_sched["rank_in_round"].astype(int).tolist()
        == exp_sched["rank_in_round"].astype(int).tolist()
    )
    assert got_sched["status"].tolist() == exp_sched["status"].tolist()


def test_byte_identical_text(engine, oracle_result, corpus):
    got = _engine_fetched(engine)
    ok = got[got.status == "ok"]
    truth = dict(zip(corpus["pages"].url, corpus["pages"].text))
    assert len(ok) > 0
    for _, row in ok.iterrows():
        assert row.text == truth[row.url], f"text drift for {row.url}"


def test_seen_set_equality(engine, oracle_result):
    eng, manifest = engine
    got_seen = set(r["url"] for r in eng.seen(manifest).select("url").collect())
    assert got_seen == oracle_result.seen


def test_robots_and_deferred_match(engine, oracle_result):
    got = _engine_fetched(engine)
    exp = oracle_result.fetched
    for status in ("robots_denied", "over_budget"):
        g = got[got.status == status].groupby("round")["url"].apply(set).to_dict()
        e = exp[exp.status == status].groupby("round")["url"].apply(set).to_dict()
        assert g == e, f"{status} rows diverge"


def test_metrics_lineage_present(engine):
    eng, manifest = engine
    m = eng.metrics(manifest).toPandas()
    assert m["scheduled"].fillna(0).sum() > 0
    assert set(m.columns) >= {
        "round",
        "partition_id",
        "candidates",
        "scheduled",
        "fetched_ok",
        "errors",
        "bloom_pruned",
    }


def test_resume_exact(spark, corpus, oracle_result, tmp_path):
    """Kill after round k, resume from the manifest snapshot — final
    state must be identical to the uninterrupted run (north_rule
    resumability; reference analog: reconnect-with-replay,
    crypto-ws-client/src/common/ws_client_internal.rs:339-454)."""
    state = str(tmp_path / "state_resume")
    sdfs = corpus_to_spark(spark, corpus)
    cfg = FrontierConfig(max_rounds=MAX_ROUNDS, n_seen_buckets=8)
    eng = FrontierScheduler(spark, sdfs["pages"], sdfs["host_policy"], state, cfg)
    # run 2 rounds, then "crash"
    eng.run(seeds=sdfs["seeds"], max_rounds=2)
    # new scheduler instance resumes purely from disk state
    eng2 = FrontierScheduler(spark, sdfs["pages"], sdfs["host_policy"], state, cfg)
    manifest = eng2.run(max_rounds=MAX_ROUNDS)

    got = eng2.fetched(manifest).toPandas()
    got_sched = (
        got[got.status.isin(["ok", "missing"])]
        .sort_values(["round", "rank_in_round"])
        .reset_index(drop=True)
    )
    exp = oracle_result.fetched
    exp_sched = (
        exp[exp.status.isin(["ok", "missing"])]
        .sort_values(["round", "rank_in_round"])
        .reset_index(drop=True)
    )
    assert got_sched["url"].tolist() == exp_sched["url"].tolist()
    got_seen = set(r["url"] for r in eng2.seen(manifest).select("url").collect())
    assert got_seen == oracle_result.seen
