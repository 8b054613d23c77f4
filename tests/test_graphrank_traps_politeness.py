"""Unit tests for the round-4 crawl-intelligence operators:
link-graph PageRank (the computed host-rank source), crawler-trap
detection/suppression, and adaptive EWMA politeness."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crypto_crawler_rs_spark.operators.graphrank import (
    pagerank,
    ranks_to_policy,
)
from crypto_crawler_rs_spark.operators.politeness import (
    ewma_policy,
    host_ewma_delay,
)
from crypto_crawler_rs_spark.operators.traps import (
    suppress_traps,
    trap_patterns,
)


# ---------------------------------------------------------------- pagerank
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_mass_conserved_and_ordered(spark):
    # star graph: everyone links to 'hub', hub links to 'a' only
    e = _edges(
        spark,
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
    )
    # the hub<->a 2-cycle makes power iteration oscillate; run enough
    # iterations to pass the steady state's crossover
    out = pagerank(e, n_iter=30).toPandas().set_index("node")
    # total PageRank mass is conserved (teleport + dangling terms sum to 1)
    assert abs(out["rank"].sum() - 1.0) < 1e-4
    # the hub dominates; 'a' (hub's sole outlink) beats b/c
    assert out.loc["hub", "rank_pos"] == 1
    assert out.loc["a", "rank"] > out.loc["b", "rank"]
    assert out.loc["b", "rank"] == out.loc["c", "rank"]


def test_pagerank_dangling_mass_redistributed(spark):
    # 'sink' has no outlinks: its mass must be teleported, not lost
    e = _edges(spark, [("a", "sink"), ("b", "sink"), ("a", "b")])
    out = pagerank(e, n_iter=8).toPandas()
    assert abs(out["rank"].sum() - 1.0) < 1e-4
    assert out.loc[out.node == "sink", "rank"].iloc[0] == out["rank"].max()


def test_pagerank_self_loops_and_multiedges_collapse(spark):
    e1 = _edges(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")])
    e2 = _edges(spark, [("a", "b"), ("b", "a")])
    r1 = pagerank(e1, n_iter=6).toPandas().sort_values("node").reset_index(drop=True)
    r2 = pagerank(e2, n_iter=6).toPandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)


def test_pagerank_empty_edges(spark):
    out = pagerank(_edges(spark, []), n_iter=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank", "rank_pos"]


def test_ranks_to_policy_shape(spark):
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("hub", "a")])
    pol = ranks_to_policy(pagerank(e, n_iter=5)).toPandas().set_index("host")
    assert pol.loc["hub", "host_rank"] == 0  # best host -> rank 0 (hottest)
    assert set(pol["host_rank"]) == {0, 10, 20}


def test_pagerank_feeds_frontier_policy(spark, tmp_path):
    """End-to-end: a COMPUTED host-rank policy drives the frontier —
    the better-ranked host's urls are scheduled first at equal depth
    (priority = depth + host_rank, plans/frontier.py)."""
    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )

    # h0 is the link-graph winner: everyone points at it
    e = _edges(spark, [("h1", "h0"), ("h2", "h0"), ("h0", "h1")])
    policy = ranks_to_policy(pagerank(e, n_iter=5)).select(
        "host",
        "host_rank",
        F.lit(10).alias("budget_per_round"),
        F.array().cast("array<string>").alias("robots_disallow"),
        F.lit(1).alias("crawl_delay_rounds"),
        F.lit(False).alias("is_hot"),
    )
    pages = spark.createDataFrame(
        [
            (f"https://{h}/p{i}", f"<html>{h}-{i}</html>".encode())
            for h in ("h0", "h1", "h2")
            for i in range(3)
        ],
        "url string, html binary",
    )
    seeds = spark.createDataFrame(
        [(f"https://{h}/p0", 0) for h in ("h0", "h1", "h2")],
        "url string, depth int",
    )
    eng = FrontierScheduler(
        spark,
        pages,
        policy,
        str(tmp_path / "state"),
        FrontierConfig(max_rounds=1),
    )
    eng.run(seeds, max_rounds=1)
    fetched = (
        eng.fetched().where("round = 0").toPandas().sort_values("rank_in_round")
    )
    hosts = [u.split("/")[2] for u in fetched.url]
    assert hosts == ["h0", "h1", "h2"]  # pagerank order, not alphabetical luck


# ------------------------------------------------------------------ traps
def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_trap_patterns_masks_digit_runs(spark):
    urls = _urls(
        spark,
        [
            "https://x.com/cal/2024/01/03",
            "https://x.com/cal/1999/12/31",
            "https://x.com/about",
        ],
    )
    out = trap_patterns(urls, min_urls=2).toPandas().set_index("pattern")
    assert out.loc["/cal/N/N/N", "n_urls"] == 2
    assert bool(out.loc["/cal/N/N/N", "is_trap"])
    assert not bool(out.loc["/about", "is_trap"])


def test_trap_patterns_counts_distinct_not_total(spark):
    urls = _urls(spark, ["https://x.com/p/1"] * 5 + ["https://x.com/p/2"])
    out = trap_patterns(urls, min_urls=3).toPandas()
    assert out.n_urls.iloc[0] == 2  # 2 distinct, 6 total
    assert not out.is_trap.iloc[0]


def test_suppress_traps_drops_only_flagged_templates(spark):
    corpus = [f"https://x.com/cal/{i}" for i in range(10)] + [
        "https://x.com/about",
        "https://y.com/cal/7",  # same template, DIFFERENT host: kept
    ]
    urls = _urls(spark, corpus)
    traps = trap_patterns(
        _urls(spark, [f"https://x.com/cal/{i}" for i in range(10)]), min_urls=5
    )
    kept = sorted(r.url for r in suppress_traps(urls, traps).collect())
    assert kept == ["https://x.com/about", "https://y.com/cal/7"]


# ------------------------------------------------------------- politeness
def _fetches(spark, rows):
    return spark.createDataFrame(
        rows, "host string, latency_ms double, ts long, fetch_id long"
    )


def test_ewma_matches_manual_recursion(spark):
    xs = [100.0, 300.0, 200.0, 50.0]
    df = _fetches(spark, [("h", x, i, i) for i, x in enumerate(xs)])
    out = host_ewma_delay(df, alpha=0.3).toPandas().iloc[0]
    e = xs[0]
    for x in xs[1:]:
        e = 0.3 * x + 0.7 * e
    assert out.n_fetches == 4
    assert math.isclose(out.ewma_ms, round(e, 6), abs_tol=1e-9)
    assert out.crawl_delay_rounds == max(1, min(16, math.ceil(round(e, 6) / 100)))


def test_ewma_order_is_by_order_cols_not_arrival(spark):
    # shuffled input rows must still fold in (ts, fetch_id) order
    rows = [("h", 1000.0, 0, 0), ("h", 10.0, 2, 2), ("h", 10.0, 1, 1)]
    df = _fetches(spark, rows[::-1])
    out = host_ewma_delay(df, alpha=0.5).toPandas().iloc[0]
    # e = .5*10 + .5*(.5*10 + .5*1000) = 257.5
    assert math.isclose(out.ewma_ms, 257.5, abs_tol=1e-9)


def test_ewma_delay_clamps(spark):
    lo = _fetches(spark, [("fast", 1.0, 0, 0)])
    hi = _fetches(spark, [("slow", 1e7, 0, 0)])
    assert host_ewma_delay(lo).toPandas().crawl_delay_rounds.iloc[0] == 1
    assert host_ewma_delay(hi).toPandas().crawl_delay_rounds.iloc[0] == 16


def test_ewma_policy_overlays_only_observed_hosts(spark):
    base = spark.createDataFrame(
        [("a", 2), ("b", 2)], "host string, crawl_delay_rounds int"
    )
    delays = host_ewma_delay(_fetches(spark, [("a", 950.0, 0, 0)]))
    out = ewma_policy(delays, base).toPandas().set_index("host")
    assert out.loc["a", "crawl_delay_rounds"] == 10  # ceil(950/100)
    assert out.loc["b", "crawl_delay_rounds"] == 2  # static default kept


# ------------------------------------------------- engine trap suppression
def _trap_corpus(spark):
    """Seed page links a calendar trap (/cal/N, 8 distinct urls) and
    two benign pages; trap pages link further into the trap."""
    from pyspark.sql import functions as F  # noqa: F401

    def page(url, links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return (url, f"<html>{body}</html>".encode())

    trap_urls = [f"https://t.example/cal/{i}" for i in range(8)]
    rows = [
        page(
            "https://t.example/",
            trap_urls[:4] + ["https://t.example/about", "https://t.example/faq"],
        ),
        page("https://t.example/about", trap_urls[4:6]),
        page("https://t.example/faq", trap_urls[6:]),
    ] + [page(u, []) for u in trap_urls]
    pages = spark.createDataFrame(rows, "url string, html binary")
    policy = spark.createDataFrame(
        [("t.example", 0, 100, [], 1, False)],
        "host string, host_rank long, budget_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean",
    )
    seeds = spark.createDataFrame(
        [("https://t.example/", 0)], "url string, depth int"
    )
    return pages, policy, seeds


def test_frontier_trap_suppression_blocks_flagged_templates(spark, tmp_path):
    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )

    pages, policy, seeds = _trap_corpus(spark)
    eng = FrontierScheduler(
        spark,
        pages,
        policy,
        str(tmp_path / "trap_state"),
        FrontierConfig(max_rounds=6, trap_min_urls=4, n_seen_buckets=4),
    )
    m = eng.run(seeds, max_rounds=6)
    fetched = {r.url for r in eng.fetched(m).select("url").collect()}
    # benign pages crawled
    assert {"https://t.example/", "https://t.example/about",
            "https://t.example/faq"} <= fetched
    # the /cal/N template hit min_urls=4 in round 1's discovery and
    # was suppressed whole: no trap url is ever fetched
    assert not any("/cal/" in u for u in fetched)
    # trap memory persisted: cumulative counts table committed
    assert "trap_counts" in m


def test_frontier_trap_suppression_off_by_default_crawls_everything(
    spark, tmp_path
):
    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )

    pages, policy, seeds = _trap_corpus(spark)
    eng = FrontierScheduler(
        spark,
        pages,
        policy,
        str(tmp_path / "notrap_state"),
        FrontierConfig(max_rounds=6, n_seen_buckets=4),
    )
    m = eng.run(seeds, max_rounds=6)
    fetched = {r.url for r in eng.fetched(m).select("url").collect()}
    assert sum("/cal/" in u for u in fetched) == 8  # all trap urls crawled
    assert "trap_counts" not in m


# ----------------------------------------------- crawl-derived rank refresh
def test_host_edges_and_rank_refresh_close_the_loop(spark):
    """The reference refreshes its rank table hourly from an external
    API (cmc_rank.rs:275-312); here the crawl's own pages produce the
    rank: host_edges -> pagerank -> refresh_host_rank overlays the
    computed position onto the static policy."""
    from crypto_crawler_rs_spark.operators.graphrank import (
        host_edges,
        pagerank,
        refresh_host_rank,
    )

    def page(url, links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return (url, f"<html>{body}</html>".encode())

    # b.test and c.test both link to a.test; a.test links to b.test
    pages = spark.createDataFrame(
        [
            page("https://b.test/", ["https://a.test/x", "https://a.test/y"]),
            page("https://c.test/", ["https://a.test/z"]),
            page("https://a.test/", ["https://b.test/p"]),
        ],
        "url string, html binary",
    )
    edges = host_edges(pages).toPandas()
    assert set(map(tuple, edges.values)) == {
        ("b.test", "a.test"),
        ("c.test", "a.test"),
        ("a.test", "b.test"),
    }  # host-granular, deduped (a.test/x and /y collapse to one edge)

    ranks = pagerank(host_edges(pages), n_iter=20)
    base = spark.createDataFrame(
        [("a.test", 500), ("b.test", 500), ("unknown.test", 7)],
        "host string, host_rank long",
    )
    out = refresh_host_rank(base, ranks).toPandas().set_index("host")
    assert out.loc["a.test", "host_rank"] == 0  # most-linked host -> hottest
    assert out.loc["b.test", "host_rank"] == 10
    assert out.loc["unknown.test", "host_rank"] == 7  # static rank kept


def test_pagerank_tol_early_stop_matches_converged(spark):
    """tol stops iteration once the L1 delta is below threshold; the
    result must agree with a long fixed run to well inside the
    rounding precision."""
    from crypto_crawler_rs_spark.operators.graphrank import pagerank

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("d", "b")],
    )
    fixed = (
        pagerank(e, n_iter=60)
        .toPandas().sort_values("node").reset_index(drop=True)
    )
    early = (
        pagerank(e, n_iter=60, tol=1e-9)
        .toPandas().sort_values("node").reset_index(drop=True)
    )
    assert (early.node == fixed.node).all()
    assert (early["rank"] - fixed["rank"]).abs().max() <= 1e-6
    assert (early.rank_pos == fixed.rank_pos).all()


def test_adaptive_politeness_closes_the_loop(spark, tmp_path):
    """Crawl -> observe per-host latency -> host_ewma_delay ->
    ewma_policy overlay -> resume: the engine spaces the slow host's
    fetches by the ADAPTED delay while the fast host keeps cadence.
    (The reference hard-codes this per exchange, utils.rs:76-103.)"""
    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )

    def page(url, links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return (url, f"<html>{body}</html>".encode())

    hosts = ("slow.test", "fast.test")
    rows = []
    for h in hosts:
        rows.append(page(f"https://{h}/", [f"https://{h}/p{i}" for i in range(3)]))
        rows += [page(f"https://{h}/p{i}", []) for i in range(3)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    base_policy = spark.createDataFrame(
        [(h, 0, 1, [], 1, False) for h in hosts],
        "host string, host_rank long, budget_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean",
    )
    seeds = spark.createDataFrame(
        [(f"https://{h}/", 0) for h in hosts], "url string, depth int"
    )
    state = str(tmp_path / "adaptive_state")
    cfg = FrontierConfig(max_rounds=64, n_seen_buckets=4)
    eng = FrontierScheduler(spark, pages, base_policy, state, cfg)
    m = eng.run(seeds, max_rounds=2)

    # observe: slow.test answers in 250ms, fast.test in 40ms
    from crypto_crawler_rs_spark.operators.politeness import (
        ewma_policy,
        host_ewma_delay,
    )

    obs = (
        eng.fetched(m)
        .where("status = 'ok'")
        .select(
            "host",
            F.when(F.col("host") == "slow.test", 250.0)
            .otherwise(40.0)
            .alias("latency_ms"),
            F.col("round").cast("long").alias("ts"),
            F.col("rank_in_round").alias("fetch_id"),
        )
    )
    adapted = ewma_policy(host_ewma_delay(obs), base_policy)
    delays = {r.host: r.crawl_delay_rounds for r in adapted.collect()}
    assert delays == {"slow.test": 3, "fast.test": 1}  # ceil(250/100), floor 1

    # resume the SAME crawl state under the adapted policy
    eng2 = FrontierScheduler(spark, pages, adapted, state, cfg)
    m2 = eng2.run(max_rounds=12)
    fetched = eng2.fetched(m2).toPandas().query("status == 'ok'")
    post = fetched[fetched["round"] >= 2]
    for host, min_gap in (("slow.test", 3), ("fast.test", 1)):
        rounds = sorted(post[post.host == host]["round"].unique())
        assert len(rounds) >= 2, f"{host} needs multiple post-resume rounds"
        gaps = [b - a for a, b in zip(rounds, rounds[1:])]
        assert all(g >= min_gap for g in gaps), (host, rounds)
    slow_rounds = sorted(post[post.host == "slow.test"]["round"].unique())
    fast_rounds = sorted(post[post.host == "fast.test"]["round"].unique())
    # the adapted slow host is actually SLOWER-paced than the fast one
    assert (slow_rounds[1] - slow_rounds[0]) > (fast_rounds[1] - fast_rounds[0])
