"""Duplicate-url pages (re-crawls): the fetch join must see exactly
one row per canonical url — the latest capture wins."""

import datetime as dt

from crypto_crawler_rs_spark.sources.fixtures import _render_html


def test_latest_capture_wins(spark, tmp_path):
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler

    u = "https://a.example.com/p/0"
    old_html = _render_html("old title", ["old body"], [])
    new_html = _render_html("new title", ["new body"], [])
    pages = spark.createDataFrame(
        [
            (u, dt.datetime(2020, 1, 1), old_html, "old title\nold body", "en"),
            (u, dt.datetime(2021, 6, 1), new_html, "new title\nnew body", "en"),
            # messy spelling of the same url, even older
            ("HTTPS://A.Example.COM:443/p/0", dt.datetime(2019, 1, 1), old_html,
             "old title\nold body", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    policy = spark.createDataFrame(
        [("a.example.com", 0, 5, [], 1, False)],
        "host string, host_rank long, budget_per_round int, robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean",
    )
    seeds = spark.createDataFrame([(u, 0)], "url string, depth int")
    eng = FrontierScheduler(
        spark, pages, policy, str(tmp_path / "s"), FrontierConfig(max_rounds=2)
    )
    m = eng.run(seeds=seeds, max_rounds=2)
    f = eng.fetched(m).toPandas()
    ok = f[f.status == "ok"]
    assert len(ok) == 1  # exactly one fetch despite 3 page rows
    assert ok.iloc[0].text == "new title\nnew body"  # latest capture
