"""robots.txt parser → host-policy table → identical crawl.

The engine consumes robots as prefix lists (host_policy.
robots_disallow); sources/robots.py produces them from raw
robots.txt.  Parser semantics are pinned directly, then the full
chain is proven by driving the SAME crawl from (a) the fixture's
prefix lists and (b) robots.txt text synthesized from them — the
fetch logs must be identical.
"""

import pandas as pd
import pytest

from crypto_crawler_rs_spark.sources.robots import parse_robots_txt, robots_policy


def test_parser_groups_and_agent_selection():
    txt = """
# global
User-agent: *
Disallow: /private
Disallow: /tmp/

User-agent: SparkBot
User-agent: OtherBot
Disallow: /spark-only
Allow: /spark-only/docs

User-agent: Spark
Disallow: /short-agent
"""
    # '*' group for an unknown agent
    dis, allow, delay = parse_robots_txt(txt, "randombot/1.0")
    assert dis == ["/private", "/tmp/"] and allow == [] and delay is None
    # longest matching agent token wins (sparkbot > spark)
    dis, allow, _ = parse_robots_txt(txt, "SparkBot/2.1")
    assert dis == ["/spark-only"] and allow == ["/spark-only/docs"]
    # shorter token when only it matches
    dis, _, _ = parse_robots_txt(txt, "sparkling-crawler")
    assert dis == ["/short-agent"]


def test_parser_edge_cases():
    # case-insensitive directives, CRLF, comments, empty Disallow
    txt = "USER-AGENT: *\r\nDISALLOW: /a # trailing comment\r\nDisallow:\r\n"
    dis, allow, delay = parse_robots_txt(txt, "*")
    assert dis == ["/a"] and allow == [] and delay is None
    # no matching group at all -> everything allowed
    assert parse_robots_txt("User-agent: onlybot\nDisallow: /x\n", "me") == (
        [], [], None,
    )
    # rules before any User-agent line are ignored
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nDisallow: /y\n", "z") == (
        ["/y"],
        [],
        None,
    )
    # Crawl-delay parses per-group; junk values ignored
    txt2 = ("User-agent: *\nCrawl-delay: 2.5\nDisallow: /q\n\n"
            "User-agent: fastbot\nCrawl-delay: zero\n")
    assert parse_robots_txt(txt2, "slowbot") == (["/q"], [], 2.5)
    assert parse_robots_txt(txt2, "fastbot")[2] is None
    # merged groups: two groups naming '*' both apply
    txt3 = "User-agent: *\nDisallow: /one\n\nUser-agent: *\nDisallow: /two\n"
    assert parse_robots_txt(txt3, "any")[0] == ["/one", "/two"]


def test_robots_chain_drives_identical_crawl(spark, tmp_path):
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus

    corpus = gen_corpus(n_pages=150, n_hosts=8, n_seeds=10, seed=43)
    sdfs = corpus_to_spark(spark, corpus)

    # synthesize robots.txt per host from the fixture's prefix lists
    pol = corpus["host_policy"]
    robots_rows = [
        (
            r.host,
            "# synthetic\nUser-agent: *\n"
            + "".join(f"Disallow: {p}\n" for p in (r.robots_disallow or [])),
        )
        for r in pol.itertuples(index=False)
    ]
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt string")
    parsed = robots_policy(robots)
    # engine policy: fixture table with robots_disallow REPLACED by
    # the parsed output
    policy_b = (
        sdfs["host_policy"]
        .drop("robots_disallow")
        .join(parsed.select("host", "robots_disallow"), "host", "left")
    )

    def crawl(policy, sub):
        eng = FrontierScheduler(
            spark, sdfs["pages"], policy, str(tmp_path / sub),
            FrontierConfig(max_rounds=4),
        )
        m = eng.run(seeds=sdfs["seeds"], max_rounds=4)
        return (
            eng.fetched(m)
            .select("round", "rank_in_round", "url", "status")
            .toPandas()
            .sort_values(["round", "url"])
            .fillna(-1)
            .reset_index(drop=True)
        )

    a = crawl(sdfs["host_policy"], "a")
    b = crawl(policy_b, "b")
    pd.testing.assert_frame_equal(a, b)
    # the fixture actually exercises robots (test has teeth)
    assert (a.status == "robots_denied").any()
