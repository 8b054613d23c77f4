"""Scale-path equivalence tests: the scalable implementations must
produce byte-identical results to their simple counterparts, and the
backoff state machine must follow the FIXTURES.md §6 unit vectors."""

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from crypto_crawler_rs_spark.operators.pop import pop_per_host
from crypto_crawler_rs_spark.operators.rank import global_rank


def test_global_rank_matches_single_partition_window(spark):
    """The two-pass range-partitioned rank == the naive global window
    (the small/big paths of the frontier must be interchangeable)."""
    df = spark.range(5000).select(
        F.pmod(F.xxhash64("id"), F.lit(97)).alias("priority"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    scalable = {
        (r.url): r.rk
        for r in global_rank(df, ["priority", "url"], out_col="rk", num_partitions=7).collect()
    }
    w = Window.orderBy("priority", "url")
    naive = {
        r.url: r.rk
        for r in df.withColumn("rk", F.row_number().over(w).cast("long")).collect()
    }
    assert scalable == naive


def test_salted_pop_equals_unsalted_under_skew(spark):
    """Hot-host salting is a physical optimization only: the selected
    set must be identical with any salt count (one hot host holds 60%
    of candidates)."""
    rows = []
    for i in range(3000):
        host = "hot.example.com" if i % 5 < 3 else f"h{i % 11}.example.com"
        rows.append((host, f"https://{host}/p/{i}", 0, i % 500, 7, host.startswith("hot")))
    df = spark.createDataFrame(
        rows,
        "host string, url string, depth int, priority long, budget_per_round int, is_hot boolean",
    )
    pick = lambda n: {
        r.url
        for r in pop_per_host(df, n_salts=n).filter("scheduled").collect()
    }
    s1, s16, s64 = pick(1), pick(16), pick(64)
    assert s1 == s16 == s64
    # budget respected per host
    per_host = (
        pop_per_host(df, n_salts=16)
        .filter("scheduled")
        .groupBy("host")
        .count()
        .collect()
    )
    assert all(r["count"] <= 7 for r in per_host)


def test_backoff_unit_vectors(spark, tmp_path):
    """FIXTURES.md §6: failure rounds double next_eligible offsets
    (1,2,4...); success resets.  A host whose pages are all missing
    must follow 2,4,8 spacing (reference A3,
    crypto-crawler/src/crawlers/utils.rs:141-199)."""
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler

    # pages table WITHOUT the seed urls -> every fetch misses
    pages = spark.createDataFrame(
        [("https://other.example.com/p/0", None, b"<html></html>", "", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    policy = spark.createDataFrame(
        [("dead.example.com", 0, 5, [], 1, False)],
        "host string, host_rank long, budget_per_round int, robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean",
    )
    # many dead urls on one host so it keeps retrying new ones
    seeds = spark.createDataFrame(
        [(f"https://dead.example.com/p/{i}", 0) for i in range(40)],
        "url string, depth int",
    )
    eng = FrontierScheduler(
        spark, pages, policy, str(tmp_path / "s"), FrontierConfig(max_rounds=8)
    )
    m = eng.run(seeds=seeds, max_rounds=8)
    fetched = eng.fetched(m).toPandas()
    sched = fetched[fetched.status == "missing"]
    rounds_with_fetch = sorted(sched["round"].unique())
    # round 0 fails -> backoff 2 -> next at round 2 -> backoff 4 -> round 6
    assert rounds_with_fetch == [0, 2, 6]


def test_crawl_delay_spacing(spark, tmp_path):
    """crawl_delay_rounds=3 with successes: fetches land every 3rd
    round (reference connect-interval pacing, crawlers/utils.rs:336-347)."""
    from crypto_crawler_rs_spark.sources.fixtures import _render_html
    from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler

    urls = [f"https://slow.example.com/p/{i}" for i in range(6)]
    pages = spark.createDataFrame(
        [(u, None, _render_html(f"t{i}", [f"body {i}"], []), f"t{i}\nbody {i}", "en")
         for i, u in enumerate(urls)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    policy = spark.createDataFrame(
        [("slow.example.com", 0, 2, [], 3, False)],
        "host string, host_rank long, budget_per_round int, robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean",
    )
    seeds = spark.createDataFrame([(u, 0) for u in urls], "url string, depth int")
    eng = FrontierScheduler(
        spark, pages, policy, str(tmp_path / "s"), FrontierConfig(max_rounds=9)
    )
    m = eng.run(seeds=seeds, max_rounds=9)
    fetched = eng.fetched(m).toPandas()
    ok_rounds = sorted(fetched[fetched.status == "ok"]["round"].unique())
    assert ok_rounds == [0, 3, 6]  # budget 2/visit, delay 3 -> 3 visits


def test_distributed_bloom_build_equivalent(spark):
    """Executor-side shard-bitmap build must produce a filter
    bit-identical to the driver-side add over the same rows."""
    import numpy as np

    from crypto_crawler_rs_spark.functions.bloom import (
        ShardedBloom,
        build_shard_bitmaps,
        merge_shard_bitmaps,
    )

    rng = np.random.default_rng(9)
    hh = rng.integers(-(2**31), 2**31, 20000)
    uh = rng.integers(-(2**63), 2**63 - 1, 20000)
    driver_b = ShardedBloom(n_shards=8, bits_per_shard=1 << 14, n_hashes=4)
    driver_b.add(hh, uh)

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(hh, uh)], "host_hash int, url_hash long"
    )
    dist_b = ShardedBloom(n_shards=8, bits_per_shard=1 << 14, n_hashes=4)
    rows = build_shard_bitmaps(df, 8, 1 << 14, 4).collect()
    merge_shard_bitmaps(dist_b, rows)
    assert np.array_equal(driver_b._arr, dist_b._arr)
