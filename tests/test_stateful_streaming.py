"""applyInPandasWithState politeness gate: budget state must carry
ACROSS micro-batches (the whole point of GroupState)."""

import pandas as pd


def test_budget_gate_state_across_batches(spark, tmp_path):
    from crypto_crawler_rs_spark.streaming.stateful import budget_gate

    landing = tmp_path / "req"
    landing.mkdir()
    # 3 files -> maxFilesPerTrigger=1 -> 3 micro-batches; host h1 gets
    # 4 requests per batch, budget 5 total -> admits 4 in batch 1,
    # 1 in batch 2, 0 in batch 3
    for b in range(3):
        pd.DataFrame(
            {
                "host": ["h1"] * 4 + ["h2"] * 2,
                "url": [f"https://h1/p/{b}-{i}" for i in range(4)]
                + [f"https://h2/p/{b}-{i}" for i in range(2)],
                "priority": list(range(4)) + [0, 1],
            }
        ).to_parquet(landing / f"b{b}.parquet", index=False)

    stream = (
        spark.readStream.schema("host string, url string, priority long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing))
    )
    gated = budget_gate(stream, budget=5)
    q = (
        gated.writeStream.format("memory")
        .queryName("gate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from gate_out").toPandas()
    assert len(out) == 18
    h1 = out[out.host == "h1"]
    h2 = out[out.host == "h2"]
    assert int(h1.admitted.sum()) == 5  # budget enforced ACROSS batches
    assert int(h2.admitted.sum()) == 5  # 2+2+1
    assert h1.admitted_so_far.max() == 5


def test_trap_gate_suppresses_across_batches(spark, tmp_path):
    """Cumulative template counts must carry across micro-batches:
    the /cal/N template crosses min_urls=5 mid-stream and every later
    url of it is suppressed; the benign /about template never is."""
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.streaming.stateful import trap_gate

    landing = tmp_path / "cand"
    landing.mkdir()
    for b in range(3):
        pd.DataFrame(
            {
                "url": [f"https://x.test/cal/{b}{i}" for i in range(3)]
                + [f"https://x.test/about{b}"],
            }
        ).to_parquet(landing / f"b{b}.parquet", index=False)

    stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(landing))
    )
    # masking is JVM-side, via the SHARED batch-operator helpers
    from crypto_crawler_rs_spark.operators.traps import host_of, mask_pattern

    keyed = stream.select(
        host_of("url").alias("host"),
        mask_pattern("url").alias("pattern"),
        "url",
    )
    q = (
        trap_gate(keyed, min_urls=5)
        .writeStream.format("memory")
        .queryName("trap_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_trap"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from trap_out").toPandas()
    cal = out[out.pattern == "/cal/N"].sort_values("template_count")
    about = out[out.pattern == "/aboutN"]
    assert len(cal) == 9
    # first 5 pass, urls 6..9 suppressed — state carried across batches
    assert list(cal.suppressed) == [False] * 5 + [True] * 4
    assert not about.suppressed.any()
