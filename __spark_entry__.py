"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (reference file:line cited per query) plus the
training-data-pipeline operators (dedup / similarity / text
analysis); ``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL.
Column names and value determinism are aligned on both sides:
money/quantity aggregates go through exact DECIMAL arithmetic before
a final cast, ratios are rounded, and every ranking has a total
order with an explicit tie-break.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

# python workers spawned by any SparkSession (including the driver
# harness's own) must be able to import crypto_crawler_rs_spark when
# unpickling the pandas UDFs used by several queries
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _pp + (os.pathsep if _pp else "") + _REPO

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

SF0001 = "/root/testdata/sf0.001"


_PKG_ZIP: str | None = None
_SHIPPED_TO: set[str] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package zip to this session's python workers
    (equivalent of `spark-submit --py-files`); idempotent per session."""
    global _PKG_ZIP
    sid = spark.sparkContext.applicationId
    if sid in _SHIPPED_TO:
        return
    if _PKG_ZIP is None:
        import shutil

        base = tempfile.mkdtemp(prefix="ccrs_pkg_")
        _PKG_ZIP = shutil.make_archive(
            os.path.join(base, "crypto_crawler_rs_spark"),
            "zip",
            root_dir=_REPO,
            base_dir="crypto_crawler_rs_spark",
        )
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:
        pass  # already registered under this name
    _SHIPPED_TO.add(sid)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_workers_can_import(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: a mini-crawl of a corpus derived from sf0.001 documents —
# the engine's real entry point (SURVEY.md §3.1), exercised end-to-end
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Run the frontier scheduler for 3 rounds over a page corpus
    synthesized deterministically from sf0.001 documents; returns the
    crawl log (round, rank_in_round, url, status, ...)."""
    import pandas as pd

    _ensure_workers_can_import(spark)
    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )
    from crypto_crawler_rs_spark.sources.fixtures import _render_html

    docs = _t(spark, SF0001, "documents").toPandas().sort_values("doc_id")
    n = len(docs)
    urls = [
        f"https://{s}.example.org/doc/{i}" for i, s in zip(docs.doc_id, docs.source)
    ]
    by_idx = {i: u for i, u in zip(range(n), urls)}
    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Timestamp("2020-01-01"),
            "html": [
                _render_html(
                    f"doc {i}",
                    [t],
                    [by_idx[(i * 7 + j) % n] for j in range(3)],  # deterministic graph
                )
                for i, t in zip(range(n), docs.text)
            ],
            "text": [f"doc {i}\n{t}" for i, t in zip(range(n), docs.text)],
            "lang": docs.lang.tolist(),
        }
    )
    hosts = sorted(set(f"{s}.example.org" for s in docs.source))
    policy = pd.DataFrame(
        {
            "host": hosts,
            "host_rank": [i * 10 for i in range(len(hosts))],
            "budget_per_round": [3 + (i % 3) for i in range(len(hosts))],
            "robots_disallow": [[] for _ in hosts],
            "crawl_delay_rounds": [1] * len(hosts),
            "is_hot": [False] * len(hosts),
        }
    )
    seeds = pd.DataFrame({"url": urls[:8], "depth": 0})

    pages_df = spark.createDataFrame(
        pages, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    policy_df = spark.createDataFrame(
        policy,
        schema=(
            "host string, host_rank long, budget_per_round int, "
            "robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean"
        ),
    )
    seeds_df = spark.createDataFrame(seeds, schema="url string, depth int")

    state = tempfile.mkdtemp(prefix="spark_graft_entry_")
    eng = FrontierScheduler(
        spark, pages_df, policy_df, os.path.join(state, "s"),
        FrontierConfig(max_rounds=3, emit_deferred=False),
    )
    manifest = eng.run(seeds=seeds_df, max_rounds=3)
    return eng.fetched(manifest).select(
        "round", "rank_in_round", "url", "host", "depth", "priority", "status",
        "text_sha256",
    )


# ---------------------------------------------------------------------------
# queries: one per operator (SURVEY.md §2 ids in each docstring)
# ---------------------------------------------------------------------------

def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def q_a2_pricing_summary(spark, sf):
    """A2 metrics aggregation (counters fold, ws_client_internal.rs:28-59)
    as the classic pricing rollup; exact DECIMAL then DOUBLE."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_j1_anti_no_orders(spark, sf):
    """J1 anti-join: the new-symbol discovery dedup
    (crypto-crawler/src/crawlers/utils.rs:543-555)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_j2_semi_parts_ordered(spark, sf):
    """J2 semi-join membership (hot filter, spot_symbols.rs:20-27)."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


def q_j3_broadcast_rank(spark, sf):
    """J3 broadcast dimension lookup w/ default (cmc_rank.rs:320-329):
    orders per nation via broadcast nation dim."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation"))
        .agg(F.count("*").alias("n_orders"))
    )


def q_f1_hot_filter(spark, sf):
    """F1 hot-symbol filter: has-derivative OR rank<=100
    (spot_symbols.rs:5-28) -> has-big-order OR top acctbal."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey").distinct()
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey")
    rank = c.filter(F.col("c_acctbal") >= 9000).select("c_custkey")
    return semi.union(rank).distinct()


def q_f3_status_filter(spark, sf):
    """F3 catalog status filter + test-symbol drop
    (binance_spot.rs:34,40-41)."""
    o = _t(spark, sf, "orders")
    return (
        o.filter((F.col("o_orderstatus") != "P") & (F.col("o_orderkey") != 123456))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def q_o1_priority_sort(spark, sf):
    """O1 priority sort w/ unknown->MAX and total-order tie-break
    (cmc_rank.rs:320-329; sort applied crawlers/utils.rs:139)."""
    o = _t(spark, sf, "orders")
    prio = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .otherwise(99)
    )
    return (
        o.withColumn("prio", prio)
        .orderBy("prio", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "prio")
    )


def q_o2_topk_per_group(spark, sf):
    """O2 top-k per key (depth5/books5 subscription,
    clients/binance.rs:162-168)."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


def q_o3_chunking(spark, sf):
    """O3 first-K chunk slicing into per-connection groups
    (crawlers/utils.rs:773-781)."""
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return (
        li.withColumn("chunk", F.floor((F.row_number().over(w) - 1) / 10))
        .groupBy("l_suppkey", "chunk")
        .agg(F.count("*").alias("n"))
    )


def q_o4_binpack_running_sum(spark, sf):
    """O4 byte-budget bin packing via running-sum window
    (ensure_frame_size, common/utils.rs:3-38)."""
    li = _t(spark, sf, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this synthetic data;
    # the running sum needs a total order -> extend the key
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.withColumn("cum", F.sum(F.col("l_quantity").cast("int")).over(w))
        .withColumn("bin", F.floor(F.col("cum") / 500))
        .groupBy("l_suppkey", "bin")
        .agg(F.count("*").alias("n"))
    )


def q_u1_union_distinct(spark, sf):
    """U1 union of per-market symbol sets (spot_symbols.rs:10-17)."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


def q_u3_except(spark, sf):
    """U3 except / unsubscribe retain (ws_client_internal.rs:313-317)."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.subtract(s)


def q_a1_batch_commands(spark, sf):
    """A1 group-by-channel command batching, <=100 per command
    (clients/kucoin/utils.rs:74-102)."""
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.ceil(F.count("*") / F.lit(100.0)).cast("long").alias("n_commands"),
    )


def q_a4_distinct_set(spark, sf):
    """A4 contract-base-coin set build — distinct projection
    (spot_symbols.rs:8-19)."""
    return _t(spark, sf, "part").select("p_brand").distinct()


def q_a5_count_distinct(spark, sf):
    """A5 distinct subscribed set size (crawlers/utils.rs:528-555)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


def q_c4_json_extract(spark, sf):
    """C4 JSON field probing (clients/binance.rs:298-320)."""
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("long").alias("sum_k")
    )


def q_p1_typed_projection(spark, sf):
    """§3.3 parsed multiplexed stream: the subscribe_symbol path
    parses payloads into typed records (crypto-crawler/src/crawlers/
    utils.rs:628-668) — from_json with an EXPLICIT schema (never
    inferred, §1.6)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k_typed"),
    )


def q_c5_explode_split(spark, sf):
    """C5 split-lines explode (deribit 4-line response,
    crawlers/utils.rs:219-231)."""
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def q_c6_split_first(spark, sf):
    """C6 split pair -> base ("BTC/USDT" -> "BTC", cmc_rank.rs:322-324)."""
    p = _t(spark, sf, "part")
    return (
        p.select(F.split("p_name", " ").getItem(0).alias("head"))
        .groupBy("head")
        .agg(F.count("*").alias("n"))
    )


def q_c7_concat_tsv(spark, sf):
    """C7 TSV envelope serialization (msg.rs:65-68)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.concat_ws(
            "\t", F.col("event_id"), F.col("event_type"), F.col("user_id")
        ).alias("tsv"),
    )


def q_c8_unix_millis(spark, sf):
    """C8 unix-millis timestamps (msg.rs:39-44)."""
    o = _t(spark, sf, "orders")
    # parquet timestamps load as TIMESTAMP_NTZ; treat as UTC instants
    ts = F.col("o_orderdate").cast("timestamp")
    return o.groupBy("o_orderstatus").agg(
        F.max(F.unix_millis(ts)).alias("max_ms"),
        F.min(F.unix_millis(ts)).alias("min_ms"),
    )


def q_c10_precision_digits(spark, sf):
    """C10 precision-from-string via regexp (crypto-markets
    exchanges/utils.rs:38-51)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.length(F.regexp_extract("props", r'"k": (\d+)', 1)).alias("k_digits"),
    )


def q_c14_sorted_params(spark, sf):
    """C14 sorted query-param assembly (BTreeMap iteration,
    crypto-rest-client/src/exchanges/utils.rs:71-94)."""
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("profile")
    )


def q_f4_classify_frames(spark, sf):
    """F4 message classification: Normal / Ping / Reconnect dispatch
    per payload (MiscMessage, crypto-ws-client/src/common/
    message_handler.rs:4-22; binance classifier clients/binance.rs:296-321)."""
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    klass = (
        F.when(k < 10, "ping")
        .when(k >= 90, "reconnect")
        .otherwise("normal")
    )
    return e.withColumn("klass", klass).groupBy("event_type", "klass").agg(
        F.count("*").alias("n")
    )


def q_c2_placeholder_sub(spark, sf):
    """C2 SYMBOL placeholder substitution in channel templates
    (topic_to_raw_channel, crypto-ws-client/src/common/utils.rs:40-42)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.regexp_replace(
            F.lit("market.SYMBOL.trade.detail"), F.lit("SYMBOL"), F.col("event_type")
        ).alias("channel"),
    )


def q_c11_decompress(spark, sf):
    """C11 payload decompression dispatch (ws_client_internal.rs:629-801).
    Identity path over uncompressed bytes; gzip/zlib paths are
    pytest-verified (tests/test_payload_packing_tsv.py)."""
    from crypto_crawler_rs_spark.functions.payload import decompress_udf

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id", decompress_udf(F.col("text").cast("binary")).alias("text_out")
    )


def q_c13_hmac_sign(spark, sf):
    """C13 HMAC-SHA256 request signing, lowercase hex
    (crypto-rest-client/src/exchanges/utils.rs:24-68). Rows-only
    (DuckDB has no hmac); stdlib-parity is pytest-verified."""
    from crypto_crawler_rs_spark.functions.payload import hmac_sign_udf

    e = _t(spark, sf, "events").limit(500)
    return e.select("event_id", hmac_sign_udf("test-secret")("props").alias("sig"))


def q_o4_pack_commands(spark, sf):
    """O4 exact greedy bin packing per group via applyInPandas
    (ensure_frame_size, crypto-ws-client/src/common/utils.rs:3-38).
    Rows-only (order-dependent greedy state is not ANSI-SQL);
    budget invariants are pytest-verified."""
    from crypto_crawler_rs_spark.operators.packing import pack_commands

    li = _t(spark, sf, "lineitem")
    items = li.select(
        F.col("l_suppkey").cast("string").alias("host"),
        F.concat_ws("-", "l_orderkey", "l_linenumber", "l_partkey").alias("url"),
        F.col("l_orderkey").alias("priority"),
    ).distinct()
    return pack_commands(items, byte_budget=256, max_items=25)


def q_w1_topic_cross_product(spark, sf):
    """§1.4 work-unit expansion: candlestick topics = symbols ×
    intervals materialized eagerly (crypto-crawler/src/crawlers/
    utils.rs:902-911); interval mapping 60→'1m' (C9,
    clients/binance.rs:273-293)."""
    e = _t(spark, sf, "events").select("event_type").distinct()
    intervals = F.array(F.lit(60), F.lit(300), F.lit(900))
    iname = (
        F.when(F.col("interval_sec") == 60, "1m")
        .when(F.col("interval_sec") == 300, "5m")
        .otherwise("15m")
    )
    return (
        e.select("event_type", F.explode(intervals).alias("interval_sec"))
        .withColumn(
            "topic",
            F.concat_ws("@", F.concat(F.lit("kline_"), iname), F.col("event_type")),
        )
    )


def q_t5_window_budget_pop(spark, sf):
    """T5 per-key budget pop (token-bucket analog): best-2 events per
    user by (value desc, event_id) — the politeness window."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("user_id", "event_id", "rk")
    )


def q_stream_hourly_rollup(spark, sf):
    """T2/K3 streaming-window rollup expressed in batch: per-hour
    per-type counters (the metrics emission path)."""
    e = _t(spark, sf, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    )


# -- training-data pipeline operators ---------------------------------------

def q_dedup_exact(spark, sf):
    """Exact dedup: hash-groupBy on md5(text)."""
    from crypto_crawler_rs_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def q_dedup_ngram_jaccard(spark, sf):
    """n-gram Jaccard near-dup pairs (inverted-index self-join)."""
    from crypto_crawler_rs_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf, "documents"), k=3, threshold=0.05)


def q_dedup_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup (banded) with exact-Jaccard confirm.
    No SQL oracle (xxhash64 family not in DuckDB) -> rows-only check;
    correctness vs exact jaccard is pytest-verified."""
    from crypto_crawler_rs_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf, "documents"), k=3, n_hashes=32, n_bands=16, threshold=0.05
    )


def q_dedup_simhash(spark, sf):
    """SimHash fingerprints (JVM-side bit sums). Rows-only check."""
    from crypto_crawler_rs_spark.operators.dedup import simhash64

    return simhash64(_t(spark, sf, "documents"))


def q_dedup_embedding_neardup(spark, sf):
    """Embedding-cosine near-duplicate pairs (training-data dedup):
    all (a < b) pairs with cosine >= 0.3, exact double arithmetic."""
    emb = _t(spark, sf, "embeddings")
    v = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim6", F.round(dot / (na * nb), 6))
        .filter(F.col("sim6") >= 0.3)
        .select("id_a", "id_b", "sim6")
    )


def q_ann_cosine_topk(spark, sf):
    """Brute-force cosine top-5 for query vectors vec_id<20."""
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nq = F.sqrt(F.aggregate("qv", F.lit(0.0), lambda a, x: a + x * x))
    nc = F.sqrt(F.aggregate("cv", F.lit(0.0), lambda a, x: a + x * x))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim6", F.round(dot / (nq * nc), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim6").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "rk", "sim6")
    )


def q_ann_cosine_lsh(spark, sf):
    """LSH-bucketed ANN (scale path). Rows-only check; recall vs
    brute force is pytest-checked."""
    from crypto_crawler_rs_spark.operators.similarity import cosine_topk_lsh

    emb = _t(spark, sf, "embeddings")
    return cosine_topk_lsh(
        emb.filter(F.col("vec_id") < 20), emb, dim=64, k=5, n_planes=6, n_tables=8
    )


def q_lang_id(spark, sf):
    """Language-ID heuristic: stopword-marker argmax."""
    from crypto_crawler_rs_spark.functions.textstats import lang_id, lang_scores

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        lang_id("text").alias("pred_lang"),
        F.element_at(lang_scores("text"), F.lit("en")).alias("en_hits"),
    )


def q_quality_score(spark, sf):
    """Quality-scoring ratio features."""
    from crypto_crawler_rs_spark.functions.textstats import quality_features

    d = _t(spark, sf, "documents")
    return d.select("doc_id", *quality_features("text"))


def q_token_count(spark, sf):
    """Token counting: whitespace + BPE-ish regex."""
    from crypto_crawler_rs_spark.functions.textstats import bpe_ish_tokens, token_count

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        F.size(bpe_ish_tokens("text")).alias("n_bpe_tokens"),
    )


def q_doc_fingerprint(spark, sf):
    """Document fingerprint: md5 of normalized text."""
    from crypto_crawler_rs_spark.functions.textstats import doc_fingerprint

    d = _t(spark, sf, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fp"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a2_pricing_summary": q_a2_pricing_summary,
        "j1_anti_no_orders": q_j1_anti_no_orders,
        "j2_semi_parts_ordered": q_j2_semi_parts_ordered,
        "j3_broadcast_rank": q_j3_broadcast_rank,
        "f1_hot_filter": q_f1_hot_filter,
        "f3_status_filter": q_f3_status_filter,
        "o1_priority_sort": q_o1_priority_sort,
        "o2_topk_per_group": q_o2_topk_per_group,
        "o3_chunking": q_o3_chunking,
        "o4_binpack_running_sum": q_o4_binpack_running_sum,
        "u1_union_distinct": q_u1_union_distinct,
        "u3_except": q_u3_except,
        "a1_batch_commands": q_a1_batch_commands,
        "a4_distinct_set": q_a4_distinct_set,
        "a5_count_distinct": q_a5_count_distinct,
        "c4_json_extract": q_c4_json_extract,
        "p1_typed_projection": q_p1_typed_projection,
        "c5_explode_split": q_c5_explode_split,
        "c6_split_first": q_c6_split_first,
        "c7_concat_tsv": q_c7_concat_tsv,
        "c8_unix_millis": q_c8_unix_millis,
        "c10_precision_digits": q_c10_precision_digits,
        "c14_sorted_params": q_c14_sorted_params,
        "c2_placeholder_sub": q_c2_placeholder_sub,
        "f4_classify_frames": q_f4_classify_frames,
        "c11_decompress": q_c11_decompress,
        "c13_hmac_sign": q_c13_hmac_sign,
        "o4_pack_commands": q_o4_pack_commands,
        "w1_topic_cross_product": q_w1_topic_cross_product,
        "t5_window_budget_pop": q_t5_window_budget_pop,
        "stream_hourly_rollup": q_stream_hourly_rollup,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_neardup": q_dedup_embedding_neardup,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_cosine_lsh": q_ann_cosine_lsh,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
    }


def oracle_sql() -> dict[str, str]:
    en = "['the','and','of','to','in','is','that','for']"
    de = "['der','die','das','und','ist','nicht','ein','zu']"
    fr = "['le','la','les','et','est','une','que','pour']"
    es = "['el','la','los','que','de','es','una','por']"
    pt = "['o','a','os','que','de','um','uma','para']"

    def hits(markers: str) -> str:
        return (
            "len(list_intersect(list_distinct(string_split(trim(text), ' ')), "
            f"{markers}))"
        )

    return {
        "a2_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "j1_anti_no_orders": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
        "j2_semi_parts_ordered": """
            SELECT p_brand, COUNT(*) AS n_parts FROM part p
            WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
            GROUP BY p_brand""",
        "j3_broadcast_rank": """
            SELECT COALESCE(n_name, 'UNKNOWN') AS nation, COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            LEFT JOIN nation ON c_nationkey = n_nationkey
            GROUP BY COALESCE(n_name, 'UNKNOWN')""",
        "f1_hot_filter": """
            SELECT DISTINCT c_custkey FROM customer c
            WHERE c_acctbal >= 9000
               OR EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""",
        "f3_status_filter": """
            SELECT o_orderstatus, COUNT(*) AS n FROM orders
            WHERE o_orderstatus <> 'P' AND o_orderkey <> 123456
            GROUP BY o_orderstatus""",
        "o1_priority_sort": """
            SELECT o_orderkey,
                   CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                        WHEN '3-MEDIUM' THEN 3 ELSE 99 END AS prio
            FROM orders ORDER BY prio, o_orderkey LIMIT 100""",
        "o2_topk_per_group": """
            SELECT o_custkey, o_orderkey, rk FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
                FROM orders) WHERE rk <= 3""",
        "o3_chunking": """
            SELECT l_suppkey, chunk, COUNT(*) AS n FROM (
                SELECT l_suppkey,
                       CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_orderkey, l_linenumber) - 1) / 10) AS BIGINT) AS chunk
                FROM lineitem) GROUP BY l_suppkey, chunk""",
        "o4_binpack_running_sum": """
            SELECT l_suppkey, bin, COUNT(*) AS n FROM (
                SELECT l_suppkey,
                       CAST(FLOOR(SUM(CAST(l_quantity AS INT)) OVER (
                            PARTITION BY l_suppkey
                            ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 500) AS BIGINT) AS bin
                FROM lineitem) GROUP BY l_suppkey, bin""",
        "u1_union_distinct": """
            SELECT c_nationkey AS nationkey FROM customer
            UNION SELECT s_nationkey FROM supplier""",
        "u3_except": """
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT DISTINCT s_nationkey FROM supplier""",
        "a1_batch_commands": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS n_commands
            FROM events GROUP BY event_type""",
        "a4_distinct_set": "SELECT DISTINCT p_brand FROM part",
        "a5_count_distinct": """
            SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
                   COUNT(DISTINCT l_suppkey) AS n_supps
            FROM lineitem GROUP BY l_returnflag""",
        "c4_json_extract": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type""",
        "p1_typed_projection": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
            FROM events""",
        "c5_explode_split": """
            SELECT token, COUNT(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token""",
        "c6_split_first": """
            SELECT string_split(p_name, ' ')[1] AS head, COUNT(*) AS n
            FROM part GROUP BY head""",
        "c7_concat_tsv": """
            SELECT event_id,
                   concat_ws(chr(9), event_id, event_type, user_id) AS tsv
            FROM events""",
        "c8_unix_millis": """
            SELECT o_orderstatus, MAX(epoch_ms(o_orderdate)) AS max_ms,
                   MIN(epoch_ms(o_orderdate)) AS min_ms
            FROM orders GROUP BY o_orderstatus""",
        "c10_precision_digits": r"""
            SELECT event_id,
                   length(regexp_extract(props, '"k": (\d+)', 1)) AS k_digits
            FROM events""",
        "c14_sorted_params": """
            SELECT user_id,
                   array_to_string(list_sort(list(DISTINCT event_type)), ',') AS profile
            FROM events GROUP BY user_id""",
        "f4_classify_frames": """
            SELECT event_type,
                   CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) < 10 THEN 'ping'
                        WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 90 THEN 'reconnect'
                        ELSE 'normal' END AS klass,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2""",
        "c2_placeholder_sub": """
            SELECT event_id,
                   replace('market.SYMBOL.trade.detail', 'SYMBOL', event_type) AS channel
            FROM events""",
        "c11_decompress": """
            SELECT doc_id, text AS text_out FROM documents""",
        "w1_topic_cross_product": """
            WITH s AS (SELECT DISTINCT event_type FROM events),
            x AS (SELECT event_type, unnest([60, 300, 900]) AS interval_sec FROM s)
            SELECT event_type, interval_sec,
                   concat('kline_',
                          CASE WHEN interval_sec = 60 THEN '1m'
                               WHEN interval_sec = 300 THEN '5m'
                               ELSE '15m' END,
                          '@', event_type) AS topic
            FROM x""",
        "t5_window_budget_pop": """
            SELECT user_id, event_id, rk FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
                FROM events) WHERE rk <= 2""",
        "stream_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 3) AS sum_value
            FROM events GROUP BY 1, 2""",
        "dedup_exact": """
            SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text)""",
        "dedup_ngram_jaccard": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            sh AS (SELECT doc_id,
                          list_distinct([array_to_string(ws[i:i+2], ' ')
                                         for i in range(1, len(ws) - 1)]) AS shingles
                   FROM w WHERE len(ws) >= 3),
            e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
                         COUNT(*) AS shared
                  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   ROUND(shared / (n_a + n_b - shared), 4) AS jaccard
            FROM p WHERE shared / (n_a + n_b - shared) >= 0.05""",
        "dedup_embedding_neardup": """
            WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS ve
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_dot_product(a.ve, b.ve) /
                         (sqrt(list_dot_product(a.ve, a.ve)) *
                          sqrt(list_dot_product(b.ve, b.ve))), 6) AS sim6
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE ROUND(list_dot_product(a.ve, b.ve) /
                  (sqrt(list_dot_product(a.ve, a.ve)) *
                   sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3""",
        "ann_cosine_topk": """
            WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS ve
                       FROM embeddings),
            s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                         ROUND(list_dot_product(q.ve, c.ve) /
                               (sqrt(list_dot_product(q.ve, q.ve)) *
                                sqrt(list_dot_product(c.ve, c.ve))), 6) AS sim6
                  FROM v q JOIN v c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim6 DESC, neighbor_id ASC) AS rk FROM s)
            SELECT query_id, neighbor_id, rk, sim6 FROM r WHERE rk <= 5""",
        "lang_id": f"""
            WITH h AS (SELECT doc_id,
                   {hits(de)} AS h_de, {hits(en)} AS h_en, {hits(es)} AS h_es,
                   {hits(fr)} AS h_fr, {hits(pt)} AS h_pt
                   FROM documents),
            m AS (SELECT *, GREATEST(h_de, h_en, h_es, h_fr, h_pt) AS mx FROM h)
            SELECT doc_id,
                   CASE WHEN mx < 1 THEN 'und'
                        WHEN h_de = mx THEN 'de' WHEN h_en = mx THEN 'en'
                        WHEN h_es = mx THEN 'es' WHEN h_fr = mx THEN 'fr'
                        ELSE 'pt' END AS pred_lang,
                   h_en AS en_hits
            FROM m""",
        "quality_score": f"""
            WITH t AS (SELECT doc_id, text, string_split(trim(text), ' ') AS ws,
                              length(text) AS n_chars
                       FROM documents)
            SELECT doc_id,
                   len(ws) AS n_tokens, n_chars,
                   ROUND(n_chars / GREATEST(len(ws), 1), 4) AS chars_per_token,
                   ROUND(len(list_distinct(ws)) / GREATEST(len(ws), 1), 4) AS distinct_ratio,
                   ROUND((n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) /
                         GREATEST(n_chars, 1), 4) AS punct_ratio,
                   ROUND(len(list_intersect(list_distinct(ws), {en})) /
                         GREATEST(len(ws), 1), 4) AS stopword_ratio
            FROM t""",
        "token_count": """
            SELECT doc_id,
                   len(string_split(trim(text), ' ')) AS n_ws_tokens,
                   len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '')) AS n_bpe_tokens
            FROM documents""",
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
            FROM documents""",
    }
