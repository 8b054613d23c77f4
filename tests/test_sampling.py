"""Deterministic stratified sampling (operators/sampling.py):
exactness, determinism across repartitioning, the md5 draw's
uniformity contract, the WindowGroupLimit plan gate, and the
budget-spec variant."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crypto_crawler_rs_spark.operators.sampling import (
    stratified_budgets,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _expected(rows, strata_cols, k):
    by_stratum = {}
    for r in rows:
        key = tuple(r[c] for c in strata_cols)
        by_stratum.setdefault(key, []).append(r["doc_id"])
    want = set()
    for key, ids in by_stratum.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want.update(ids[:k])
    return want


def test_exact_k_per_stratum_matches_md5_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    got = stratified_sample(docs, ["lang", "source"], k=3).collect()
    rows = docs.collect()
    assert {r["doc_id"] for r in got} == _expected(rows, ["lang", "source"], 3)
    # per-stratum count is min(k, stratum size), ranks are 1..n
    sizes = {}
    for r in rows:
        sizes[(r["lang"], r["source"])] = sizes.get((r["lang"], r["source"]), 0) + 1
    per = {}
    for r in got:
        per.setdefault((r["lang"], r["source"]), []).append(r["sample_rank"])
    assert set(per) == {s for s in sizes}  # every stratum represented
    for key, ranks in per.items():
        assert sorted(ranks) == list(range(1, min(3, sizes[key]) + 1))


def test_deterministic_under_repartition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, ["lang", "source"], k=5).collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13), ["lang", "source"], k=5
        ).collect()
    }
    assert a == b


def test_window_group_limit_in_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    plan = (
        stratified_sample(docs, ["lang", "source"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side per-stratum pruning before the exchange — the 100-TB
    # claim (same gate as the o2_topk_per_group plan audit)
    assert "WindowGroupLimit" in plan


def test_budget_spec_variant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    budgets = spark.createDataFrame(
        [("en", 4), ("de", 1)], "lang string, budget int"
    )
    got = stratified_budgets(docs, budgets, ["lang"]).collect()
    per = {}
    for r in got:
        per.setdefault(r["lang"], set()).add(r["doc_id"])
    assert set(per) == {"en", "de"}
    assert len(per["en"]) == 4 and len(per["de"]) == 1
    rows = docs.where(F.col("lang").isin("en", "de")).collect()
    assert per["en"] == _expected(
        [r for r in rows if r["lang"] == "en"], ["lang"], 4
    )
    assert per["de"] == _expected(
        [r for r in rows if r["lang"] == "de"], ["lang"], 1
    )
