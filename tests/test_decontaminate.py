"""Benchmark decontamination (operators/decontaminate.py): Python
set-arithmetic twin on the real documents table, broadcast-plan gate,
and the end-to-end drop behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_crawler_rs_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)

SF = "/root/testdata/sf0.001"


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = (text or "").split(" ")
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_report_matches_python_twin(spark, docs):
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    got = {
        r["doc_id"]: (r["overlap_shingles"], r["n_shingles"], r["contamination"])
        for r in contamination_report(corpus, bench).collect()
    }

    rows = docs.select("doc_id", "text").collect()
    bench_sh = set().union(
        *[_shingles(r["text"]) for r in rows if r["doc_id"] % 97 == 0]
    )
    want = {}
    for r in rows:
        if r["doc_id"] % 97 == 0:
            continue
        sh = _shingles(r["text"])
        ov = len(sh & bench_sh)
        if ov >= 1:
            want[r["doc_id"]] = (ov, len(sh), round(ov / len(sh), 6))
    assert set(got) == set(want)
    for did, (ov, n, c) in want.items():
        assert got[did][0] == ov and got[did][1] == n, did
        assert got[did][2] == pytest.approx(c, abs=1e-9), did
    # the stand-in benchmark must actually contaminate something at
    # this SF or the test is vacuous
    assert len(want) > 0


def test_benchmark_side_is_broadcast(spark, docs):
    plan = (
        contamination_report(
            docs.where(F.col("doc_id") % 97 != 0),
            docs.where(F.col("doc_id") % 97 == 0),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the corpus side must NOT be exchanged before the join — only the
    # post-join per-doc count aggregation shuffles
    assert "SortMergeJoin" not in plan


def test_decontaminate_drops_exactly_the_contaminated(spark, docs):
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    bad = {
        r["doc_id"]
        for r in contamination_report(corpus, bench).collect()
    }
    kept = {r["doc_id"] for r in decontaminate(corpus, bench).collect()}
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert kept == all_ids - bad
    assert bad and kept  # neither side vacuous


def test_full_contamination_is_exactly_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z z z q q q")],
        "doc_id long, text string",
    )
    bench = df.where("doc_id = 1")
    rep = {
        r["doc_id"]: r["contamination"]
        for r in contamination_report(
            df.where("doc_id != 1"), bench
        ).collect()
    }
    assert rep == {2: 1.0}


def test_decontaminate_prod_key_family(spark, docs):
    """key_family='xxhash64' (the 8-byte production join key) must
    return the IDENTICAL report — the hash only re-keys the equi-join;
    membership is unchanged modulo 64-bit collisions, which this real
    corpus must not exhibit."""
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    def rows(fam):
        return sorted(
            (r["doc_id"], r["overlap_shingles"], r["n_shingles"],
             r["contamination"])
            for r in contamination_report(
                corpus, bench, key_family=fam
            ).collect()
        )

    a, b = rows("string"), rows("xxhash64")
    assert a == b and len(a) > 0


def test_decontaminate_key_family_validates(spark, docs):
    with pytest.raises(ValueError, match="key_family"):
        contamination_report(docs, docs, key_family="sha1").collect()
