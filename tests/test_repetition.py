"""Gopher-style repetition features (functions/textstats
.repetition_features): hand-computed vectors, a brute-force Python
twin over the real documents table, and a plan gate proving the
zero-shuffle claim."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crypto_crawler_rs_spark.functions.textstats import repetition_features

SF = "/root/testdata/sf0.001"


def _py_fracs(text: str) -> tuple[float, float]:
    toks = text.strip().split()
    bi = Counter(
        " ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 0))
    )
    tri = Counter(
        " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
    )
    top = round(max(bi.values()) / sum(bi.values()), 6) if bi else 0.0
    dup = (
        round(sum(n for n in tri.values() if n > 1) / sum(tri.values()), 6)
        if tri
        else 0.0
    )
    return top, dup


@pytest.mark.parametrize(
    "text,top,dup",
    [
        # "a b" x4 = 8 tokens -> 7 bigrams [ab ba ab ba ab ba ab]:
        # top = 4/7; all 6 trigrams duplicated
        ("a b a b a b a b", 4 / 7, 1.0),
        # no repetition at all
        ("one two three four five", 1 / 4, 0.0),
        # single token / empty: no n-grams -> 0.0
        ("lonely", 0.0, 0.0),
        ("", 0.0, 0.0),
        # one duplicate trigram among distinct bigrams...
        ("x y z q x y z", 2 / 6, round(2 / 5, 6)),
    ],
)
def test_hand_vectors(spark, text, top, dup):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(*repetition_features("text"))
        .first()
    )
    assert row["top_bigram_frac"] == pytest.approx(round(top, 6), abs=1e-9)
    assert row["dup_trigram_frac"] == pytest.approx(round(dup, 6), abs=1e-9)


def test_matches_python_twin_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["doc_id"]: (r["top_bigram_frac"], r["dup_trigram_frac"])
        for r in docs.select(
            "doc_id", *repetition_features("text")
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert len(got) == len(texts)
    for did, text in texts.items():
        top, dup = _py_fracs(text)
        assert got[did][0] == pytest.approx(top, abs=1e-9), did
        assert got[did][1] == pytest.approx(dup, abs=1e-9), did


def test_zero_shuffle_plan(spark):
    """The whole feature computation must stay inside the scan stage:
    no Exchange in the executed plan (the 100-TB claim)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        docs.select("doc_id", *repetition_features("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_null_text_scores_zero(spark):
    row = (
        spark.createDataFrame([(None,)], "text string")
        .select(*repetition_features("text"))
        .first()
    )
    assert row["top_bigram_frac"] == 0.0
    assert row["dup_trigram_frac"] == 0.0
