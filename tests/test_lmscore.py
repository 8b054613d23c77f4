"""unigram LM surprisal scoring (operators/lmscore.py) vs an
independent DuckDB SQL twin at sf0.001, plus hand-computed semantics
on a tiny corpus."""

from __future__ import annotations

import math

import duckdb
import pytest

from crypto_crawler_rs_spark.operators.lmscore import (
    train_unigram_logprobs,
    unigram_surprisal_score,
)

SF = "/root/testdata/sf0.001"

ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents
),
tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
counts AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY token),
tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS v FROM counts),
logp AS (SELECT token,
                LN((cnt + 1.0) / ((SELECT n FROM tot) + 1.0 * (SELECT v FROM tot)))
                  AS lp
         FROM counts)
SELECT tk.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_scored_tokens,
       ROUND(-AVG(lp), 6) AS surprisal
FROM tk JOIN logp ON tk.token = logp.token
GROUP BY tk.doc_id
"""


def test_surprisal_matches_sql_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        unigram_surprisal_score(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(ORACLE).df().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got.doc_id.values == exp.doc_id.values).all()
    assert (got.n_scored_tokens.values == exp.n_scored_tokens.values).all()
    assert all(
        f"{a:.9g}" == f"{b:.9g}" for a, b in zip(got.surprisal, exp.surprisal)
    )


def test_surprisal_semantics_tiny(spark):
    # corpus: 'a a a b' -> counts a=3,b=1, N=4, V=2, denom=6
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    out = (
        unigram_surprisal_score(docs)
        .toPandas()
        .set_index("doc_id")
    )
    lp_a = math.log((3 + 1) / (4 + 2))
    lp_b = math.log((1 + 1) / (4 + 2))
    assert math.isclose(out.loc[1, "surprisal"], round(-lp_a, 6), abs_tol=1e-9)
    assert math.isclose(out.loc[2, "surprisal"], round(-lp_b, 6), abs_tol=1e-9)
    # rare-token doc scores HIGHER surprisal than common-token doc
    assert out.loc[2, "surprisal"] > out.loc[1, "surprisal"]


def test_train_returns_scalars(spark):
    docs = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    logp, n, v = train_unigram_logprobs(docs)
    assert (n, v) == (3, 2)
    got = {r.token: r.logp for r in logp.collect()}
    assert math.isclose(got["x"], math.log(3 / 5), abs_tol=1e-12)
    assert math.isclose(got["y"], math.log(2 / 5), abs_tol=1e-12)


def test_surprisal_covers_zero_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = (
        unigram_surprisal_score(docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]  # one row per doc, junk included
    assert out.loc[2, "n_scored_tokens"] == 0
    assert out.loc[3, "n_scored_tokens"] == 0
    assert math.isnan(out.loc[2, "surprisal"])
    assert out.loc[1, "n_scored_tokens"] == 3
