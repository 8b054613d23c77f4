"""prep_corpus (operators/prep.py) — the composed quality-gate ->
chunk-dedup -> exact-dedup pipeline — against an independent DuckDB
SQL twin at sf0.001, plus unit semantics (stage order, survivor
rules)."""

from __future__ import annotations

import duckdb
import pytest

from crypto_crawler_rs_spark.operators.prep import prep_corpus

SF = "/root/testdata/sf0.001"

_EN = "['the','and','of','to','in','is','that','for']"
_DE = "['der','die','das','und','ist','nicht','ein','zu']"
_FR = "['le','la','les','et','est','une','que','pour']"
_ES = "['el','la','los','que','de','es','una','por']"
_PT = "['o','a','os','que','de','um','uma','para']"


def _hits(markers: str) -> str:
    return (
        r"len(list_intersect(list_distinct(string_split_regex(trim(text), '\s+')), "
        f"{markers}))"
    )


ORACLE = f"""
WITH h AS (SELECT doc_id, text,
       {_hits(_DE)} AS h_de, {_hits(_EN)} AS h_en, {_hits(_ES)} AS h_es,
       {_hits(_FR)} AS h_fr, {_hits(_PT)} AS h_pt
       FROM documents),
m AS (SELECT *, GREATEST(h_de, h_en, h_es, h_fr, h_pt) AS mx FROM h),
langed AS (SELECT doc_id, text,
       CASE WHEN mx < 1 THEN 'und'
            WHEN h_de = mx THEN 'de' WHEN h_en = mx THEN 'en'
            WHEN h_es = mx THEN 'es' WHEN h_fr = mx THEN 'fr'
            ELSE 'pt' END AS lang
       FROM m),
q AS (SELECT doc_id, text, lang,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\\s+')))
         / GREATEST(len(string_split_regex(trim(text), '\\s+')), 1) AS dr
      FROM langed),
gated AS (SELECT doc_id, text, lang, n_tokens FROM q
          WHERE lang = 'en' AND n_tokens BETWEEN 20 AND 100000
            AND dr >= 0.4),
keepx AS (SELECT md5(text) AS k, MIN(doc_id) AS keeper FROM gated GROUP BY 1),
uniq AS (SELECT g.* FROM gated g JOIN keepx
         ON md5(g.text) = keepx.k WHERE g.doc_id = keepx.keeper),
w AS (SELECT doc_id, lang, n_tokens, string_split(text, ' ') AS words
      FROM uniq),
c AS (SELECT w.doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
             array_to_string(list_slice(w.words, t.i*10+1, t.i*10+10), ' ') AS chunk
      FROM w, LATERAL unnest(
        range(CAST(ceil(len(w.words)/10.0) AS BIGINT))) AS t(i)),
f AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn FROM c),
reasm AS (SELECT doc_id,
       COALESCE(string_agg(chunk, ' ' ORDER BY chunk_idx)
                FILTER (WHERE rn = 1), '') AS text_prepped,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM f GROUP BY doc_id)
SELECT r.doc_id, r.text_prepped, u.lang,
       CAST(u.n_tokens AS BIGINT) AS n_tokens,
       r.n_chunks, r.n_kept
FROM reasm r JOIN uniq u USING (doc_id)
WHERE r.n_kept > 0
"""


@pytest.fixture(scope="module")
def oracle_df():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return (
        con.execute(ORACLE).df().sort_values("doc_id").reset_index(drop=True)
    )


def test_prep_corpus_matches_sql_twin(spark, oracle_df):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        prep_corpus(
            docs,
            langs=("en",),
            min_tokens=20,
            min_distinct_ratio=0.4,
            min_stopword_ratio=0.0,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(oracle_df)
    assert len(got) > 0  # the gate must not degenerate to empty
    for c in ["doc_id", "text_prepped", "lang", "n_tokens", "n_chunks", "n_kept"]:
        assert (
            got[c].astype(str) == oracle_df[c].astype(str)
        ).all(), f"column {c} diverges"


def test_prep_corpus_gate_actually_gates(spark, oracle_df):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_in = docs.count()
    assert len(oracle_df) < n_in  # thresholds chosen to discriminate


def test_prep_corpus_exact_dedup_keeps_min_id(spark):
    docs = spark.createDataFrame(
        [
            # two docs collapsing to the SAME prepped text: 3 shares
            # every chunk with 1 -> only keeper 1 survives
            (1, "the is and of to in that for aa bb"),
            (3, "the is and of to in that for aa bb"),
            # distinct doc
            (2, "the is and of to in that for cc dd"),
        ],
        "doc_id long, text string",
    )
    out = prep_corpus(
        docs, min_tokens=5, min_distinct_ratio=0.0
    ).toPandas()
    assert sorted(out.doc_id) == [1, 2]


# -- fuzzy near-dup stage (VERDICT r5 next-2) -------------------------------

_BASE = "the is and of to in that for " + " ".join(f"w{i}" for i in range(20))


def _fuzzy(docs, **kw):
    return prep_corpus(
        docs,
        min_tokens=5,
        min_distinct_ratio=0.0,
        fuzzy_threshold=0.5,
        fuzzy_hash_family="md5",
        **kw,
    ).toPandas()


def test_fuzzy_drops_near_dup_keeps_min_id(spark):
    # doc 7 is doc 2 with ONE word changed (not exact-dup; high
    # Jaccard); doc 9 is unrelated.  Fuzzy keeps the component min.
    docs = spark.createDataFrame(
        [
            (2, _BASE),
            (7, _BASE.replace("w10", "zz")),
            (9, "the is and of to " + " ".join(f"u{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    out = _fuzzy(docs)
    assert sorted(out.doc_id) == [2, 9]
    # without the fuzzy stage both near-dups survive (not exact dups)
    plain = prep_corpus(docs, min_tokens=5, min_distinct_ratio=0.0).toPandas()
    assert sorted(plain.doc_id) == [2, 7, 9]


def test_fuzzy_chain_collapses_to_component_min(spark):
    # 1~5 and 5~8 but 1!~8 directly: transitive closure must still
    # collapse all three to keeper 1 — pins that the stage is
    # components over pairs, not pairwise greedy
    v1 = _BASE
    v5 = _BASE.replace("w3", "x3").replace("w4", "x4")
    v8 = v5.replace("w15", "y15").replace("w16", "y16")
    docs = spark.createDataFrame(
        [(5, v5), (8, v8), (1, v1)], "doc_id long, text string"
    )
    out = _fuzzy(docs)
    assert sorted(out.doc_id) == [1]


def test_fuzzy_runs_after_exact_dedup(spark):
    # exact dups collapse FIRST (keeper 3); the fuzzy stage then sees
    # only keepers, so the near-dup comparison is 3-vs-6 and 3 wins
    docs = spark.createDataFrame(
        [
            (4, _BASE),
            (3, _BASE),
            (6, _BASE.replace("w10", "zz")),
        ],
        "doc_id long, text string",
    )
    out = _fuzzy(docs)
    assert sorted(out.doc_id) == [3]
