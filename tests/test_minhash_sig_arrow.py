"""r7 optimization pin: the memoized Arrow MinHash signature pass
(_minhash_sig_rows_arrow, used by _band_signatures when the caller
passes the source docs and the family is md5) is bit-identical to the
original groupBy(min(seeded md5)) JVM aggregation — same shingling,
same UTF-8 md5 hex, same string min order — including the degenerate
docs (under k words, empty, NULL text) that must emit no row."""

from __future__ import annotations

from crypto_crawler_rs_spark.operators.dedup import (
    _band_signatures,
    shingle_rows,
)


def _band_rows(ex, docs, n_hashes, n_bands):
    old = _band_signatures(ex, n_hashes, n_bands, "md5")
    new = _band_signatures(ex, n_hashes, n_bands, "md5", docs=docs)
    return (
        sorted(map(tuple, old.collect())),
        sorted(map(tuple, new.collect())),
    )


def test_arrow_sig_path_matches_jvm_agg(spark):
    docs = spark.range(0, 400).selectExpr(
        "id as doc_id",
        # repeated small vocabulary => the partition-local memo path
        # actually engages (same shingle hashed via memo and via agg)
        "concat_ws(' ', 'tok', cast(id % 7 as string), 'a b c d e', "
        "cast(id % 3 as string), 'x y z') as text",
    )
    ex = shingle_rows(docs, "doc_id", "text", 3)
    o, n = _band_rows(ex, docs, 16, 8)
    assert len(o) == 400 * 8
    assert o == n


def test_simhash_arrow_twin_matches_jvm_agg(spark):
    from crypto_crawler_rs_spark.operators.dedup import simhash_fingerprints

    docs = spark.range(0, 300).selectExpr(
        "id as doc_id",
        # repeated tokens both within and across docs: multiplicity
        # must count (the sums aggregate over occurrences, not the set)
        "concat_ws(' ', 'alpha', cast(id % 5 as string), 'beta beta', "
        "cast(id % 2 as string), 'gamma') as text",
    )
    o = sorted(
        map(tuple, simhash_fingerprints(docs, hash_family="md5", n_bits=60, impl="agg").collect())
    )
    n = sorted(
        map(tuple, simhash_fingerprints(docs, hash_family="md5", n_bits=60, impl="auto").collect())
    )
    assert len(o) == 300
    assert o == n


def test_simhash_arrow_twin_degenerate_docs(spark):
    from crypto_crawler_rs_spark.operators.dedup import simhash_fingerprints

    docs = spark.createDataFrame(
        [
            (1, ""),       # split('', ' ') == [''] -> one empty token, HAS a row
            (2, None),     # NULL text -> no exploded rows -> NO fingerprint row
            (3, "x  y"),   # double space -> empty middle token
            (4, "a a b"),  # within-doc multiplicity
        ],
        "doc_id long, text string",
    )
    o = sorted(
        map(tuple, simhash_fingerprints(docs, hash_family="md5", n_bits=60, impl="agg").collect())
    )
    n = sorted(
        map(tuple, simhash_fingerprints(docs, hash_family="md5", n_bits=60, impl="auto").collect())
    )
    assert {r[0] for r in o} == {1, 3, 4}
    assert o == n


EDGE_TEXTS = [
    (1, ""),
    (2, None),
    (3, "   "),
    (4, "\t\n the and of \r\n"),      # trim touches 0x20 only; Java split keeps trailing ""
    (5, " the and of"),      # NBSP is NOT Java \s
    (6, "the,and.of!to?in"),
    (7, "café naïve résumé the and of to"),
    (8, "\U0001F600 the and of to emoji"),
    (9, "der die das und ist"),
    (10, "le la les et est"),
    (11, "el la los que de"),          # es/pt marker overlap: tie-break
    (12, "o a os que de um"),
    (13, "x_y_z a1b2 __ the"),
    (14, " \x0b\x0c mixed\x0bws "),    # \x0b IS Java \s but NOT trimmed
    (15, "the the the the and and of"),
    (16, "　the and　of"),     # ideographic space
    (17, "a  b   c"),
    (18, "trailing space "),
    (19, " leading"),
]


def test_gate_counts_arrow_matches_jvm_expressions(spark):
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.functions.textstats import (
        gate_count_rows_arrow,
        gate_stats_from_counts,
        lang_id,
        quality_features,
    )

    edge = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    gen = spark.range(0, 200).selectExpr(
        "id as doc_id",
        "concat_ws(' ', 'the and of', cast(id % 9 as string), 'para um la', "
        "repeat('tok ', cast(id % 7 as int))) as text",
    )
    for docs in (edge, gen):
        jvm = docs.select(
            "doc_id", "text", lang_id("text").alias("lang"), *quality_features("text")
        )
        c = gate_count_rows_arrow(docs, "doc_id", "text")
        arr = c.select(F.col("doc_id"), F.col("text"), *gate_stats_from_counts(c))
        assert jvm.columns == arr.columns
        assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, arr.collect()))


def test_prep_corpus_stats_impls_equal(spark, ):
    from crypto_crawler_rs_spark.operators.prep import prep_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(langs=("en",), min_tokens=20, min_distinct_ratio=0.4,
              min_stopword_ratio=0.0)
    a = sorted(map(tuple, prep_corpus(docs, stats_impl="jvm", **kw).collect()))
    b = sorted(map(tuple, prep_corpus(docs, stats_impl="auto", **kw).collect()))
    assert a == b and len(a) > 0


def test_unrolled_expr_dot_norm_match_reduce_fold(spark):
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    import crypto_crawler_rs_spark.operators.similarity as sim

    assert sim._simple_col_name(F.col("_unit")) == "_unit"
    assert sim._simple_col_name(F.col("a") + F.col("b")) is None
    assert sim._simple_col_name(F.col("x._id")) is None

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        F.transform("embedding", lambda x: (x * 2).cast("double")).alias("w"),
    )

    def dot_reduce(a, b, dim):
        return _reduce(
            lambda acc, i: acc + F.element_at(a, i + 1) * F.element_at(b, i + 1),
            range(dim),
            F.lit(0.0),
        )

    ref = sorted(map(tuple, v.select(
        "vec_id",
        dot_reduce(F.col("v"), F.col("w"), 64).alias("d"),
        F.sqrt(dot_reduce(F.col("v"), F.col("v"), 64)).alias("n"),
    ).collect()))
    got = sorted(map(tuple, v.select(
        "vec_id",
        sim._dot(F.col("v"), F.col("w"), 64).alias("d"),
        sim._norm(F.col("v"), 64).alias("n"),
    ).collect()))
    assert ref == got


def test_arrow_sig_path_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "one two"),          # k-1 words: no shingles, no row
            (3, "one two three"),    # exactly k words: one shingle
            (4, None),               # NULL text
            (5, "a a a a"),          # duplicate shingles collapse
        ],
        "doc_id long, text string",
    )
    ex = shingle_rows(docs, "doc_id", "text", 3)
    o, n = _band_rows(ex, docs, 8, 4)
    assert {r[0] for r in o} == {3, 5}
    assert o == n
