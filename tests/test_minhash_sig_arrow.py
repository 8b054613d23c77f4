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
