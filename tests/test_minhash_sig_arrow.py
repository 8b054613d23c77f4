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
