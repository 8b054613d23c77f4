"""Unit tests for pure building blocks — golden values per
FIXTURES.md §6, mirroring the reference's exact-golden-string tests
(crypto-ws-client/src/clients/binance.rs:379-409)."""

import pandas as pd
import pytest

from crypto_crawler_rs_spark.functions.bloom import ShardedBloom
from crypto_crawler_rs_spark.functions.hashing import murmur3_32
from crypto_crawler_rs_spark.functions.text import (
    extract_outlinks_py,
    extract_text_py,
)
from crypto_crawler_rs_spark.functions.urls import canonicalize_url, host_of_url

CANON_CASES = [
    # lowercase scheme+host, strip default port + fragment, sort params
    ("HTTP://Example.COM:80/a?b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
    ("https://Example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/p/1#x", "https://example.com/p/1"),
    ("https://example.com/p?z=1&a=9&a=2", "https://example.com/p?a=2&a=9&z=1"),
    ("https://example.com/p?", "https://example.com/p"),
    ("  https://example.com/p/1 ", "https://example.com/p/1"),
    ("not a url", None),
    (None, None),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_golden(raw, expected):
    assert canonicalize_url(raw) == expected


def test_canonicalize_idempotent():
    for raw, expected in CANON_CASES:
        if expected is not None:
            assert canonicalize_url(expected) == expected


def test_host_of_url():
    assert host_of_url("https://Host.Example.com:8080/p") == "host.example.com"
    assert host_of_url("garbage") is None


def test_canonicalize_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.functions.urls import canonicalize_udf

    raws = [c[0] for c in CANON_CASES if c[0] is not None]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [r[0] for r in df.select(canonicalize_udf(F.col("url"))).collect()]
    assert got == [canonicalize_url(r) for r in raws]


def test_murmur3_matches_spark_hash(spark):
    """Pure-Python murmur3 replica must agree bit-for-bit with the
    JVM Murmur3 behind F.hash() — the partition keys the seen-set
    buckets are built on."""
    from pyspark.sql import functions as F

    vals = ["", "a", "ab", "abc", "abcd", "hot.example.com",
            "https://example.com/p?a=1", "日本語テキスト", "x" * 133]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    jvm = [r[0] for r in df.select(F.hash(F.col("s"))).collect()]
    ours = [murmur3_32(v) for v in vals]
    assert ours == jvm


def test_extract_text_roundtrip():
    from crypto_crawler_rs_spark.sources.fixtures import _render_html

    html = _render_html("My Title", ["para one", "para two"], ["https://a/b"])
    assert extract_text_py(html) == "My Title\npara one\npara two"
    assert extract_outlinks_py(html) == ["https://a/b"]


def test_extract_text_udf_byte_identical(spark, tiny_corpus):
    """input_hint invariant: extract_text(html) == pages.text, byte
    for byte, for every fixture page."""
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.functions.text import extract_text_udf
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark

    pages = corpus_to_spark(spark, tiny_corpus)["pages"]
    bad = (
        pages.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(
            F.sha2(F.col("extracted"), 256) != F.sha2(F.col("text"), 256)
        )
        .count()
    )
    assert bad == 0


def test_bloom_no_false_negatives_and_delete():
    import numpy as np

    rng = np.random.default_rng(7)
    hh = rng.integers(-(2**31), 2**31, 5000)
    uh = rng.integers(-(2**63), 2**63 - 1, 5000)
    b = ShardedBloom(n_shards=8, bits_per_shard=1 << 16, n_hashes=4)
    b.add(hh[:4000], uh[:4000])
    assert b.probe(hh[:4000], uh[:4000]).all()  # no false negatives
    fp = b.probe(hh[4000:], uh[4000:]).mean()
    assert fp < 0.05  # sane false-positive rate at this load

    c = ShardedBloom(n_shards=4, bits_per_shard=1 << 14, n_hashes=4, counting=True)
    c.add(hh[:100], uh[:100])
    assert c.probe(hh[:100], uh[:100]).all()
    c.delete(hh[:50], uh[:50])
    assert not c.probe(hh[:50], uh[:50]).any()  # deletions stick
    assert c.probe(hh[50:100], uh[50:100]).all()  # others unaffected


def test_bloom_save_load(tmp_path):
    import numpy as np

    b = ShardedBloom(n_shards=4, bits_per_shard=1 << 12, n_hashes=3)
    hh = np.arange(100)
    uh = np.arange(100) * 7 + 3
    b.add(hh, uh)
    b.save(str(tmp_path / "bloom"))
    b2 = ShardedBloom.load(str(tmp_path / "bloom"))
    assert b2.probe(hh, uh).all()


def test_outlinks_udf_matches_python(spark, tiny_corpus):
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.functions.text import outlinks_udf
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark

    pages = corpus_to_spark(spark, tiny_corpus)["pages"]
    got = {
        r["url"]: r["links"]
        for r in pages.select("url", outlinks_udf(F.col("html")).alias("links")).collect()
    }
    pdf = tiny_corpus["pages"]
    for _, row in pdf.head(30).iterrows():
        assert got[row.url] == extract_outlinks_py(row.html)


def test_canonicalize_series_equals_scalar_on_messy_urls():
    """The vectorized messy path must agree with canonicalize_url on
    every dialect corner: case, ports (default/odd/leading-zero),
    fragments, empty paths, query sorting/duplicates/empties, garbage."""
    import pandas as pd

    from crypto_crawler_rs_spark.functions.urls import (
        _canonicalize_series,
        canonicalize_url,
    )

    cases = [
        "HTTPS://WWW.Example.COM:443/Path/x?b=2&a=1&a=0#frag",
        "http://Example.com:8080/p/1",
        "HTTP://EXAMPLE.COM",
        "https://example.com/ok?z=9#x",
        "https://example.com:0443/p",      # non-canonical default port spelling
        "https://example.com/?",            # empty query
        "https://example.com/?&&",          # pairs all empty
        "https://example.com/a?x&y=1",      # bare key
        "  https://pad.example.com/a  ",    # whitespace
        "ftp://Files.Example.com:21/x",     # non-http scheme, port kept
        "not a url",
        "::garbage::",
        "",
        None,
        "https://example.com/a?k=v&k=a",    # duplicate keys sorted by pair
        "https://clean.example.com/already/canonical",
    ]
    got = _canonicalize_series(pd.Series(cases, dtype="object"))
    for raw, g in zip(cases, got):
        assert g == canonicalize_url(raw), f"{raw!r}: {g!r} != {canonicalize_url(raw)!r}"


def test_canonicalize_series_equals_scalar_randomized():
    import random

    import pandas as pd

    from crypto_crawler_rs_spark.functions.urls import (
        _canonicalize_series,
        canonicalize_url,
    )

    rng = random.Random(99)
    schemes = ["http", "HTTPS", "Http", "ws"]
    hosts = ["A.b.C", "x.example.COM", "h0st-1.org"]
    ports = ["", ":80", ":443", ":8443", ":007"]
    paths = ["", "/", "/P/q", "/a%20b"]
    queries = ["", "?b=2&a=1", "?dup=1&dup=0&a", "?&", "?k"]
    frags = ["", "#f", "#a#b"]
    cases = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(500)
    ]
    got = _canonicalize_series(pd.Series(cases, dtype="object"))
    for raw, g in zip(cases, got):
        assert g == canonicalize_url(raw), f"{raw!r}"
