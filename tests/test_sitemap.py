"""Sitemap discovery source: protocol parsing + frontier seeding.

The reference bootstraps from symbol catalogs; the web analog is
sitemap.xml.  Parser semantics pinned directly (urlset, sitemapindex,
gzip, plain-text fallback, malformed), then the Spark operator seeds
an actual crawl whose round-0 equals seeding from the same url list.
"""

import gzip

from crypto_crawler_rs_spark.sources.sitemap import parse_sitemap, sitemap_urls

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example.com/p/1</loc><lastmod>2024-01-02</lastmod></url>
  <url><loc> https://a.example.com/p/2 </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example.com/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://a.example.com/sitemap-2.xml.gz</loc>
    <lastmod>2024-02-03T04:05:06Z</lastmod></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index():
    assert parse_sitemap(URLSET) == [
        ("https://a.example.com/p/1", "2024-01-02", "url"),
        ("https://a.example.com/p/2", None, "url"),
    ]
    assert parse_sitemap(INDEX) == [
        ("https://a.example.com/sitemap-1.xml", None, "sitemap"),
        ("https://a.example.com/sitemap-2.xml.gz", "2024-02-03T04:05:06Z", "sitemap"),
    ]


def test_parse_gzip_plaintext_and_garbage():
    # gzipped urlset decompresses transparently
    assert parse_sitemap(gzip.compress(URLSET.encode()))[0][0] == (
        "https://a.example.com/p/1"
    )
    # plain-text simple form: one url per line, junk lines skipped
    txt = "https://b.example.com/x\n# comment\nhttps://b.example.com/y\n"
    assert [u for u, _, k in parse_sitemap(txt)] == [
        "https://b.example.com/x",
        "https://b.example.com/y",
    ]
    assert parse_sitemap(b"\x00\x01 not xml not urls") == []
    assert parse_sitemap("<html><body>404</body></html>") == []


def test_sitemap_seeds_same_crawl_as_url_list(spark, tmp_path):
    """Seeding the frontier from parsed sitemaps == seeding from the
    equivalent (url, depth) list; child-sitemap rows separate out."""
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.plans.frontier import (
        FrontierConfig,
        FrontierScheduler,
    )
    from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus

    corpus = gen_corpus(n_pages=120, n_hosts=6, n_seeds=12, seed=29)
    sdfs = corpus_to_spark(spark, corpus)
    seeds = corpus["seeds"]  # pandas: url, depth

    # wrap each host's seed urls in a urlset + one child-sitemap entry
    per_host: dict[str, list[str]] = {}
    for r in seeds.itertuples(index=False):
        host = r.url.split("/")[2]
        per_host.setdefault(host, []).append(r.url)
    rows = []
    for host, urls in per_host.items():
        body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        body += f"<sitemap><loc>https://{host}/sitemap-child.xml</loc></sitemap>"
        xml = (
            '<?xml version="1.0"?><urlset '
            'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + body + "</urlset>"
        )
        rows.append((host, bytearray(xml.encode())))
    sitemaps = spark.createDataFrame(rows, "host string, sitemap_xml binary")
    parsed = sitemap_urls(sitemaps)
    # child-sitemap rows separate by their CHILD tag even when mixed
    # into a urlset container (real-world sitemaps do this)
    url_rows = parsed.filter(F.col("kind") == "url").select(
        F.col("loc").alias("url")
    )
    assert url_rows.count() == len(seeds)
    kids = parsed.filter(F.col("kind") == "sitemap")
    assert kids.count() == len(per_host)
    assert all("sitemap-child" in r["loc"] for r in kids.collect())

    def crawl(seed_df, sub):
        eng = FrontierScheduler(
            spark, sdfs["pages"], sdfs["host_policy"], str(tmp_path / sub),
            FrontierConfig(max_rounds=3),
        )
        m = eng.run(
            seeds=seed_df.withColumn("depth", F.lit(0)), max_rounds=3
        )
        return (
            eng.fetched(m)
            .select("round", "rank_in_round", "url", "status")
            .toPandas()
            .sort_values(["round", "url"])
            .fillna(-1)
            .reset_index(drop=True)
        )

    import pandas as pd

    a = crawl(sdfs["seeds"].select("url"), "a")
    b = crawl(url_rows, "b")
    pd.testing.assert_frame_equal(a, b)
