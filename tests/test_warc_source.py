"""WARC source: roundtrip + crawl equivalence.

A corpus shipped as .warc / .warc.gz files must drive the engine to
the IDENTICAL crawl as the same corpus handed over as a DataFrame —
including the payload-contains-CRLFCRLF trap (Content-Length-driven
parsing, never scanning)."""

from crypto_crawler_rs_spark.plans.frontier import FrontierConfig, FrontierScheduler
from crypto_crawler_rs_spark.sources.fixtures import corpus_to_spark, gen_corpus
from crypto_crawler_rs_spark.sources.warc import (
    iter_warc_records,
    pages_from_warc,
    write_warc,
)


def test_warc_roundtrip_with_crlf_payload(tmp_path):
    html = b"<html><title>T</title>\r\n\r\n<p>body \r\n\r\n more</p></html>"
    recs = [
        ("https://a.example.com/p/0", "2020-01-01T00:00:00Z", html),
        ("https://a.example.com/p/1", "2021-06-02T03:04:05Z", b""),
    ]
    p = tmp_path / "t.warc"
    write_warc(recs, str(p))
    got = list(iter_warc_records(p.read_bytes()))
    assert len(got) == 2
    assert got[0][0]["WARC-Target-URI"] == recs[0][0]
    assert got[0][1] == html
    assert got[1][1] == b""


def test_warc_crawl_equals_dataframe_crawl(spark, tmp_path):
    corpus = gen_corpus(n_pages=60, n_hosts=4, n_seeds=6, seed=37)
    sdfs = corpus_to_spark(spark, corpus)

    # ship the same pages as two warc files, one plain one gzipped
    recs = [
        (r.url, r.warc_ts.isoformat() + "Z", bytes(r.html))
        for r in corpus["pages"].itertuples(index=False)
    ]
    wdir = tmp_path / "warc"
    wdir.mkdir()
    write_warc(recs[: len(recs) // 2], str(wdir / "a.warc"))
    write_warc(recs[len(recs) // 2 :], str(wdir / "b.warc.gz"), compress=True)
    pages = pages_from_warc(spark, str(wdir))
    assert pages.count() == len(recs)

    results = []
    for name, pdf in (("df", sdfs["pages"]), ("warc", pages)):
        eng = FrontierScheduler(
            spark, pdf, sdfs["host_policy"], str(tmp_path / f"s_{name}"),
            FrontierConfig(max_rounds=4, n_seen_buckets=4),
        )
        m = eng.run(seeds=sdfs["seeds"], max_rounds=4)
        f = eng.fetched(m).toPandas()
        sched = f[f.status.isin(["ok", "missing"])].sort_values(
            ["round", "rank_in_round"]
        )
        results.append(
            (
                sched[["round", "url", "status", "text_sha256"]]
                .to_records(index=False)
                .tolist(),
                {r["url"] for r in eng.seen(m).select("url").collect()},
            )
        )
    assert results[0] == results[1]
