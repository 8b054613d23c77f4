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


def test_warc_per_record_gzip_members_stream(tmp_path):
    """Common Crawl gzips each record as its own member; the reader
    must walk members incrementally (never inflating the archive at
    once) and yield identical records to the plain file."""
    import gzip as _gzip
    import io as _io

    from crypto_crawler_rs_spark.sources.warc import iter_warc_stream

    recs = [
        (f"https://m.example.com/p/{i}", "2022-02-02T00:00:00Z",
         f"<html><p>body {i} \r\n\r\n x</p></html>".encode())
        for i in range(25)
    ]
    p = tmp_path / "m.warc.gz"
    write_warc(recs, str(p), compress="members")
    data = p.read_bytes()
    # sanity: the file really is concatenated members (many magics)
    assert data.count(b"\x1f\x8b\x08") >= len(recs)
    stream = _io.BufferedReader(_gzip.GzipFile(fileobj=_io.BytesIO(data)))
    got = list(iter_warc_stream(stream))
    assert [(h["WARC-Target-URI"], b) for h, b in got] == [
        (u, b) for u, _, b in recs
    ]


def test_warc_batch_flush_bounds_memory(spark, tmp_path, monkeypatch):
    """With a tiny batch cap the reader emits MANY Arrow batches per
    archive (the 1 GB-archive memory bound) and the result is still
    exactly the record set."""
    import crypto_crawler_rs_spark.sources.warc as warcmod

    monkeypatch.setattr(warcmod, "_BATCH_ROWS", 7)
    recs = [
        (f"https://b.example.com/p/{i}", "2023-03-03T00:00:00Z",
         f"<html><p>{i}</p></html>".encode())
        for i in range(40)
    ]
    wdir = tmp_path / "w"
    wdir.mkdir()
    write_warc(recs, str(wdir / "a.warc.gz"), compress="members")
    got = warcmod.pages_from_warc(spark, str(wdir)).toPandas()
    assert sorted(got["url"]) == sorted(u for u, _, _ in recs)
    assert {bytes(h) for h in got["html"]} == {b for _, _, b in recs}


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
    third = len(recs) // 3
    write_warc(recs[:third], str(wdir / "a.warc"))
    write_warc(recs[third : 2 * third], str(wdir / "b.warc.gz"), compress=True)
    write_warc(recs[2 * third :], str(wdir / "c.warc.gz"), compress="members")
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


def test_warc_multi_archive_parallelism(spark, tmp_path):
    """A sharded corpus (many archives, the CC layout) reads as one
    DataFrame with file-level parallelism: records land in multiple
    tasks (one per archive once file-packing is out of the way), and
    the union equals the sum of per-archive reads."""
    from pyspark.sql import functions as F

    n_files, per_file = 6, 8
    expect = set()
    for a in range(n_files):
        recs = []
        for i in range(per_file):
            url = f"https://s{a}.example.com/p/{i}"
            recs.append((url, "2023-03-03T00:00:00Z",
                         f"<html><p>a{a} r{i}</p></html>".encode()))
            expect.add(url)
        write_warc(recs, str(tmp_path / f"shard-{a}.warc.gz"),
                   compress="members")

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        # defeat small-file packing so each tiny archive gets its own
        # split, as a real ~1 GB shard would under defaults
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        spark.conf.set("spark.sql.files.openCostInBytes", "2048")
        df = pages_from_warc(spark, str(tmp_path / "shard-*.warc.gz"))
        got = (
            df.withColumn("pid", F.spark_partition_id())
            .select("url", "pid")
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    assert {r["url"] for r in got} == expect
    by_pid = {}
    for r in got:
        by_pid.setdefault(r["pid"], set()).add(r["url"].split(".")[0])
    # multiple tasks did real work, and no archive was split across
    # tasks (binaryFile is one row per file)
    assert len(by_pid) >= 2
    for hosts in by_pid.values():
        assert len(hosts) <= max(1, n_files // len(by_pid) + 1)


def test_warc_streaming_source(spark, tmp_path):
    """Archives landing over time stream through as pages micro-batches
    with exactly-once file tracking; record semantics identical to the
    batch reader."""
    import os
    import time

    from crypto_crawler_rs_spark.sources.warc import stream_pages_from_warc

    land = tmp_path / "land"
    os.makedirs(land)

    def shard(a, n=6):
        recs = [
            (f"https://w{a}.example.com/p/{i}", "2024-04-04T00:00:00Z",
             f"<html><p>w{a} r{i} \r\n\r\n x</p></html>".encode())
            for i in range(n)
        ]
        write_warc(recs, str(land / f"in-{a}.warc.gz"), compress="members")
        return {u for u, _, _ in recs}

    expect = shard(0)
    stream = stream_pages_from_warc(
        spark, str(land / "*.warc.gz"), max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        def wait_for(n, timeout=60):
            t0 = time.time()
            while time.time() - t0 < timeout:
                if spark.sql("SELECT count(*) c FROM warc_stream").collect()[0]["c"] >= n:
                    return
                time.sleep(0.5)
            raise AssertionError(f"stream never reached {n} rows")

        wait_for(6)
        expect |= shard(1)  # second archive lands mid-stream
        wait_for(12)
    finally:
        q.stop()
    got = spark.sql("SELECT url, html FROM warc_stream").collect()
    assert {r["url"] for r in got} == expect
    assert len(got) == 12  # exactly-once: no file re-ingested
    assert all(bytes(r["html"]).startswith(b"<html>") for r in got)
