"""WARC source — Common Crawl's native archive format (ISO 28500).

The reference ingests live websocket/REST frames; the web-scale
analog of "another exchange connector" is another ARCHIVE format.
This reader turns .warc / .warc.gz files into the engine's pages
schema (url, warc_ts, html) without any external warc library:
records are length-delimited (Content-Length) header blocks, so the
parse is a deterministic byte walk.

Scale model: Spark's binaryFile source assigns one file per task —
Common Crawl ships ~1 GB warc files, so file-level parallelism is
the natural (and CC-standard) partitioning.  Record parsing happens
executor-side inside mapInPandas; nothing but file paths ever reaches
the driver.  The writer exists for tests and for re-sharding small
corpora.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"


def write_warc(records: list[tuple[str, str, bytes]], path: str, compress: bool = False) -> None:
    """Write (url, iso_ts, html_bytes) records as a WARC response
    file.  ``compress`` gzips the whole file (single member — the
    reader handles both; per-record members are what CC really ships,
    also handled since gzip.decompress concatenates members)."""
    buf = io.BytesIO()
    for url, ts, html in records:
        headers = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(html)}\r\n"
            "Content-Type: text/html\r\n"
        ).encode("utf-8")
        buf.write(headers + b"\r\n" + html + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk (headers, body) records of one (decompressed) WARC file.
    Content-Length-driven — no scanning inside payloads, so html
    containing '\\r\\n\\r\\n' parses fine."""
    i = 0
    n = len(data)
    while i < n:
        while data.startswith(b"\r\n", i):
            i += 2
        if i >= n:
            break
        he = data.find(b"\r\n\r\n", i)
        if he < 0:
            raise ValueError(f"truncated WARC header block at offset {i}")
        lines = data[i:he].decode("utf-8").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        hdrs = {}
        for line in lines[1:]:
            if ": " in line:
                k, v = line.split(": ", 1)
                hdrs[k] = v
        length = int(hdrs["Content-Length"])
        body_start = he + 4
        if body_start + length > n:
            raise ValueError("truncated WARC record body")
        yield hdrs, data[body_start : body_start + length]
        i = body_start + length


def pages_from_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read .warc / .warc.gz files into (url, warc_ts, html) — the
    engine's pages shape.  Only ``response`` records with a target
    URI are emitted."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": []}
            for content in pdf["content"]:
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                for hdrs, body in iter_warc_records(data):
                    if hdrs.get("WARC-Type") != "response":
                        continue
                    uri = hdrs.get("WARC-Target-URI")
                    if not uri:
                        continue
                    ts = pd.Timestamp(hdrs.get("WARC-Date"))
                    if ts.tzinfo is not None:
                        ts = ts.tz_convert("UTC").tz_localize(None)
                    rows["url"].append(uri)
                    rows["warc_ts"].append(ts)
                    rows["html"].append(body)
            yield pd.DataFrame(rows)

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)
