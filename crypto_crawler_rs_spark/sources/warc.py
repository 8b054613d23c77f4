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
the driver.

Memory model: CC gzips each record as its OWN gzip member (members
concatenate), precisely so consumers can stream.  The reader honors
that: records are decompressed member-by-member through a streaming
``gzip.GzipFile`` and emitted in bounded Arrow batches — a ~1 GB
archive never inflates its ~4-5 GB of content in task memory at
once; peak extra memory is one record plus one output batch
(``_BATCH_BYTES``).  The writer exists for tests and for re-sharding
small corpora.

Per-file ceiling: ``binaryFile`` materializes each archive's
COMPRESSED bytes as one row, and Spark caps binaryFile rows at 2 GB
(Int.MaxValue bytes — ``spark.sql.sources.binaryFile.maxLength``).
CC's ~1 GB shards sit comfortably under it; for oversize archives,
re-shard upstream or swap this source for an
``sc.binaryFiles``/custom-datasource reader with a true streaming
open.  Throughput scales with the FILE count (one task per archive;
see ``test_warc_multi_archive_parallelism``), so many ~1 GB shards
is also the fast layout, not just the safe one.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"

# flush an output batch once its html payloads reach this size — keeps
# task memory bounded regardless of archive size
_BATCH_BYTES = 64 << 20
_BATCH_ROWS = 10_000


def write_warc(
    records: list[tuple[str, str, bytes]], path: str, compress: bool | str = False
) -> None:
    """Write (url, iso_ts, html_bytes) records as a WARC response
    file.  ``compress``: False = plain; True/'file' = one gzip member
    for the whole file; 'members' = one gzip member PER RECORD — what
    Common Crawl actually ships (enables range reads + streaming)."""

    def record_bytes(url: str, ts: str, html: bytes) -> bytes:
        headers = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(html)}\r\n"
            "Content-Type: text/html\r\n"
        ).encode("utf-8")
        return headers + b"\r\n" + html + b"\r\n\r\n"

    with open(path, "wb") as f:
        if compress == "members":
            for url, ts, html in records:
                f.write(gzip.compress(record_bytes(url, ts, html), mtime=0))
        else:
            buf = io.BytesIO()
            for url, ts, html in records:
                buf.write(record_bytes(url, ts, html))
            data = buf.getvalue()
            if compress:
                data = gzip.compress(data, mtime=0)
            f.write(data)


def iter_warc_stream(f) -> Iterator[tuple[dict, bytes]]:
    """Walk (headers, body) records from a readable binary stream.
    Content-Length-driven — no scanning inside payloads, so html
    containing '\\r\\n\\r\\n' parses fine.  Only one record's body is
    ever materialized."""
    while True:
        line = f.readline()
        while line in (b"\r\n", b"\n"):
            line = f.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line!r}")
        hdrs: dict[str, str] = {}
        while True:
            raw = f.readline()
            if raw == b"":
                raise ValueError(
                    "truncated WARC header block (EOF before blank line)"
                )
            if raw in (b"\r\n", b"\n"):
                break
            text = raw.decode("utf-8").rstrip("\r\n")
            if ": " in text:
                k, v = text.split(": ", 1)
                hdrs[k] = v
        if "Content-Length" not in hdrs:
            raise ValueError(f"WARC record missing Content-Length: {hdrs!r}")
        length = int(hdrs["Content-Length"])
        body = f.read(length)
        if len(body) < length:
            raise ValueError("truncated WARC record body")
        yield hdrs, body


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, body) records of one decompressed WARC byte blob —
    thin wrapper over :func:`iter_warc_stream` for in-memory use."""
    yield from iter_warc_stream(io.BytesIO(data))


def _open_warc(data: bytes):
    """Readable stream over (possibly gzipped) warc bytes.  Gzip is
    decompressed INCREMENTALLY: ``gzip.GzipFile`` walks concatenated
    members one at a time (the CC per-record-member layout), so the
    archive's inflated content never exists in memory at once."""
    if data[:2] == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(data)))
    return io.BytesIO(data)


def pages_from_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read .warc / .warc.gz files into (url, warc_ts, html) — the
    engine's pages shape.  Only ``response`` records with a target
    URI are emitted, in bounded-size Arrow batches."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return _parse_warc_files(files)


def stream_pages_from_warc(
    spark: SparkSession, path_glob: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """STREAMING variant: watch a directory for newly-landed WARC
    archives (the Common-Crawl-dump ingest shape — shards arrive over
    hours) and emit their records as an unbounded pages stream.

    ``binaryFile`` is a file-based streaming source, so this is the
    same one-task-per-archive scale model as the batch reader with
    exactly-once file tracking from the streaming checkpoint;
    ``max_files_per_trigger`` bounds micro-batch size (archives per
    trigger).  Compose with ``streaming/stream.py`` (windowed metrics,
    stateful dedup, budget gate) like any other pages stream."""
    # streaming sources require an explicit schema; binaryFile's is fixed
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path_glob).select("path", "content")
    return _parse_warc_files(files)


def _parse_warc_files(files: DataFrame) -> DataFrame:
    """(path, content) archive rows -> parsed pages (shared by the
    batch and streaming readers — identical record semantics)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {"url": [], "warc_ts": [], "html": []}
        pending = 0

        def flush() -> pd.DataFrame:
            nonlocal rows, pending
            out = pd.DataFrame(rows)
            rows = {"url": [], "warc_ts": [], "html": []}
            pending = 0
            return out

        for pdf in batches:
            for content in pdf["content"]:
                stream = _open_warc(bytes(content))
                for hdrs, body in iter_warc_stream(stream):
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
                    pending += len(body)
                    if pending >= _BATCH_BYTES or len(rows["url"]) >= _BATCH_ROWS:
                        yield flush()
        if rows["url"]:
            yield flush()

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)
