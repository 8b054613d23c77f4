"""sitemap.xml → URL discovery rows.

The reference bootstraps its crawl from exchange symbol catalogs
(``fetch_symbols``, crypto-crawler/src/crawlers/utils.rs:223-258 —
scan the catalog, emit one subscription per symbol).  The open-web
analog is the sitemap protocol: fetch ``sitemap.xml`` per host, emit
one frontier candidate per ``<url>`` entry, recurse through
``<sitemapindex>`` files that point at child sitemaps.

Shapes handled (sitemaps.org protocol):

* ``<urlset>`` — leaf sitemap: emits ``kind='url'`` rows with
  optional ``lastmod``;
* ``<sitemapindex>`` — emits ``kind='sitemap'`` rows; the caller
  feeds those locations back through the fetch join and calls this
  operator again (iterative expansion, exactly like the frontier's
  own discovery loop — recursion is rounds, not recursion);
* gzipped payloads (``sitemap.xml.gz``) are decompressed
  transparently, and a plain-text url-per-line file (the protocol's
  simple form) falls back cleanly.

Scale shape: one sitemap per row, dimension-sized inputs, parsed
executor-side in Arrow batches (``mapInPandas``) with stdlib
``xml.etree`` — no per-row Python in any hot path (sitemaps are a
bootstrap/discovery table, not the 100 TB pages table).
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_ROWS_SCHEMA = "loc string, lastmod string, kind string"

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(payload: bytes | str) -> list[tuple[str, str | None, str]]:
    """(loc, lastmod, kind) entries of one sitemap document — the
    executor kernel and test twin.  ``kind`` is ``'url'`` for urlset
    entries, ``'sitemap'`` for sitemapindex children.  Malformed XML
    falls back to the protocol's plain-text form (one url per line);
    anything else yields []."""
    if isinstance(payload, str):
        data = payload.encode()
    else:
        data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    out: list[tuple[str, str | None, str]] = []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        for line in data.decode("utf-8", "replace").splitlines():
            line = line.strip()
            if line.startswith("http://") or line.startswith("https://"):
                out.append((line, None, "url"))
        return out
    tag = root.tag.removeprefix(_NS)
    if tag not in ("urlset", "sitemapindex"):
        return out
    for child in root:
        # kind follows the CHILD element, not the container: real-world
        # sitemaps mix <sitemap> children into urlsets and vice versa
        ctag = child.tag.removeprefix(_NS)
        if ctag not in ("url", "sitemap"):
            continue
        loc = child.find(f"{_NS}loc")
        if loc is None or not (loc.text or "").strip():
            continue
        lastmod = child.find(f"{_NS}lastmod")
        out.append(
            (
                loc.text.strip(),
                lastmod.text.strip() if lastmod is not None and lastmod.text else None,
                "sitemap" if ctag == "sitemap" else "url",
            )
        )
    return out


def sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    payload_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, sitemap payload) rows → exploded
    ``(host, loc, lastmod, kind)`` rows.  ``kind='url'`` rows join the
    frontier as depth-0 candidates (through the usual canonicalize →
    seen → politeness path); ``kind='sitemap'`` rows are child
    sitemaps to fetch and feed back in the next round."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, locs, mods, kinds = [], [], [], []
            for host, payload in zip(pdf[host_col], pdf[payload_col]):
                if payload is None:
                    continue
                for loc, lastmod, kind in parse_sitemap(payload):
                    hosts.append(host)
                    locs.append(loc)
                    mods.append(lastmod)
                    kinds.append(kind)
            yield pd.DataFrame(
                {"host": hosts, "loc": locs, "lastmod": mods, "kind": kinds}
            )

    return sitemaps.select(host_col, payload_col).mapInPandas(
        gen, schema=f"host string, {SITEMAP_ROWS_SCHEMA}"
    )
