"""Payload decode: html binary -> text, and outlink discovery.

The reference's payload path decompresses/decodes binary frames
before emitting them (gzip/zlib/protobuf sniffing,
crypto-ws-client/src/common/ws_client_internal.rs:629-801) under the
hard rule that payloads are preserved verbatim (README.md:32,
crypto-crawler/src/msg.rs:45).  Our analog: ``extract_text(html)``
must reproduce the corpus ground-truth ``text`` column
BYTE-IDENTICALLY (BASELINE.json input_hint), and outlink extraction
drives the discovery loop (the reference's hourly symbol re-scan,
crypto-crawler/src/crawlers/utils.rs:520-606).

All implementations are Arrow-batched pandas UDFs over vectorized
pandas str ops — no per-row Python in the engine path.  The fixture
HTML dialect (sources/fixtures.py) is title + <p> paragraphs +
<a href> anchors; extraction is deterministic regex, immune to
locale/unicode normalization drift.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)
_HREF_RE = re.compile(r'href="([^"]*)"')


def _maybe_gunzip(b: bytes) -> bytes:
    """Common-Crawl WARC payloads are frequently gzip members; the
    reference likewise decompresses every frame before parsing
    (ws_client_internal.rs:629-668).  Magic-byte sniff keeps plain
    html untouched — extraction stays byte-identical either way."""
    if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
        return gzip.decompress(b)
    return b


def extract_text_py(html: bytes | None) -> str | None:
    """Pure-Python extraction (oracle + unit tests). Byte-for-byte
    the inverse of the fixture generator's html rendering."""
    if html is None:
        return None
    s = _maybe_gunzip(html).decode("utf-8", errors="strict")
    title = _TITLE_RE.search(s)
    paras = _PARA_RE.findall(s)
    parts = ([title.group(1)] if title else []) + paras
    return "\n".join(parts)


def extract_outlinks_py(html: bytes | None) -> list[str]:
    if html is None:
        return []
    return _HREF_RE.findall(_maybe_gunzip(html).decode("utf-8", errors="strict"))


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: _maybe_gunzip(b).decode("utf-8") if b is not None else None)
    s = pd.Series(s, index=html.index, dtype="object")
    title = s.str.extract(_TITLE_RE, expand=False)
    # extractall returns one row per <p> match; join back per index
    paras = s.str.findall(_PARA_RE)
    joined = paras.map(lambda ps: "\n".join(ps) if isinstance(ps, list) else None)
    out = title.fillna("")
    # a lone EMPTY <p></p> still counts as a paragraph (it contributes
    # a separator in the oracle's "\n".join) — so paragraph presence
    # is the match-list length, never joined-string non-emptiness
    has_paras = paras.map(lambda ps: isinstance(ps, list) and len(ps) > 0)
    has_paras = pd.Series(has_paras, index=s.index, dtype="bool")
    out = out.where(~has_paras, out + "\n" + joined.fillna(""))
    # no-title rows must not gain a leading separator
    out = out.where(~(title.isna() & has_paras), joined.fillna(""))
    # rows with no title and no paras but valid html -> empty string;
    # null html -> null
    out = out.where(s.notna(), None)
    return out


@pandas_udf(ArrayType(StringType()))
def outlinks_udf(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: _maybe_gunzip(b).decode("utf-8") if b is not None else None)
    s = pd.Series(s, index=html.index, dtype="object")
    found = s.str.findall(_HREF_RE)
    return found.map(lambda x: x if isinstance(x, list) else [])
