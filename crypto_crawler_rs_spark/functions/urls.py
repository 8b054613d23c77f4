"""URL canonicalization — the request-identity normalization step.

The reference canonicalizes request identity before keying any state
on it: symbols are lowercased when building websocket topics
(crypto-ws-client/src/clients/binance.rs:263) and REST query params
are emitted in sorted order via a BTreeMap
(crypto-rest-client/src/exchanges/utils.rs:71-94).  Our analog is
full URL canonicalization: lowercase scheme+host, strip fragments,
strip default ports, sort query params (stable, duplicates
preserved), empty path -> "/".

Two entry points with IDENTICAL semantics (tested against each
other):

* :func:`canonicalize_url` — pure Python, used by the sequential
  oracle simulator and unit tests.
* :func:`canonicalize_udf` — Arrow-batched pandas UDF for the engine.
  A vectorized regex fast-path handles already-clean URLs (the vast
  majority at crawl scale) without touching Python per element; only
  messy URLs fall back to the scalar routine.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# scheme://host[:port][/path][?query][#fragment]
_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#:]+)"
    r"(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#.*)?$"
)

# Fast-path: lowercase scheme+host, no port, no query, no fragment,
# non-empty path.  These URLs are already canonical.
_CLEAN_RE = re.compile(r"^[a-z][a-z0-9+.-]*://[a-z0-9.-]+/[^?#]*$")


def canonicalize_url(url: str | None) -> str | None:
    """Canonicalize one URL. Returns None for None/unparseable input."""
    if url is None:
        return None
    url = url.strip()
    m = _URL_RE.match(url)
    if m is None:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    port = m.group("port")
    path = m.group("path") or "/"
    query = m.group("query")
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    out = f"{scheme}://{netloc}{path}"
    if query:
        # stable sort of k=v pairs by (key, value); duplicates kept
        pairs = query.split("&")
        keyed = sorted(
            (p.split("=", 1)[0], p) for p in pairs if p != ""
        )
        if keyed:
            out += "?" + "&".join(p for _, p in keyed)
    return out


def host_of_url(url: str | None) -> str | None:
    """Registrable host of an (already canonical) URL."""
    if url is None:
        return None
    m = _URL_RE.match(url)
    if m is None:
        return None
    return m.group("host").lower()


def _sort_query(q: str) -> str | None:
    """Stable (key, pair) sort of query pairs; None when no pairs
    survive (mirrors canonicalize_url's omit-empty-'?' rule)."""
    pairs = [p for p in q.split("&") if p != ""]
    if not pairs:
        return None
    return "&".join(p for _, p in sorted((p.split("=", 1)[0], p) for p in pairs))


def _canonicalize_series(s: pd.Series) -> pd.Series:
    # vectorized fast path: already-canonical URLs pass through
    clean = s.str.match(_CLEAN_RE, na=False)
    if clean.all():
        return s
    out = s.copy()
    dirty = (~clean) & s.notna()
    if not dirty.any():
        return out
    # vectorized messy path: ONE regex pass extracts all components
    # (named groups), assembly is pandas str ops; only the query-sort
    # touches python per element, and only for urls that HAVE a query.
    # Semantics are pinned 1:1 to canonicalize_url by a randomized
    # equivalence test (tests/test_functions.py).
    d = s[dirty].str.strip()
    m = d.str.extract(_URL_RE)
    parseable = m["scheme"].notna()
    scheme = m["scheme"].str.lower()
    host = m["host"].str.lower()
    port = m["port"]
    default = scheme.map(_DEFAULT_PORTS).fillna("")
    keep_port = port.notna() & (port != default)
    netloc = host.where(~keep_port, host + ":" + port.fillna(""))
    base = scheme + "://" + netloc + m["path"].fillna("/")
    q = m["query"]
    has_q = q.notna() & (q != "")
    if has_q.any():
        sq = q[has_q].map(_sort_query)
        keep = sq.notna()
        add = base[has_q][keep] + "?" + sq[keep]
        base.update(add)
    canon = base.where(parseable, None)
    out[dirty] = canon
    return out


@pandas_udf(StringType())
def canonicalize_udf(s: pd.Series) -> pd.Series:
    return _canonicalize_series(s)


@pandas_udf(StringType())
def host_udf(s: pd.Series) -> pd.Series:
    # host extraction is a pure regex — fully vectorized
    return s.str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", expand=False).str.lower()


def host_col(url_col):
    """Host of an ALREADY-CANONICAL url — pure JVM expression (the
    canonicalizer guarantees a lowercase host, so no python stage is
    needed; whole-stage codegen keeps this in the scan pipeline).
    Returns NULL for null/unparseable input like :func:`host_udf`."""
    ex = F.regexp_extract(url_col, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    return F.when(ex == "", None).otherwise(ex)


def with_canonical(df, url_col: str = "url", out_col: str = "url"):
    """Add/replace canonical url + host columns on a DataFrame."""
    df = df.withColumn(out_col, canonicalize_udf(F.col(url_col)))
    return df.withColumn("host", host_udf(F.col(out_col)))
