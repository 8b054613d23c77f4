"""Binary payload handling: decompression dispatch + request signing.

C11/C12: the reference sniffs each websocket frame's leading bytes
and dispatches to gzip / zlib / plain-text decoding
(crypto-ws-client/src/common/ws_client_internal.rs:629-801, magic
bytes: gzip ``1f 8b``, zlib ``78 xx``).  Here the same dispatch is an
Arrow-batched pandas UDF over a BinaryType column — per-batch format
detection, stdlib codecs, deterministic output.

C13: HMAC-SHA256 request signing with lowercase-hex output
(crypto-rest-client/src/exchanges/utils.rs:24-68).  Not needed by the
frontier itself; provided for API-surface completeness (the
reference's private-endpoint path).
"""

from __future__ import annotations

import gzip
import hashlib
import hmac as _hmac
import zlib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def decompress_payload(b: bytes | None) -> str | None:
    """Pure-python twin (tests / oracle)."""
    if b is None:
        return None
    if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
        return gzip.decompress(b).decode("utf-8")
    if len(b) >= 1 and b[0] == 0x78:
        return zlib.decompress(b).decode("utf-8")
    return b.decode("utf-8", errors="replace")


@pandas_udf(StringType())
def decompress_udf(payload: pd.Series) -> pd.Series:
    return payload.map(decompress_payload)


def sign_hmac_sha256(secret: str, message: str) -> str:
    return _hmac.new(
        secret.encode("utf-8"), message.encode("utf-8"), hashlib.sha256
    ).hexdigest()


def hmac_sign_udf(secret: str):
    """UDF factory: sign a message column with a fixed secret.
    The secret rides the closure (broadcast with the serialized UDF),
    never a DataFrame column."""

    @pandas_udf(StringType())
    def sign(msg: pd.Series) -> pd.Series:
        key = secret.encode("utf-8")
        return msg.map(
            lambda m: _hmac.new(key, m.encode("utf-8"), hashlib.sha256).hexdigest()
            if m is not None
            else None
        )

    return sign
