"""Generate the committed decompression oracle fixture for
c11_decompress.

DuckDB cannot gzip/zlib-compress, so the oracle for the NON-identity
decompression paths is a plain projection of THIS fixture: payloads
compressed by python STDLIB gzip/zlib (independent of Spark and of
functions/payload.py's UDF) from the deterministic documents table at
sf0.01 — the scale the driver's correctness gate runs at.  Mix:

    doc_id % 3 == 0 -> gzip member   (magic 1f 8b)
    doc_id % 3 == 1 -> zlib stream   (0x78 header)
    doc_id % 3 == 2 -> raw utf-8     (identity path)

so one oracle row set covers ALL THREE dispatch branches of
decompress_udf (ws_client_internal.rs:629-801 sniffing analog).

Usage: python tools/gen_c11_fixture.py  (idempotent; commits the
small parquet at fixtures/c11_payloads_sf0.01.parquet)
"""

from __future__ import annotations

import gzip
import os
import zlib

import duckdb

SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "c11_payloads_sf0.01.parquet")


def main() -> None:
    df = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SRC}') ORDER BY doc_id"
    ).df()

    def pack(doc_id: int, text: str) -> bytes:
        raw = text.encode("utf-8")
        m = doc_id % 3
        if m == 0:
            return gzip.compress(raw, mtime=0)
        if m == 1:
            return zlib.compress(raw)
        return raw

    def sniff_unpack(b: bytes) -> str:
        """Independent twin of the ENGINE's magic-byte dispatch
        (payload.decompress_payload: gzip '1f 8b', zlib first byte
        0x78, else raw).  Regeneration must fail loudly if a raw text
        happens to START with a magic byte (e.g. 'x...' = 0x78) — it
        would be mis-dispatched and silently poison the oracle."""
        if b[:2] == b"\x1f\x8b":
            return gzip.decompress(b).decode("utf-8")
        if len(b) >= 1 and b[0] == 0x78:
            return zlib.decompress(b).decode("utf-8")
        return b.decode("utf-8")

    df["payload"] = [pack(int(i), t) for i, t in zip(df["doc_id"], df["text"])]
    df["expected"] = df["text"]
    for i, (p, t) in enumerate(zip(df["payload"], df["expected"])):
        got = sniff_unpack(p)
        assert got == t, (
            f"row {i}: dispatch roundtrip mismatch (raw text colliding "
            f"with a compression magic byte?) — refusing to write a "
            f"poisoned oracle fixture"
        )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    df[["doc_id", "payload", "expected"]].to_parquet(OUT, index=False)
    print(f"wrote {len(df)} rows -> {OUT}")


if __name__ == "__main__":
    main()
