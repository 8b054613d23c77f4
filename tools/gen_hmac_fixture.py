"""Generate the committed HMAC oracle fixture for c13_hmac_sign.

DuckDB has no hmac() function, so the oracle for C13 is a plain
projection of THIS fixture: expected signatures computed by the
python STDLIB hmac (an implementation independent of Spark and of
functions/payload.py's UDF closure) over the deterministic events
subset event_id % 20 == 0 at sf0.01 — the scale the driver's
correctness gate runs at.

Usage: python tools/gen_hmac_fixture.py  (idempotent; commits the
~25 KB parquet at fixtures/hmac_expected_sf0.01.parquet)
"""

from __future__ import annotations

import hashlib
import hmac
import os

import duckdb

SECRET = b"test-secret"  # must match q_c13_hmac_sign
SRC = "/root/testdata/sf0.01/events.parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "hmac_expected_sf0.01.parquet")


def main() -> None:
    df = duckdb.sql(
        f"SELECT event_id, props FROM read_parquet('{SRC}') "
        "WHERE event_id % 20 = 0 ORDER BY event_id"
    ).df()
    df["sig"] = [
        hmac.new(SECRET, p.encode("utf-8"), hashlib.sha256).hexdigest()
        for p in df["props"]
    ]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    df[["event_id", "sig"]].to_parquet(OUT, index=False)
    print(f"wrote {len(df)} rows -> {OUT}")


if __name__ == "__main__":
    main()
