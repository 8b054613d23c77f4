"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Explicit schemas via parquet's embedded schema — no inferSchema
anywhere (the reference hand-declares every serde struct, e.g.
crypto-markets/src/exchanges/binance/binance_spot.rs:13-28).
"""

from __future__ import annotations

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark, sf_dir: str, names=TABLES) -> dict:
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
