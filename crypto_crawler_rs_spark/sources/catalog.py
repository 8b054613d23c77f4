"""Market catalog: the reference's richest schema as explicit Spark
nested types (§1.2 parity).

``Market`` (crypto-markets/src/market.rs:37-84) carries nested
``Fees{maker,taker}`` (market.rs:6-9), ``Precision{tick_size,
lot_size}`` (market.rs:12-17), nullable ``QuantityLimit`` with four
optional floats (market.rs:20-33) and a dynamic ``info`` map holding
the raw exchange JSON (market.rs:83).  No schema inference anywhere —
the reference hand-declares serde structs per exchange
(crypto-markets/src/exchanges/binance/binance_spot.rs:13-28); we
hand-declare the StructType.

``normalize_catalog`` is the fetch_markets post-processing analog:
status filtering (F3, binance_spot.rs:34,40-41), precision-digit
derivation from tick sizes (C10, crypto-markets/src/exchanges/
utils.rs:38-51), and base/quote extraction (C6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

FEES = StructType(
    [
        StructField("maker", DoubleType(), False),
        StructField("taker", DoubleType(), False),
    ]
)
PRECISION = StructType(
    [
        StructField("tick_size", DoubleType(), False),
        StructField("lot_size", DoubleType(), False),
    ]
)
QUANTITY_LIMIT = StructType(
    [
        StructField("min", DoubleType(), True),
        StructField("max", DoubleType(), True),
        StructField("notional_min", DoubleType(), True),
        StructField("notional_max", DoubleType(), True),
    ]
)

MARKET_SCHEMA = StructType(
    [
        StructField("exchange", StringType(), False),
        StructField("market_type", StringType(), False),  # closed vocab (§1.3)
        StructField("symbol", StringType(), False),
        StructField("base_id", StringType(), False),
        StructField("quote_id", StringType(), False),
        StructField("settle_id", StringType(), True),
        StructField("base", StringType(), False),
        StructField("quote", StringType(), False),
        StructField("settle", StringType(), True),
        StructField("active", BooleanType(), False),
        StructField("margin", BooleanType(), False),
        StructField("fees", FEES, False),
        StructField("precision", PRECISION, False),
        StructField("quantity_limit", QUANTITY_LIMIT, True),
        StructField("contract_value", DoubleType(), True),
        StructField("delivery_date", LongType(), True),  # unix millis
        StructField("info", MapType(StringType(), StringType()), False),
    ]
)

# MarketType closed vocabulary (crypto-market-type/src/lib.rs:32-50)
MARKET_TYPES = [
    "unknown", "spot", "linear_future", "inverse_future", "linear_swap",
    "inverse_swap", "european_option", "american_option", "quanto_future",
    "quanto_swap", "move", "bvol",
]


def market_types_df(spark: SparkSession) -> DataFrame:
    """The enum as a broadcastable validation dimension (Spark has no
    enum type; membership is a semi-join, §1.6)."""
    return spark.createDataFrame([(m,) for m in MARKET_TYPES], "market_type string")


def normalize_catalog(markets: DataFrame) -> DataFrame:
    """fetch_markets post-processing: keep active markets with a
    known market_type, derive precision digits and a canonical pair."""
    spark = markets.sparkSession
    return (
        markets.filter(F.col("active"))
        .join(F.broadcast(market_types_df(spark)), "market_type", "left_semi")
        .withColumn(
            "price_digits",
            F.length(
                F.regexp_extract(
                    F.format_number(F.col("precision.tick_size"), 10), r"\.(\d*?)0*$", 1
                )
            ),
        )
        .withColumn("pair", F.concat_ws("/", "base", "quote"))
        .withColumn("maker_fee", F.col("fees.maker"))
        .withColumn(
            "min_qty", F.coalesce(F.col("quantity_limit.min"), F.lit(0.0))
        )
    )


def demo_catalog(spark: SparkSession) -> DataFrame:
    """Deterministic fixture rows exercising every nested/nullable
    shape in MARKET_SCHEMA."""
    rows = [
        (
            "binance", "spot", "BTCUSDT", "BTC", "USDT", None, "BTC", "USDT",
            None, True, True, (0.001, 0.002), (0.01, 0.0001),
            (0.0001, 9000.0, 10.0, None), None, None, {"status": "TRADING"},
        ),
        (
            "binance", "linear_swap", "BTCUSDT", "BTC", "USDT", "USDT", "BTC",
            "USDT", "USDT", True, False, (0.0002, 0.0004), (0.1, 0.001),
            None, 1.0, 1893456000000, {"contractType": "PERPETUAL"},
        ),
        (
            "deribit", "european_option", "BTC-28MAR25", "BTC", "USD", "BTC",
            "BTC", "USD", "BTC", False, False, (0.0003, 0.0003), (0.0005, 0.1),
            (0.1, None, None, None), 1.0, 1743148800000, {},
        ),
        (
            "bogus", "not_a_type", "XXX", "X", "Y", None, "X", "Y", None,
            True, False, (0.0, 0.0), (1.0, 1.0), None, None, None, {},
        ),
    ]
    return spark.createDataFrame(rows, MARKET_SCHEMA)
