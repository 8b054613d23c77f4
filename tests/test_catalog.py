"""Market-catalog nested schema (§1.2) + enum-dimension validation
(§1.3): nested structs, nullable nested structs, map columns, and the
normalization stage."""

from crypto_crawler_rs_spark.sources.catalog import (
    MARKET_SCHEMA,
    demo_catalog,
    market_types_df,
    normalize_catalog,
)


def test_schema_shapes(spark):
    df = demo_catalog(spark)
    assert df.schema == MARKET_SCHEMA
    rows = {(r.exchange, r.market_type): r for r in df.collect()}
    spot = rows[("binance", "spot")]
    assert spot.fees.maker == 0.001
    assert spot.quantity_limit.notional_max is None  # nullable nested field
    swap = rows[("binance", "linear_swap")]
    assert swap.quantity_limit is None  # nullable nested struct
    assert swap.info["contractType"] == "PERPETUAL"


def test_normalize_filters_and_derives(spark):
    out = normalize_catalog(demo_catalog(spark)).collect()
    got = {(r.exchange, r.market_type): r for r in out}
    # inactive deribit option dropped; unknown market_type dropped
    assert set(got) == {("binance", "spot"), ("binance", "linear_swap")}
    spot = got[("binance", "spot")]
    assert spot.pair == "BTC/USDT"
    assert spot.price_digits == 2  # tick 0.01
    assert spot.min_qty == 0.0001
    swap = got[("binance", "linear_swap")]
    assert swap.price_digits == 1  # tick 0.1
    assert swap.min_qty == 0.0  # null limit coalesced


def test_enum_dimension(spark):
    assert market_types_df(spark).count() == 12
