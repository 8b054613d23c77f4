"""C12 protobuf codec + C3 to_json command rendering.

Golden byte vectors are hand-assembled from the proto3 wire-format
spec (NOT produced by our own encoder), so decode is verified against
an independent ground truth; the mixed-batch test exercises the full
gzip/zlib/protobuf/text dispatch the reference performs per frame
(ws_client_internal.rs:629-801)."""

import gzip
import zlib

from pyspark.sql import functions as F

from crypto_crawler_rs_spark.functions.payload import (
    decode_frame,
    decode_frame_udf,
    looks_like_protobuf,
    pb_decode,
    pb_encode,
)

# field 1 (tag 0x0A) "spot@public.deals.v3.api@BTCUSDT"? keep short:
# channel="trade", symbol="BTCUSDT", ts=1700000000000, body="{}"
GOLDEN = bytes(
    [0x0A, 0x05] + list(b"trade")
    + [0x12, 0x07] + list(b"BTCUSDT")
    # field 3 varint: 1700000000000 in 7-bit LE groups
    + [0x18, 0x80, 0xD0, 0x95, 0xFF, 0xBC, 0x31]
    + [0x22, 0x02] + list(b"{}")
)


def test_pb_decode_golden_bytes():
    d = pb_decode(GOLDEN)
    assert d == {
        "channel": "trade",
        "symbol": "BTCUSDT",
        "ts": 1_700_000_000_000,
        "body": "{}",
    }


def test_pb_encode_matches_golden():
    assert pb_encode("trade", "BTCUSDT", 1_700_000_000_000, "{}") == GOLDEN


def test_pb_roundtrip_unicode_and_empty():
    for args in (("", "", 0, ""), ("k线", "BTC/USDT", 2**62, '{"p": "1.5"}')):
        assert pb_decode(pb_encode(*args)) == dict(
            zip(("channel", "symbol", "ts", "body"), args)
        )


def test_pb_sniff_rejects_malformed():
    assert not looks_like_protobuf(b"")
    assert not looks_like_protobuf(b"\x0a\xff")  # LEN overruns buffer
    assert not looks_like_protobuf(b"\x7b\x22k\x22")  # '{"k"' json text
    assert not looks_like_protobuf(b"\x1f\x8b\x08\x00")  # gzip magic
    assert looks_like_protobuf(GOLDEN)


def test_decode_frame_mixed_batch_dispatch(spark):
    text = '{"e":"trade","p":"42.0"}'
    frames = [
        ("gzip", gzip.compress(text.encode())),
        ("zlib", zlib.compress(text.encode())),
        ("protobuf", GOLDEN),
        ("text", text.encode()),
        (None, None),
    ]
    # pure-python twin
    for fmt, b in frames:
        got_fmt, got_text = decode_frame(b)
        assert got_fmt == fmt
        if fmt == "protobuf":
            assert got_text == "trade|BTCUSDT|1700000000000|{}"
        elif fmt is not None:
            assert got_text == text
    # UDF over one mixed Arrow batch
    df = spark.createDataFrame(
        [(i, b) for i, (_, b) in enumerate(frames)], "i int, payload binary"
    )
    out = (
        df.select("i", decode_frame_udf(F.col("payload")).alias("d"))
        .select("i", "d.format", "d.text")
        .toPandas()
        .sort_values("i")
    )
    assert out["format"].tolist() == [f for f, _ in frames]


def test_c3_golden_command_strings(spark):
    """Exact JSON command strings, mirroring the reference's golden
    command tests (clients/binance.rs:379-409 shape)."""
    df = spark.createDataFrame([("BTCUSDT",), ("ethusdt",)], "sym string")
    cmd = F.to_json(
        F.struct(
            F.lit("SUBSCRIBE").alias("method"),
            F.array(F.concat(F.lower("sym"), F.lit("@depth"))).alias("params"),
            F.lit(9527).cast("long").alias("id"),
        )
    )
    got = {r["sym"]: r["c"] for r in df.select("sym", cmd.alias("c")).collect()}
    assert got["BTCUSDT"] == '{"method":"SUBSCRIBE","params":["btcusdt@depth"],"id":9527}'
    assert got["ethusdt"] == '{"method":"SUBSCRIBE","params":["ethusdt@depth"],"id":9527}'
