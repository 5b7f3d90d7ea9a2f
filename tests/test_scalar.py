"""Scalar function goldens (reference: internal/lua/lua_test.go:323-401)
plus the per-row error semantics the reference's (value, err) returns
imply: invalid input must become null, never abort the job."""

from __future__ import annotations

import hashlib
import hmac as _hmac

from pyspark.sql import functions as F

from hermod_spark.functions import scalar


def _one(spark, expr, value: str):
    df = spark.createDataFrame([(value,)], "s STRING")
    return df.select(expr("s").alias("out")).first()["out"]


def test_rot13_golden(spark):
    # lua_test.go:344-356
    assert _one(spark, scalar.rot13, "Hello, World!") == "Uryyb, Jbeyq!"


def test_rot13_involution(spark):
    df = spark.createDataFrame([("Uryyb, Jbeyq!",)], "s STRING")
    assert (
        df.select(scalar.rot13(scalar.rot13("s")).alias("o")).first()["o"]
        == "Uryyb, Jbeyq!"
    )


def test_rot13_non_ascii_untouched(spark):
    assert _one(spark, scalar.rot13, "abc äöü 123") == "nop äöü 123"


def test_base64_golden(spark):
    # lua_test.go:383-401
    assert _one(spark, scalar.base64_encode, "Hello, World!") == "SGVsbG8sIFdvcmxkIQ=="


def test_base64_roundtrip(spark):
    df = spark.createDataFrame([("Hello, World!",)], "s STRING")
    out = df.select(
        scalar.base64_decode(scalar.base64_encode("s")).alias("o")
    ).first()["o"]
    assert out == "Hello, World!"


def test_base64_long_input_no_mime_wrap(spark):
    import base64

    s = "x" * 500
    assert _one(spark, scalar.base64_encode, s) == base64.b64encode(s.encode()).decode()


def test_base64_decode_invalid_is_null(spark):
    # ADVICE r1: 'not-valid!!' must yield null, not MALFORMED_CHARACTER_CODING
    assert _one(spark, scalar.base64_decode, "not-valid!!") is None


def test_hex_golden_lowercase(spark):
    assert _one(spark, scalar.hex_encode, "Hello") == "48656c6c6f"


def test_hex_roundtrip(spark):
    df = spark.createDataFrame([("Hello, World!",)], "s STRING")
    out = df.select(scalar.hex_decode(scalar.hex_encode("s")).alias("o")).first()["o"]
    assert out == "Hello, World!"


def test_hex_decode_non_utf8_is_null(spark):
    # ADVICE r1: valid hex of invalid UTF-8 ('ff') -> null, not a crash
    assert _one(spark, scalar.hex_decode, "ff") is None
    assert _one(spark, scalar.hex_decode, "zz") is None


def test_hmac_sha256_golden(spark):
    want = _hmac.new(b"secret-key", b"Hello, World!", hashlib.sha256).hexdigest()
    df = spark.createDataFrame([("Hello, World!",)], "s STRING")
    got = df.select(
        scalar.hmac_sha256(F.lit("secret-key"), F.col("s")).alias("o")
    ).first()["o"]
    assert got == want


def test_json_encode_decode(spark):
    df = spark.createDataFrame([(1, "x")], "a INT, b STRING")
    js = df.select(scalar.json_encode(F.struct("a", "b")).alias("o")).first()["o"]
    assert js == '{"a":1,"b":"x"}'
    back = (
        spark.createDataFrame([(js,)], "s STRING")
        .select(scalar.json_decode("s", "a INT, b STRING").alias("o"))
        .first()["o"]
    )
    assert back["a"] == 1 and back["b"] == "x"


def test_json_decode_invalid_is_null(spark):
    out = (
        spark.createDataFrame([("not json",)], "s STRING")
        .select(scalar.json_decode("s", "a INT").alias("o"))
        .first()["o"]
    )
    assert out is None or out["a"] is None
