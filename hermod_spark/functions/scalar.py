"""Scalar function library (reference: internal/lua/lua.go:86-176).

The reference exposes 8 Go-backed helpers to Lua transforms; here each
is a native Column expression (JVM-side, codegen-friendly) except HMAC,
which Spark SQL lacks — that one is an Arrow-batched pandas_udf.

Golden values pinned by the reference tests (internal/lua/lua_test.go:
323-401): rot13("Hello, World!") == "Uryyb, Jbeyq!",
base64_encode("Hello, World!") == "SGVsbG8sIFdvcmxkIQ==".
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = _UPPER.lower()
_ROT_UPPER = _UPPER[13:] + _UPPER[:13]
_ROT_LOWER = _LOWER[13:] + _LOWER[:13]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def rot13(col: Column | str) -> Column:
    """ASCII-only ROT13 (reference impl internal/lua/lua.go:242-252)."""
    return F.translate(_c(col), _UPPER + _LOWER, _ROT_UPPER + _ROT_LOWER)


def base64_encode(col: Column | str) -> Column:
    # Spark base64() may wrap long output with \r\n (MIME); strip to match
    # Go's raw StdEncoding.
    return F.regexp_replace(F.base64(F.encode(_c(col), "UTF-8")), "\r\n", "")


def _safe_utf8(binary: Column) -> Column:
    """BINARY -> STRING, null when the bytes are not valid UTF-8.

    F.decode(..., 'UTF-8') raises MALFORMED_CHARACTER_CODING on bad
    bytes, which would abort a 100 TB job on one poisoned row; the
    reference instead returns (nil, err) per row (lua.go:103-136), so
    per-row null is the faithful mapping."""
    return F.when(F.is_valid_utf8(binary), F.decode(binary, "UTF-8"))


def base64_decode(col: Column | str) -> Column:
    """Invalid input -> null (reference returns (nil, err); lua.go:103-114)."""
    return _safe_utf8(F.try_to_binary(_c(col), F.lit("base64")))


def hex_encode(col: Column | str) -> Column:
    """Lowercase hex — Go's hex.EncodeToString emits lowercase
    (lua.go:117-122); Spark hex() is uppercase, so wrap with lower()."""
    return F.lower(F.hex(F.encode(_c(col), "UTF-8")))


def hex_decode(col: Column | str) -> Column:
    """Invalid hex or non-UTF-8 payload -> null (lua.go:125-136)."""
    return _safe_utf8(F.try_to_binary(_c(col), F.lit("hex")))


@F.pandas_udf(StringType())
def _hmac_sha256(key: pd.Series, msg: pd.Series) -> pd.Series:
    def one(k, m):
        if k is None or m is None:
            return None
        return _hmac.new(str(k).encode(), str(m).encode(), hashlib.sha256).hexdigest()

    return pd.Series([one(k, m) for k, m in zip(key, msg)])


def hmac_sha256(key: Column | str, msg: Column | str) -> Column:
    """HMAC-SHA256, lowercase hex (lua.go:139-147). No Spark SQL builtin
    (sha2() is a plain hash, not HMAC) -> Arrow-batched pandas_udf."""
    return _hmac_sha256(_c(key), _c(msg))


def json_encode(col: Column | str) -> Column:
    """to_json (lua.go:150-161)."""
    return F.to_json(_c(col))


def json_decode(col: Column | str, schema) -> Column:
    """from_json with explicit schema; invalid JSON -> null, matching the
    reference's (nil, err) convention (lua.go:164-175)."""
    return F.from_json(_c(col), schema)
