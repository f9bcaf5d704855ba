"""Null-on-failure coercion expressions.

The reference coerces dirty API payloads with a `_safe_*` family that
returns NULL on any parse failure and unwraps `{"value": ...}` /
`{"id": ...}` dicts (reference: src/transformers/normalize_pipedrive.py:63-112,
normalize_zendesk.py:61-103). In Spark these are native `try_cast`-style
column expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "safe_long",
    "safe_double",
    "safe_decimal",
    "safe_bool",
    "safe_timestamp",
    "safe_date",
    "safe_text",
    "unwrap_value",
]

_TRUTHY = ("true", "t", "1", "yes", "y")
_FALSY = ("false", "f", "0", "no", "n")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def safe_long(col: Column | str) -> Column:
    return _c(col).try_cast("long")


def safe_double(col: Column | str) -> Column:
    return _c(col).try_cast("double")


def safe_decimal(col: Column | str, precision: int = 15, scale: int = 2) -> Column:
    return _c(col).try_cast(f"decimal({precision},{scale})")


def safe_bool(col: Column | str) -> Column:
    """Truthy-string parsing per normalize_pipedrive.py:84-91."""
    c = _c(col)
    s = F.lower(F.trim(c.cast("string")))
    return (
        F.when(s.isin(*_TRUTHY), F.lit(True))
        .when(s.isin(*_FALSY), F.lit(False))
        .otherwise(c.try_cast("boolean"))
    )


def safe_timestamp(col: Column | str) -> Column:
    return _c(col).try_cast("timestamp")


def safe_date(col: Column | str) -> Column:
    return _c(col).try_cast("date")


def safe_text(col: Column | str) -> Column:
    return _c(col).cast("string")


def unwrap_value(struct_col: Column | str, *fields: str) -> Column:
    """Extract the first present field of a struct payload.

    Mirrors `_safe_text` dict-unwrap: prefer `.value`, then `.id`, then
    `.name` (normalize_pipedrive.py:92-112). Pass explicit field names to
    override the default preference order.
    """
    c = _c(struct_col)
    names = fields or ("value", "id", "name")
    return F.coalesce(*[c.getField(f) for f in names])
