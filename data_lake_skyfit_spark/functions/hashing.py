"""Deterministic surrogate-key and fingerprint expressions.

The reference's synthetic entry key is MD5 over 7 pipe-joined fields,
first 15 hex digits parsed as an integer, mod 10^15 (reference:
src/evo/loaders/load_evo_entries_stg_fast_v2.py:210-223; rationale
ADR-004 docs/evo/ARCHITECTURE_DECISIONS.md:91-115). Note the code's
7-field formula is canonical — the 4-field description in
docs/evo/EVO_DATA_MODEL.md:304-312 is stale.

All expressions here are JVM-native (md5/xxhash64/conv) — they run in
whole-stage codegen with zero Python involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["surrogate_key_expr", "entry_id_expr", "fingerprint64", "md5_prefix"]


def _s(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def md5_prefix(cols: Sequence[Column | str], *, sep: str = "|", length: int = 15) -> Column:
    """First `length` hex chars of md5(pipe-joined fields). NULLs are
    skipped by concat_ws, matching the Python `"|".join(str(x) if x is
    not None else "")` behavior only when empty strings are used — so we
    coalesce NULL to '' explicitly to match the reference byte-for-byte."""
    padded = [F.coalesce(_s(c), F.lit("")) for c in cols]
    return F.substring(F.md5(F.concat_ws(sep, *padded)), 1, length)


def surrogate_key_expr(cols: Sequence[Column | str], *, sep: str = "|") -> Column:
    """15-hex-digit MD5 prefix parsed as decimal, mod 10^15 (ADR-004)."""
    hex15 = md5_prefix(cols, sep=sep, length=15)
    return (F.conv(hex15, 16, 10).cast("long") % F.lit(10**15)).cast("long")


def _falsy_zero_as_empty(col: Column | str) -> Column:
    """Numeric id fields in the reference pass through
    `str(rec.get("idMember") or "")` — Python's `or` maps 0 (not just
    NULL) to ''. Mirror that for byte-for-byte entry_id parity: a record
    with idMember == 0 must hash identically to one with idMember NULL
    (ADVICE r1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == 0), F.lit("")).otherwise(c.cast("string"))


def entry_id_expr(
    date_col: Column | str = "date",
    member_col: Column | str = "idMember",
    prospect_col: Column | str = "idProspect",
    employee_col: Column | str = "idEmployee",
    branch_col: Column | str = "idBranch",
    device_col: Column | str = "device",
    action_col: Column | str = "entryAction",
) -> Column:
    """The canonical 7-field entry_id: date|idMember|idProspect|idEmployee|idBranch|device|entryAction.

    The four numeric id fields get the reference's falsy handling
    (0 → '' as well as NULL → ''); the string fields only coalesce NULL
    (a literal "0" device/action is truthy in Python and stays "0")."""
    return surrogate_key_expr(
        [
            date_col,
            _falsy_zero_as_empty(member_col),
            _falsy_zero_as_empty(prospect_col),
            _falsy_zero_as_empty(employee_col),
            _falsy_zero_as_empty(branch_col),
            device_col,
            action_col,
        ]
    )


def fingerprint64(col: Column | str) -> Column:
    """Cheap 64-bit content fingerprint (xxhash64) for exact-dup grouping
    at scale — 8 bytes/row of shuffle instead of the full document."""
    return F.xxhash64(_s(col))
