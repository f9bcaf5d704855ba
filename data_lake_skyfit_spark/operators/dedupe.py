"""Keyed deduplication operators.

The reference's canonical dedupe is "keep the newest version of each
business key" — `ROW_NUMBER() OVER (PARTITION BY key ORDER BY loaded_at
DESC) ... WHERE rn = 1` executed before every CORE normalization
(reference: src/transformers/normalize_pipedrive.py:122-133) — plus
Postgres `DISTINCT ON` keep-first (normalize_zendesk.py:769-787) and a
driver-side seen-set dedupe (normalize_zendesk.py:740-752).

Spark-first realization: a single window + filter. At scale this is one
hash-shuffle on the key columns; AQE handles skewed keys. When the
downstream operator groups/joins on the same keys, Catalyst reuses the
exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["latest_wins", "distinct_on", "drop_exact_duplicates"]


def _order_cols(order_by: Sequence[str | Column], descending: bool) -> list[Column]:
    cols: list[Column] = []
    for c in order_by:
        col = F.col(c) if isinstance(c, str) else c
        cols.append(col.desc() if descending else col.asc())
    return cols


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    *,
    descending: bool = True,
    tie_breakers: Sequence[str | Column] = (),
) -> DataFrame:
    """Keep one row per `keys`, the first by `order_by` (default: newest).

    Equivalent of the reference's rn=1 pattern (W1) and DISTINCT ON (W2).
    Pass `tie_breakers` to make the choice deterministic when `order_by`
    ties (the reference relies on Postgres's arbitrary-but-stable heap
    order; we make determinism explicit).
    """
    ordering = _order_cols(order_by, descending) + _order_cols(tie_breakers, descending)
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_on(df: DataFrame, keys: Sequence[str], order_by: Sequence[str | Column]) -> DataFrame:
    """Postgres `SELECT DISTINCT ON (keys) ... ORDER BY keys, o` analog."""
    return latest_wins(df, keys, order_by, descending=False)


def drop_exact_duplicates(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Seen-set dedupe (reference J6) — distributed, no driver state."""
    return df.dropDuplicates(list(keys) if keys else None)
