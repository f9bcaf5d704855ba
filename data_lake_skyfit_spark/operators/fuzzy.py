"""Blocked fuzzy-match join (entity resolution by edit distance).

Approximate string matching between a probe set (dirty names) and a
candidate set (canonical names) — the record-linkage / entity-
resolution operator every ingestion pipeline eventually needs and the
reference resolves manually with SQL equality chains (its normalize
scripts join on exact keys only; fuzzy linkage is beyond-reference,
SURVEY.md §7.5 spirit).

Scale design — NEVER a cross join:

- Candidate generation is a standard *blocking* equi-join: both sides
  key on a cheap deterministic block key (lowercased name prefix), so
  the shuffle is by block and the quadratic work is bounded by the
  largest block, not |probes|×|candidates|. A length-band residual
  predicate (`abs(len_p - len_c) <= len_band`, a necessary condition
  for edit distance <= len_band) prunes inside each block before any
  distance is computed.
- `F.levenshtein` is JVM codegen (whole-stage) — no Python in the
  pair loop.
- Best-match selection is one map-side-combining `min(struct(dist,
  cand_id))` per probe — total order (distance, then candidate id)
  makes the winner deterministic; no window over the full pair set.
- Skew: a pathological block (every name sharing a prefix) degrades to
  that block's quadratic — mitigate by lengthening `block_prefix` or
  swapping in a q-gram blocking key; the operator takes the block-key
  expression as a parameter for exactly that reason.

Both Spark and DuckDB implement unit-cost Levenshtein identically
(integer result), so the operator is exactly oracle-able.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_match_join", "prefix_block_key", "edge_block_key"]


def prefix_block_key(n: int = 1) -> Callable[[Column], Column]:
    """Blocking key: lowercased first `n` characters."""

    def key(col: Column) -> Column:
        return F.lower(F.substring(col, 1, n))

    return key


def edge_block_key() -> Callable[[Column], Column]:
    """Composite blocking key: lowercased (first char, last char).

    Squares the block cardinality of the single-prefix key at the cost
    of missing edits that touch either edge — the standard
    multi-attribute blocking trade (run a second pass with a different
    key to recover edge edits)."""

    def key(col: Column) -> Column:
        return F.concat(
            F.lower(F.substring(col, 1, 1)),
            F.lower(col.substr(F.length(col), F.lit(1))),
        )

    return key


def fuzzy_match_join(
    probes: DataFrame,
    candidates: DataFrame,
    *,
    probe_id: str = "probe_id",
    probe_col: str = "probe_name",
    cand_id: str = "cand_id",
    cand_col: str = "cand_name",
    max_dist: int = 2,
    len_band: int = 2,
    block_key: Callable[[Column], Column] | None = None,
    keep_unmatched: bool = False,
) -> DataFrame:
    """Best fuzzy match per probe: ``(probe_id, cand_id, dist)``.

    A probe matches the candidate minimizing ``levenshtein(probe,
    cand)`` among same-block candidates within ``max_dist`` (ties →
    lowest ``cand_id``). With ``keep_unmatched``, probes with no
    in-threshold candidate emit ``(probe_id, NULL, NULL)``.
    """
    key = block_key or prefix_block_key(1)
    p = probes.select(
        F.col(probe_id).alias("probe_id"),
        F.col(probe_col).alias("__pn"),
        key(F.col(probe_col)).alias("__blk"),
    )
    c = candidates.select(
        F.col(cand_id).alias("cand_id"),
        F.col(cand_col).alias("__cn"),
        key(F.col(cand_col)).alias("__blk"),
    )
    # Bounded Levenshtein: with a threshold, Spark runs the banded DP
    # (O(max_dist·len) instead of O(len²) per pair) and returns the
    # EXACT distance when it is <= max_dist, else -1 — so `>= 0` keeps
    # exactly the pairs `levenshtein(p, c) <= max_dist` kept, with
    # identical dist values for every survivor (verified empirically:
    # exact-within-threshold, -1 beyond). The big side's per-pair work
    # drops ~len/max_dist-fold; survivors and values are unchanged.
    dist = F.levenshtein(F.col("__pn"), F.col("__cn"), max_dist)
    pairs = (
        p.join(c, "__blk")
        .filter(
            F.abs(F.length("__pn") - F.length("__cn")) <= F.lit(len_band)
        )
        .select("probe_id", "cand_id", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
    )
    best = (
        pairs.groupBy("probe_id")
        .agg(F.min(F.struct("dist", "cand_id")).alias("__best"))
        .select(
            "probe_id",
            F.col("__best.cand_id").alias("cand_id"),
            F.col("__best.dist").cast("int").alias("dist"),
        )
    )
    if not keep_unmatched:
        return best
    return (
        probes.select(F.col(probe_id).alias("probe_id"))
        .join(best, "probe_id", "left")
        .select("probe_id", "cand_id", F.col("dist").cast("int").alias("dist"))
    )
