"""Eval-set decontamination: flag training documents sharing long
n-grams with an evaluation corpus — the GPT-3/Pile-style overlap check
every serious LLM training pipeline runs before a data release (the
reference has no analog; first-class §7.5 extension alongside dedup).

Scale design (100 TB train corpus, benchmark-sized eval sets):
- The eval side is SMALL by nature (benchmarks are thousands of docs,
  not billions). Its exploded shingle index is broadcast, so the train
  corpus joins map-side: the 100 TB side never shuffles for candidate
  generation, and only (train_id, eval_id, shingle-hit) rows — a
  vanishing fraction — reach the aggregation exchange.
- Shingles are DISTINCT n-gram sets (llm.text.shingles_expr), so the
  per-pair hit count IS |shared shingles| with no multiplicity
  correction.
- Hot boilerplate shingles inflate hits but the fan-out is bounded by
  the eval corpus size (each train shingle matches at most |eval docs|
  rows); if an eval set itself is boilerplate-heavy, drop its top-F
  document-frequency shingles before broadcasting (lossy is acceptable
  here: decontamination cares about LONG rare n-grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles_expr, spread_small_input

__all__ = ["contamination_report"]


def contamination_report(
    train: DataFrame,
    evalset: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Per-train-document contamination stats against an eval corpus.

    Output: (train_id, n_eval_hits, max_shared, contaminated) — one row
    per train document (zero-hit docs included):
      n_eval_hits  = number of eval documents sharing ≥1 n-gram
      max_shared   = largest shared-shingle count with any single eval doc
      contaminated = max_shared >= min_shared
    """
    # Spread the big (train) side's shingling off a one-split scan; the
    # eval side is small and broadcast, so it stays as-is.
    t = spread_small_input(train, id_col).select(
        F.col(id_col).alias("train_id"), shingles_expr(text_col, n).alias("sh")
    )
    e = evalset.select(
        F.col(id_col).alias("eval_id"), shingles_expr(text_col, n).alias("sh")
    )
    tex = t.filter(F.size("sh") > 0).select("train_id", F.explode("sh").alias("g"))
    eex = e.filter(F.size("sh") > 0).select("eval_id", F.explode("sh").alias("g"))

    hits = (
        tex.join(F.broadcast(eex), "g")  # map-side: train never shuffles here
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    per_train = hits.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        F.max("shared").alias("max_shared"),
    )
    return (
        t.select("train_id")
        .join(per_train, "train_id", "left")
        .select(
            "train_id",
            F.coalesce("n_eval_hits", F.lit(0)).alias("n_eval_hits"),
            F.coalesce("max_shared", F.lit(0)).alias("max_shared"),
            (F.coalesce("max_shared", F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )
