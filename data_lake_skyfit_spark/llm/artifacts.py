"""Persisted trained-artifact registry — the model-store leg of the
LLM pipeline tier.

The index structures already persist (`dedup.MinHashIndex`,
`similarity.IVFIndex` — both ParquetTable-backed); this module gives
the remaining DRIVER-TRAINED artifacts (dual encoder, BPE merge table,
unigram-LM vocabulary, quantized classifier weights) the same
durability contract, so a production pipeline trains once and serves
from storage across runs instead of holding models in session memory:

- storage is one keyed ParquetTable (name → kind + JSON payload), so
  saves are idempotent MERGEs (replaying a training job converges, the
  `MinHashIndex.add` discipline) and the table inherits the
  crash-atomic swap-commit of the merge layer;
- payloads are canonical JSON (sorted keys, no whitespace): Python's
  float repr is shortest-round-trip, so every trained double survives
  save→load BIT-EXACTLY (pinned in tests — a reloaded encoder emits
  identical embeddings), and `allow_nan=False` refuses non-finite
  weights loudly rather than persisting a poisoned model;
- artifacts are kilobytes-to-megabytes (bounded driver structures by
  construction — max_pairs / max_words caps), so a single-row JSON
  payload is the right storage shape: the registry read is one tiny
  parquet scan, never a data-sized job.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import ParquetTable
from .encoder import DualEncoder
from .unigram import UnigramModel

__all__ = ["ModelRegistry"]


class ModelRegistry:
    """Named store of trained artifacts on one keyed parquet table."""

    def __init__(self, root: str):
        self.table = ParquetTable(f"{root}/artifacts", ["name"])

    # ------------------------------------------------------------ core
    def save(self, spark: SparkSession, name: str, kind: str, payload) -> None:
        js = json.dumps(
            payload, sort_keys=True, separators=(",", ":"), allow_nan=False
        )
        df = spark.createDataFrame(
            [(name, kind, js, len(js))],
            "name string, kind string, payload string, n_bytes long",
        )
        self.table.merge(df)

    def load(self, spark: SparkSession, name: str) -> tuple[str, object]:
        if not self.table.exists():
            raise KeyError(f"no artifact named {name!r} in {self.table.path}")
        rows = (
            self.table.read(spark).filter(F.col("name") == name).collect()
        )
        if not rows:
            raise KeyError(f"no artifact named {name!r} in {self.table.path}")
        return rows[0]["kind"], json.loads(rows[0]["payload"])

    def list(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark).select("name", "kind", "n_bytes")

    # ------------------------------------------------- typed wrappers
    def save_dual_encoder(
        self, spark: SparkSession, name: str, model: DualEncoder
    ) -> None:
        self.save(
            spark,
            name,
            "dual_encoder",
            {
                "w_img": [[float(v) for v in row] for row in model.w_img],
                "w_txt": [[float(v) for v in row] for row in model.w_txt],
                "grid": model.grid,
                "buckets": model.buckets,
                "dim": model.dim,
                "temperature": model.temperature,
            },
        )

    def load_dual_encoder(self, spark: SparkSession, name: str) -> DualEncoder:
        kind, p = self.load(spark, name)
        if kind != "dual_encoder":
            raise TypeError(f"{name!r} is a {kind}, not a dual_encoder")
        return DualEncoder(
            w_img=np.array(p["w_img"], dtype=np.float64),
            w_txt=np.array(p["w_txt"], dtype=np.float64),
            grid=int(p["grid"]),
            buckets=int(p["buckets"]),
            dim=int(p["dim"]),
            temperature=float(p["temperature"]),
        )

    def save_bpe_merges(
        self, spark: SparkSession, name: str, merges: list[tuple[str, str]]
    ) -> None:
        self.save(spark, name, "bpe_merges", [[a, b] for a, b in merges])

    def load_bpe_merges(
        self, spark: SparkSession, name: str
    ) -> list[tuple[str, str]]:
        kind, p = self.load(spark, name)
        if kind != "bpe_merges":
            raise TypeError(f"{name!r} is a {kind}, not bpe_merges")
        return [(a, b) for a, b in p]

    def save_unigram(
        self, spark: SparkSession, name: str, model: UnigramModel
    ) -> None:
        self.save(
            spark, name, "unigram_lm", [[w, float(lp)] for w, lp in model.to_items()]
        )

    def load_unigram(self, spark: SparkSession, name: str) -> UnigramModel:
        kind, p = self.load(spark, name)
        if kind != "unigram_lm":
            raise TypeError(f"{name!r} is a {kind}, not unigram_lm")
        return UnigramModel.from_items([(w, lp) for w, lp in p])

    def save_quantized_weights(
        self, spark: SparkSession, name: str, weights: dict[int, int]
    ) -> None:
        # JSON object keys are strings; store as pairs to keep int keys
        self.save(
            spark,
            name,
            "quantized_weights",
            sorted([[int(b), int(w)] for b, w in weights.items()]),
        )

    def load_quantized_weights(
        self, spark: SparkSession, name: str
    ) -> dict[int, int]:
        kind, p = self.load(spark, name)
        if kind != "quantized_weights":
            raise TypeError(f"{name!r} is a {kind}, not quantized_weights")
        return {int(b): int(w) for b, w in p}
