"""Storage maintenance (compaction) and multimodal→ANN composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_skyfit_spark.llm import multimodal, similarity
from data_lake_skyfit_spark.operators.merge import ParquetTable
from data_lake_skyfit_spark.tables import load_table


def test_compact_reduces_file_count(spark, tmp_path):
    t = ParquetTable(str(tmp_path / "t"), ["id"])
    base = spark.range(2000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    # many incremental merges → many small files
    t.overwrite(base.repartition(16))
    for i in range(3):
        t.merge(
            spark.range(i * 10, i * 10 + 10)
            .select(F.col("id"), F.lit(-1).alias("v"))
            .repartition(8)
        )
    before = t.stats(spark)
    t.compact(spark, target_file_mb=128)
    after = t.stats(spark)
    assert after["n_rows"] == before["n_rows"] == 2000
    assert after["n_files"] < before["n_files"]
    assert after["n_files"] <= 2
    # content preserved:
    assert t.read(spark).filter("v = -1").count() == 30


def test_media_embeddings_feed_ann(spark):
    """Composition: binary payload → extract_embeddings → top-k cosine
    over the extracted features — the multimodal-to-similarity pipeline."""
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = multimodal.attach_binary_payload(d, "text")
    feats = multimodal.extract_embeddings(media, dims=8)
    corpus = feats.select(F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding"))
    queries = corpus.filter(F.col("vec_id") < 3)
    topk = similarity.brute_force_topk(queries, corpus, k=3)
    rows = topk.collect()
    assert len(rows) == 9  # 3 queries × top-3
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in rows)
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
