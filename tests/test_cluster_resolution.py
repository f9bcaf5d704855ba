"""Connected-components cluster resolution on known graph shapes."""

from __future__ import annotations

from data_lake_skyfit_spark.llm.dedup import connected_components


def test_chain_star_and_pair(spark):
    # chain 1-2-3-4 (diameter 3), star 10-(11,12,13), pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "a_id long, b_id long",
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_reversed_edge_direction_irrelevant(spark):
    pairs = spark.createDataFrame([(5, 2), (2, 9)], "a_id long, b_id long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2}
