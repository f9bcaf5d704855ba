"""Distributed graph centrality for corpus curation: integer-exact
PageRank over a DataFrame edge list.

Why it's here: graph centrality is a standard web-corpus QUALITY
signal — Common-Crawl-scale pipelines rank hosts by (harmonic /
page-rank-style) centrality over the link graph and use the score as a
curation prior, exactly like the classifier margins in llm/classifier.
The reference keeps no graph machinery (north-star extension, SURVEY
§7.5); the sibling iterative operator is connected_components in
llm/dedup.py and this follows the same discipline: a driver loop of a
FIXED small number of DataFrame rounds, localCheckpoint between rounds
so the lineage (and its re-execution) never grows with iterations.

Determinism contract: all arithmetic is BIGINT — ranks are scaled by
`scale` (default 10^6) and every step is integer (`div`, `*`, `+`), so
the result is bit-identical in any engine that runs the same recurrence
(the battery oracle unrolls the same iterations in plain SQL). The
float-free recurrence per iteration, with damping d as a rational
num/den (default 85/100):

    rank'(v) = ((den - num) * scale) // den
             + (num * Σ_{u→v} rank(u) // outdeg(u)) // den

Scale notes (100 TB): each iteration is one equi-join of the rank
frame to the edge list on src (both shuffled by the same key, so AQE
reuses the exchange across iterations) plus one groupBy(dst) sum with
map-side partial aggregation. Shuffle volume per round ∝ |E|; the
iteration count is a fixed constant, not data-dependent. No collect of
anything data-sized; skewed hub nodes are exactly the salting case
`operators.scale.salted_join` documents if an in-degree ever becomes
pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-exact PageRank: returns ``(node_id, rank_scaled)``.

    The node set is every DISTINCT ``src`` in the edge list; dangling
    mass is therefore only contributed BY nodes that have out-edges
    (callers ranking an undirected graph should pass both edge
    directions, which also guarantees no dangling nodes). Ranks start
    at ``scale`` and follow the integer recurrence in the module
    docstring — floor division keeps every intermediate a BIGINT, so
    the output hash-compares across engines.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    if not 0 < damping_num < damping_den:
        raise ValueError("damping must be a proper fraction num/den")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=False)
    # out-degree rides with the edge list so the per-iteration join is
    # a single equi-join (rank ⋈ edges+deg on src), not two.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    teleport = (damping_den - damping_num) * scale // damping_den

    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        inc = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("`rank` div `outdeg`").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.join(inc, nodes["node"] == inc["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_num} * coalesce(`inc`, 0L)) div {damping_den}"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            # break lineage each round: without this the plan (and its
            # re-execution on every downstream reference) doubles per
            # iteration — the connected_components rule.
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("node").alias("node_id"), F.col("rank").alias("rank_scaled"))
