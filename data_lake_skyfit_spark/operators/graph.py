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

__all__ = ["pagerank", "triangle_counts"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    broadcast_nodes: int = 2_000_000,
) -> DataFrame:
    """Integer-exact PageRank: returns ``(node_id, rank_scaled)``.

    The node set is every DISTINCT ``src`` in the edge list; dangling
    mass is therefore only contributed BY nodes that have out-edges
    (callers ranking an undirected graph should pass both edge
    directions, which also guarantees no dangling nodes). Ranks start
    at ``scale`` and follow the integer recurrence in the module
    docstring — floor division keeps every intermediate a BIGINT, so
    the output hash-compares across engines.

    Join strategy: the rank frame is one 16-byte row per node while the
    edge frame is one row per EDGE — when the node count is at most
    ``broadcast_nodes`` (≈32 MB at the default, the classic
    host-graph case: millions of hosts, billions of links) the rank
    side ships as a BROADCAST hash join and the edge frame is never
    re-shuffled, leaving one map-side-combinable groupBy(dst) as the
    only exchange per round. localCheckpoint (which the iteration
    needs to cut lineage) reports UnknownPartitioning, so without the
    hint every round would sort-merge-exchange the full edge list
    against a kilobyte-scale rank table. Above the threshold the
    shuffle join stands (rank tables that genuinely don't fit a task).
    The node count comes from one scalar .count() job — bounded, never
    data-sized rows on the driver.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    if not 0 < damping_num < damping_den:
        raise ValueError("damping must be a proper fraction num/den")
    # Three consumers read the edge frame (node set, out-degrees, the
    # degree-annotated edge list) — checkpoint it or its upstream
    # lineage (often a join+distinct) re-executes per consumer.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    # out-degree rides with the edge list so the per-iteration join is
    # a single equi-join (rank ⋈ edges+deg on src), not two. The node
    # set IS deg's key set (distinct src either way), so deriving it
    # from the checkpointed deg frame deletes a second full distinct
    # over the edge list (r10: one aggregation pass instead of two).
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint(
        eager=False
    )
    nodes = deg.select(F.col("src").alias("node"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    teleport = (damping_den - damping_num) * scale // damping_den
    small = deg.count() <= broadcast_nodes

    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        rank_side = F.broadcast(ranks) if small else ranks
        inc = (
            ed.join(rank_side, ed["src"] == rank_side["node"])
            .select("dst", F.expr("`rank` div `outdeg`").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        inc_side = F.broadcast(inc) if small else inc
        ranks = (
            nodes.join(inc_side, nodes["node"] == inc_side["dst"], "left")
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


def triangle_counts(
    pairs: DataFrame,
    *,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Exact per-node triangle counts via DEGREE ORIENTATION — the
    standard scalable algorithm (Cohen's MapReduce formulation /
    node-iterator++): orient every undirected edge from the endpoint
    with smaller (degree, id) to the larger, enumerate wedges between
    out-edges of a common source, and close them against the oriented
    edge list. Every triangle {x,y,z} is counted EXACTLY once — as the
    wedge at its lowest-ranked vertex.

    Why orientation matters at 100 TB: the wedge join's output is
    Σ_v outdeg(v)², and with degree orientation outdeg is bounded by
    O(√m) on ANY graph (arboricity bound) — so wedge volume is ≤ m^1.5
    even on graphs with billion-degree hubs, where the naive
    neighbor-join explodes to Σ deg² (a single celebrity node is a
    quadratic task). All three legs are equi-joins on node keys (plain
    shuffle joins, AQE-salvageable on residual skew); nothing is ever
    collected.

    Input: one row per (possibly duplicated, possibly both-direction)
    edge; self-loops dropped, multi-edges deduped. Output:
    ``(node_id, degree, triangles, clustering)`` for every node with
    degree ≥ 1, where clustering = 2·triangles / (degree·(degree−1))
    (0.0 for degree-1 nodes) — one IEEE divide of exact integers, so
    the column hash-compares across engines.
    """
    e = pairs.select(F.col(a).alias("x"), F.col(b).alias("y")).filter(
        F.col("x") != F.col("y")
    )
    und = (
        e.select(
            F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi")
        )
        .distinct()
        # three consumers (degree, orientation, closing join): break the
        # shared lineage once
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionAll(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    dl = deg.select(
        F.col("node").alias("lo"), F.col("degree").alias("dlo")
    )
    dh = deg.select(
        F.col("node").alias("hi"), F.col("degree").alias("dhi")
    )
    ranked = und.join(dl, "lo").join(dh, "hi")
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    # oriented edge (u → v) with v's rank carried for the wedge ordering
    oriented = ranked.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("dv"),
    ).localCheckpoint(eager=False)
    w1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1")
    )
    w2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2")
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    per_node = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    d = F.col("degree")
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias("node_id"),
            "degree",
            F.coalesce("triangles", F.lit(0).cast("long")).alias("triangles"),
            F.when(
                d >= 2,
                (F.lit(2.0) * F.coalesce("triangles", F.lit(0).cast("long")))
                / (d * (d - F.lit(1))),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
