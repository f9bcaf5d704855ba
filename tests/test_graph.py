"""Integer-exact PageRank (operators/graph.py): hand-computed
recurrence values, the nodes-are-sources contract, and mass sanity.
Greenfield relative to the reference (SURVEY §7.5 scope) — the
centrality-as-quality-prior signal of web-corpus curation pipelines.
"""

from __future__ import annotations

import pytest

from data_lake_skyfit_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _undirected(pairs):
    return pairs + [(b, a) for a, b in pairs]


def test_pagerank_hand_computed_path_graph(spark):
    """Path a-b-c (undirected): deg a=1 b=2 c=1, scale 1e6, d=85/100.

    iter1: inc(a)=1e6//2=500000, inc(b)=1e6+1e6, inc(c)=500000
           r1 = 150000 + 85*inc//100 -> a,c=575000  b=1850000
    iter2: inc(a)=1850000//2=925000, inc(b)=575000*2, inc(c)=925000
           r2 -> a,c=936250  b=1127500
    """
    e = _edges(spark, _undirected([(1, 2), (2, 3)]))
    r1 = {r["node_id"]: r["rank_scaled"] for r in pagerank(e, iterations=1).collect()}
    assert r1 == {1: 575000, 2: 1850000, 3: 575000}
    r2 = {r["node_id"]: r["rank_scaled"] for r in pagerank(e, iterations=2).collect()}
    assert r2 == {1: 936250, 2: 1127500, 3: 936250}


def test_pagerank_hub_outranks_leaves(spark):
    """A star graph's hub must dominate after any number of rounds."""
    e = _edges(spark, _undirected([(0, i) for i in range(1, 6)]))
    out = {r["node_id"]: r["rank_scaled"] for r in pagerank(e, iterations=3).collect()}
    hub = out.pop(0)
    assert all(hub > v for v in out.values())
    assert len(set(out.values())) == 1  # leaves are symmetric


def test_pagerank_node_set_is_distinct_sources(spark):
    """Directed a->b only: b never appears as src, so it is NOT a node
    (the documented contract); a keeps only its teleport mass."""
    out = {r["node_id"]: r["rank_scaled"] for r in pagerank(_edges(spark, [(1, 2)])).collect()}
    assert out == {1: 150000}


def test_pagerank_mass_conserved_up_to_floor_loss(spark):
    """On an undirected graph total rank stays within floor-division
    loss of n*scale: each round redistributes, never creates, mass."""
    pairs = _undirected([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    e = _edges(spark, pairs)
    out = [r["rank_scaled"] for r in pagerank(e, iterations=3).collect()]
    n = 4
    assert sum(out) <= n * 1_000_000
    assert sum(out) > n * 1_000_000 - n * 3 * 100  # ≤ ~1 ulp/div/round


def test_pagerank_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="iteration"):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping_num=100, damping_den=100)


# ------------------------------------------------------------ triangles


def _tri(spark, pairs):
    from data_lake_skyfit_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(pairs, "a long, b long")
    return {
        r["node_id"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_counts(df).collect()
    }


def test_triangles_k4(spark):
    """K4: every node degree 3, sits in C(3,2)=3 triangles, clustering 1."""
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = _tri(spark, pairs)
    assert out == {n: (3, 3, 1.0) for n in (1, 2, 3, 4)}


def test_triangles_path_and_degree_one(spark):
    """Path 1-2-3-4: no triangles anywhere; degree-1 endpoints get
    clustering 0.0 (no 0/0)."""
    out = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert out == {1: (1, 0, 0.0), 2: (2, 0, 0.0), 3: (2, 0, 0.0), 4: (1, 0, 0.0)}


def test_triangles_dedupe_selfloops_and_directions(spark):
    """Multi-edges, both directions, and self-loops must not inflate
    counts: triangle 1-2-3 counted once per node regardless."""
    pairs = [(1, 2), (2, 1), (2, 3), (2, 3), (1, 3), (3, 3), (1, 1)]
    out = _tri(spark, pairs)
    assert out == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_triangles_match_brute_force_on_seeded_graph(spark):
    """Erdős–Rényi-ish seeded graph vs an itertools brute force —
    per-node counts, not just the global total."""
    import itertools
    import random

    rng = random.Random(20260815)
    n = 24
    edges = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < 0.25
    ]
    adj = {i: set() for i in range(n)}
    for i, j in edges:
        adj[i].add(j)
        adj[j].add(i)
    expect = {}
    for v in range(n):
        if not adj[v]:
            continue
        t = sum(
            1 for x, y in itertools.combinations(sorted(adj[v]), 2) if y in adj[x]
        )
        d = len(adj[v])
        expect[v] = (d, t, (2.0 * t) / (d * (d - 1)) if d >= 2 else 0.0)
    assert _tri(spark, edges) == expect


def test_triangles_hub_graph_orientation_bound(spark):
    """Star + one rim edge: the hub (degree 100) must NOT be wedge
    source for its whole neighborhood — with degree orientation every
    wedge source is a low-rank node, and the count is exactly 1 triangle."""
    pairs = [(0, i) for i in range(1, 101)] + [(1, 2)]
    out = _tri(spark, pairs)
    assert out[0] == (100, 1, 2.0 * 1 / (100 * 99))
    assert out[1][1] == 1 and out[2][1] == 1
    assert out[50] == (1, 0, 0.0)


def test_pagerank_broadcast_vs_shuffle_paths_identical(spark):
    """The broadcast-rank fast path (node count ≤ broadcast_nodes) and
    the big-graph shuffle path must produce bit-identical ranks.
    (The per-round BroadcastHashJoin itself is not observable from the
    returned frame — the round-boundary localCheckpoint truncates the
    plan to an RDD scan — so the pin here is value parity between the
    two join strategies, which is what the hint must not change.)"""
    from data_lake_skyfit_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(23) for _ in range(2)]
        + [((i * 5) % 23, i) for i in range(23)],
        "src long, dst long",
    )
    fast = pagerank(edges, iterations=3)
    slow = pagerank(edges, iterations=3, broadcast_nodes=0)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
