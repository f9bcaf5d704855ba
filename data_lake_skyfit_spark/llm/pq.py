"""Product quantization (IVF-PQ style) for embedding columns.

The memory-compression leg of the ANN tier (SURVEY.md §7.5 similarity
search; reference analog: raw vector handling is out of the reference's
scope — this is a north-star extension like `similarity.IVFIndex`).
PQ is how billion-scale ANN actually ships (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split each
D-dim vector into `n_sub` subvectors, vector-quantize each against a
per-subspace codebook of `n_centroids` entries, and keep only the code
ids — at (8 sub × 16 centroids) a 64-dim float64 vector shrinks from
512 bytes to 8 nibbles, a 128× compression, and query scoring becomes
table lookups (ADC: asymmetric distance computation) instead of
full-width dot products.

Scale shape (100 TB): encoding is a zero-shuffle codegen map (the
codebook is a plan literal — kilobytes); the codes table is the only
thing that persists or shuffles afterwards. ADC probing broadcasts the
query-side lookup tables (n_queries × n_sub × n_centroids doubles) and
scans codes with an O(n_sub) sum per pair — no full-width vector math
ever touches the corpus side again.

Exactness discipline (the graded entry's contract): every distance is
built as an explicit left-associated (+, -, ×) chain over doubles —
correctly-rounded IEEE ops that Catalyst never reassociates (its
ReorderAssociativeOperator is integral-only) — so DuckDB replaying the
generated oracle SQL computes bit-identical doubles, and argmin /
ranking decisions (ties broken on centroid id / neighbor id) agree
across engines with no epsilon anywhere. The graded battery entry uses
`deterministic_codebook` (a pure integer-arithmetic codebook both
sides can state literally); production trains the codebook with
`pq_train` and the recall-vs-exact trade-off is pinned in
tests/test_similarity_quality.py.
"""

from __future__ import annotations

from functools import reduce
from operator import add as _add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _as_double
from .text import spread_small_input

__all__ = [
    "deterministic_codebook",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
    "pq_search_rerank",
    "ivfpq_build",
    "ivfpq_topk",
    "pack_codes_expr",
    "unpack_codes_expr",
]


def deterministic_codebook(
    n_sub: int = 8, n_centroids: int = 16, sub_dim: int = 8
) -> list[list[list[float]]]:
    """Fixed codebook from pure integer arithmetic: value(s, c, j) =
    ((7s + 11c + 13j + 5cj + 3sj) mod 17 − 8) / 16 ∈ [−0.5, 0.5] —
    every entry an exact multiple of 1/16 (lossless through any decimal
    round-trip), distinct per-centroid slopes within a subspace (5·Δc
    mod 17 ≠ 0 for Δc < 17), and the same closed form is restated
    literally in the graded oracle SQL, so the Spark plan and the
    oracle can never drift."""
    return [
        [
            [
                ((7 * s + 11 * c + 13 * j + 5 * c * j + 3 * s * j) % 17 - 8)
                / 16.0
                for j in range(sub_dim)
            ]
            for c in range(n_centroids)
        ]
        for s in range(n_sub)
    ]


def pq_train(
    corpus: DataFrame,
    *,
    n_sub: int = 8,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 3,
    dims: int | None = None,
) -> list[list[list[float]]]:
    """Train a PQ codebook: independent deterministic SQUARED-L2
    k-means per subspace (PQ quantizes Euclidean cells — the IVF tier's
    spherical/cosine Lloyd is the wrong objective for ADC), with ALL
    subspaces trained in the SAME Spark jobs: seeding collects the
    n_centroids lowest-xxhash64 rows once and slices them per subspace
    (each subspace's Lloyd depends only on its own columns, so fusing
    changes nothing semantically), and each Lloyd step is ONE corpus
    pass — the n_sub JVM argmin codes per row (pq_encode's expression)
    plus a posexplode keyed by (subspace, code, dim) whose mean table
    (n_sub·n_centroids·m rows — kilobytes) is the only collect. The
    first build looped subspaces serially: 9 trainings × 3 jobs ≈ 27
    job launches of pure fixed overhead dominated ivfpq_build at 33 s;
    fused it is 1 + kmeans_iters jobs total. An emptied cluster keeps
    its previous centroid so the codebook shape is stable."""
    e = _as_double(vec_col)
    if dims is None:
        dims_row = corpus.select(F.size(e).alias("d")).first()
        if dims_row is None:
            raise ValueError("pq_train: empty corpus")
        dims = dims_row["d"]
    if dims % n_sub:
        raise ValueError(f"pq_train: dims {dims} not divisible by n_sub {n_sub}")
    m = dims // n_sub
    staged = corpus.select(
        F.col(id_col).alias("id"), e.alias("e")
    ).localCheckpoint(eager=False)
    seed_rows = (
        staged.withColumn("__h", F.xxhash64("id"))
        .orderBy("__h")
        .limit(n_centroids)
        .select("e")
        .collect()
    )
    full = [list(map(float, r["e"])) for r in seed_rows]
    if not full:
        raise ValueError("pq_train: empty corpus")
    while len(full) < n_centroids:
        full.append(list(full[len(full) % len(full)]))
    book: list[list[list[float]]] = [
        [row[s * m : (s + 1) * m] for row in full] for s in range(n_sub)
    ]
    for _ in range(kmeans_iters):
        # codes live in their OWN frame joined back by id: putting the
        # argmin expression in the same select as the posexplode lets
        # CollapseProject inline it into the Generate, where it
        # re-evaluates per EXPLODED row — dims× the intended work (the
        # 4.2 s Lloyd step at 500 rows was 64× re-evaluated argmins,
        # not data). The id join shuffles (id, codes) rows — tiny.
        codes_df = staged.select(
            "id",
            F.array(
                *[_argmin_code(F.col("e"), s, book[s], m) for s in range(n_sub)]
            ).alias("codes"),
        )
        vals = staged.select("id", F.posexplode("e").alias("pos", "val"))
        rows = (
            vals.join(codes_df, "id")
            .select(
                F.floor(F.col("pos") / m).cast("int").alias("s"),
                F.element_at(
                    F.col("codes"),
                    (F.floor(F.col("pos") / m) + 1).cast("int"),
                ).alias("code"),
                (F.col("pos") % m).cast("int").alias("j"),
                "val",
            )
            .groupBy("s", "code", "j")
            .agg(F.avg("val").alias("mn"))
            .collect()
        )
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            means.setdefault((r["s"], r["code"]), {})[r["j"]] = r["mn"]
        book = [
            [
                [means[(s, c)][j] for j in range(m)]
                if (s, c) in means
                else book[s][c]
                for c in range(n_centroids)
            ]
            for s in range(n_sub)
        ]
    return book


def _cb_lit(cents: list[list[float]]) -> Column:
    """One subspace's codebook as a literal array<array<double>>.

    One F.lit per CENTROID over a float64 ndarray — pyspark's ndarray
    fast path is a single py4j round trip shipping the doubles bit-
    exact, while lit(list) recurses into per-ELEMENT lit()+array()
    calls. The old all-scalar shape cost ~2.7 s of pure Python-side
    query BUILD time per pq query in py4j socket round trips (measured
    r9 cProfile: 13.9k send_command calls; JVM plan was 0.06 s and
    exec 1.3 s). Values are identical doubles."""
    import numpy as np

    return F.array(*[F.lit(np.asarray(cent, dtype=np.float64)) for cent in cents])


def _sub_dist_pre(sub: Column, cent: Column) -> Column:
    """Squared L2 distance of a PRE-SLICED subvector to one centroid (a
    Column of array<double>), as an ordered fold: acc starts at +0.0
    and adds each (a−b)² left-to-right — bit-identical to the oracle's
    explicit `t0 + t1 + …` chain (+0.0 + t0 == t0 for every IEEE t0,
    squares are never −0.0), with a TINY expression tree. The first
    build unrolled all 128 distance chains into whole-stage codegen and
    Janino compile time (not data!) dominated: 10.6 s cold / 0.26 s
    warm at sf0.1, an 8 MiB task binary. Interpreted higher-order
    folds trade ~µs/element for a kilobyte plan — the right side of
    the trade at every scale, since compile cost was per-stage and the
    per-element work is 3 flops."""
    return F.aggregate(
        F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _sub_dist(e: Column, s: int, cent: Column, m: int) -> Column:
    """_sub_dist_pre over subvector s sliced out of `e` inline. NB for
    callers fanning out over many centroids: the slice (and anything
    inside `e`, e.g. the _as_double cast-transform) re-evaluates per
    call — interpreted HOFs have no CSE. Corpus-sized paths must stage
    the cast+sliced subvectors as materialized columns and call
    _sub_dist_pre (pq_encode does; r9 optimization)."""
    return _sub_dist_pre(F.slice(e, s * m + 1, m), cent)


def _argmin_code(e: Column, s: int, cents: list[list[float]], m: int) -> Column:
    """Nearest-centroid id for subvector s: array_min over (distance,
    id) structs — lexicographic struct ordering breaks exact-distance
    ties on the lowest centroid id, in the JVM. The candidate structs
    come from one transform over the literal codebook array."""
    # named_struct, not struct(...).alias: aliases on expressions built
    # inside a lambda don't survive lambda binding in every context
    # (pq_train's bare-select hit FIELD_NOT_FOUND where pq_encode's
    # projection resolved fine), and the struct ORDER (d first) is what
    # makes array_min's lexicographic compare mean min-distance.
    cands = F.transform(
        _cb_lit(cents),
        lambda cent, i: F.named_struct(
            F.lit("d"), _sub_dist(e, s, cent, m), F.lit("c"), i.cast("int")
        ),
    )
    return F.array_min(cands)["c"]


def _argmin_code_pre(sub: Column, cents: list[list[float]]) -> Column:
    """_argmin_code over a pre-sliced (and pre-cast) subvector column —
    the corpus-encode path: one transform over the literal codebook,
    each centroid's distance from _sub_dist_pre, so nothing inside the
    subvector expression re-evaluates per centroid."""
    cands = F.transform(
        _cb_lit(cents),
        lambda cent, i: F.named_struct(
            F.lit("d"), _sub_dist_pre(sub, cent), F.lit("c"), i.cast("int")
        ),
    )
    return F.array_min(cands)["c"]


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes array<int>), one int per
    subspace. Zero-shuffle codegen map; argmin per subspace is
    `array_min` over (distance, centroid-id) structs, so ties break on
    the lowest centroid id deterministically in the JVM (numpy never
    decides anything here)."""
    e = _as_double(vec_col)
    m = len(codebook[0][0])
    # Stage the cast+sliced subvectors as materialized columns first:
    # interpreted HOFs re-evaluate their argument subtrees per call, so
    # feeding `e` (a cast-transform over the full vector) straight into
    # n_sub × n_cent _sub_dist calls re-ran the cast 128× and the slice
    # 16× per row (the CLAUDE.md let-bind rule). The staged columns are
    # non-cheap and multiply-referenced, so CollapseProject keeps the
    # barrier. Measured r9: ann_pq_adc_topk 3.6 s → (see
    # OPTIMIZATION_r09.md) with identical codes.
    subs = [F.slice(e, s * m + 1, m).alias(f"__sub{s}") for s in range(len(codebook))]
    # Encode is a pure map over the corpus: spread a one-split scan so
    # the 128 centroid-distance folds per row run on every core (no-op
    # at real scale).
    staged = spread_small_input(df, id_col).select(
        F.col(id_col).alias("id"), *[F.col(k) for k in keep_cols], *subs
    )
    codes = [
        _argmin_code_pre(F.col(f"__sub{s}"), cents)
        for s, cents in enumerate(codebook)
    ]
    return staged.select(
        "id",
        *[F.col(k) for k in keep_cols],
        F.array(*codes).alias("codes"),
    )


def pack_codes_expr(codes: Column, *, bits: int = 4) -> Column:
    """Pack a codes array into one BIGINT (storage form: 8×4-bit codes
    = one 32-bit word per vector). Fold is ordered (F.aggregate), so
    packing is deterministic; `unpack_codes_expr` inverts it."""
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: F.shiftleft(acc, bits) + c.cast("long"),
    )


def unpack_codes_expr(packed: Column, *, n_sub: int = 8, bits: int = 4) -> Column:
    mask = (1 << bits) - 1
    return F.array(
        *[
            F.shiftright(packed, (n_sub - 1 - s) * bits).bitwiseAND(F.lit(mask)).cast("int")
            for s in range(n_sub)
        ]
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: list[list[list[float]]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, rank corpus codes by
    Σ_s lut[s][code_s] where lut is the query's exact squared-L2 table
    to every centroid (computed ONCE per query row, broadcast with the
    query side), then row_number ties on neighbor_id.

    Output (query_id, neighbor_id, rank, adc) — adc is the raw PQ
    approximation of squared L2 distance, rounded to 4 places for
    display; the ROUND is safe to hash-compare because both engines
    compute bit-identical doubles (see module docstring).

    Scale: the join is broadcast(q-with-LUT) × codes — a map-side
    pass over the codes table; per pair cost is n_sub array lookups
    and a fixed-length add chain. No full-width vectors on the corpus
    side."""
    n_sub = len(codebook)
    n_cent = len(codebook[0])
    m = len(codebook[0][0])
    e = _as_double(vec_col)
    # Stage the cast+sliced query subvectors first (the pq_encode
    # staging applied to the QUERY side, r10): feeding `e` straight
    # into the per-centroid distance lambdas re-evaluated the
    # cast-transform once per centroid and the slice once per subspace
    # (interpreted HOFs have no CSE). LUT values are identical — same
    # fold, same order.
    q_staged = queries.select(
        F.col(id_col).alias("id"),
        *[F.slice(e, s * m + 1, m).alias(f"__qsub{s}") for s in range(n_sub)],
    )
    # NB: the per-subspace lambda must be built by a factory — a
    # `lambda cent, s=s:` default-arg closure has TWO parameters, which
    # PySpark's arity sniffing reads as an (element, index) lambda and
    # silently binds s to the centroid index (NULL lut entries from
    # out-of-range slices).
    def _lut_for(s: int):
        return F.transform(
            _cb_lit(codebook[s]),
            lambda cent: _sub_dist_pre(F.col(f"__qsub{s}"), cent),
        )

    lut = F.flatten(F.array(*[_lut_for(s) for s in range(n_sub)]))
    q = q_staged.select("id", lut.alias("lut"))
    adc = reduce(
        _add,
        [
            F.element_at(
                F.col("q.lut"),
                F.lit(s * n_cent + 1) + F.element_at(F.col("c.codes"), s + 1),
            )
            for s in range(n_sub)
        ],
    )
    scored = (
        F.broadcast(q.alias("q"))
        .join(codes.alias("c"), F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            adc.alias("adc_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_raw").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("adc_raw", 4).alias("adc"),
        )
    )


def pq_search_rerank(
    queries: DataFrame,
    codes: DataFrame,
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    *,
    k: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production search shape (FAISS-style two stage): PQ-ADC
    proposes a `shortlist`-deep candidate set per query from CODES ONLY
    (no full-width vectors on the scan side), then the shortlist — and
    nothing else — is joined back to the raw vectors for an exact
    squared-L2 rerank. Full-vector work is O(queries × shortlist), not
    O(queries × corpus); on the battery corpus the trained codebook's
    shortlist at depth 100 recovers ~87% of the true top-5 (pinned in
    tests/test_similarity_quality.py).

    Output (query_id, neighbor_id, rank, d2) — d2 the exact squared L2
    distance of the reranked pair."""
    cand = pq_adc_topk(
        queries, codes, codebook, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    vq = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qe")
    )
    vc = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("ce")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = (
        cand.join(F.broadcast(vq), "query_id")
        .join(vc, "neighbor_id")
        .select("query_id", "neighbor_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("d2", 4).alias("d2"),
        )
    )


def _lut_expr(e: Column, codebook: list[list[list[float]]]) -> Column:
    """Flattened per-row ADC lookup table: squared-L2 of each subvector
    of `e` to every centroid, n_sub × n_centroids entries in subspace-
    major order (see pq_adc_topk for the factory-not-default-arg
    rationale)."""
    m = len(codebook[0][0])

    def lut_for(s: int):
        return F.transform(
            _cb_lit(codebook[s]), lambda cent: _sub_dist(e, s, cent, m)
        )

    return F.flatten(F.array(*[lut_for(s) for s in range(len(codebook))]))


def ivfpq_build(
    corpus: DataFrame,
    *,
    n_lists: int = 16,
    n_sub: int = 8,
    n_centroids: int = 16,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the full FAISS-style IVF-PQ structure: an L2 coarse
    quantizer (n_lists full-width centroids — pq_train with one
    subspace), per-vector RESIDUALS against the assigned centroid
    (residual PQ is what makes small codebooks sharp: residual norms
    are a fraction of vector norms, so the same 4-bit codes quantize a
    much smaller cell), and a residual PQ codebook + codes table.

    Returns (coarse, book, codes) where codes is (id, cid, codes) —
    the only corpus-sized artifact, 8×4-bit codes + one list id per
    vector. Scale: two Lloyd trainings (centroid-only collects), one
    assignment map, one encode map; nothing wider than the raw scan."""
    e = _as_double(vec_col)
    dims_row = corpus.select(F.size(e).alias("d")).first()
    if dims_row is None:
        raise ValueError("ivfpq_build: empty corpus")
    dims = dims_row["d"]
    coarse = pq_train(
        corpus,
        n_sub=1,
        n_centroids=n_lists,
        id_col=id_col,
        vec_col=vec_col,
        kmeans_iters=kmeans_iters,
        dims=dims,
    )[0]
    coarse_lit = _cb_lit(coarse)
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        e.alias("e"),
        _argmin_code(e, 0, coarse, dims).alias("cid"),
    )
    resid = assigned.select(
        "id",
        "cid",
        F.zip_with(
            F.col("e"),
            F.element_at(coarse_lit, (F.col("cid") + 1).cast("int")),
            lambda a, b: a - b,
        ).alias("r"),
    ).localCheckpoint(eager=False)
    book = pq_train(
        resid,
        n_sub=n_sub,
        n_centroids=n_centroids,
        id_col="id",
        vec_col="r",
        kmeans_iters=kmeans_iters,
        dims=dims,
    )
    codes = pq_encode(resid, book, id_col="id", vec_col="r", keep_cols=("cid",))
    return coarse, book, codes


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 16,
    n_sub: int = 8,
    n_centroids: int = 16,
    shortlist: int = 1_000_000,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search, the composed production shape: probe the n_probe
    nearest coarse lists per query, ADC-score ONLY the probed lists'
    codes with a per-(query, list) residual lookup table, shortlist,
    then exact-rerank the shortlist against raw vectors. Per-query work
    is ∝ corpus·n_probe/n_lists code rows + shortlist full-width
    vectors — never the whole corpus in full width.

    Battery contract (same as ivf_topk): at n_probe = n_lists and a
    corpus-deep shortlist the candidate set is total, so the output
    must EQUAL exact squared-L2 top-k and the brute-force SQL is the
    oracle — recall itself is the checked property (rerank distances
    are ordered zip_with folds, bit-identical to DuckDB's
    list_inner_product of the difference list; validated over every
    sf0.01 pair). Sub-exhaustive recall is pinned in
    tests/test_similarity_quality.py.

    Output (query_id, neighbor_id, rank, d2)."""
    coarse, book, codes = ivfpq_build(
        corpus,
        n_lists=n_lists,
        n_sub=n_sub,
        n_centroids=n_centroids,
        kmeans_iters=kmeans_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    e = _as_double(vec_col)
    dims = len(coarse[0])
    coarse_lit = _cb_lit(coarse)
    cand_lists = F.slice(
        F.array_sort(
            F.transform(
                coarse_lit,
                lambda cent, i: F.named_struct(
                    F.lit("d"),
                    _sub_dist(e, 0, cent, dims),
                    F.lit("c"),
                    i.cast("int"),
                ),
            )
        ),
        1,
        min(n_probe, n_lists),
    )
    probed = queries.select(
        F.col(id_col).alias("id"), e.alias("e"), F.explode(cand_lists).alias("p")
    ).select("id", "e", F.col("p.c").alias("cid"))
    with_rq = probed.withColumn(
        "rq",
        F.zip_with(
            F.col("e"),
            F.element_at(coarse_lit, (F.col("cid") + 1).cast("int")),
            lambda a, b: a - b,
        ),
    )
    q_lut = with_rq.select(
        "id", "e", "cid", _lut_expr(F.col("rq"), book).alias("lut")
    )
    n_cent = len(book[0])
    adc = reduce(
        _add,
        [
            F.element_at(
                F.col("q.lut"),
                F.lit(s * n_cent + 1) + F.element_at(F.col("c.codes"), s + 1),
            )
            for s in range(len(book))
        ],
    )
    # cand rows are (ids, adc) ONLY — carrying the full-width query
    # vector per candidate would push corpus·n_probe/n_lists × dims
    # doubles through the shortlist window exchange, exactly the
    # full-width traffic ADC exists to avoid; qe re-joins (broadcast)
    # onto the shortlist-sized survivors instead.
    cand = (
        F.broadcast(q_lut.alias("q"))
        .join(
            codes.alias("c"),
            (F.col("q.cid") == F.col("c.cid")) & (F.col("q.id") != F.col("c.id")),
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            adc.alias("adc_raw"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_raw").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), e.alias("qe"))
    short = (
        cand.withColumn("srk", F.row_number().over(w_short))
        .filter(F.col("srk") <= shortlist)
        .select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
    )
    vc = corpus.select(
        F.col(id_col).alias("neighbor_id"), e.alias("ce")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = short.join(vc, "neighbor_id").select(
        "query_id", "neighbor_id", d2.alias("d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("d2", 4).alias("d2"),
        )
    )
