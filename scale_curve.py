#!/usr/bin/env python
"""Scale-curve harness (VERDICT r3 next #3): measure how the heavy
LLM-pipeline operators scale with corpus size, past the fixed per-query
job overhead that dominates sf0.1 battery timings.

Method: inflate documents/embeddings ×1/×8/×64 with
operators.scale.inflate_documents / inflate_embeddings (copy i
Caesar-rotates text / offsets vectors, so the inflation multiplies
CORPUS SIZE at constant near-dup density rather than multiplying the
pair output), MATERIALIZE each inflated corpus to parquet first (the
op timing excludes inflation and scans real files), then wall-time:

- dedup_minhash_lsh      minhash_lsh_pairs(...).count()
- dedup_cluster_resolution  connected_components(pairs).count()
- curation_pipeline      curate_corpus(train, eval).count()
- ann_knn_join           knn_join(...).count()  (num_blocks sized so a
                         block pair fits a task — the documented knob)
- ann_pq_adc             pq_encode + pq_adc_topk for 10 queries (r4b:
                         the compressed-domain scan — should stay
                         near-linear where exact knn is quadratic)
- text_bm25_topk         bm25_topk for 20 fixed queries over the
                         inflated corpus (r4c: postings build is the
                         linear term; the candidate join is sparse)
- fuzzy_match_parts      fuzzy_match_join, fixed probe set vs inflated
                         candidates (r4c: blocking keeps the verify
                         join ∝ same-block pairs, not |P|·|C|)
- clip_text_encode       text_hash_features + encode_features over the
                         inflated corpus with a fixed dual-encoder
                         (r4d: the serving path is a zero-shuffle Arrow
                         map — the curve should be flat-linear)
- image_neardup_hamming  PNG encode + real decode + dHash + banded
                         Hamming join (r4e: md5-cell patterns so the
                         fixture can't fabricate near-pairs; output
                         must stay exactly the planted pairs ∝ factor)
- text_heavy_hitters     two-pass MG + recount at fixed k over
                         verbatim-copy inflation (r4e: same 30 heavy
                         tokens at every factor, work ∝ n)

Usage: python scale_curve.py [--factors 1,8,64] [--ops lsh,cc,cur,knn]
Writes one JSON line per (op, factor) and a final markdown table for
SCALING.md. Run it alone (it owns the 32 cores, like bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WORK = os.environ.get("SKYFIT_SCALE_DIR", "/tmp/skyfit_scale_curve")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,8,64")
    ap.add_argument(
        "--ops",
        default="lsh,cc,cur,knn,pq,bm25,fuzzy,clip,hamming,hh,pagerank,tri,contain,span,hevc",
    )
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    ops = args.ops.split(",")

    from pyspark.sql import SparkSession

    from data_lake_skyfit_spark.llm.curation import curate_corpus
    from data_lake_skyfit_spark.llm.dedup import (
        connected_components, minhash_lsh_pairs,
    )
    from data_lake_skyfit_spark.llm.retrieval import bm25_topk
    from data_lake_skyfit_spark.llm.similarity import knn_join
    from data_lake_skyfit_spark.llm import pq as pq_mod
    from data_lake_skyfit_spark.operators.fuzzy import (
        edge_block_key, fuzzy_match_join,
    )
    from data_lake_skyfit_spark.operators.scale import (
        inflate_documents, inflate_embeddings,
    )
    from data_lake_skyfit_spark.tables import load_table

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    embs = load_table(spark, SF_DIR, "embeddings")

    # Always rebuild: the driver REGENERATES /root/testdata between
    # rounds (CLAUDE.md), so a cached inflated corpus from a previous
    # round would silently measure stale data (code-review r4). The
    # rebuild is seconds; within ONE run the per-factor path is reused.
    built: set[str] = set()

    def materialize(df, name: str, factor: int) -> str:
        path = os.path.join(WORK, f"{name}_x{factor}.parquet")
        if path not in built:
            df.write.mode("overwrite").parquet(path)
            built.add(path)
        return path

    # num_blocks sized so one block pair (2·n/nb vectors) stays a sane
    # task: ~2k vectors/block at every factor — the production knob the
    # operator documents (per-task memory is two blocks).
    def knn_blocks(n: int) -> int:
        return max(2, -(-n // 2000))

    results = []
    rows = {}
    # Untimed warmup at the smallest factor: whole-stage-codegen compile
    # and scan/JVM warmup otherwise land entirely on the ×1 point and
    # flatten the curve's low end.
    wf = factors[0]
    wd = spark.read.parquet(materialize(inflate_documents(docs, wf), "documents", wf))
    we = spark.read.parquet(materialize(inflate_embeddings(embs, wf), "embeddings", wf))
    if "lsh" in ops or "cc" in ops:
        minhash_lsh_pairs(wd, threshold=0.8).count()
    if "cur" in ops:
        curate_corpus(
            wd, eval_df=wd.filter("doc_id % 101 = 7").selectExpr(
                "doc_id + 900000000000000 AS doc_id", "text"
            )
        ).count()
    if "knn" in ops:
        knn_join(we, k=3, num_blocks=knn_blocks(we.count())).count()
    if "pq" in ops:
        _cb = pq_mod.deterministic_codebook()
        pq_mod.pq_adc_topk(
            we.filter("vec_id < 10"), pq_mod.pq_encode(we, _cb), _cb, k=5
        ).count()

    # Fixed probe/query sides built from the BASE corpus so only the
    # searched side grows with the factor (the production shape: a
    # bounded query workload against an ever-larger corpus). Plain
    # deterministic filters, NOT limit() (row choice would be
    # plan-dependent) and NOT localCheckpoint (timed() unpersists every
    # persistent RDD between ops, which would kill the blocks).
    bm25_q = docs.filter("doc_id % 61 = 7 AND doc_id < 1220").selectExpr(
        "doc_id AS query_id", r"slice(split(text, '\\s+'), 1, 4) AS terms"
    )
    # Probe = candidate with its SECOND char substituted: edit distance
    # ≤ 1 but both edge chars intact, so the probe stays in its
    # candidate's (first,last)-char block. The first cut of this
    # fixture shifted the whole string by one char — every probe left
    # its block and the curve timed an all-empty join (the r4 lesson:
    # assert output CARDINALITY in scale harnesses, enforced in timed()).
    fuzzy_p = docs.filter("doc_id % 37 = 3 AND doc_id < 18500").selectExpr(
        "doc_id AS probe_id",
        "concat(substr(text, 1, 1), 'x', substr(text, 3, 10)) AS probe_name",
    )
    # Fixed (seeded, untrained) dual encoder: the curve measures the
    # SERVING path — training is a bounded driver computation whose
    # cost is corpus-size independent by construction (max_pairs cap).
    if "clip" in ops:
        import numpy as np

        from data_lake_skyfit_spark.llm import encoder as enc_mod

        _rng = np.random.default_rng(42)
        clip_model = enc_mod.DualEncoder(
            w_img=_rng.standard_normal((64, 32)),
            w_txt=_rng.standard_normal((256, 32)),
            grid=8, buckets=256, dim=32, temperature=20.0,
        )

        def clip_count(frame):
            feats = enc_mod.text_hash_features(frame, buckets=256)
            return enc_mod.encode_features(
                feats, clip_model, modality="text"
            ).count()

    if "bm25" in ops:
        bm25_topk(wd, bm25_q, k=5, idf="log").count()
    if "hamming" in ops:
        from data_lake_skyfit_spark.llm.dedup import hamming_neardup_pairs as _hnp
        from data_lake_skyfit_spark.llm.multimodal import (
            image_dhash as _idh,
            synthesize_neardup_png_payloads as _snp,
        )

        _hnp(
            _idh(_snp(wd.select("doc_id"), random_pattern=True)), max_dist=3
        ).count()
    if "hh" in ops:
        from pyspark.sql import functions as _F

        from data_lake_skyfit_spark.llm.text import tokens_expr as _te
        from data_lake_skyfit_spark.operators.scale import heavy_hitters as _hh

        _hh(
            wd.select(_F.explode(_te(_F.lower(_F.col("text")))).alias("token")),
            "token",
            k=64,
        ).count()
    # r5 tier: the four newest shuffle-heavy operators. Structural
    # inputs are HASH-BASED (xxhash64 targets / hash-varying snippet
    # lengths), never closed forms — a mod-M lattice collapses every
    # M-th row into identical structure over large id ranges and the
    # curve measures fabricated quadratic output (injectivity lesson
    # #3); planted structure (triangles, snippet-in-parent containment)
    # keeps output cardinality ∝ factor so the harness's zero-row /
    # cardinality asserts stay meaningful.
    from pyspark.sql import functions as _Fg

    from data_lake_skyfit_spark.llm.dedup import (
        containment_pairs as _containment_pairs,
        duplicate_span_removal as _span_removal,
    )
    from data_lake_skyfit_spark.llm.text import tokens_expr as _tokens
    from data_lake_skyfit_spark.operators.graph import (
        pagerank as _pagerank,
        triangle_counts as _triangles,
    )
    from data_lake_skyfit_spark.operators.scale import _ID_STRIDE

    n_base = docs.count()

    def rand_edges(d, factor: int, deg: int):
        """deg out-edges per node, hash-routed to real inflated ids:
        dst = (xxhash copy) · stride + (xxhash base)."""
        e = d.select(
            _Fg.col("doc_id").alias("src"),
            _Fg.explode(_Fg.sequence(_Fg.lit(0), _Fg.lit(deg - 1))).alias("j"),
        )
        dst = _Fg.pmod(_Fg.xxhash64("src", _Fg.col("j")), _Fg.lit(factor)) * _Fg.lit(
            _ID_STRIDE
        ) + _Fg.pmod(_Fg.xxhash64(_Fg.col("j"), "src"), _Fg.lit(n_base))
        return e.select("src", dst.alias("dst")).filter(_Fg.col("src") != _Fg.col("dst"))

    def tri_pairs(d, factor: int):
        """Undirected pair list: hash bulk edges + one PLANTED triangle
        per (copy, base ≡ 0 mod 3) so triangle output grows ∝ factor
        (a hash-only sparse graph's expected triangle count is O(1))."""
        bulk = rand_edges(d, factor, 4).select(
            _Fg.least("src", "dst").alias("a"), _Fg.greatest("src", "dst").alias("b")
        )
        v = d.select("doc_id").filter(
            ((_Fg.col("doc_id") % _ID_STRIDE) % 3 == 0)
            & ((_Fg.col("doc_id") % _ID_STRIDE) + 2 < n_base)
        )
        planted = (
            v.select(_Fg.col("doc_id").alias("a"), (_Fg.col("doc_id") + 1).alias("b"))
            .unionAll(v.select((_Fg.col("doc_id") + 1).alias("a"), (_Fg.col("doc_id") + 2).alias("b")))
            .unionAll(v.select(_Fg.col("doc_id").alias("a"), (_Fg.col("doc_id") + 2).alias("b")))
        )
        return bulk.unionAll(planted)

    def with_snippets(d):
        """Corpus + one snippet doc per base doc (the first 6..11
        tokens, hash-varied length): every snippet is ≥ 4/5 contained
        in its parent, so containment output ∝ factor."""
        snip = d.select(
            (_Fg.col("doc_id") + _Fg.lit(1 << 50)).alias("doc_id"),
            _Fg.array_join(
                _Fg.slice(
                    _tokens("text"),
                    _Fg.lit(1),
                    (_Fg.pmod(_Fg.xxhash64("doc_id"), _Fg.lit(6)) + 6).cast("int"),
                ),
                " ",
            ).alias("text"),
        )
        return d.select("doc_id", "text").unionByName(snip)

    if "pagerank" in ops:
        _pagerank(rand_edges(wd, wf, 6), iterations=3).count()
    if "tri" in ops:
        _triangles(tri_pairs(wd, wf)).count()
    if "contain" in ops:
        _containment_pairs(with_snippets(wd), threshold_num=4, threshold_den=5).count()
    if "containcap" in ops:
        _containment_pairs(
            with_snippets(wd), threshold_num=4, threshold_den=5,
            max_candidates_per_doc=4,
        ).count()
    if "span" in ops:
        _span_removal(wd, k=6).count()
    if "clip" in ops:
        clip_count(wd)
    if "fuzzy" in ops:
        fuzzy_match_join(
            fuzzy_p,
            wd.selectExpr("doc_id AS cand_id", "substr(text, 1, 12) AS cand_name"),
            block_key=edge_block_key(),
        ).count()

    for factor in factors:
        # Size shuffle partitions with the data (the CLAUDE.md scale
        # discipline: partitions must fit executor memory at the target
        # size). A fixed 32 at ×64 puts ~1 GiB of candidate rows per
        # sort task in the containment verify join and the curve
        # measures SPILL, not the operator; runtime conf so one session
        # serves every factor, exactly what AQE-less static planning
        # needs on a real cluster.
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(max(int(CPUS), 32 * ((factor + 7) // 8)))
        )
        dpath = materialize(inflate_documents(docs, factor), "documents", factor)
        epath = materialize(inflate_embeddings(embs, factor), "embeddings", factor)
        d = spark.read.parquet(dpath)
        e = spark.read.parquet(epath)
        n_docs, n_vecs = d.count(), e.count()
        rows[factor] = (n_docs, n_vecs)

        def timed(op: str, thunk) -> None:
            # Free localCheckpoint blocks from the PREVIOUS operator
            # (bench.py's rule — clearCache() does not touch persisted
            # RDDs): accumulated blocks otherwise surface as a GC spike
            # inside a later timed run and distort the curve.
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            t0 = time.time()
            out_n = thunk()
            dt = round(time.time() - t0, 2)
            if not out_n:
                raise SystemExit(
                    f"{op} x{factor} produced 0 rows - the fixture is "
                    "broken and the timing meaningless (r4 lesson: "
                    "scale harnesses assert output cardinality)"
                )
            rec = {
                "op": op, "factor": factor, "rows_in": n_docs,
                "vecs_in": n_vecs, "out_rows": out_n, "sec": dt,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

        if "lsh" in ops:
            timed("dedup_minhash_lsh", lambda: minhash_lsh_pairs(d, threshold=0.8).count())
        if "cc" in ops:
            timed(
                "dedup_cluster_resolution",
                lambda: connected_components(
                    minhash_lsh_pairs(d, threshold=0.8)
                ).count(),
            )
        if "cur" in ops:
            ev = d.filter("doc_id % 101 = 7").selectExpr(
                "doc_id + 900000000000000 AS doc_id", "text"
            )
            timed("curation_pipeline", lambda: curate_corpus(d, eval_df=ev).count())
        if "knn" in ops:
            timed(
                "ann_knn_join",
                lambda: knn_join(e, k=3, num_blocks=knn_blocks(n_vecs)).count(),
            )
        if "ivf" in ops:
            # r6: the clustered ANN probe — the path that RUNS at the
            # factors where the exact tier is the (quadratic) verifier
            from data_lake_skyfit_spark.llm.similarity import ivf_topk

            timed(
                "ann_ivf_topk",
                lambda: ivf_topk(
                    e.filter("vec_id < 10"), e, k=5, n_lists=64, n_probe=6
                ).count(),
            )
        if "hnsw" in ops:
            from data_lake_skyfit_spark.llm.hnsw import hnsw_topk

            timed(
                "ann_hnsw_topk",
                lambda: hnsw_topk(
                    e.filter("vec_id < 10"), e, k=5,
                    n_shards=max(8, int(CPUS)), ef_search=64,
                ).count(),
            )
        if "dress" in ops:
            # r6 dress rehearsal (VERDICT r5 #6): one end-to-end
            # curated-corpus run over the inflated corpus — web leg
            # (WARC walk → HTML extraction → quality gate), text leg
            # (full curate_corpus incl. decontamination), image leg
            # (PNG encode → real decode → dHash → banded Hamming join)
            # — timed as one composite plus per-leg rows.
            from pyspark.sql import functions as F

            from data_lake_skyfit_spark.llm import text as text_ops
            from data_lake_skyfit_spark.llm.dedup import hamming_neardup_pairs
            from data_lake_skyfit_spark.llm.multimodal import (
                image_dhash,
                synthesize_neardup_png_payloads,
            )
            from data_lake_skyfit_spark.sources import warc as warc_mod

            def web_leg():
                pages = d.select(
                    "doc_id",
                    F.concat(
                        F.lit("<html><head><title>t</title></head><body><p>"),
                        F.col("text"),
                        F.lit("</p></body></html>"),
                    ).alias("text"),
                )
                recs = warc_mod.read_warc_records(
                    warc_mod.synthesize_warc_payloads(pages), include_body=True
                )
                x = text_ops.html_to_text(F.col("body"))
                return (
                    recs.filter(F.col("warc_type") == "response")
                    .select((text_ops.token_count(x) >= 5).alias("ok"))
                    .filter("ok")
                    .count()
                )

            def text_leg():
                ev = d.filter("doc_id % 101 = 7").selectExpr(
                    "doc_id + 900000000000000 AS doc_id", "text"
                )
                return curate_corpus(d, eval_df=ev).count()

            def image_leg():
                return hamming_neardup_pairs(
                    image_dhash(
                        synthesize_neardup_png_payloads(
                            d.select("doc_id"), random_pattern=True
                        )
                    ),
                    max_dist=3,
                ).count()

            def video_leg():
                # r7 (VERDICT r6 #7): the AVC video leg — every doc
                # carries a REAL MP4 whose samples decode through the
                # full H.264 path (CAVLC flat/PCM, deblocked strips,
                # CABAC legs, r7b 4-frame P-GOPs with motion
                # compensation, r7c 7-frame IBP GOPs with bi-predicted
                # B slices over the POC-ordered DPB — ids folded into
                # the fixture space, so all entropy + prediction tiers
                # run ∝ factor). Pure per-row Arrow decode, no
                # shuffle; output rows = Σ frames per doc,
                # deterministic and ∝ factor (timed() asserts > 0).
                from data_lake_skyfit_spark.llm.multimodal import (
                    decode_video_pixels,
                    synthesize_avc_mp4_payloads,
                )

                return decode_video_pixels(
                    synthesize_avc_mp4_payloads(
                        d.selectExpr("doc_id % 500 AS doc_id")
                    ),
                    every_ms=400,
                ).count()

            def video_keyframe_leg():
                # r7c: the stss keyframe-only sampler over a GOP-only
                # corpus (ids folded into 420-499 — every doc carries
                # P/B reference chains, the real-world shape): only
                # self-contained IDR samples decode, every P/B chain
                # is skipped at the sample-table walk.  The production
                # 100-TB knob — savings scale with the non-IDR share.
                from data_lake_skyfit_spark.llm.multimodal import (
                    decode_video_pixels,
                    synthesize_avc_mp4_payloads,
                )

                return decode_video_pixels(
                    synthesize_avc_mp4_payloads(
                        d.selectExpr("420 + doc_id % 80 AS doc_id")
                    ),
                    every_ms=400,
                    keyframes_only=True,
                ).count()

            def video_gop_full_leg():
                # the same GOP-only corpus fully decoded — the
                # denominator for the keyframe-sampling saving
                from data_lake_skyfit_spark.llm.multimodal import (
                    decode_video_pixels,
                    synthesize_avc_mp4_payloads,
                )

                return decode_video_pixels(
                    synthesize_avc_mp4_payloads(
                        d.selectExpr("420 + doc_id % 80 AS doc_id")
                    ),
                    every_ms=400,
                ).count()

            timed("dress_web_leg", web_leg)
            timed("dress_text_leg", text_leg)
            timed("dress_image_leg", image_leg)
            timed("dress_video_leg", video_leg)
            timed("dress_video_gop_full_leg", video_gop_full_leg)
            timed("dress_video_keyframe_leg", video_keyframe_leg)
        if "pq" in ops:
            cb = pq_mod.deterministic_codebook()
            # inflate_embeddings keeps vec_id unique across copies; the
            # 10 base queries scan the whole inflated codes table.
            timed(
                "ann_pq_adc_topk",
                lambda: pq_mod.pq_adc_topk(
                    e.filter("vec_id < 10"), pq_mod.pq_encode(e, cb), cb, k=5
                ).count(),
            )
        if "bm25" in ops:
            timed(
                "text_bm25_topk",
                lambda: bm25_topk(d, bm25_q, k=5, idf="log").count(),
            )
        if "clip" in ops:
            timed("clip_text_encode", lambda: clip_count(d))
        if "fuzzy" in ops:
            timed(
                "fuzzy_match_parts",
                lambda: fuzzy_match_join(
                    fuzzy_p,
                    d.selectExpr(
                        "doc_id AS cand_id", "substr(text, 1, 12) AS cand_name"
                    ),
                    block_key=edge_block_key(),
                ).count(),
            )
        if "pagerank" in ops:
            timed(
                "graph_pagerank_centrality",
                lambda: _pagerank(rand_edges(d, factor, 6), iterations=3).count(),
            )
        if "tri" in ops:
            timed(
                "graph_triangle_counts",
                lambda: _triangles(tri_pairs(d, factor)).count(),
            )
        if "contain" in ops:
            timed(
                "dedup_containment_pairs",
                lambda: _containment_pairs(
                    with_snippets(d), threshold_num=4, threshold_den=5
                ).count(),
            )
        if "containcap" in ops:
            # r7 (VERDICT r6 #2): the capped mode that must COMPLETE at
            # ×512 where the lossless form exceeded the sandbox disk on
            # this deliberately vocabulary-degenerate fixture. cap=4
            # bounds the verify join to ≤ 4 candidates per probe doc;
            # on THIS worst-case fixture ties are everywhere, so capped
            # output undercounts planted pairs by design (the recall
            # trade is pinned losslessly-green on the zipfian fixture
            # in test_containment_candidate_cap_recall_and_audit) —
            # the harness asserts nonzero output and measures the wall.
            timed(
                "dedup_containment_capped",
                lambda: _containment_pairs(
                    with_snippets(d),
                    threshold_num=4,
                    threshold_den=5,
                    max_candidates_per_doc=4,
                ).count(),
            )
        if "span" in ops:
            timed(
                "dedup_span_removal",
                lambda: _span_removal(d, k=6).count(),
            )
        if "hevc" in ops:
            # r7d: the HEVC/HEIC tier at scale — per-doc hvc1 MP4s
            # (ids folded into the battery fixture space, so each doc
            # pays a full fixture ENCODE + container mux + CABAC
            # DECODE) and per-doc .heic stills (single items + Apple
            # grids).  Pure per-row Arrow work, zero shuffle; output
            # rows deterministic ∝ factor.
            from data_lake_skyfit_spark.llm.multimodal import (
                decode_images,
                decode_video_pixels,
                synthesize_heic_payloads,
                synthesize_hevc_mp4_payloads,
            )

            timed(
                "hevc_mp4_decode",
                lambda: decode_video_pixels(
                    synthesize_hevc_mp4_payloads(
                        # spread explicitly: the materialized corpus may
                        # sit in few parquet splits and the per-row
                        # CABAC work is the whole cost (battery rule)
                        d.selectExpr("doc_id % 200 AS doc_id")
                        .repartition(int(CPUS))
                    ),
                    every_ms=400,
                ).count(),
            )
            timed(
                "heic_decode",
                lambda: decode_images(
                    synthesize_heic_payloads(
                        d.selectExpr("doc_id % 160 AS doc_id")
                        .repartition(int(CPUS))
                    )
                ).count(),
            )
        if "shards" in ops:
            # r7: pure-Python compressed-shard decode at scale — one
            # ~30 KB payload per doc (docs' text tripled so the
            # matchers have real work), decoded in Arrow kernels; zero
            # shuffle, output rows = Σ lines ∝ factor. r7b: the codec
            # cycle grew to all seven wires (zstd seq/store, LZ4,
            # gzip, bzip2, xz, brotli — brotli via the codec-hint
            # column, the headerless-wire contract).
            from pyspark.sql import functions as _Fs

            from data_lake_skyfit_spark.sources.zstd_shards import (
                read_compressed_jsonl_lines,
            )
            from data_lake_skyfit_spark.sources.zstd_codec import (
                zstd_compress as _zc, zstd_compress_store as _zs,
            )
            from data_lake_skyfit_spark.sources.lz4_codec import lz4_compress as _l4
            from data_lake_skyfit_spark.sources.brotli_codec import (
                brotli_compress as _brc,
            )
            import bz2 as _bz2
            import gzip as _gz
            import lzma as _lzma

            def shard_count():
                import pandas as _pd
                from pyspark.sql import types as _T

                schema = _T.StructType([
                    _T.StructField("doc_id", _T.LongType()),
                    _T.StructField("payload", _T.BinaryType()),
                    _T.StructField("codec", _T.StringType()),
                ])
                encs = (
                    _zc, _zs, _l4, lambda b: _gz.compress(b, mtime=0),
                    _bz2.compress,
                    lambda b: _lzma.compress(b, format=_lzma.FORMAT_XZ),
                    _brc,
                )

                def kern(batches):
                    for pdf in batches:
                        payloads, codecs = [], []
                        for rid, txt in zip(pdf["doc_id"], pdf["text"]):
                            k = int(rid) % 7
                            payloads.append(encs[k](
                                (str(txt) * 12).encode("utf-8", "ignore")
                            ))
                            codecs.append("br" if k == 6 else "auto")
                        yield _pd.DataFrame(
                            {"doc_id": pdf["doc_id"], "payload": payloads,
                             "codec": codecs}
                        )

                payloads = d.select("doc_id", "text").mapInPandas(kern, schema)
                return read_compressed_jsonl_lines(
                    payloads, codec_col="codec").count()

            timed("format_shard_compressed", shard_count)
        if "hamming" in ops:
            # r4e: perceptual image dedup end-to-end — PNG encode +
            # real decode + dHash are the linear legs, the banded
            # equi-join is the only shuffle. random_pattern md5 cells:
            # the battery's closed-form pattern keeps lattice structure
            # over multi-100k-id ranges that inflates accidental
            # near-pairs (the first ×64 run measured 207M pairs from a
            # mod-251 periodicity — corpus-inflation injectivity lesson
            # #3); with md5 cells the output is the planted pairs plus
            # birthday-rare accidents, cardinality ∝ factor.
            from data_lake_skyfit_spark.llm.dedup import hamming_neardup_pairs
            from data_lake_skyfit_spark.llm.multimodal import (
                image_dhash,
                synthesize_neardup_png_payloads,
            )

            timed(
                "image_neardup_hamming",
                lambda: hamming_neardup_pairs(
                    image_dhash(
                        synthesize_neardup_png_payloads(
                            d.select("doc_id"), random_pattern=True
                        )
                    ),
                    max_dist=3,
                ).count(),
            )
        if "hh" in ops:
            # r4e: exact heavy hitters at FIXED k over verbatim-copy
            # inflation (explode over a sequence — heavy hitters ignore
            # ids, and rotation would disjoint the alphabets so nothing
            # stays above n/k). Relative frequencies are
            # factor-invariant: output is the same ~30 tokens at every
            # factor while n grows — the pure operator curve.
            from pyspark.sql import functions as F

            from data_lake_skyfit_spark.llm.text import tokens_expr
            from data_lake_skyfit_spark.operators.scale import heavy_hitters

            base_docs = spark.read.parquet(
                materialize(inflate_documents(docs, 1), "documents", 1)
            )
            toks = base_docs.select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(factor - 1))
                ).alias("__copy"),
                F.col("text"),
            ).select(
                F.explode(tokens_expr(F.lower(F.col("text")))).alias("token")
            )
            timed(
                "text_heavy_hitters",
                lambda: heavy_hitters(toks, "token", k=64).count(),
            )
        spark.catalog.clearCache()

    print("\n| op | " + " | ".join(f"×{f} ({rows[f][0]} docs / {rows[f][1]} vecs)" for f in factors) + " |")
    print("|---|" + "---|" * len(factors))
    for op in dict.fromkeys(r["op"] for r in results):
        cells = []
        base = None
        for f in factors:
            rec = next((r for r in results if r["op"] == op and r["factor"] == f), None)
            if rec is None:
                cells.append("—")
                continue
            if base is None:
                base = rec["sec"]
                cells.append(f"{rec['sec']} s")
            else:
                cells.append(f"{rec['sec']} s ({rec['sec'] / base:.1f}×)")
        print(f"| {op} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    if "--clean" in sys.argv:
        shutil.rmtree(WORK, ignore_errors=True)
        sys.argv.remove("--clean")
    main()
