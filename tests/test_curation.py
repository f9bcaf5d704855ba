"""Corpus-curation operators (llm/curation.py): repetition metrics,
PII scan/redaction, vocabulary/OOV coverage — plus the pointer-jumping
convergence bound of connected_components on chain-shaped components.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.llm.curation import (
    normalize_unicode,
    oov_stats,
    pii_scan,
    top_ngram_stats,
)
from data_lake_skyfit_spark.llm.dedup import connected_components


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_unicode_cross_engine_parity(spark):
    """CPython unicodedata (the kernel) and DuckDB utf8proc (the
    oracle) must agree byte-for-byte across composed / decomposed /
    singleton / reordering inputs — the property the graded
    text_unicode_normalize entry rests on. All literals are explicit
    escapes: composed vs decomposed is invisible in source text."""
    import duckdb
    import unicodedata

    cases = [
        " cafe\u0301",  # decomposed, composes to e-acute
        " caf\u00e9",  # already NFC
        " A\u030Angstro\u0308m",  # decomposed Angstrom
        " \u212B+\u2126",  # ANGSTROM SIGN / OHM SIGN singletons
        " A\u0301\u0327",  # reorder + compose through a lower ccc
        "plain ascii",
        "",
    ]
    con = duckdb.connect()
    for s in cases:
        duck = con.execute("select nfc_normalize(?)", [s]).fetchone()[0]
        assert unicodedata.normalize("NFC", s) == duck, s

    df = _docs(spark, [(i, s) for i, s in enumerate(cases)])
    out = {r["doc_id"]: r["text"] for r in normalize_unicode(df).collect()}
    for i, s in enumerate(cases):
        assert out[i] == unicodedata.normalize("NFC", s)


def test_normalize_unicode_semantics(spark):
    # \ufb01 = fi ligature, \u00bd = 1/2 fraction: NFC-invariant, NFKC-folded
    df = _docs(spark, [(1, "caf\u00e9 \ufb01ne \u00bd"), (2, None), (3, "x")])
    nfc = {r["doc_id"]: r["text"] for r in normalize_unicode(df).collect()}
    assert nfc[1] == "caf\u00e9 \ufb01ne \u00bd" and nfc[2] is None and nfc[3] == "x"
    nfkc = {r["doc_id"]: r["text"] for r in normalize_unicode(df, form="NFKC").collect()}
    assert nfkc[1] == "caf\u00e9 fine 1\u20442"
    # out_col keeps the raw column beside the normalized one
    both = normalize_unicode(df, form="NFC", out_col="norm")
    assert both.columns == ["doc_id", "text", "norm"]
    # idempotence: NFC(NFC(x)) == NFC(x)
    twice = {
        r["doc_id"]: r["text"]
        for r in normalize_unicode(normalize_unicode(df)).collect()
    }
    assert twice == nfc
    # strip_control removes Cc (NUL) and Cf (ZWJ) but keeps tab/newline/CR
    ctl = _docs(spark, [(1, "a\x00b\u200dc\td\ne\rf")])
    got = normalize_unicode(ctl, strip_control=True).collect()[0]["text"]
    assert got == "abc\td\ne\rf"
    with pytest.raises(ValueError, match="normalization form"):
        normalize_unicode(df, form="NFX")


def test_top_ngram_stats_basic_and_tiebreak(spark):
    df = _docs(
        spark,
        [
            (1, "a a a b c"),          # top unigram 'a' 3/5
            (2, "x y x y x y"),        # top bigram 'x y' 3/5
            (3, "b a b a"),            # unigram tie a==b -> 'a' (lexicographic)
            (4, "solo"),               # too short for bigrams
            (5, ""),                   # empty
        ],
    )
    uni = {r["doc_id"]: r for r in top_ngram_stats(df, n=1, prefix="uni").collect()}
    assert (uni[1]["top_unigram"], uni[1]["unigram_count"], uni[1]["unigram_frac"]) == ("a", 3, 0.6)
    assert uni[3]["top_unigram"] == "a" and uni[3]["unigram_count"] == 2
    assert (uni[5]["top_unigram"], uni[5]["unigram_count"], uni[5]["unigram_frac"]) == ("", 0, 0.0)

    bi = {r["doc_id"]: r for r in top_ngram_stats(df, n=2, prefix="bi").collect()}
    assert (bi[2]["top_bigram"], bi[2]["bigram_count"], bi[2]["bigram_frac"]) == ("x y", 3, 0.6)
    assert (bi[4]["top_bigram"], bi[4]["bigram_count"], bi[4]["bigram_frac"]) == ("", 0, 0.0)


def test_pii_scan_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob@example.com and carol.smith+x@sub.domain.org now"),
            (2, "call 12-345-678-9012 or 99-888-777-6666"),
            (3, "clean text with no contact info"),
            (4, "mixed a@b.co 11-222-333-4444 tail"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (2, 0)
    assert got[1]["redacted"] == "mail [EMAIL] and [EMAIL] now"
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 2)
    assert got[2]["redacted"] == "call [PHONE] or [PHONE]"
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (0, 0)
    assert got[3]["redacted"] == got[3]["redacted"] == "clean text with no contact info"
    assert got[4]["redacted"] == "mixed [EMAIL] [PHONE] tail"


def test_oov_stats_against_manual_vocab(spark):
    # Corpus frequency: a:4, b:3, c:2, d:1 -> vocab_size=2 keeps {a, b}.
    df = _docs(
        spark,
        [
            (1, "a a b c"),
            (2, "a b b d"),
            (3, "a c"),
            (4, ""),
        ],
    )
    got = {r["doc_id"]: r for r in oov_stats(df, vocab_size=2).collect()}
    assert (got[1]["n_tokens"], got[1]["n_oov"], got[1]["oov_frac"]) == (4, 1, 0.25)
    assert (got[2]["n_tokens"], got[2]["n_oov"], got[2]["oov_frac"]) == (4, 1, 0.25)
    assert (got[3]["n_tokens"], got[3]["n_oov"], got[3]["oov_frac"]) == (2, 1, 0.5)
    assert (got[4]["n_tokens"], got[4]["n_oov"], got[4]["oov_frac"]) == (0, 0, 0.0)


def test_oov_vocab_tiebreak_is_deterministic(spark):
    # b and c tie at the K boundary; token-asc tie-break keeps 'b'.
    df = _docs(spark, [(1, "a a b c"), (2, "a b c")])
    got = {r["doc_id"]: r for r in oov_stats(df, vocab_size=2).collect()}
    # vocab = {a (3), b (2)}; c is OOV.
    assert got[1]["n_oov"] == 1 and got[2]["n_oov"] == 1


def test_chunk_documents_boundaries(spark):
    # 10 tokens, chunk=4, overlap=1 -> stride 3, ceil((10-4)/3)+1 = 3
    # chunks: [t1..t4],[t4..t7],[t7..t10] — coverage stops exactly at
    # the last token.
    text = " ".join(f"t{i}" for i in range(1, 11))
    df = _docs(spark, [(1, text), (2, "a b"), (3, "")])
    from data_lake_skyfit_spark.llm.curation import chunk_documents

    got = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        )
    assert sorted(by_doc[1]) == [
        (0, 4, "t1 t2 t3 t4"),
        (1, 4, "t4 t5 t6 t7"),
        (2, 4, "t7 t8 t9 t10"),
    ]
    assert by_doc[2] == [(0, 2, "a b")]
    assert by_doc[3] == [(0, 0, "")]  # empty doc keeps one empty chunk


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "a b c")])
    from data_lake_skyfit_spark.llm.curation import chunk_documents

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_temperature_sample_matches_python_mirror(spark):
    import hashlib
    import math

    rows = [(i, "big" if i < 80 else "small", "x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    from data_lake_skyfit_spark.llm.curation import temperature_sample

    got = {
        (r["doc_id"], r["src"], r["keep_threshold"])
        for r in temperature_sample(df, group_col="src").collect()
    }
    # Mirror: n_min=20; big rate sqrt(20/80)=0.5 -> threshold 500000;
    # small rate 1.0 -> threshold 1000000 (keeps everything).
    want = set()
    for i, src, _ in rows:
        n = 80 if src == "big" else 20
        thr = math.floor(1_000_000 * math.sqrt(20 / n))
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 1_000_000
        if bucket < thr:
            want.add((i, src, thr))
    assert got == want
    # The small group is fully kept; the big group is strictly thinned.
    assert sum(1 for _, s, _ in got if s == "small") == 20
    assert 0 < sum(1 for _, s, _ in got if s == "big") < 80


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 200-node chain (diameter 199) must resolve well inside 12
    rounds: pointer jumping doubles covered distance per round, where
    plain min-label propagation would need 199 rounds."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "a_id long, b_id long"
    )
    labels = connected_components(chain, max_iter=12).collect()
    assert len(labels) == 201
    assert {r["cluster_id"] for r in labels} == {0}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
DOC = st.lists(WORD, min_size=0, max_size=40)
CHUNK = st.integers(min_value=2, max_value=8)
OVERLAP = st.integers(min_value=0, max_value=3)


@given(docs=st.lists(DOC, min_size=1, max_size=4), chunk=CHUNK, overlap=OVERLAP)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_coverage_and_reconstruction_property(spark, docs, chunk, overlap):
    """Invariants for arbitrary docs/chunk/overlap:
    1. every token position is covered by at least one chunk;
    2. dropping each chunk's first `overlap` tokens (except chunk 0)
       and concatenating reconstructs the document exactly;
    3. every chunk except the last has exactly `chunk` tokens."""
    from data_lake_skyfit_spark.llm.curation import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, d in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        rebuilt: list[str] = []
        for c in chunks:
            toks = c["chunk_text"].split(" ") if c["chunk_text"] else []
            assert c["n_chunk_tokens"] == len(toks)
            start = c["chunk_id"] * stride
            assert toks == d[start : start + chunk]  # coverage + content
            rebuilt.extend(toks if c["chunk_id"] == 0 else toks[overlap:])
        # Overlap-trimmed concatenation reconstructs the doc (tail chunks
        # shorter than overlap contribute nothing new).
        assert rebuilt[: len(d)] == d and len(rebuilt) == len(d)
        for c in chunks[:-1]:
            assert c["n_chunk_tokens"] == chunk


def test_budget_select_greedy_cutoff(spark):
    from data_lake_skyfit_spark.llm.curation import budget_select

    df = spark.createDataFrame(
        [(i, i, 10) for i in range(1, 11)], "doc_id long, rank long, cost long"
    )
    out = budget_select(
        df, cost_col="cost", order_cols=["rank", "doc_id"], budget=35
    ).collect()
    # 10+10+10 = 30 fits; the 4th row would reach 40 > 35.
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    assert {r["doc_id"]: r["cum_cost"] for r in out} == {1: 10, 2: 20, 3: 30}


def test_budget_select_no_global_single_task_window(spark):
    from data_lake_skyfit_spark.llm.curation import budget_select

    df = spark.createDataFrame(
        [(i, i, 1) for i in range(100)], "doc_id long, rank long, cost long"
    )
    out = budget_select(df, cost_col="cost", order_cols=["rank", "doc_id"], budget=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The corpus-sized running sum must window per partition id (the
    # range partitioning itself is hidden behind the localCheckpoint's
    # ExistingRDD scan); the only SinglePartition exchange allowed is
    # the one over per-partition totals (`partitions` tiny rows).
    assert "windowspecdefinition(__pid" in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_cap_per_group_deterministic_uniform(spark):
    from data_lake_skyfit_spark.llm.curation import cap_per_group

    df = spark.createDataFrame(
        [(i, "a" if i < 40 else "b") for i in range(50)],
        "doc_id long, source string",
    )
    out = cap_per_group(df, group_col="source", k=5)
    rows = out.collect()
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["a"]) == 5
    assert len(by_src["b"]) == 5  # group smaller than... 10 rows, capped at 5
    # Deterministic: same input → identical kept set.
    again = cap_per_group(df, group_col="source", k=5).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in rows)
    # The md5 draw is not "first k by id": at least one kept id in the
    # big group is outside the first five ids.
    assert any(d >= 5 for d in by_src["a"])


def test_cross_doc_duplication_scores(spark):
    from data_lake_skyfit_spark.llm.curation import cross_doc_duplication

    df = _docs(
        spark,
        [
            (1, "a b c d e"),        # shares all shingles with doc 2
            (2, "a b c d e"),        # exact copy
            (3, "p q r s t"),        # fully original
            (4, "a b c x y z"),      # one shared shingle ('a b c') of 4
            (5, "xx yy"),            # too short for 3-shingles
        ],
    )
    got = {r["doc_id"]: r for r in cross_doc_duplication(df, n=3).collect()}
    assert got[1]["shared_frac"] == 1.0 and got[2]["shared_frac"] == 1.0
    assert got[3]["shared_frac"] == 0.0 and got[3]["n_shingles"] == 3
    assert got[4]["n_shingles"] == 4 and got[4]["n_shared"] == 1
    assert got[4]["shared_frac"] == 0.25
    assert got[5]["n_shingles"] == 0 and got[5]["shared_frac"] == 0.0


def test_negative_sample_pairs_determinism_and_shape(spark):
    from data_lake_skyfit_spark.llm.curation import negative_sample_pairs

    df = _docs(spark, [(i, f"doc {i}") for i in range(20)])
    out = negative_sample_pairs(df, k=3).collect()
    # ≤ k pairs per anchor (self-draws dropped), negatives from corpus
    by_anchor: dict[int, list] = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
        assert 0 <= r["negative_id"] < 20
        assert r["negative_id"] != r["anchor_id"]
    assert set(by_anchor) <= set(range(20))
    assert all(1 <= len(v) <= 3 for v in by_anchor.values())
    # deterministic across runs
    again = negative_sample_pairs(df, k=3).collect()
    key = lambda r: (r["anchor_id"], r["slot"], r["negative_id"])  # noqa: E731
    assert sorted(map(key, again)) == sorted(map(key, out))


def test_dense_index_is_gapless_and_ordered(spark):
    from data_lake_skyfit_spark.operators.scale import dense_index

    df = spark.createDataFrame([(i * 7 % 100, ) for i in range(100)], "v long")
    got = dense_index(df, ["v"]).collect()
    ordered = sorted(got, key=lambda r: r["idx"])
    assert [r["idx"] for r in ordered] == list(range(100))
    assert [r["v"] for r in ordered] == sorted(r["v"] for r in got)


def test_gopher_rules_flags_and_metrics(spark):
    """Each rule trips on its designed violation; metrics match a hand
    computation; empty docs get null ratios and keep=0."""
    from data_lake_skyfit_spark.llm.curation import gopher_rules

    rows = [
        # passes everything: 12 alphabetic words incl. 2 stopwords
        (0, "the quick brown fox jumps over a lazy dog near river bank"),
        # too few words
        (1, "the a short one"),
        # mean word length too high (3 words of 20+ chars), also stopword fail
        (2, "aaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbb cccccccccccccccccccccccc"),
        # symbol-heavy: many '#' and ellipses
        (3, "the a b c d e f g h i j k ### ... ### ... ####"),
        # numeric soup: alpha fraction low
        (4, "the a 111 222 333 444 555 666 777 888 999 000"),
        (5, ""),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(
            _docs(spark, rows), min_words=10, min_stopword_hits=2
        ).collect()
    }
    assert out[0]["keep"] == 1 and out[0]["n_words"] == 12
    assert out[0]["alpha_word_frac"] == 1.0 and out[0]["r_stopwords"] == 1
    assert out[1]["r_word_count"] == 0 and out[1]["keep"] == 0
    w2 = rows[2][1].split()
    assert out[2]["r_mean_word_len"] == 0
    assert out[2]["mean_word_len"] == round(sum(map(len, w2)) / len(w2), 4)
    assert out[3]["r_symbol_ratio"] == 0  # 10 '#' + 2 '...' over 17 words
    assert out[4]["r_alpha_words"] == 0 and out[4]["alpha_word_frac"] == round(2 / 12, 4)
    assert out[5]["n_words"] == 0 and out[5]["mean_word_len"] is None
    assert out[5]["keep"] == 0


def test_semantic_dedup_marks_lower_id_clustermates(spark):
    """Within a shard, every vector with a lower-id near-identical mate
    is marked dup_of the smallest such id; cross-shard near-dups are NOT
    compared (the SemDeDup contract); survivors keep is_dup=0."""
    import math

    from data_lake_skyfit_spark.llm.dedup import semantic_dedup

    # Two orthogonal directions; ids interleaved. shard_col pins shards
    # explicitly so the test controls the partition.
    rows = [
        (0, [1.0, 0.0], 0),
        (2, [1.0, 1e-6], 0),   # ~same direction as 0, same shard -> dup of 0
        (4, [0.0, 1.0], 0),    # orthogonal -> survivor
        (1, [1.0, 0.0], 1),    # same direction as 0 but other shard -> survivor
        (3, [1.0, 2e-6], 1),   # dup of 1 within shard 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, grp int")
    out = {
        r["id"]: (r["is_dup"], r["dup_of"], r["shard"])
        for r in semantic_dedup(df, threshold=0.99, shard_col="grp").collect()
    }
    assert out[0] == (0, None, 0)
    assert out[2] == (1, 0, 0)
    assert out[4] == (0, None, 0)
    assert out[1] == (0, None, 1)
    assert out[3] == (1, 1, 1)
    assert math.isclose(sum(1 for v in out.values() if v[0]), 2)


def test_semantic_dedup_md5_shard_matches_python_mirror(spark):
    """The default md5 shard assignment is the engine-reproducible
    conv(md5(id)[:6],16,10) % n_shards — pinned against hashlib."""
    import hashlib

    from data_lake_skyfit_spark.llm.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, n_shards=16, threshold=0.999999).collect()
    for r in out:
        expect = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:6], 16) % 16
        assert r["shard"] == expect


def test_curate_corpus_stage_order_and_dispositions(spark):
    """All four stages drop something; the FIRST dropping stage wins the
    disposition; survivors are exactly the non-dropped ids."""
    from data_lake_skyfit_spark.llm.curation import curate_corpus

    base = " ".join(f"tok{i}" for i in range(30)) + " the a of and"
    rows = [
        (0, base + " zero marker words here"),          # kept
        (1, "too short the a"),                          # quality (n_words < 10)
        (2, base + " zero marker words here"),           # exact dup of 0
        (3, base + " zero marker words here extra"),     # near dup of 0 (high Jaccard)
        (4, base + " four distinct tail " + " ".join(f"x{i}" for i in range(10))),  # kept
    ]
    # eval doc sharing a >=5-token run ONLY with doc 4's distinctive
    # tail -> contaminates 4 alone (doc 0 shares no 5-gram with it)
    ev = [(100, "unrelated eval prefix words tail x0 x1 x2 x3 x4 x5")]
    train = _docs(spark, rows)
    evalset = _docs(spark, ev)
    out = {
        r["doc_id"]: r["drop_reason"]
        for r in curate_corpus(train, evalset, jaccard_threshold=0.7).collect()
    }
    assert out[1] == "quality"
    assert out[2] == "exact_dup"
    assert out[3] == "near_dup"
    assert out[4] == "contaminated"
    assert out[0] == "kept"


def test_curate_corpus_no_eval_set_skips_decontamination(spark):
    from data_lake_skyfit_spark.llm.curation import curate_corpus

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(20)) + " the a is it") for i in range(5)]
    out = curate_corpus(_docs(spark, rows)).collect()
    assert all(r["drop_reason"] == "kept" and r["kept"] == 1 for r in out)


def test_train_bpe_learns_expected_merges(spark):
    """Hand-checkable corpus: 'low' x5, 'lower' x2, 'newest' x6,
    'widest' x3 (the classic BPE example). Highest-frequency adjacent
    pair merges first; ties break lexicographically."""
    from data_lake_skyfit_spark.llm.tokenizer import train_bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = train_bpe(df, num_merges=4)
    # pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ...
    # tie (e,s) vs (s,t) -> ('e','s'); then ('es','t')=9; then (l,o)=7
    # vs (o,w)=7 -> ('l','o'); then ('lo','w')=7.
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_apply_bpe_matches_python_mirror(spark):
    """apply_bpe (Arrow kernel + memoization) must agree with a direct
    per-word GPT-2-style merge loop on every document."""
    import random

    from data_lake_skyfit_spark.llm.tokenizer import (
        apply_bpe,
        bpe_encode_word,
        train_bpe,
    )

    rng = random.Random(5)
    alphabet = "abcd"
    docs = [
        (i, " ".join("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
                      for _ in range(rng.randint(0, 12))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = train_bpe(df, num_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r for r in apply_bpe(df, merges).collect()}
    for i, text in docs:
        words = text.split()
        want = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert (got[i]["n_words"], got[i]["n_bpe_tokens"]) == (len(words), want)
        assert got[i]["n_chars"] == sum(len(w) for w in words)
    # merges actually compress: some doc has fewer tokens than chars
    assert any(r["n_bpe_tokens"] < r["n_chars"] for r in got.values())


def test_bpe_encode_word_rank_order_not_greedy_length():
    """GPT-2 semantics: the LOWEST-RANK pair present merges first, even
    when a longer later merge exists."""
    from data_lake_skyfit_spark.llm.tokenizer import bpe_encode_word

    ranks = {("a", "b"): 0, ("c", "d"): 1, ("b", "c"): 2}
    # 'abcd': rank0 (a,b) -> [ab, c, d]; rank1 (c,d) -> [ab, cd]
    assert bpe_encode_word("abcd", ranks) == ["ab", "cd"]


def test_bpe_fixture_class_counts():
    """The graded text_bpe_encode oracle hard-codes per-class
    (token, char) constants; they must be exactly what bpe_encode_word
    produces under the fixed merge table (the closed form IS the
    fixture's construction)."""
    from data_lake_skyfit_spark.llm.tokenizer import bpe_encode_word
    from data_lake_skyfit_spark.queries_llm import (
        _BPE_CLASS_TOKENS,
        _BPE_CLASS_WORDS,
        _BPE_FIXED_MERGES,
    )

    ranks = {p: i for i, p in enumerate(_BPE_FIXED_MERGES)}
    got = [len(bpe_encode_word(w, ranks)) for w in _BPE_CLASS_WORDS]
    assert got == _BPE_CLASS_TOKENS
    # the class set must really exercise distinct regimes: at least one
    # word fully collapses, one doesn't merge at all, and the
    # rank-order pin holds (abcd -> [abc, d], never [ab, cd])
    assert 1 in got and max(got) == 3
    assert bpe_encode_word("abcd", ranks) == ["abc", "d"]


def test_semantic_dedup_blocked_equals_monolithic(spark):
    """Giant-cluster mode (num_blocks>1: per-shard Gram decomposed into
    block pairs) must produce EXACTLY the monolithic result — same
    dup_of, same survivors — on a corpus with many near-dup pairs."""
    import random

    from data_lake_skyfit_spark.llm.dedup import semantic_dedup

    rng = random.Random(13)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(6)]
    rows = []
    for i in range(90):
        b = base[i % 6]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mono = {
        r["id"]: (r["shard"], r["is_dup"], r["dup_of"])
        for r in semantic_dedup(df, n_shards=4, threshold=0.9).collect()
    }
    blocked = {
        r["id"]: (r["shard"], r["is_dup"], r["dup_of"])
        for r in semantic_dedup(df, n_shards=4, threshold=0.9, num_blocks=3).collect()
    }
    assert mono == blocked
    assert sum(1 for v in mono.values() if v[1]) > 10  # real dup mass


def test_semantic_dedup_with_kmeans_clusters(spark):
    """The production SemDeDup path: cluster ids from the IVF k-means
    quantizer feed shard_col. Near-identical vectors land in the same
    centroid list, so they dedup; the result must agree with a direct
    per-cluster check."""
    import random

    from data_lake_skyfit_spark.llm import similarity as S
    from data_lake_skyfit_spark.llm.dedup import semantic_dedup
    from pyspark.sql import functions as F

    rng = random.Random(21)
    centers = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
    rows = [
        (i, [x + rng.uniform(-0.01, 0.01) for x in centers[i % 4]])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c = S._prep(df, "vec_id", "embedding").localCheckpoint(eager=False)
    cids, cmat = S._train_centroids(c, 4, 1)
    assigned = S._assign_to_centroids(c, 1, cids, cmat).select(
        F.col("id").alias("vec_id"), F.col("cid").alias("cluster")
    )
    clustered = df.join(assigned, "vec_id")
    out = semantic_dedup(
        clustered, threshold=0.999, shard_col="cluster"
    ).collect()
    assert len(out) == 60
    # Mirror: within each k-means list, a vector is a dup iff a lower-id
    # list-mate has round(cos,4) >= threshold; dup_of is the min such id.
    import numpy as np

    vecs = {i: np.array(v) for i, v in rows}
    shard_of = {r["id"]: r["shard"] for r in out}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for r in out:
        mates = [
            j
            for j in vecs
            if j < r["id"]
            and shard_of[j] == r["shard"]
            and round(cos(vecs[j], vecs[r["id"]]), 4) >= 0.999
        ]
        if mates:
            assert (r["is_dup"], r["dup_of"]) == (1, min(mates))
        else:
            assert (r["is_dup"], r["dup_of"]) == (0, None)
    # the clustering actually dedups: most of the 60 near-identical
    # family members collapse
    assert sum(r["is_dup"] for r in out) >= 40


WORDS = st.lists(
    st.sampled_from(["the", "a", "fox", "zebra", "q", "###", "12345", "aaaaaaaaaaaaaaaaaaaaaaaaa"]),
    min_size=0,
    max_size=25,
)


@given(docs=st.lists(WORDS, min_size=1, max_size=5))
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gopher_rules_flags_consistent_with_metrics_property(spark, docs):
    """For arbitrary word soups: every flag equals the rule recomputed
    from the emitted metrics, and keep is exactly their conjunction."""
    from data_lake_skyfit_spark.llm.curation import gopher_rules

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    out = gopher_rules(_docs(spark, rows), min_words=3).collect()
    assert len(out) == len(rows)
    for r in out:
        flags = {
            "r_word_count": 3 <= r["n_words"] <= 100_000,
            "r_mean_word_len": r["mean_word_len"] is not None
            and 2.0 <= r["mean_word_len"] <= 12.0,
            "r_symbol_ratio": r["symbol_ratio"] is not None
            and r["symbol_ratio"] <= 0.1,
            "r_alpha_words": r["alpha_word_frac"] is not None
            and r["alpha_word_frac"] >= 0.8,
            "r_stopwords": r["stopword_hits"] >= 2,
        }
        for name, want in flags.items():
            assert r[name] == int(want), (r, name)
        assert r["keep"] == int(all(flags.values()))


def test_trigram_language_id_beats_stopword_tier_on_short_text(spark):
    """VERDICT r3 #7 'done' condition: the trigram tier must (a) agree
    with the stopword tier on ordinary sentences and (b) recover
    languages on short/stopword-free text where the stopword tier
    returns 'und' — affix/boundary trigrams fire on content words."""
    from data_lake_skyfit_spark.llm.text import (
        language_scores, language_scores_trigram,
    )

    cases = [
        # ordinary sentences: both tiers should get these
        (1, "the cat sat in the house and the dog is in the garden", "en"),
        (2, "el perro y el gato que se ven en la casa de los vecinos", "es"),
        (3, "le chien et le chat sont dans la maison de la ville", "fr"),
        (4, "der hund und die katze sind von den leuten ein geschenk", "de"),
        # short / stopword-free: no stopword fires, trigrams still do
        (5, "running jumping thinking swimming", "en"),
        (6, "wandern schwimmen sprechen verstehen", "de"),
        (7, "informacion entendiendo quedamos", "es"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id long, text string"
    )
    stop = {r["doc_id"]: r["predicted_lang"] for r in language_scores(df).collect()}
    tri = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_scores_trigram(df).collect()
    }
    truth = {i: lang for i, _, lang in cases}
    acc_stop = sum(stop[i] == truth[i] for i in truth) / len(truth)
    acc_tri = sum(tri[i] == truth[i] for i in truth) / len(truth)
    # the stopword tier is blind on 5-7 by construction
    assert all(stop[i] == "und" for i in (5, 6, 7))
    assert all(tri[i] == truth[i] for i in (5, 6, 7)), tri
    assert acc_tri > acc_stop
    assert acc_tri == 1.0, tri


def test_line_level_dedup_semantics(spark):
    """Corpus-wide first-occurrence-wins at line granularity: cross-doc
    copies drop, within-doc copies drop, short lines always survive,
    and documents rebuild in original line order."""
    from data_lake_skyfit_spark.llm.dedup import line_level_dedup

    dup = "this exact content line repeats everywhere"
    docs = [
        (1, f"{dup}\nunique alpha content line\n---\n{dup}"),
        (2, f"{dup}\nunique beta content line"),
        (3, "---\n--"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["id"]: r for r in line_level_dedup(df).collect()}
    # doc 1: keeps first copy of dup, unique line, short '---'; drops its
    # own second copy (within-doc dedup)
    assert out[1]["text"] == f"{dup}\nunique alpha content line\n---"
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["n_dropped"]) == (4, 3, 1)
    # doc 2: loses the cross-doc copy
    assert out[2]["text"] == "unique beta content line"
    assert out[2]["n_dropped"] == 1
    # doc 3: all short/structural lines kept verbatim
    assert out[3]["text"] == "---\n--" and out[3]["n_dropped"] == 0


def test_duplicate_span_removal_semantics(spark):
    """Lee-et-al-style span dedup at k=3: the corpus-wide first
    occurrence survives, later occurrences cut exactly their k token
    positions (overlapping duplicated spans union their coverage),
    sub-k documents pass through untouched, and rebuilt text re-joins
    surviving tokens."""
    from data_lake_skyfit_spark.llm.dedup import duplicate_span_removal

    span = "alpha beta gamma"
    docs = [
        (1, f"{span} delta epsilon"),          # first occurrence: untouched
        (2, f"zeta {span} eta"),               # span cut from the middle
        (3, f"{span} {span}"),                 # both copies lose to doc 1
        (4, "too short"),                      # < k tokens: no grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["id"]: r for r in duplicate_span_removal(df, k=3).collect()}
    assert out[1]["text"] == "alpha beta gamma delta epsilon"
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "zeta eta" and out[2]["n_removed"] == 3
    # doc 3 is "alpha beta gamma alpha beta gamma": the duplicated gram's
    # GLOBAL winner is doc 1's start 0, so doc 3's occurrences at starts
    # 0 and 3 are both cut — covering all six positions. A doc made
    # entirely of seen content vanishes (token-less docs keep a row).
    assert out[3]["text"] == "" and out[3]["n_removed"] == 6
    assert out[3]["n_tokens"] == 6 and out[3]["n_kept"] == 0
    assert out[4]["text"] == "too short" and out[4]["n_removed"] == 0


def test_target_importance_scores_semantics(spark):
    """DSIR-shaped selection signal: documents sharing more bigram mass
    with the target corpus must score strictly higher; bigram-less docs
    keep a zero-score row; the target's own docs score highest."""
    from data_lake_skyfit_spark.llm.curation import target_importance_scores

    target = spark.createDataFrame(
        [(100, "machine learning models train on curated data")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "machine learning models need data"),   # heavy overlap
            (2, "cooking recipes with fresh basil"),    # zero overlap
            (3, "models train fast with less target"),  # some overlap
            (4, "one"),                                 # no bigrams at all
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in target_importance_scores(train, target).collect()}
    assert out[1]["score"] > out[3]["score"] > out[2]["score"] == 0.0
    assert out[1]["raw_score"] == 2  # 'machine learning', 'learning models'
    assert out[3]["raw_score"] == 1  # 'models train' (1 of 5 bigrams)
    assert out[4] and out[4]["n_feats"] == 0 and out[4]["score"] == 0.0


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=5,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_line_dedup_conservation_and_idempotence_property(spark, docs):
    """For arbitrary small corpora (lines = 3-token groups):
    1. n_kept + n_dropped == n_lines per doc;
    2. line_level_dedup is IDEMPOTENT — after one pass no content line
       appears twice corpus-wide, so a second pass drops nothing."""
    from data_lake_skyfit_spark.llm.dedup import line_level_dedup

    rows = [
        (i, "\n".join(" ".join(d[j : j + 3]) for j in range(0, len(d), 3)))
        for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = line_level_dedup(df)
    got = once.collect()
    for r in got:
        assert r["n_kept"] + r["n_dropped"] == r["n_lines"]
    twice = line_level_dedup(
        once.select(F.col("id").alias("doc_id"), "text")
    ).collect()
    assert all(r["n_dropped"] == 0 for r in twice)
    assert {r["id"]: r["text"] for r in twice} == {r["id"]: r["text"] for r in got}


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10),
        min_size=1, max_size=4,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_removal_conservation_property(spark, docs):
    """duplicate_span_removal invariants for arbitrary tiny corpora:
    n_kept + n_removed == n_tokens; survivors' rebuilt text has exactly
    n_kept tokens; the GLOBAL first occurrence of every duplicated
    k-gram value survives somewhere (first-doc text always intact when
    it contains the winner)."""
    from data_lake_skyfit_spark.llm.dedup import duplicate_span_removal

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_span_removal(df, k=3).collect()
    for r in out:
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"]
        n_text_tokens = len(r["text"].split()) if r["text"] else 0
        assert n_text_tokens == r["n_kept"]


# ---------------------------------------------------------------------------
# Hashed n-gram quality classifier (llm.classifier)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clf_task(spark):
    """A genuinely learnable held-out rule: docs with more 'table' than
    'spark' token occurrences. (The documents table's lang/source
    columns are metadata UNCORRELATED with the text — no text model can
    beat majority on them, which is itself pinned nowhere because it's
    a property of the synthetic data, not the code.)"""
    from data_lake_skyfit_spark.llm import text as text_ops
    from data_lake_skyfit_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    toks = text_ops.tokens_expr(F.col("text"))

    def cnt(t):
        return F.size(F.filter(toks, lambda x: x == t))

    labels = d.select(
        "doc_id", (cnt("table") > cnt("spark")).cast("int").alias("y")
    )
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    return train, test, labels


def _holdout_accuracy(test, labels, pred):
    j = pred.join(labels, "doc_id")
    return j.filter(F.col("label") == F.col("y")).count() / j.count()


def test_classifier_logistic_beats_majority_and_nb(spark, clf_task):
    from data_lake_skyfit_spark.llm import classifier

    train, test, labels = clf_task
    maj = labels.join(test.select("doc_id"), "doc_id").agg(F.avg("y")).first()[0]
    majority = max(maj, 1 - maj)

    w_nb = classifier.train_nb_logodds(train, labels)
    acc_nb = _holdout_accuracy(
        test, labels, classifier.apply_quantized(test, classifier.quantize_weights(w_nb))
    )

    w_lr, bias = classifier.train_logistic(train, labels)
    acc_lr = _holdout_accuracy(
        test,
        labels,
        classifier.apply_quantized(
            test,
            classifier.quantize_weights(w_lr),
            bias_int=round(bias * (1 << 16)),
        ),
    )
    # measured r4: NB 0.79, LBFGS 0.92, majority 0.59 — slack for
    # testdata regeneration
    assert acc_nb >= majority + 0.05, f"NB {acc_nb:.2f} vs majority {majority:.2f}"
    assert acc_lr >= 0.8, f"LBFGS holdout too low: {acc_lr:.2f}"
    assert acc_lr >= acc_nb - 0.02, (
        f"LBFGS {acc_lr:.2f} should not lose to NB {acc_nb:.2f}"
    )


def test_classifier_fixed_margin_matches_explode_groupby(spark, clf_task):
    """The graded zero-shuffle fold == the long-form explode/groupBy
    sum with the same fixed weights (two independent Spark plans)."""
    from data_lake_skyfit_spark.llm import classifier

    _, test, _ = clf_task
    fold = classifier.score_quality_fixed(test).select("doc_id", "margin")
    feats = classifier.hashed_features(test)
    long_form = (
        feats.withColumn(
            "t", classifier.fixed_weight_expr(F.col("bucket")) * F.col("cnt")
        )
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.sum("t").cast("long").alias("m2"))
    )
    bad = (
        fold.join(long_form, "doc_id", "left")
        .filter(F.coalesce(F.col("m2"), F.lit(0)) != F.col("margin"))
        .count()
    )
    assert bad == 0


def test_classifier_single_token_doc_has_no_bigrams(spark):
    from data_lake_skyfit_spark.llm import classifier

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["n_grams"]
        for r in classifier.score_quality_fixed(df).collect()
    }
    assert rows == {1: 1, 2: 3, 3: 0, 4: 0}


def test_curate_corpus_classifier_stage(spark):
    """Optional model gate (stage 1b): integer weights that condemn a
    marker token must drop exactly the docs carrying it, with the
    disposition precedence quality > classifier > exact_dup intact and
    the no-weights path byte-identical to before (the graded
    curation_pipeline passes no weights)."""
    import hashlib

    from data_lake_skyfit_spark.llm.classifier import N_BUCKETS
    from data_lake_skyfit_spark.llm.curation import curate_corpus

    bad_bucket = int(hashlib.md5(b"badword").hexdigest()[:4], 16) % N_BUCKETS
    # margin = n_grams·1 − 10^6·cnt(badword-bucket): positive unless the
    # marker (or a same-bucket collision) appears.
    weights = {bad_bucket: -(10**6)}
    good = "solid useful prose with enough words to pass the gate " * 6
    rows = [
        (1, good),
        (2, good.replace("useful", "badword", 1)),
        (3, "x"),  # fails gopher quality first → 'quality', not 'classifier'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    disp = {
        r["doc_id"]: r["drop_reason"]
        for r in curate_corpus(
            df, classifier_weights=weights, classifier_bias=1
        ).collect()
    }
    assert disp[1] == "kept"
    assert disp[2] == "classifier"
    assert disp[3] == "quality"

    plain = {
        r["doc_id"]: r["drop_reason"] for r in curate_corpus(df).collect()
    }
    # No model gate → the marker doc survives to the LSH stage, where
    # it is caught as a near-dup of doc 1 instead (one token changed in
    # repeated text) — the stage ORDER is visible in the disposition.
    assert plain[2] == "near_dup"


def test_html_to_text_absolute_semantics(spark):
    """The graded entry only proves CROSS-ENGINE parity of the chain;
    this pins what the chain actually does: boilerplate truly gone,
    tags stripped, entity gauntlet incl. the double-escape rule."""
    from data_lake_skyfit_spark.llm.text import html_to_text

    html = (
        '<html><head><title>T</title><style>p{color:red}</style>'
        '<script a="1">var s = "SECRET";\nmore();</script>'
        "<!-- note --></head><body><h1>Head</h1>"
        "<p>body&nbsp;text</p>"
        "<p>Tom &amp; Jerry &lt;3 &quot;q&quot; it&#39;s &amp;lt;kept</p>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    out = df.select(html_to_text(F.col("text")).alias("x")).collect()[0]["x"]
    assert out == 'T Head body text Tom & Jerry <3 "q" it\'s &lt;kept'
    assert "SECRET" not in out and "color:red" not in out and "note" not in out
    # multi-line script bodies vanish too ((?s) dotall) and empty input
    # survives the chain
    e = spark.createDataFrame([(1, ""), (2, "plain, no markup")], "doc_id long, text string")
    got = {r["doc_id"]: r["x"] for r in e.select("doc_id", html_to_text(F.col("text")).alias("x")).collect()}
    assert got == {1: "", 2: "plain, no markup"}


def test_normalize_url_absolute_semantics(spark):
    from data_lake_skyfit_spark.llm.text import normalize_url, url_host

    cases = [
        (1, "HTTP://Example.COM:80/p/1?q=1#frag", "http://example.com/p/1?q=1", "example.com"),
        (2, "https://HOST.net:443/", "https://host.net", "host.net"),
        (3, "https://a.b.c/x/", "https://a.b.c/x/", "a.b.c"),  # non-bare trailing slash kept
        (4, "http://plain.org", "http://plain.org", "plain.org"),
        (5, "ftp://Weird.Host:21/x", "ftp://weird.host:21/x", "weird.host:21"),  # non-http ports kept
        (6, "  not a url  ", "not a url", ""),  # passthrough, trimmed
        (7, "http://h:8080/a#b#c", "http://h:8080/a", "h:8080"),  # only default ports drop
        (8, "https://U.io:443", "https://u.io", "u.io"),  # port on empty path
    ]
    df = spark.createDataFrame([(i, u) for i, u, _, _ in cases], "doc_id long, url string")
    out = {
        r["doc_id"]: (r["n"], r["h"])
        for r in df.select(
            "doc_id",
            normalize_url(F.col("url")).alias("n"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    for i, _, want_norm, want_host in cases:
        assert out[i] == (want_norm, want_host), (i, out[i])


def test_script_fractions_absolute_semantics(spark):
    """Dominance must actually flip with content (the graded entry only
    proves cross-engine parity); digits never dominate; empty text is
    'other' with zero fractions."""
    from data_lake_skyfit_spark.llm.text import script_fractions

    rows = [
        (1, "hello world"),
        (2, "привет мир ok"),  # cyrillic > latin
        (3, "你好世界"),  # pure CJK
        (4, "12345 67890"),  # digits only -> other
        (5, ""),
        (6, "ab αβ"),  # latin==greek tie -> greek (name-asc)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_fractions(df).collect()}
    assert out[1]["dominant_script"] == "latin"
    assert out[2]["dominant_script"] == "cyrillic" and out[2]["n_cyrillic"] == 9
    assert out[3]["dominant_script"] == "cjk" and out[3]["frac_cjk"] == 1.0
    assert out[4]["dominant_script"] == "other" and out[4]["n_digit"] == 10
    assert out[5]["dominant_script"] == "other" and out[5]["n_chars"] == 0
    assert out[6]["dominant_script"] == "greek"  # 2 == 2, name-asc wins


def test_sentences_expr_semantics(spark):
    from data_lake_skyfit_spark.llm.text import sentences_expr

    rows = [
        (1, "One. Two! Three?"),
        (2, "No terminator at all"),
        (3, "Wait... what?! Done."),  # grouped terminator runs
        (4, ""),
        (5, "  Leading. trailing frag"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: list(r["s"])
        for r in df.select("doc_id", sentences_expr("text").alias("s")).collect()
    }
    assert out[1] == ["One.", "Two!", "Three?"]
    assert out[2] == ["No terminator at all"]
    assert out[3] == ["Wait...", "what?!", "Done."]
    assert out[4] == []
    assert out[5] == ["Leading.", "trailing frag"]


def test_sentence_level_dedup_semantics(spark):
    """First (id, pos) keeps the shared sentence; short sentences are
    structural and always kept; docs rebuild in position order."""
    from data_lake_skyfit_spark.llm.dedup import sentence_level_dedup

    rows = [
        (1, "Unique opening sentence one. This exact sentence repeats everywhere!"),
        (2, "This exact sentence repeats everywhere! Unique closing sentence two."),
        (3, "Ok. This exact sentence repeats everywhere! Ok."),  # short 'Ok.' kept twice
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in sentence_level_dedup(df).collect()}
    assert out[1]["text"] == rows[0][1]
    assert out[1]["n_dropped"] == 0
    assert out[2]["text"] == "Unique closing sentence two."
    assert out[2]["n_dropped"] == 1
    assert out[3]["text"] == "Ok. Ok."
    assert (out[3]["n_sentences"], out[3]["n_kept"]) == (3, 2)


def test_compression_ratio_separates_repetitive_from_varied(spark):
    from data_lake_skyfit_spark.llm.curation import compression_ratio

    varied = " ".join(f"w{i * 7919 % 9973}" for i in range(200))
    rows = [
        (1, "spam spam spam " * 100),  # highly compressible
        (2, varied),  # much less so
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert out[1]["ratio"] < 0.1 < out[2]["ratio"]
    assert out[1]["n_bytes"] == 1500
    assert out[3]["ratio"] == 0.0 and out[3]["n_bytes"] == 0
    assert out[4]["ratio"] is None
    # schema: original columns preserved, three stats appended
    assert compression_ratio(df).columns == ["doc_id", "text", "n_bytes", "n_compressed", "ratio"]


# ----------------------------------------------------- LM surprisal tier


def test_word_surprisal_hand_computed(spark):
    """4 docs, vocab_size large enough for all words; total = 8 tokens
    → bitlen(8) = 4 ('1000'). 'the'×4 → bits 4-3=1; 'cat'/'sat'×2 →
    4-2=2 each; wordless doc zero-filled."""
    from data_lake_skyfit_spark.llm.text import word_surprisal_scores

    d = spark.createDataFrame(
        [
            (1, "the cat sat"),       # 1 + 2 + 2 = 5 bits
            (2, "the the cat"),       # 1 + 1 + 2 = 4
            (3, "the sat"),           # 1 + 2 = 3
            (4, "   "),               # no tokens
            (5, None),                # null text
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_oov"], r["surprisal_bits"])
        for r in word_surprisal_scores(d, vocab_size=16).collect()
    }
    assert out == {
        1: (3, 0, 5),
        2: (3, 0, 4),
        3: (2, 0, 3),
        4: (0, 0, 0),
        5: (0, 0, 0),
    }


def test_word_surprisal_oov_penalty_and_vocab_cut(spark):
    """vocab_size=1 keeps only the most frequent word ('a', 3×); every
    other token is OOV and pays bitlen(total)+1 = bitlen(6)+1 = 4."""
    from data_lake_skyfit_spark.llm.text import word_surprisal_scores

    d = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_oov"], r["surprisal_bits"])
        for r in word_surprisal_scores(d, vocab_size=1).collect()
    }
    # total=6 tokens → bitlen=3; 'a' count 3 → bitlen 2 → 1 bit each
    assert out == {1: (4, 1, 3 * 1 + 4), 2: (2, 2, 8)}


def test_word_surprisal_ranks_fluent_below_gibberish(spark):
    """The quality-prior property: a document of common words scores
    fewer bits/word than one of hapax gibberish on the same corpus."""
    from data_lake_skyfit_spark.llm.text import word_surprisal_scores

    common = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(i, common) for i in range(8)] + [
        (100, "zxqv wvut kjhg plmo qwer tyui") ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["surprisal_bits"] / r["n_words"]
        for r in word_surprisal_scores(d, vocab_size=64).collect()
    }
    assert out[100] > out[0] * 1.5


def test_luhn_validation_known_numbers(spark):
    """Published Luhn examples: the classic 4539... test PAN is valid,
    a one-digit corruption is not; short strings reject."""
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.llm.curation import luhn_valid_expr

    cases = [
        ("4539148803436467", True),   # classic valid test PAN
        ("4539148803436468", False),  # corrupted check digit
        ("79927398713", True),        # the canonical Luhn example
        ("79927398710", False),
        ("0000000000000000", True),   # sum 0 ≡ 0 mod 10
    ]
    df = spark.createDataFrame(cases, "num string, expect boolean")
    got = df.select("num", "expect", luhn_valid_expr(F.col("num")).alias("v")).collect()
    for r in got:
        assert r["v"] == r["expect"], r["num"]


def test_pii_luhn_scan_redacts_only_validated(spark):
    from data_lake_skyfit_spark.llm.curation import pii_luhn_scan

    rows = [
        (1, "pay 4539148803436467 now"),          # valid → redacted
        (2, "order 4539148803436468 shipped"),    # invalid → kept
        (3, "ref 12345678901234567 long"),        # 17 digits → no candidate
        (4, "a 4539148803436467 b 79927398713999999 c"),  # 1 valid of 2? second is 17 digits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_luhn_scan(df).collect()}
    assert got[1]["n_candidates"] == 1 and got[1]["n_valid"] == 1
    assert got[1]["redacted"] == "pay [CARD] now"
    assert got[2]["n_valid"] == 0 and "4539148803436468" in got[2]["redacted"]
    assert got[3]["n_candidates"] == 0
    assert got[4]["n_candidates"] == 1 and got[4]["n_valid"] == 1


def test_fix_mojibake_strict_roundtrip(spark):
    from data_lake_skyfit_spark.llm.text import fix_mojibake

    # all non-ASCII content via escapes (the r4c rule): mojibake of
    # e-acute = \u00c3\u00a9, of U+4F60 = \u00e4\u00bd\u00a0
    rows = [
        (1, "caf\u00c3\u00a9"),        # mojibake e-acute -> fixed
        (2, "plain ascii"),              # untouched (round-trips to self)
        (3, "stray \u00c3x"),           # invalid continuation -> untouched
        (4, "already caf\u00e9"),       # real e-acute: byte E9 alone is
        #                                  invalid utf-8 -> kept as-is
        (5, None),                       # null text -> null, 0
        (6, "\u00e4\u00bd\u00a0"),    # mojibake of a 3-byte CJK char
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["fixed"], r["was_fixed"]) for r in fix_mojibake(df).collect()}
    assert got[1] == ("caf\u00e9", 1)
    assert got[2] == ("plain ascii", 0)
    assert got[3] == ("stray \u00c3x", 0)
    assert got[4] == ("already caf\u00e9", 0)
    assert got[5] == (None, 0)
    assert got[6] == ("\u4f60", 1)


def test_pii_luhn_replace_is_boundary_guarded(spark):
    """The redaction fold must respect the same digit boundaries the
    extractor used: a valid card found standalone must NOT also be
    replaced where it appears embedded inside a longer digit run (e.g.
    a 20-digit order number) that the extractor excluded."""
    from data_lake_skyfit_spark.llm.curation import pii_luhn_scan

    valid = "4539148803436467"
    rows = [
        (1, f"pay {valid} order 99{valid}33 end"),
        (2, f"x {valid} y {valid} z"),  # two standalone hits, both redacted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_luhn_scan(df).collect()}
    assert got[1]["n_candidates"] == 1 and got[1]["n_valid"] == 1
    assert got[1]["redacted"] == f"pay [CARD] order 99{valid}33 end"
    assert got[2]["n_valid"] == 2
    assert got[2]["redacted"] == "x [CARD] y [CARD] z"


def test_logistic_vector_assembly_is_arrow_and_bit_exact(spark):
    """The Arrow-optimized assembly must deliver bit-identical sparse
    vectors to a driver-side construction (the useArrow transport may
    not mangle values), and training must be deterministic run-to-run."""
    from pyspark.ml.linalg import Vectors, VectorUDT

    from data_lake_skyfit_spark.llm.classifier import N_BUCKETS

    n = N_BUCKETS

    @F.udf(VectorUDT(), useArrow=True)
    def to_vec(fm):
        items = sorted((int(k), float(v)) for k, v in fm.items())
        return Vectors.sparse(n, [i for i, _ in items], [v for _, v in items])

    rows = [
        (1, {3: 2.0, 7: 1.0, 4090: 5.0}),
        (2, {0: 0.1 + 0.2}),  # non-representable double must survive exactly
        (3, {}),
    ]
    df = spark.createDataFrame(rows, f"id long, fm map<int,double>")
    got = {r["id"]: r["v"] for r in df.select("id", to_vec("fm").alias("v")).collect()}
    for rid, fm in rows:
        items = sorted((int(k), float(v)) for k, v in fm.items())
        want = Vectors.sparse(n, [i for i, _ in items], [v for _, v in items])
        assert got[rid] == want


def test_train_logistic_deterministic_across_runs(spark, clf_task):
    from data_lake_skyfit_spark.llm import classifier

    train, _test, labels = clf_task
    w1, b1 = classifier.train_logistic(train, labels, max_iter=15)
    w2, b2 = classifier.train_logistic(train, labels, max_iter=15)
    assert w1 == w2 and b1 == b2


def test_bigram_surprisal_hand_computed(spark):
    """Stupid-backoff bigram bits on a corpus small enough to verify
    every table cut and every branch by hand."""
    from data_lake_skyfit_spark.llm.text import bigram_surprisal_scores

    rows = [(1, "a b a b c"), (2, "a b x"), (3, "z"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # defaults: everything in-table
    # unigrams a:3 b:3 c:1 x:1 z:1, total 9 -> bl_total 4
    # bigrams 'a b':3 'b a':1 'b c':1 'b x':1; ctx a:3 b:3
    got = {r["doc_id"]: r for r in bigram_surprisal_scores(df).collect()}
    assert (got[1]["n_bigrams"], got[1]["n_backoff"], got[1]["bigram_bits"]) == (4, 0, 2)
    assert (got[2]["n_bigrams"], got[2]["n_backoff"], got[2]["bigram_bits"]) == (2, 0, 1)
    assert (got[3]["n_bigrams"], got[3]["bigram_bits"]) == (0, 0)
    assert (got[4]["n_bigrams"], got[4]["bigram_bits"]) == (0, 0)
    # tight cuts exercise every backoff branch:
    # bigram table {a b, b a} (count desc, key asc), ctx {a},
    # unigrams {a, b, c} -> 'b a' backs off (ctx miss) = 1+(4-2)=3,
    # 'b c' (bigram miss, c in-vocab) = 1+(4-1)=4, 'b x' (OOV) = 1+5=6
    got = {
        r["doc_id"]: r
        for r in bigram_surprisal_scores(
            df, bigram_vocab=2, context_vocab=1, unigram_vocab=3
        ).collect()
    }
    assert (got[1]["n_bigrams"], got[1]["n_backoff"], got[1]["bigram_bits"]) == (4, 2, 7)
    assert (got[2]["n_bigrams"], got[2]["n_backoff"], got[2]["bigram_bits"]) == (2, 1, 6)


def test_trigram_surprisal_hand_computed(spark):
    """Three-tier stupid-backoff trigram bits on a corpus small enough
    to verify every table cut and every tier by hand."""
    from data_lake_skyfit_spark.llm.text import trigram_surprisal_scores

    rows = [(1, "a b c a b c a b c"), (2, "a b c"), (3, "a b"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # defaults: everything in-table. unigrams a:5 b:5 c:4, total 14
    # bigrams 'a b':5 'b c':4 'c a':2; trigrams 'a b c':4 'b c a':2 'c a b':2
    got = {r["doc_id"]: r for r in trigram_surprisal_scores(df).collect()}
    # doc1: 'a b c'x3 direct bl(5)-bl(4)=0; 'b c a'x2 bl(4)-bl(2)=1;
    #       'c a b'x2 bl(2)-bl(2)=0 -> 2 bits, no backoff
    assert (
        got[1]["n_trigrams"], got[1]["n_backoff_bigram"],
        got[1]["n_backoff_unigram"], got[1]["trigram_bits"],
    ) == (7, 0, 0, 2)
    assert (
        got[2]["n_trigrams"], got[2]["trigram_bits"],
    ) == (1, 0)
    assert (got[3]["n_trigrams"], got[3]["trigram_bits"]) == (0, 0)
    assert (got[4]["n_trigrams"], got[4]["trigram_bits"]) == (0, 0)
    # tight cuts exercise every tier: tgt {'a b c'}, ctx2 {'a b'},
    # bgt {'a b','b c'}, ctx {a,b}, uni {a,b}
    got = {
        r["doc_id"]: r
        for r in trigram_surprisal_scores(
            df,
            trigram_vocab=1, context2_vocab=1, bigram_vocab=2,
            context_vocab=2, unigram_vocab=2,
        ).collect()
    }
    # doc1: 'a b c'x3 direct bl(5)-bl(4)=0; 'b c a'x2 -> unigram tier
    # ('c a' not in bgt): 2+(4-3)=3; 'c a b'x2 -> bigram tier
    # ('a b' in bgt, ctx a): 1+3-3=1 -> bits 0+6+2=8
    assert (
        got[1]["n_trigrams"], got[1]["n_backoff_bigram"],
        got[1]["n_backoff_unigram"], got[1]["trigram_bits"],
    ) == (7, 2, 2, 8)
    assert (
        got[2]["n_trigrams"], got[2]["n_backoff_bigram"],
        got[2]["n_backoff_unigram"], got[2]["trigram_bits"],
    ) == (1, 0, 0, 0)


def test_trigram_discriminates_at_equal_bigram_stats(spark):
    """The CCNet-grade pin from the r5 verdict: a doc whose BIGRAM
    multiset is identical to natural text but whose three-word order
    is scrambled must score strictly more trigram bits — the fluency
    gap the bigram tier provably cannot see."""
    from data_lake_skyfit_spark.llm.text import (
        bigram_surprisal_scores,
        trigram_surprisal_scores,
    )

    natural = "a b a c a b a c"
    scrambled = "a b a b a c a c"  # same bigram multiset, new trigrams
    rows = [(i, natural) for i in range(20)] + [(99, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bg = {r["doc_id"]: r["bigram_bits"] for r in bigram_surprisal_scores(df).collect()}
    assert bg[99] == bg[0]  # bigram tier is blind to the scramble
    tg = {r["doc_id"]: r["trigram_bits"] for r in trigram_surprisal_scores(df).collect()}
    assert tg[99] > tg[0]
    assert (tg[0], tg[99]) == (1, 10)  # hand-computed: 42/41/21/20 tables
