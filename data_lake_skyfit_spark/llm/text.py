"""Text-analysis operators for large-scale training-data pipelines.

All expressions are JVM-native (split/regexp/higher-order functions) —
no Python in the hot path, so they run inside whole-stage codegen and
scale linearly with executors. Greenfield relative to the reference
(SURVEY.md §7.5); the string-function surface generalizes the
reference's §2.10 scalar family.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens_expr",
    "let_expr",
    "shingles_expr",
    "spread_small_input",
    "token_count",
    "bpe_ish_token_count",
    "quality_metrics",
    "language_scores",
    "language_scores_trigram",
    "doc_fingerprint",
    "html_to_text",
    "normalize_url",
    "url_host",
    "URL_RE",
    "script_fractions",
    "sentences_expr",
    "SENTENCE_RE",
    "SCRIPT_CLASSES",
    "STOPWORDS",
    "TRIGRAM_PROFILES",
]

# Small per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Deterministic and SQL-portable (used verbatim in oracles).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "los", "se"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"),
}

PUNCT_CLASS = "[.,!?;:]"

#: spread_small_input sizing: enough rows per task that per-task fixed
#: overhead stays small against ~0.1-0.5 ms/row tokenize/shingle work.
_SPREAD_ROWS_PER_TASK = 128

#: Characteristic char trigrams per language (Cavnar–Trenkle-style
#: profile, '_' = space shown here as a real space): high-frequency
#: function-word boundaries and affixes. ASCII-only BY CONSTRUCTION —
#: the scorer normalizes text to [a-z ] first, so profile entries
#: containing anything else could never match. zh follows the pinyin
#: convention of STOPWORDS (tone digits are stripped by normalization).
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", "ing", "ng ",
           " of", "of ", "ion", " to", "to ", "ed ", " in", "in "),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "que",
           " qu", "ue ", "as ", " en", "en ", " se", "ent", "es "),
    "fr": (" le", "le ", " de", "de ", "es ", " la", "la ", "et ",
           " et", "ent", "nt ", " un", "un ", "ion", " pa", "re "),
    "de": (" de", "der", "er ", "ie ", " di", "die", "und", " un",
           "nd ", "ich", "ch ", "ein", " ei", "sch", "en ", "ist"),
    "zh": ("shi", " sh", "zai", " za", "you", " yo", " wo", "wo ",
           " ta", "ta ", " le", "le ", " he", "he ", " de", "de "),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def spread_small_input(
    df: DataFrame, key: str, *, rows_per_task: int | None = None
) -> DataFrame:
    """Hash-repartition a narrow-scan input to the session's default
    parallelism before expensive per-row map work (tokenize / shingle /
    per-seed hashing). The r7d/r9 one-split trap generalized to the
    TEXT tier: a small corpus sits in 1-2 parquet splits, so the whole
    tokenize→explode→partial-agg map side of every text operator runs
    on ONE core (measured r10: the minhash signature stage 2.9 s
    one-split vs 1.4 s spread at sf0.1 on 32 cores). Conditional so it
    is a NO-OP at real scale: when the scan already carries >= the
    cluster's parallelism in splits, no shuffle is added — the 100 TB
    plan stays scan→agg with zero extra exchanges. Hash partitioning by
    the id key is deterministic under task retry (guide §2.5), and the
    shuffled bytes are the raw rows (small corpus by precondition).
    Callers pass scan-rooted frames, so the partition probe is
    planning-only (no exchange to materialize).

    The spread WIDTH follows the row count, not the core count: fanning
    a few-hundred-row frame to full parallelism makes every downstream
    stage of a long pipeline pay ~32 near-empty tasks (measured r10:
    curation_pipeline +1.2 s at width 32; the r9 dedup_audio_envelope
    0.37x regression was the same mechanism). One bounded count job —
    only ever taken on a sub-parallelism scan, i.e. a small input —
    prices the width so ~_ROWS_PER_TASK rows land per task."""
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism, 1)
    existing = df.rdd.getNumPartitions()
    if existing >= n:
        return df
    rows = df.count()
    per_task = rows_per_task or _SPREAD_ROWS_PER_TASK
    width = min(n, max(1, -(-rows // per_task)))
    if width <= existing:
        return df
    return df.repartition(width, key)


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(_c(text), r"\s+"), lambda t: t != "")


def let_expr(value: Column, body) -> Column:
    """Bind `value` once and evaluate `body(var)` against the bound
    variable — a `let` for expression trees.

    Higher-order lambdas are interpreted (no codegen/CSE), so a subtree
    referenced k times inside a transform() is re-evaluated k times per
    row; binding it as a lambda variable evaluates it exactly once.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles_expr(text: Column | str, n: int = 3) -> Column:
    """Distinct n-gram (word shingle) set — the dedup unit for MinHash /
    Jaccard. Built entirely from higher-order functions. The token array
    is let-bound so the split happens once per row, not once per
    element_at."""

    def body(w: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
        parts = lambda i: [F.element_at(w, i + j) for j in range(n)]  # noqa: E731
        grams = F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", *parts(i))))
        # sequence(1, stop<1) yields a DESCENDING sequence, not empty —
        # guard short documents explicitly.
        return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))

    return let_expr(tokens_expr(text), body)


def token_count(text: Column | str) -> Column:
    return F.size(tokens_expr(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword count: alpha runs, digit runs, and isolated
    symbols each count as one token (regex identical in Java and RE2)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scores: length, token stats, type-token
    ratio, stopword ratio, punctuation density. Ratios are exact-integer
    divisions rounded to 4 — deterministic across engines."""
    t = _c(text_col)
    en = F.array([F.lit(s) for s in STOPWORDS["en"]])
    # Stage the token array as a real column: every metric reads the
    # attribute instead of re-splitting the text (CollapseProject keeps
    # multi-referenced non-cheap projections separate).
    staged = df.select(
        F.col(id_col),
        t.alias("__t"),
        tokens_expr(text_col).alias("__w"),
    )
    t, w = F.col("__t"), F.col("__w")
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(en, x)))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return staged.select(
        F.col(id_col),
        F.length(t).cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("int").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(w)) / n_tokens, 4).alias("type_token_ratio"),
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        n_punct.cast("int").alias("n_punct"),
        F.round(
            (F.length(t) / n_tokens), 4
        ).alias("avg_token_span"),
    )


def language_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID. Emits per-language hit counts and the
    argmax prediction (ties broken by language code order, making the
    result deterministic)."""
    # Stage tokens, then hit counts, as materialized columns — the CASE
    # chain references each hit count ~3×; attribute refs make that free.
    staged = df.select(F.col(id_col), tokens_expr(text_col).alias("__w"))
    langs = sorted(STOPWORDS)
    hit_exprs = []
    for lang in langs:
        arr = F.array([F.lit(s) for s in STOPWORDS[lang]])
        hit_exprs.append(
            F.size(F.filter(F.col("__w"), lambda x: F.array_contains(arr, x)))
            .cast("int")
            .alias(f"hits_{lang}")
        )
    hits_df = staged.select(F.col(id_col), *hit_exprs)
    hit_cols = [(lang, F.col(f"hits_{lang}")) for lang in langs]
    best = F.greatest(*[h for _, h in hit_cols])
    pred = F.lit("und")
    # First language (in sorted order) achieving the max wins: build the
    # CASE from last to first so earlier langs take precedence.
    for lang, hits in reversed(hit_cols):
        pred = F.when(hits == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return hits_df.select(
        F.col(id_col),
        *[F.col(f"hits_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def language_scores_trigram(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Char-trigram profile language ID (Cavnar & Trenkle 1994 shape) —
    the VERDICT-r3 #7 upgrade over `language_scores`: robust on short or
    stopword-free text, since affix/boundary trigrams ('ing', ' th',
    'sch') fire on CONTENT words, not only function words.

    Engine-deterministic by construction, so the battery oracle is
    exact: text normalizes to lowercase [a-z ] (ASCII regex, identical
    semantics both engines) with a space sentinel on each end; each
    profile trigram is counted with the replace-based occurrence count
    (LENGTH(t) − LENGTH(REPLACE(t, g, ''))) / 3 — leftmost
    NON-OVERLAPPING occurrences, the convention Spark `replace` and
    DuckDB REPLACE share; per language the score is the cosine between
    the doc's integer count vector over that language's 16 profile
    coordinates and the binary profile vector: Σc / (√Σc² · √16) — one
    correctly-rounded sqrt/division chain that both engines reproduce
    bit-for-bit (no ROUND of doubles anywhere). Zero shuffle: the whole
    operator is a codegen'd scalar map, scan-speed at 100 TB.

    Output: (id, score_<lang>... DOUBLE, predicted_lang) — argmax with
    language-code tie-break, 'und' when no profile trigram fires."""
    langs = sorted(TRIGRAM_PROFILES)
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.coalesce(_c(text_col), F.lit(""))), "[^a-z ]", " "),
        F.lit(" "),
    )
    grams = sorted({g for p in TRIGRAM_PROFILES.values() for g in p})
    gcol = {g: f"__g{i}" for i, g in enumerate(grams)}
    # 64 full-text replace() allocations per row: real map work, spread
    # off the one-split scan (no-op at real scale).
    staged = spread_small_input(df, id_col).select(F.col(id_col), norm.alias("__t"))
    # F.expr strings (one py4j round trip per gram instead of ~6 Column
    # API calls — the r9 build-time lever); grams are [a-z ] only, so
    # the single-quoted SQL literal needs no escaping. `/` is double
    # division and CAST AS BIGINT truncates exactly like .cast("long"),
    # so values are unchanged. regexp_count was also measured as an
    # alternative to the replace-based count (same leftmost
    # non-overlapping convention): 1.10 s vs 1.02 s min-of-3 — replace
    # stays.
    # The raw f-string interpolation below is only safe while profile
    # grams stay inside [a-z ] — a quote or backslash in a future
    # profile entry would break (or silently change) the parsed SQL.
    assert all(c.islower() or c == " " for g in grams for c in g), (
        "TRIGRAM_PROFILES grams must be [a-z ] — escape before widening"
    )
    counts = staged.select(
        F.col(id_col),
        *[
            F.expr(
                f"CAST((length(__t) - length(replace(__t, '{g}'))) / 3 "
                f"AS BIGINT) AS {gcol[g]}"
            )
            for g in grams
        ],
    )
    score_exprs = []
    for lang in langs:
        prof = TRIGRAM_PROFILES[lang]
        dot = reduce(add, [F.col(gcol[g]) for g in prof])
        ssq = reduce(add, [F.col(gcol[g]) * F.col(gcol[g]) for g in prof])
        score = F.when(dot == 0, F.lit(0.0)).otherwise(
            dot / (F.sqrt(ssq) * F.sqrt(F.lit(len(prof))))
        )
        score_exprs.append(score.alias(f"score_{lang}"))
    scored = counts.select(F.col(id_col), *score_exprs)
    score_cols = [(lang, F.col(f"score_{lang}")) for lang in langs]
    best = F.greatest(*[s for _, s in score_cols])
    pred = F.lit("und")
    for lang, s in reversed(score_cols):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.select(
        F.col(id_col),
        *[F.col(f"score_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def doc_fingerprint(text: Column | str, prefix_tokens: int = 8) -> Column:
    """Content fingerprint: md5 of the normalized text prefix — the
    cheap first-pass grouping key for exact/near dedup at scale."""
    w = tokens_expr(F.lower(F.trim(_c(text))))
    head = F.slice(w, 1, prefix_tokens)
    return F.md5(F.concat_ws(" ", head))


# Entity decode order matters twice: entities decode AFTER tag
# stripping (so '&lt;script&gt;' never becomes a live tag) and '&amp;'
# decodes LAST (so the double-escape '&amp;lt;' correctly yields the
# literal '&lt;', not '<').
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


#: Sentence-shaped runs: text up to and including a terminator group,
#: plus a trailing unterminated fragment. Deliberately NO lookarounds —
#: RE2 has none, so the oracle replays the pattern verbatim. Known
#: naivety (documented): abbreviations ("Dr.") and decimal points
#: split; the rule-based tier trades that for engine portability.
SENTENCE_RE = r"[^.!?]+[.!?]+|[^.!?]+$"


def sentences_expr(text: Column | str) -> Column:
    """Rule-based sentence segmentation → trimmed non-empty sentence
    array: the unit for sentence-level dedup and sentence-aware
    chunking (a training sequence should not split mid-sentence when
    it can help it). Zero-shuffle codegen map."""
    runs = F.regexp_extract_all(_c(text), F.lit(SENTENCE_RE), 0)
    # explicit single-arg lambda: F.trim itself has an optional second
    # parameter in Spark 4, so passing it bare trips the HOF
    # arity-sniffing trap (binds as an (element, index) lambda and the
    # trim silently no-ops — caught by test_sentences_expr_semantics).
    return F.filter(F.transform(runs, lambda s: F.trim(s)), lambda s: s != "")


#: Literal-character ranges (written as \uXXXX escapes in source per
#: the r4c fixture rule) — literal chars inside a class mean the same
#: thing to Java regex and RE2, so Spark and the DuckDB oracles share
#: these strings VERBATIM (unlike \p{script} classes, whose spelling
#: differs between the engines). Latin splits around U+00D7/U+00F7
#: (multiplication/division signs are not letters).
SCRIPT_CLASSES: dict[str, str] = {
    "arabic": "[؀-ۿ]",
    "cjk": "[一-鿿぀-ヿ]",
    "cyrillic": "[Ѐ-ӿ]",
    "digit": "[0-9]",
    "greek": "[Ͱ-Ͽ]",
    "latin": "[A-Za-zÀ-ÖØ-öø-ɏ]",
}


def script_fractions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode-script composition — the multilingual
    curation signal that catches mixed-script spam, mojibake and
    wrong-language contamination before the language-ID tier commits
    to one label. Counts per script class via length-difference after
    class removal (zero-shuffle codegen map, one regexp per class),
    fractions rounded to 4, dominant script = argmax over the letter
    scripts (digits excluded) with name-asc tie-break, 'other' when no
    letter script hits."""
    staged = df.select(F.col(id_col), _c(text_col).alias("__t"))
    t = F.col("__t")
    names = sorted(SCRIPT_CLASSES)
    counts = staged.select(
        F.col(id_col),
        F.length(t).cast("int").alias("n_chars"),
        *[
            (F.length(t) - F.length(F.regexp_replace(t, SCRIPT_CLASSES[n], "")))
            .cast("int")
            .alias(f"n_{n}")
            for n in names
        ],
    )
    letter_scripts = [n for n in names if n != "digit"]
    best = F.greatest(*[F.col(f"n_{n}") for n in letter_scripts])
    dom = F.lit("other")
    for n in reversed(letter_scripts):
        dom = F.when(F.col(f"n_{n}") == best, F.lit(n)).otherwise(dom)
    dom = F.when(best > 0, dom).otherwise(F.lit("other"))
    denom = F.greatest(F.col("n_chars"), F.lit(1))
    return counts.select(
        F.col(id_col),
        F.col("n_chars"),
        *[F.col(f"n_{n}") for n in names],
        *[F.round(F.col(f"n_{n}") / denom, 4).alias(f"frac_{n}") for n in names],
        dom.alias("dominant_script"),
    )


#: One authority-splitting regex shared verbatim by Java and RE2 (and
#: the battery oracles): scheme :// authority rest. Both engines return
#: '' from group extraction on no match, which is the passthrough test.
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"


def normalize_url(url: Column | str) -> Column:
    """Canonical URL form — the crawl-frontier / URL-level-dedup key of
    a web pipeline (two spellings of one page must collide BEFORE
    fetch, or the corpus pays for the duplicate download and the dedup
    tier pays again later): lowercase scheme+authority, strip the
    fragment, drop default ports (http:80 / https:443), collapse a
    bare '/' path to ''. Non-URL strings pass through trimmed. Pure
    zero-shuffle JVM chain; every regex is Java/RE2-shared so the
    oracle replays it verbatim."""
    u = F.trim(_c(url))
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    host0 = F.lower(F.regexp_extract(u, URL_RE, 2))
    host = (
        F.when(scheme == "http", F.regexp_replace(host0, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host0, ":443$", ""))
        .otherwise(host0)
    )
    rest0 = F.regexp_replace(F.regexp_extract(u, URL_RE, 3), "#.*$", "")
    rest = F.when(rest0 == "/", F.lit("")).otherwise(rest0)
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def url_host(url: Column | str) -> Column:
    """Lowercased authority of a normalized URL ('' for non-URLs) —
    the per-domain grouping key for crawl caps and blocklist joins."""
    return F.lower(F.regexp_extract(normalize_url(url), URL_RE, 2))


def html_to_text(html: Column | str) -> Column:
    """HTML → visible text extraction: the step between WARC ingestion
    and curation in a web-corpus pipeline. Drops <script>/<style>
    blocks and comments, strips remaining tags, decodes the core named
    entities, collapses whitespace. A pure JVM regexp/replace chain
    (zero-shuffle codegen map, like every op in this module) that is
    expressible verbatim in RE2/DuckDB — deliberately NO backreferences
    (RE2 has none, so script and style get separate patterns) and no
    replacement-string metacharacters. Attribute values containing a
    raw '>' are out of scope (documented limit of regex-tier
    extraction; a DOM tier would be a Pandas-UDF kernel)."""
    c = _c(html)
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def word_surprisal_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1024,
) -> DataFrame:
    """CCNet-style LM quality prior, INTEGER-EXACT tier: per-document
    word surprisal in whole bits against the corpus's own unigram
    frequency table.

    CCNet/LLaMA pipelines rank documents by language-model perplexity
    and keep the fluent tail. The trained-float version of that signal
    lives in `unigram.apply_unigram` (Viterbi pieces_logp over the
    SentencePiece-style model — libm log, so pytest-pinned); this tier
    is its hash-comparable integer sibling: surprisal(word) =
    bitlen(total_tokens) − bitlen(count(word)) — i.e. ⌊log2⌋ self-
    information — computed via BINARY-STRING LENGTH (Spark conv(n,10,2)
    / DuckDB bin(n)), never libm log2, so every value is engine-exact.
    Out-of-vocabulary words (past the top-`vocab_size`) pay
    bitlen(total)+1 bits, one more than the rarest possible in-vocab
    word.

    Scale: one token-count shuffle builds the frequency table; the
    top-`vocab_size` cut (count desc, word asc — a total order, so the
    cut is deterministic) bounds the table regardless of corpus size,
    and it joins back BROADCAST, so scoring re-shuffles only the
    (doc_id, token) explosion for its per-doc sum. The two corpus-wide
    scalars (total tokens) ride the established broadcast-single-row
    cross join (curation.py's pattern). Output: (id, n_words, n_oov,
    surprisal_bits) — all BIGINT, zero-filled for wordless documents.
    """
    # No input spread here: the unigram tier's map side is one light
    # explode — measured r10 (same-session A/B) the spread's count job
    # + exchange cost MORE than the 1-core map it parallelized
    # (0.98 -> 1.21 s). The heavier trigram tier keeps it.
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("w")
    ).localCheckpoint(eager=False)
    bitlen = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731
    total = toks.agg(
        bitlen(F.count(F.lit(1))).cast("long").alias("_bl_total")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w", bitlen(F.col("_n")).cast("long").alias("_bl_w"))
    )
    scored = (
        toks.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.when(F.col("_bl_w").isNull(), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("_oov"),
            F.coalesce(
                F.col("_bl_total") - F.col("_bl_w"), F.col("_bl_total") + 1
            ).alias("_bits"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_oov").alias("n_oov"),
            F.sum("_bits").alias("surprisal_bits"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce("n_oov", zero).alias("n_oov"),
            F.coalesce("surprisal_bits", zero).alias("surprisal_bits"),
        )
    )


def bigram_surprisal_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigram_vocab: int = 2048,
    context_vocab: int = 1024,
    unigram_vocab: int = 1024,
) -> DataFrame:
    """STUPID-BACKOFF bigram LM quality prior (Brants et al. 2007, the
    web-scale LM that skips normalization), integer-exact tier — one
    model order up from `word_surprisal_scores`: a document's fluency
    is judged by its word-to-word TRANSITIONS, which catches shuffled
    or templated text that unigram frequency cannot (every word common,
    every transition absurd).

    Per bigram (w1, w2): when the bigram is inside the top-`bigram_vocab`
    table AND its context w1 inside the top-`context_vocab` table,
    bits = bitlen(count(w1 ·)) − bitlen(count(w1 w2)) — the ⌊log2⌋
    conditional self-information, non-negative since the context count
    dominates its bigrams. Otherwise back off to the unigram tier at a
    ONE-BIT penalty (stupid backoff's α as an exact power of two:
    α = 1/2 ⇒ +1 bit — no float anywhere): 1 + (bitlen(total) −
    bitlen(count(w2))), OOV paying bitlen(total) + 1 as in the unigram
    tier. All bit-lengths via BINARY-STRING LENGTH (Spark conv(n,10,2)
    / DuckDB bin(n)) — never libm log2, so every value hash-compares.

    Scale: bigrams come from the token ARRAY (a zip_with over two
    staged slices, exploded — no positional self-join, and no array
    column carried through the Generate, so the exploded rows are one
    short string each); all three model tables are
    deterministic bounded cuts (count desc, key asc) that join back
    BROADCAST; the only corpus-sized exchanges are the two counting
    aggregations and the per-doc sum. Output: (id, n_bigrams,
    n_backoff, bigram_bits), zero-filled for docs with < 2 tokens."""
    # No input spread (r10 same-session A/B: 1.58 -> 1.83 s — the
    # bigram tier's map side is too light to pay the count+exchange).
    arr = df.select(
        F.col(id_col), tokens_expr(text_col).alias("_arr")
    ).localCheckpoint(eager=False)  # feeds unigram counts AND bigrams
    bitlen = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731

    toks = arr.select(id_col, F.explode("_arr").alias("w"))
    total = toks.agg(bitlen(F.count(F.lit(1))).cast("long").alias("_bl_total"))
    uni = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("w").asc())
        .limit(unigram_vocab)
        .select(F.col("w").alias("_w2"), bitlen(F.col("_n")).cast("long").alias("_bl_w"))
    )
    size = F.size("_arr")
    bg = (
        arr.filter(size >= 2)
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_arr", 1, size - 1),
                    F.slice("_arr", 2, size - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("_bg"),
        )
        # tokens are \\s+-split, so the single space splits back exactly
        .withColumn("_w1", F.substring_index("_bg", " ", 1))
        .withColumn("_w2", F.substring_index("_bg", " ", -1))
        .localCheckpoint(eager=False)  # feeds both tables AND scoring
    )
    bgt = (
        bg.groupBy("_bg")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_bg").asc())
        .limit(bigram_vocab)
        .select("_bg", bitlen(F.col("_n")).cast("long").alias("_bl_big"))
    )
    ctx = (
        bg.groupBy("_w1")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_w1").asc())
        .limit(context_vocab)
        .select("_w1", bitlen(F.col("_n")).cast("long").alias("_bl_ctx"))
    )
    direct = F.col("_bl_big").isNotNull() & F.col("_bl_ctx").isNotNull()
    scored = (
        bg.join(F.broadcast(bgt), "_bg", "left")
        .join(F.broadcast(ctx), "_w1", "left")
        .join(F.broadcast(uni), "_w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.when(direct, F.lit(0).cast("long")).otherwise(F.lit(1)).alias("_backoff"),
            F.when(direct, F.col("_bl_ctx") - F.col("_bl_big"))
            .otherwise(
                F.lit(1)
                + F.coalesce(
                    F.col("_bl_total") - F.col("_bl_w"), F.col("_bl_total") + 1
                )
            )
            .alias("_bits"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_backoff").alias("n_backoff"),
            F.sum("_bits").alias("bigram_bits"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", zero).alias("n_bigrams"),
            F.coalesce("n_backoff", zero).alias("n_backoff"),
            F.coalesce("bigram_bits", zero).alias("bigram_bits"),
        )
    )


def trigram_surprisal_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigram_vocab: int = 2048,
    context2_vocab: int = 1024,
    bigram_vocab: int = 2048,
    context_vocab: int = 1024,
    unigram_vocab: int = 1024,
) -> DataFrame:
    """STUPID-BACKOFF trigram LM quality prior — one model order above
    `bigram_surprisal_scores` (same Brants et al. 2007 unnormalized
    design, same integer-exact bit arithmetic). CCNet-grade fluency:
    text whose every BIGRAM is natural but whose three-word phrases
    are scrambled scores worse than natural prose at EQUAL bigram
    statistics (pinned in tests with a bigram-multiset-preserving
    shuffle).

    Per trigram (w1 w2 w3), the three-tier backoff chain — each level
    down pays stupid backoff's alpha = 1/2 as exactly one bit:
    1. direct:   trigram in the top-`trigram_vocab` table AND its
       (w1 w2) context in the top-`context2_vocab` bigram table →
       bits = bitlen(count(w1 w2)) − bitlen(count(w1 w2 w3)).
       Non-negative: every trigram occurrence contributes a (w1 w2)
       bigram occurrence, so the context count dominates.
    2. bigram (+1 bit): (w2 w3) in the top-`bigram_vocab` table AND
       w2 in the top-`context_vocab` table →
       bits = 1 + bitlen(count(w2 ·)) − bitlen(count(w2 w3)).
    3. unigram (+2 bits): 2 + (bitlen(total) − bitlen(count(w3))),
       OOV paying bitlen(total) + 1 as in the unigram tier.
    All bit-lengths via binary-string length (conv(n,10,2) / DuckDB
    bin(n)) — never libm log2, so every value hash-compares.

    Scale: trigrams come from a zip_with compose over three staged
    token-array slices (no positional self-join; exploded rows are one
    short string each); all five model tables are deterministic
    bounded cuts (count desc, key asc) that join back BROADCAST; the
    only corpus-sized exchanges are the counting aggregations and the
    per-doc sum. Output: (id, n_trigrams, n_backoff_bigram,
    n_backoff_unigram, trigram_bits), zero-filled for docs with < 3
    tokens."""
    arr = spread_small_input(df, id_col).select(
        F.col(id_col), tokens_expr(text_col).alias("_arr")
    ).localCheckpoint(eager=False)  # feeds unigram, bigram AND trigram streams
    bitlen = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731

    toks = arr.select(id_col, F.explode("_arr").alias("w"))
    total = toks.agg(bitlen(F.count(F.lit(1))).cast("long").alias("_bl_total"))
    uni = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("w").asc())
        .limit(unigram_vocab)
        .select(F.col("w").alias("_w3"), bitlen(F.col("_n")).cast("long").alias("_bl_w"))
    )
    size = F.size("_arr")
    bg = (
        arr.filter(size >= 2)
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_arr", 1, size - 1),
                    F.slice("_arr", 2, size - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("_bg"),
        )
        .withColumn("_w1", F.substring_index("_bg", " ", 1))
        .localCheckpoint(eager=False)  # feeds bigram counts, ctx2 AND ctx
    )
    bgc = bg.groupBy("_bg").agg(F.count(F.lit(1)).alias("_n")).localCheckpoint(
        eager=False  # two cuts below share one counting exchange
    )
    bgt = (
        bgc.orderBy(F.col("_n").desc(), F.col("_bg").asc())
        .limit(bigram_vocab)
        .select(F.col("_bg").alias("_w2w3"), bitlen(F.col("_n")).cast("long").alias("_bl_big"))
    )
    ctx2 = (
        bgc.orderBy(F.col("_n").desc(), F.col("_bg").asc())
        .limit(context2_vocab)
        .select(F.col("_bg").alias("_w1w2"), bitlen(F.col("_n")).cast("long").alias("_bl_ctx2"))
    )
    ctx = (
        bg.groupBy("_w1")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_w1").asc())
        .limit(context_vocab)
        .select(F.col("_w1").alias("_w2"), bitlen(F.col("_n")).cast("long").alias("_bl_ctx"))
    )
    tg = (
        arr.filter(size >= 3)
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_arr", 1, size - 2),
                    F.zip_with(
                        F.slice("_arr", 2, size - 2),
                        F.slice("_arr", 3, size - 2),
                        lambda a, b: F.concat_ws(" ", a, b),
                    ),
                    lambda a, bc: F.concat_ws(" ", a, bc),
                )
            ).alias("_tg"),
        )
        # tokens are \s+-split so single spaces split back exactly
        .withColumn("_w1w2", F.substring_index("_tg", " ", 2))
        .withColumn("_w2w3", F.substring_index("_tg", " ", -2))
        .withColumn("_w2", F.substring_index(F.col("_w2w3"), " ", 1))
        .withColumn("_w3", F.substring_index("_tg", " ", -1))
    )
    tgt = (
        tg.groupBy("_tg")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_tg").asc())
        .limit(trigram_vocab)
        .select("_tg", bitlen(F.col("_n")).cast("long").alias("_bl_tri"))
    )
    direct = F.col("_bl_tri").isNotNull() & F.col("_bl_ctx2").isNotNull()
    big_tier = F.col("_bl_big").isNotNull() & F.col("_bl_ctx").isNotNull()
    scored = (
        tg.join(F.broadcast(tgt), "_tg", "left")
        .join(F.broadcast(ctx2), "_w1w2", "left")
        .join(F.broadcast(bgt), "_w2w3", "left")
        .join(F.broadcast(ctx), "_w2", "left")
        .join(F.broadcast(uni), "_w3", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.when(direct, F.lit(0))
            .when(big_tier, F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            .alias("_tier"),
            F.when(direct, F.col("_bl_ctx2") - F.col("_bl_tri"))
            .when(big_tier, F.lit(1) + F.col("_bl_ctx") - F.col("_bl_big"))
            .otherwise(
                F.lit(2)
                + F.coalesce(
                    F.col("_bl_total") - F.col("_bl_w"), F.col("_bl_total") + 1
                )
            )
            .alias("_bits"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum((F.col("_tier") == 1).cast("long")).alias("n_backoff_bigram"),
            F.sum((F.col("_tier") == 2).cast("long")).alias("n_backoff_unigram"),
            F.sum("_bits").alias("trigram_bits"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", zero).alias("n_trigrams"),
            F.coalesce("n_backoff_bigram", zero).alias("n_backoff_bigram"),
            F.coalesce("n_backoff_unigram", zero).alias("n_backoff_unigram"),
            F.coalesce("trigram_bits", zero).alias("trigram_bits"),
        )
    )


def fix_mojibake(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repair the classic double-encoding mojibake (UTF-8 bytes that
    were mis-read as Latin-1 — 'caf\\u00c3\\u00a9' for 'caf\\u00e9'):
    a document is fixed iff EVERY character is a Latin-1 code point
    AND re-reading those bytes as UTF-8 succeeds AND changes the text
    — the strict ftfy-style round-trip, so a stray '\\u00c3' followed
    by an invalid continuation byte never triggers a rewrite (repair
    must be provably reversible, never heuristic damage). Pure-ASCII
    documents round-trip to themselves and stay untouched.

    Returns (id, fixed, was_fixed). Arrow-batched mapInPandas — the
    str.encode/decode pair is exact and deterministic, so the output
    is engine-reproducible (oracles build both sides from chr()
    arithmetic, never non-ASCII literals — the r4c escape rule). Zero
    shuffles; a corpus map like pii_scan at 100 TB."""
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("fixed", T.StringType()),
            T.StructField("was_fixed", T.IntegerType()),
        ]
    )

    def kernel(batches):
        def one(s: str | None) -> tuple[str | None, int]:
            if s is None:
                return None, 0
            try:
                d = s.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return s, 0
            return (d, 1) if d != s else (s, 0)

        for pdf in batches:
            fixed = [one(s) for s in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fixed": [f[0] for f in fixed],
                    "was_fixed": pd.array([f[1] for f in fixed], dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
