"""Text-analysis column expressions for the documents pipeline.

All pure Column expressions (JVM-side, whole-stage-codegen-friendly) —
no Python UDFs in the hot path. Each is designed so an equivalent
ANSI-SQL formulation exists for the DuckDB oracle (see queries/textops.py).

Covers the training-data-pipeline text layer: tokenization, shingles,
quality scoring, language-ID heuristics, token counting and content
fingerprinting over the ``documents`` fixture table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
}

EN_STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, lower-cased: the BPE-ish baseline."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenization, simplified to the engine-portable core:
# letter runs, digit runs, and non-space punctuation runs each count as
# one token (the BPE merge step would only split these further, so this
# is the stable lower bound both Spark and DuckDB can compute with one
# regexp scan).
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex — JVM-side
    ``regexp_count``, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(BPE_ISH_PATTERN))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array.

    ``slice`` + ``array_join`` per window start — measured ~2× faster
    than the per-position ``get`` formulation (one interpreted lambda
    call per shingle instead of ``n``), and identical output: for docs
    shorter than ``n`` tokens the slice is simply short, matching the
    oracle's ``concat_ws``-skips-missing semantics (verified
    element-for-element against the DuckDB formulation on the fixture).

    ``toks`` is :func:`let_bound` before the per-position transform:
    callers pass the ``tokens(text)`` EXPRESSION, and the interpreted
    HOF evaluator would otherwise re-run that split once per shingle
    position — O(doc²) tokenization that every dedup query downstream
    of ``with_shingles`` was silently paying.
    """
    return let_bound(toks, lambda t: _shingles_of(t, n))


def _shingles_of(t: Column, n: int) -> Column:
    # NULL token array -> NULL shingles (plain null propagation).
    # Without the guard, greatest(NULL - k, 1) resolves to 1 (greatest
    # skips NULLs) and a NULL document yields the junk 1-element
    # [NULL] set, which would then participate in dedup grouping.
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))
    )
    return F.when(t.isNotNull(), shingles)


def stopword_count(toks: Column, stopwords: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[^.,;:!?]", "")
    return F.length(stripped)


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / token / punctuation / stopword-ratio quality features
    (the heuristic-filter family used in web-corpus curation)."""
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    n_tok = F.size(t)
    return {
        "n_chars_m": F.length(c),
        "n_tokens": n_tok,
        "avg_token_len": F.round(F.length(c) / F.greatest(n_tok, F.lit(1)), 4),
        "punct_ratio": F.round(punct_count(c) / F.greatest(F.length(c), F.lit(1)), 6),
        "stopword_ratio": F.round(
            stopword_count(t, EN_STOPWORDS) / F.greatest(n_tok, F.lit(1)), 6
        ),
    }


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_count(toks, markers) for lang, markers in LANG_MARKERS.items()}


def gopher_metrics(tk: Column) -> dict[str, Column]:
    """The four STRUCTURAL Gopher document-quality metrics (Rae et al.
    2021 appendix A1.1) over a pre-tokenized array — THE one
    formulation (r10 review: tx14 and pipe4 carried character-level
    copies of these lambdas; a regex or rounding tweak to one would
    silently diverge pipe4's stage-1 survivors from tx14's flags).
    Ratios round to 6 BEFORE thresholding on both engines so no
    boundary ULP divergence can flip a flag. The caller aliases ``tk``
    in its own select (tx6 CollapseProject discipline)."""
    n = F.greatest(F.size(tk), F.lit(1))
    return {
        "n_words": F.size(tk).cast("long"),
        "mean_word_len": F.round(
            F.aggregate(tk, F.lit(0), lambda a, w: a + F.length(w)) / n, 6
        ),
        "symbol_word_ratio": F.round(
            F.size(F.filter(tk, lambda w: w.rlike(r"#|\.\.\."))) / n, 6
        ),
        "alpha_word_frac": F.round(
            F.size(F.filter(tk, lambda w: w.rlike("[a-z]"))) / n, 6
        ),
    }


# Gopher structural-gate THRESHOLDS (Rae et al. 2021 appendix A1.1) —
# the one product constant for the keep/drop policy shared by tx14's
# flags, pipe4's batch gate and pipe5's streaming gate (r12 self-review
# #4: the composed-restart test restated these four ranges verbatim, so
# it would have kept passing against its private copy if the product
# gate drifted; now the test imports the same policy the queries run).
GOPHER_WORD_COUNT_RANGE = (50, 100000)
GOPHER_MEAN_WORD_LEN_RANGE = (3.0, 10.0)
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8


def gopher_structural_rules(
    n_words: Column, mwl: Column, swr: Column, awf: Column
) -> dict[str, Column]:
    """Per-rule boolean Columns of the four structural Gopher gates
    over already-computed :func:`gopher_metrics` outputs. tx14 flags
    each rule individually; the pipelines AND them via
    :func:`gopher_structural_gate`."""
    return {
        "word_count": n_words.between(*GOPHER_WORD_COUNT_RANGE),
        "mean_word_len": mwl.between(*GOPHER_MEAN_WORD_LEN_RANGE),
        "symbol_ratio": swr <= GOPHER_MAX_SYMBOL_WORD_RATIO,
        "alpha_words": awf >= GOPHER_MIN_ALPHA_WORD_FRAC,
    }


def gopher_structural_gate(
    n_words: Column, mwl: Column, swr: Column, awf: Column
) -> Column:
    """The conjunction keep/drop gate pipe4 (batch) and pipe5
    (streaming) run — one Column, map-only."""
    r = gopher_structural_rules(n_words, mwl, swr, awf)
    return (
        r["word_count"] & r["mean_word_len"] & r["symbol_ratio"] & r["alpha_words"]
    )


def gopher_gate_sql(
    n_words: str = "n_tokens",
    mwl: str = "mwl",
    swr: str = "swr",
    awf: str = "awf",
) -> str:
    """The same gate as ANSI-SQL text for the DuckDB oracles — built
    from the identical constants so the two sides cannot drift."""
    return (
        f"{n_words} BETWEEN {GOPHER_WORD_COUNT_RANGE[0]} "
        f"AND {GOPHER_WORD_COUNT_RANGE[1]} "
        f"AND {mwl} BETWEEN {GOPHER_MEAN_WORD_LEN_RANGE[0]} "
        f"AND {GOPHER_MEAN_WORD_LEN_RANGE[1]} "
        f"AND {swr} <= {GOPHER_MAX_SYMBOL_WORD_RATIO} "
        f"AND {awf} >= {GOPHER_MIN_ALPHA_WORD_FRAC}"
    )


# C4 cleaning ruleset (Raffel et al. 2020, §2.2) — the LINE-grain
# sibling of the Gopher document gate above: C4 filters individual
# lines first (terminal punctuation, >= 3 words, no blocklist term),
# then drops documents left with too few lines or containing a
# blocked phrase. The synthetic fixture has no punctuation or
# newlines, so the predicates carry documented stand-ins on the d15
# fixed-width line convention: line grain = C4_LINE_WORDS tokens
# (real corpora swap in split-on-newline), the >=3-words rule becomes
# >= C4_MIN_LINE_WORDS (exercised by each document's short final
# line), the "javascript"/"{" line blocklist becomes the fixture
# token C4_LINE_BLOCK_TOKEN, the >=5-sentences rule keeps its
# constant as C4_MIN_KEPT_LINES, and the "lorem ipsum" phrase
# blocklist becomes the fixture bigram C4_DOC_BLOCK_PHRASE. One
# constant set shared by the Spark plan and the DuckDB oracle (the
# tx14/gopher discipline). C4's fourth pass — dedup of repeated
# spans across documents — is deliberately NOT here: that is d15
# (paragraph_dedup), and the two compose.
C4_LINE_WORDS = 12
C4_MIN_LINE_WORDS = 5
C4_LINE_BLOCK_TOKEN = "slow"
C4_MIN_KEPT_LINES = 5
C4_DOC_BLOCK_PHRASE = "big slow"


def c4_line_clean(df, text_col: str = "text", id_col: str = "doc_id"):
    """C4 line-level cleaning over a documents DataFrame: chunk each
    document into ``C4_LINE_WORDS``-token lines, keep lines that pass
    both line rules (length, blocklist token), evaluate the two
    document rules, and reassemble the surviving text in line order.

    Returns one row per input document: ``(id, n_lines, kept_lines,
    removed_frac, r_min_lines, r_phrase, doc_pass, clean_text)`` with
    the rule flags as 0/1 bigints (tx14's flag convention) and
    ``doc_pass`` their conjunction.

    Scale shape: ENTIRELY map-side — tokenize, one ``transform`` over
    the line index to slice lines, one order-preserving ``filter``,
    one reassembly join; no shuffle, no explode (the line arrays never
    leave their document row), no UDF. Every lambda body touches only
    its bound variable and the pre-aliased token array (the let-bound
    HOF discipline), so nothing O(doc) re-evaluates per line. At
    100 TB this is the same map-only gate class as the Gopher pass:
    its output keep/drop column is what the downstream sample reads.
    """
    k = C4_LINE_WORDS
    toks = df.select(
        id_col,
        tokens(F.col(text_col)).alias("__tk"),
        normalized_text(F.col(text_col)).alias("__norm"),
    )
    lined = toks.select(
        id_col,
        "__norm",
        F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(F.ceil(F.size("__tk") / F.lit(k)), F.lit(1)).cast(
                    "int"
                )
                - 1,
            ),
            lambda i: F.slice("__tk", i * k + 1, k),
        ).alias("__lines"),
    )
    kept = lined.select(
        id_col,
        "__norm",
        F.size("__lines").cast("bigint").alias("n_lines"),
        F.filter(
            "__lines",
            lambda ln: (F.size(ln) >= C4_MIN_LINE_WORDS)
            & ~F.array_contains(ln, C4_LINE_BLOCK_TOKEN),
        ).alias("__kept"),
    )
    kept_n = F.size("__kept").cast("bigint")
    r_min_lines = (kept_n >= C4_MIN_KEPT_LINES).cast("bigint")
    r_phrase = (
        ~F.col("__norm").contains(F.lit(C4_DOC_BLOCK_PHRASE))
    ).cast("bigint")
    return kept.select(
        id_col,
        "n_lines",
        kept_n.alias("kept_lines"),
        F.round(F.lit(1.0) - kept_n / F.col("n_lines"), 6).alias(
            "removed_frac"
        ),
        r_min_lines.alias("r_min_lines"),
        r_phrase.alias("r_phrase"),
        (r_min_lines * r_phrase).alias("doc_pass"),
        F.array_join(
            F.transform("__kept", lambda ln: F.array_join(ln, " ")), " "
        ).alias("clean_text"),
    )


def lang_id_tokens(toks: Column) -> Column:
    """:func:`lang_id` over a PRE-TOKENIZED array — use this form when
    the caller already aliased the token array in its own select (the
    tx6 CollapseProject discipline): lang_id(text) embeds one split
    per marker scan, so a projection computing several token-derived
    columns re-tokenizes every row repeatedly (r10 review: pipe1 paid
    ~7 splits/row)."""
    scores = lang_scores(toks)
    langs = sorted(scores)  # fixed order => deterministic ties
    m = F.greatest(*[scores[lang] for lang in langs])
    # NULL tokens → NULL label (r10 review: with NULL scores every WHEN
    # condition skips, so the otherwise() branch was silently labeling
    # NULL docs as the last language in code order)
    expr = F.when(toks.isNull(), F.lit(None).cast("string")).when(
        m == 0, F.lit("und")
    )
    for lang in langs[:-1]:
        expr = expr.when(scores[lang] == m, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def lang_id(text: Column | str) -> Column:
    """Pick the language whose marker-stopword count is highest;
    deterministic tie-break by language-code order; 'und' when no
    marker hits at all (word-soup docs land here often — fine, the
    oracle computes the identical function); NULL text → NULL label."""
    return lang_id_tokens(tokens(text))


def content_fingerprint(text: Column | str) -> Column:
    """Deterministic whole-document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. Engine-portable (md5 is
    identical in Spark and DuckDB), used for exact-dup detection
    across formatting differences."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def normalized_text(text: Column | str) -> Column:
    """The whitespace-normalized, lower-cased text itself — the string
    :func:`content_fingerprint` hashes. Exposed for callers that need
    fingerprint-DETERMINED attributes (e.g. normalized length): any
    column derived from this expression is constant within a
    fingerprint group, so it survives first-seen dedup
    deterministically. tests/test_multimodal-adjacent pin:
    md5(normalized_text(c)) must stay expression-identical to
    content_fingerprint(c) (the two are kept separate so fingerprint
    consumers' closures do not change; the pytest catches drift)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def let_bound(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``body`` as a bound
    lambda variable — a let-expression for Column trees.

    Spark's higher-order functions run interpreted (never whole-stage
    codegen) and the interpreted evaluator re-evaluates a lambda's
    captured subexpressions on EVERY invocation: referencing an
    O(n)-cost array expression inside a transform over n positions
    silently costs O(n²). ``transform`` over a one-element array
    evaluates its input exactly once and binds it, so the body sees a
    cheap NamedLambdaVariable instead of the whole upstream tree.
    (Diagnosed live: the fused formulation of winnow_fingerprints put
    a full re-tokenization inside every k-gram lambda — jstack showed
    StringSplit per position — and turned a seconds-scale map pass
    into half an hour at sf0.1.)
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def winnow_fingerprints(text: Column | str, k: int = 5, w: int = 4) -> Column:
    """MOSS-style winnowing fingerprint set (Schleimer, Wilkerson &
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003): hash every k-token gram with a portable 48-bit
    md5-derived integer, then keep the MINIMUM hash of every w-window
    of consecutive k-gram hashes, deduplicated.

    Guarantee (the paper's): any shared run of >= w+k-1 consecutive
    tokens between two documents shares at least one fingerprint,
    while only ~2/(w+1) of the k-gram hashes are kept — the rolling-
    hash fingerprinting primitive for plagiarism/copy detection and
    substring-level dedup, as a pure Column expression (array HOFs,
    no UDF; the md5-derived hash keeps it engine-portable for the
    DuckDB oracle, unlike xxhash64).

    This takes-minimum-per-window formulation (rather than the
    paper's pointer-walking loop) is order-free and relational: the
    fingerprint SET is identical, only per-position provenance is
    dropped. The token array and the k-gram hash array are
    :func:`let_bound` so each phase evaluates once per row — O(n·k)
    work per document, not the O(n²) the naive fused expression costs
    under the interpreted HOF evaluator.
    """
    c = F.col(text) if isinstance(text, str) else text

    def window_mins(h: Column) -> Column:
        # NULL hash array -> NULL fingerprints (see _shingles_of)
        widx = F.sequence(F.lit(1), F.greatest(F.size(h) - (w - 1), F.lit(1)))
        return F.when(
            h.isNotNull(),
            F.array_distinct(
                F.transform(widx, lambda j: F.array_min(F.slice(h, j, w)))
            ),
        )

    def kgram_hashes(toks: Column) -> Column:
        kidx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
        hashes = F.transform(
            kidx,
            lambda i: F.conv(
                F.substring(F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 12),
                16,
                10,
            ).cast("long"),
        )
        return F.when(toks.isNotNull(), hashes)

    return let_bound(
        tokens(c), lambda toks: let_bound(kgram_hashes(toks), window_mins)
    )
