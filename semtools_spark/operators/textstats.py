"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM expressions (split / regexp / aggregate) — whole-stage
codegen, no Python, and every output is an integer or string so the
DuckDB oracle comparison is bit-exact. Each builder has a matching
*_sql_duckdb renderer used by __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-ratio heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (BIGINT; 0 for empty)."""
    return (
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("long")
    )


def token_count_sql_duckdb(text_expr: str = "text") -> str:
    return (
        f"CAST(CASE WHEN length(trim({text_expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+')) END AS BIGINT)"
    )


def stopword_hits(text_col: str, lang: str) -> Column:
    words = LANG_MARKERS[lang]
    arr = f"split(trim({text_col}), '\\\\s+')"
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter({arr}, t -> t IN ({lst})))"
    ).cast("long")


def lang_id_expr(text_col: str = "text") -> Column:
    """Pick the language whose marker-word hit count is highest
    (ties → lexicographic language code; 'und' when no marker hits)."""
    scored = [
        F.struct(stopword_hits(text_col, lang).alias("hits"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ]
    # max over structs orders by hits then lang; invert lang order so that
    # ties resolve to the lexicographically *smallest* code
    best = F.greatest(*[
        F.struct(s.hits.alias("hits"), F.lit(-i).alias("ord"), s.lang.alias("lang"))
        for i, s in enumerate(scored)
    ])
    return F.when(best.hits > 0, best.lang).otherwise(F.lit("und"))


def lang_id_sql_duckdb(text_expr: str = "text") -> str:
    arr = f"regexp_split_to_array(trim({text_expr}), '\\s+')"
    cases = []
    for i, lang in enumerate(sorted(LANG_MARKERS)):
        lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        hits = f"len(list_filter({arr}, t -> t IN ({lst})))"
        cases.append(f"({hits}, {-i}, '{lang}')")
    rows = ", ".join(f"{c}" for c in cases)
    return (
        f"(SELECT CASE WHEN max(s)[1] > 0 THEN max(s)[3] ELSE 'und' END "
        f"FROM (SELECT unnest([{rows}]) AS s))"
    )


def quality_score_milli(text_col: str = "text") -> Column:
    """Integer quality score in [0, 1000]: mean of three simple signals —
    length band (50..2000 chars), alpha-token ratio, mean-word-length band
    (3..12). Deterministic integer arithmetic only."""
    n_chars = F.length(F.col(text_col))
    arr = f"split(trim({text_col}), '\\\\s+')"
    n_tok = token_count(text_col)
    alpha = F.expr(f"size(filter({arr}, t -> t rlike '^[A-Za-z]+$'))").cast("long")
    len_ok = F.when((n_chars >= 50) & (n_chars <= 2000), 1000).otherwise(0)
    alpha_ratio = F.when(n_tok > 0, (alpha * 1000) / n_tok).otherwise(F.lit(0))
    mean_wl = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0))
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), 1000).otherwise(0)
    return ((len_ok + F.floor(alpha_ratio) + wl_ok) / 3).cast("long")


def quality_score_sql_duckdb(text_expr: str = "text") -> str:
    arr = f"regexp_split_to_array(trim({text_expr}), '\\s+')"
    n_tok = token_count_sql_duckdb(text_expr)
    n_chars = f"length({text_expr})"
    alpha = f"len(list_filter({arr}, t -> regexp_matches(t, '^[A-Za-z]+$')))"
    len_ok = f"CASE WHEN {n_chars} BETWEEN 50 AND 2000 THEN 1000 ELSE 0 END"
    alpha_ratio = f"CASE WHEN {n_tok} > 0 THEN floor(({alpha} * 1000.0) / {n_tok}) ELSE 0 END"
    mean_wl = f"CASE WHEN {n_tok} > 0 THEN ({n_chars} - ({n_tok} - 1.0)) / {n_tok} ELSE 0 END"
    wl_ok = f"CASE WHEN {mean_wl} BETWEEN 3 AND 12 THEN 1000 ELSE 0 END"
    return f"CAST(floor((({len_ok}) + ({alpha_ratio}) + ({wl_ok})) / 3.0) AS BIGINT)"


def fingerprint64(text_col: str = "text") -> Column:
    """Order-invariant document fingerprint: sum of md5-derived 32-bit
    token hashes of the *distinct* token set, mod 2^31−1. Shared exactly
    with DuckDB (rolling-hash analog of the reference's content keys)."""
    arr = f"array_distinct(split(trim({text_col}), '\\\\s+'))"
    return F.expr(
        f"aggregate({arr}, 0L, (acc, t) -> "
        f"(acc + conv(substring(md5(t), 1, 8), 16, 10)) % 2147483647L)"
    )


def fingerprint64_sql_duckdb(text_expr: str = "text") -> str:
    arr = f"list_distinct(regexp_split_to_array(trim({text_expr}), '\\s+'))"
    return (
        f"list_sum(list_transform({arr}, "
        f"t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % 2147483647)) % 2147483647"
    )


# ---------------------------------------------------------------------------
# repetition signals (round 6) — the within-document duplication filters of
# the public web-corpus literature (Rae et al., "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", 2021, §A1.1 repetition
# rules; Penedo et al., "The RefinedWeb Dataset", 2023). All integer milli
# fractions, floor()ed on both engines, pure codegen.
# ---------------------------------------------------------------------------

def dup_token_frac_milli(text_col: str = "text") -> Column:
    """1000 × (fraction of tokens that repeat an earlier token): a
    boilerplate / keyword-stuffing signal. 0 for empty docs."""
    arr = f"split(trim({text_col}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN length(trim({text_col})) = 0 THEN 0L ELSE "
        f"FLOOR(1000 * (size({arr}) - size(array_distinct({arr}))) / size({arr})) END"
    ).cast("long")


def dup_token_frac_sql_duckdb(text_expr: str = "text") -> str:
    arr = f"regexp_split_to_array(trim({text_expr}), '\\s+')"
    return (
        f"CAST(CASE WHEN length(trim({text_expr})) = 0 THEN 0 ELSE "
        f"floor(1000.0 * (len({arr}) - len(list_distinct({arr}))) / len({arr})) "
        f"END AS BIGINT)"
    )


def top_token_frac_milli(text_col: str = "text") -> Column:
    """1000 × (fraction of tokens equal to the single most frequent
    token) — Gopher's most-common-word rule. O(n log n) per doc:
    array_sort then a single aggregate() pass tracking the longest
    adjacent run (equal tokens are adjacent after the sort), all
    inside codegen (no shuffle, no UDF). The earlier
    transform(array_distinct(...), t -> size(filter(...))) shape was
    O(distinct × n) — ~10^10 comparisons in ONE task for a 100k-token
    mostly-distinct doc, a straggler generator at corpus scale."""
    arr = f"split(trim({text_col}), '\\\\s+')"
    run = "IF(t <=> a.prev, a.run + 1L, 1L)"
    top = (
        f"aggregate(array_sort({arr}), "
        f"named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        f"(a, t) -> named_struct('prev', t, 'run', {run}, "
        f"'best', GREATEST(a.best, {run})), "
        f"a -> a.best)"
    )
    return F.expr(
        f"CASE WHEN length(trim({text_col})) = 0 THEN 0L ELSE "
        f"FLOOR(1000 * {top} / size({arr})) END"
    ).cast("long")


def top_token_frac_sql_duckdb(text_expr: str = "text") -> str:
    arr = f"regexp_split_to_array(trim({text_expr}), '\\s+')"
    top = (
        f"list_max(list_transform(list_distinct({arr}), "
        f"t -> len(list_filter({arr}, x -> x = t))))"
    )
    return (
        f"CAST(CASE WHEN length(trim({text_expr})) = 0 THEN 0 ELSE "
        f"floor(1000.0 * {top} / len({arr})) END AS BIGINT)"
    )


def dup_bigram_frac_milli(text_col: str = "text") -> Column:
    """1000 × (fraction of word 2-grams that repeat an earlier 2-gram) —
    the top-n-gram duplication rule; catches templated/spun text whose
    token-level duplication looks normal. 0 for docs under 2 tokens."""
    arr = f"split(trim({text_col}), '\\\\s+')"
    bi = (
        f"transform(sequence(1, size({arr}) - 1), "
        f"i -> concat(element_at({arr}, i), ' ', element_at({arr}, i + 1)))"
    )
    return F.expr(
        f"CASE WHEN length(trim({text_col})) = 0 OR size({arr}) < 2 THEN 0L ELSE "
        f"FLOOR(1000 * (size({bi}) - size(array_distinct({bi}))) / size({bi})) END"
    ).cast("long")


def dup_bigram_frac_sql_duckdb(text_expr: str = "text") -> str:
    arr = f"regexp_split_to_array(trim({text_expr}), '\\s+')"
    bi = f"list_transform(range(1, len({arr})), i -> {arr}[i] || ' ' || {arr}[i+1])"
    return (
        f"CAST(CASE WHEN length(trim({text_expr})) = 0 OR len({arr}) < 2 THEN 0 ELSE "
        f"floor(1000.0 * (len({bi}) - len(list_distinct({bi}))) / len({bi})) "
        f"END AS BIGINT)"
    )


#: default Gopher-style thresholds (Rae et al. 2021 A1.1 shapes, milli
#: units) shared by training_keep_expr / training_keep_sql_duckdb /
#: filter_training_docs / profile()'s keep_default column
DEFAULT_MIN_TOKENS = 10
DEFAULT_MAX_TOKENS = 100_000
DEFAULT_MIN_QUALITY_MILLI = 300
DEFAULT_MAX_DUP_TOKEN_MILLI = 900
DEFAULT_MAX_TOP_TOKEN_MILLI = 300
DEFAULT_MAX_DUP_BIGRAM_MILLI = 600


def training_keep_expr(
    text_col: str = "text",
    *,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    min_quality_milli: int = DEFAULT_MIN_QUALITY_MILLI,
    max_dup_token_milli: int = DEFAULT_MAX_DUP_TOKEN_MILLI,
    max_top_token_milli: int = DEFAULT_MAX_TOP_TOKEN_MILLI,
    max_dup_bigram_milli: int = DEFAULT_MAX_DUP_BIGRAM_MILLI,
) -> Column:
    """The keep-predicate of the Gopher-style document filter as a single
    boolean Column: length band, quality floor, and the three repetition
    caps. Shared by :func:`filter_training_docs` (which applies it) and
    the ``text_profile`` correctness gate (which records it per-doc and
    hash-checks it against :func:`training_keep_sql_duckdb` with the same
    thresholds), so the gated expression IS the filter's predicate."""
    return (
        token_count(text_col).between(min_tokens, max_tokens)
        & (quality_score_milli(text_col) >= min_quality_milli)
        & (dup_token_frac_milli(text_col) <= max_dup_token_milli)
        & (top_token_frac_milli(text_col) <= max_top_token_milli)
        & (dup_bigram_frac_milli(text_col) <= max_dup_bigram_milli)
    )


def training_keep_sql_duckdb(
    text_expr: str = "text",
    *,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    min_quality_milli: int = DEFAULT_MIN_QUALITY_MILLI,
    max_dup_token_milli: int = DEFAULT_MAX_DUP_TOKEN_MILLI,
    max_top_token_milli: int = DEFAULT_MAX_TOP_TOKEN_MILLI,
    max_dup_bigram_milli: int = DEFAULT_MAX_DUP_BIGRAM_MILLI,
) -> str:
    """DuckDB equivalent of :func:`training_keep_expr` (same defaults),
    composed from the per-signal oracle helpers — 1 = keep, 0 = drop."""
    return (
        f"CAST(CASE WHEN "
        f"{token_count_sql_duckdb(text_expr)} BETWEEN {min_tokens} AND {max_tokens} "
        f"AND {quality_score_sql_duckdb(text_expr)} >= {min_quality_milli} "
        f"AND {dup_token_frac_sql_duckdb(text_expr)} <= {max_dup_token_milli} "
        f"AND {top_token_frac_sql_duckdb(text_expr)} <= {max_top_token_milli} "
        f"AND {dup_bigram_frac_sql_duckdb(text_expr)} <= {max_dup_bigram_milli} "
        f"THEN 1 ELSE 0 END AS INTEGER)"
    )


def filter_training_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    min_quality_milli: int = DEFAULT_MIN_QUALITY_MILLI,
    max_dup_token_milli: int = DEFAULT_MAX_DUP_TOKEN_MILLI,
    max_top_token_milli: int = DEFAULT_MAX_TOP_TOKEN_MILLI,
    max_dup_bigram_milli: int = DEFAULT_MAX_DUP_BIGRAM_MILLI,
) -> DataFrame:
    """The keep-side of a Gopher-style document filter: length band,
    quality floor, and the three repetition caps applied in one pass.
    Returns the input rows that survive, untouched — map-only (every
    signal is a codegen expression over the text column; no shuffle, no
    UDF), so at 100 TB this is a pure scan stage that composes with
    predicate pushdown on any other filter. Thresholds default to the
    shape of the public literature's rules (Rae et al. 2021 A1.1) scaled
    to milli units; callers tune per corpus."""
    return docs.filter(
        training_keep_expr(
            text_col,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            min_quality_milli=min_quality_milli,
            max_dup_token_milli=max_dup_token_milli,
            max_top_token_milli=max_top_token_milli,
            max_dup_bigram_milli=max_dup_bigram_milli,
        )
    )


def profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc: token count, detected language, quality score,
    fingerprint, the three repetition signals, and whether
    :func:`filter_training_docs` (default thresholds) would keep the doc
    — the text-analysis sweep a training pipeline runs first.

    ``keep_default`` is derived from the already-computed signal COLUMNS
    in a second projection, not re-derived from the text: the signal
    expressions are higher-order functions that run interpreted (outside
    codegen CSE), and Catalyst's CollapseProject keeps the two projects
    separate exactly because each expensive alias is referenced twice —
    so every signal is evaluated once per row (A/B: re-deriving from
    text cost +33% on the gate query)."""
    sig = docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        lang_id_expr(text_col).alias("lang_pred"),
        quality_score_milli(text_col).alias("quality_milli"),
        fingerprint64(text_col).alias("fingerprint"),
        dup_token_frac_milli(text_col).alias("dup_token_milli"),
        top_token_frac_milli(text_col).alias("top_token_milli"),
        dup_bigram_frac_milli(text_col).alias("dup_bigram_milli"),
    )
    keep = (
        F.col("n_tokens").between(DEFAULT_MIN_TOKENS, DEFAULT_MAX_TOKENS)
        & (F.col("quality_milli") >= DEFAULT_MIN_QUALITY_MILLI)
        & (F.col("dup_token_milli") <= DEFAULT_MAX_DUP_TOKEN_MILLI)
        & (F.col("top_token_milli") <= DEFAULT_MAX_TOP_TOKEN_MILLI)
        & (F.col("dup_bigram_milli") <= DEFAULT_MAX_DUP_BIGRAM_MILLI)
    )
    # NULL text -> NULL signals -> NULL predicate; record 0 (drop), which
    # is both what filter_training_docs does (filter drops NULL) and what
    # the DuckDB oracle's CASE WHEN yields — keeps the gate hash-exact on
    # corpora with null documents
    return sig.select(
        "*", F.coalesce(keep.cast("int"), F.lit(0)).alias("keep_default")
    )
