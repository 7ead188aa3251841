"""Text-analysis operators for LLM training-data pipelines (SURVEY §2.5).

Language-ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (md5 whole-doc +
min-shingle rolling hash + simhash) — all as JVM-side column expressions;
no Python UDFs, so at 100 TB these pipeline into the parquet scan with
zero extra shuffles.

Single-source-of-truth: the constants below feed BOTH the Spark
expressions and the generated DuckDB oracle SQL, so semantics cannot
drift between engine and oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import (
    normalize_text,
    sql_normalize_text,
    sql_stable_hash32,
    stable_hash32,
    tokens,
)

# BPE-ish token pattern: letter runs, digit runs, single other-symbols.
#: Explicit whitespace class: Java regex \s includes \x0B (vertical tab)
#: while DuckDB/RE2 \s does not — spelling the class out keeps the Spark
#: count and the SQL oracle bit-identical on every byte (r6 review).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0b]"

#: tiny per-language marker vocabularies (language-ID heuristic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "las", "es", "y"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de", "shi", "le", "bu", "zai", "wo"),
}
#: deterministic vote tiebreak order (first wins on equal votes)
LANG_ORDER = ("en", "de", "es", "fr", "zh")

ENGLISH_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "this", "that",
)

SIMHASH_BITS = 32


# -- token counting (whitespace + BPE-ish) ----------------------------------

def ws_token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def sql_ws_token_count(expr: str) -> str:
    return f"len(string_split({sql_normalize_text(expr)}, ' '))"


def sql_bpe_token_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_TOKEN_RE}'))"


# -- quality scoring ---------------------------------------------------------

def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features; each value round(…, 6)."""
    n_chars = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    toks = tokens(text)
    n_toks = F.size(toks).cast("double")
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*ENGLISH_STOPWORDS))
    ).cast("double")
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / n_toks
    return {
        "alpha_ratio": F.round(alpha / n_chars, 6),
        "stopword_ratio": F.round(stop / n_toks, 6),
        "mean_token_len": F.round(mean_len, 6),
        "n_tokens": n_toks.cast("long"),
    }


def sql_quality_features(expr: str) -> dict[str, str]:
    stop_list = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    toks = f"string_split({sql_normalize_text(expr)}, ' ')"
    return {
        "alpha_ratio": (
            f"round(cast(len(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) as double)"
            f" / len({expr}), 6)"
        ),
        "stopword_ratio": (
            f"round(cast(len(list_filter({toks}, t -> list_contains([{stop_list}], t))) as double)"
            f" / len({toks}), 6)"
        ),
        "mean_token_len": (
            f"round(cast(list_sum(list_transform({toks}, t -> len(t))) as double)"
            f" / len({toks}), 6)"
        ),
        "n_tokens": f"cast(len({toks}) as bigint)",
    }


# -- language identification -------------------------------------------------

def lang_votes(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker votes, LANG_ORDER tiebreak, 'und' if all zero."""
    votes = lang_votes(text)
    best = F.greatest(*[votes[lg] for lg in LANG_ORDER])
    expr = F.lit("und")
    for lg in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (votes[lg] == best), F.lit(lg)).otherwise(expr)
    return expr


def sql_lang_id(expr: str) -> str:
    toks = f"string_split({sql_normalize_text(expr)}, ' ')"
    votes = {
        lg: (
            f"len(list_filter({toks}, t -> list_contains("
            f"[{', '.join(repr(m) for m in LANG_MARKERS[lg])}], t)))"
        )
        for lg in LANG_ORDER
    }
    best = f"greatest({', '.join(votes[lg] for lg in LANG_ORDER)})"
    sql = "'und'"
    for lg in reversed(LANG_ORDER):
        sql = f"CASE WHEN {best} > 0 AND {votes[lg]} = {best} THEN '{lg}' ELSE {sql} END"
    return sql


# -- fingerprinting -----------------------------------------------------------

def content_md5(text: Column) -> Column:
    """Whole-document fingerprint of normalized text."""
    return F.md5(normalize_text(text))


def sql_content_md5(expr: str) -> str:
    return f"md5({sql_normalize_text(expr)})"


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over distinct whitespace tokens: bit b is set iff more than
    half the token hashes have bit b set.  Pure bit arithmetic — the same
    expression tree is generated for the oracle by :func:`sql_simhash`."""
    hs = F.transform(F.array_distinct(tokens(text)), stable_hash32)
    n = F.size(hs)
    out = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.size(F.filter(hs, lambda h: h.bitwiseAND(F.lit(1 << b)) != 0))
        out = out + F.when(ones * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def sql_token_hashes(expr: str) -> str:
    """Distinct-token hash list — stage this in a CTE, then apply
    :func:`sql_simhash_over` to the staged column name."""
    toks = f"list_distinct(string_split({sql_normalize_text(expr)}, ' '))"
    return f"list_transform({toks}, t -> {sql_stable_hash32('t')})"


def sql_simhash_over(hs_col: str, bits: int = SIMHASH_BITS) -> str:
    terms = []
    for b in range(bits):
        ones = f"len(list_filter({hs_col}, h -> (h & {1 << b}) <> 0))"
        terms.append(f"(CASE WHEN {ones} * 2 > len({hs_col}) THEN {1 << b} ELSE 0 END)")
    return f"cast({' + '.join(terms)} as bigint)"


def simhash_wide(text: Column, bits: int = 48) -> Column:
    """Wide SimHash via the vote-array formulation: one pass builds a
    per-bit vote vector (``aggregate`` + ``zip_with``), a second folds the
    majority bits into the hash.  Codegen size is O(1) in ``bits`` (three
    nested higher-order functions) where :func:`simhash`'s per-bit
    filter+size chain is O(bits) — at 48+ bits the naive form's generated
    code dominates compile time.  Values are identical to the naive form
    at equal ``bits``; the oracle keeps the term-by-term SQL
    (:func:`sql_simhash_over`), which DuckDB evaluates fine.

    Token hashes are md5-derived at the SAME width (``stable_hash_bits``),
    so every simhash bit position has uniform votes — a 32-bit token hash
    under a 48-bit simhash would leave the top 16 bits always-zero and
    any band over them degenerate.  Max 60 bits (md5-nibble granularity +
    signed-long headroom).
    """
    from event_streaming_spark.functions.hashing import stable_hash_bits

    hs = F.transform(F.array_distinct(tokens(text)), lambda t: stable_hash_bits(t, bits))
    n = F.size(hs)
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    bit_vec = lambda h: F.transform(  # noqa: E731
        powers, lambda p: F.when(h.bitwiseAND(p) != 0, 1).otherwise(0)
    )
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, bit_vec(h), lambda x, y: x + y),
    )
    contrib = F.zip_with(
        votes, powers, lambda v, p: F.when(v * 2 > n, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)


def sql_token_hashes_wide(expr: str, bits: int) -> str:
    """Oracle twin of the token-hash stage inside :func:`simhash_wide`."""
    from event_streaming_spark.functions.hashing import sql_stable_hash_bits

    toks = f"list_distinct(string_split({sql_normalize_text(expr)}, ' '))"
    return f"list_transform({toks}, t -> {sql_stable_hash_bits('t', bits)})"

