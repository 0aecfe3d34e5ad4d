"""Gopher document-quality rules (SURVEY.md §2.13 text-quality tier).

The non-repetition half of the Gopher / MassiveText cleaning rules
(Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", table A1) — the most widely copied
published rule set for pretrain-corpus document filtering (reused by
RefinedWeb, FineWeb, Dolma): drop a document unless

- its word count is within [50, 100,000] and its mean word length is
  within [3, 10] characters;
- its symbol-to-word ratio is <= 0.1 for BOTH the hash symbol '#'
  and the ellipsis '...';
- <= 90% of its lines start with a bullet point and <= 30% end with
  an ellipsis;
- >= 80% of its words contain at least one alphabetic character;
- it contains at least 2 distinct words from a small English stop
  list (the, be, to, of, and, that, have, with).

The repetition half of table A1 (duplicate-token fraction, top-n-gram
character coverage) lives in operators/repetition.py; this module
completes the published rule set. The reference notebook (README.md)
has no text-quality stage at all — both halves extend the engine per
the BASELINE.md north-star.

Engine-exactness: every ratio rule is an integer CROSS-MULTIPLIED
comparison (``10 * n_hash <= n_words`` instead of ``n_hash / n_words
<= 0.1``) — no float division anywhere, so any SQL engine replays the
verdicts bit-identically. Words are the repo's single-space tokens
(functions/text.tokens — the convention every text oracle shares);
lines split on ``\\n``; '#'/'...' counts come from length-after-
literal-replace deltas (left-to-right non-overlapping in Spark and
DuckDB alike, and '...' removal always deletes a multiple of 3
characters, so the /3 is exact).

Scale shape (100 TB): the ENTIRE rule set is scan-stage JVM
expressions — split, higher-order filter/aggregate over the small
per-doc arrays, literal replaces. Zero shuffles, zero joins, zero
UDFs; :func:`gopher_quality_filter` is literally ``df.filter(<one
expression>)``, so Catalyst pushes it into the scan like any
predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import tokens

#: table A1's stop list, verbatim
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: bullet markers counted as "line starts with a bullet point"
BULLET_PREFIXES = ("- ", "* ", "•")


def _literal_count(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via the length delta of a
    literal (non-regex) replace — non-overlapping left-to-right in
    every engine."""
    removed = F.length(col) - F.length(
        F.replace(col, F.lit(needle), F.lit(""))
    )
    return (removed / F.lit(len(needle))).cast("long")


def _counters(text_col: str, stopwords: tuple[str, ...]) -> dict:
    """The raw per-document counters every rule reads, as named
    scan-stage expressions."""
    text = F.col(text_col)
    tk = tokens(text_col)
    lines = F.split(text, "\n")

    def starts_bullet(line: Column) -> Column:
        cond = line.startswith(BULLET_PREFIXES[0])
        for p in BULLET_PREFIXES[1:]:
            cond = cond | line.startswith(p)
        return cond

    stop_hits: Column = F.lit(0).cast("long")
    for w in stopwords:
        stop_hits = stop_hits + F.array_contains(tk, w).cast("long")
    return {
        "n_words": F.size(tk).cast("long"),
        "n_lines": F.size(lines).cast("long"),
        # Σ token lengths via a higher-order aggregate — NOT
        # len(text) - (n-1): injected newlines/odd whitespace live
        # inside tokens and must count as the characters they are
        "n_chars_in_words": F.aggregate(
            F.transform(tk, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
        "hash_count": _literal_count(text, "#"),
        "ellipsis_count": _literal_count(text, "..."),
        "bullet_lines": F.size(F.filter(lines, starts_bullet)).cast(
            "long"
        ),
        "ellipsis_lines": F.size(
            F.filter(lines, lambda line: line.endswith("..."))
        ).cast("long"),
        "alpha_words": F.size(
            F.filter(tk, lambda t: t.rlike("[A-Za-z]"))
        ).cast("long"),
        "stop_hits": stop_hits,
    }


def _rules(
    c: dict,
    min_words: int,
    max_words: int,
    min_mean_word_len: int,
    max_mean_word_len: int,
    min_stop_hits: int,
) -> dict:
    """Rule verdicts over the counter expressions — integer
    cross-multiplied, the 0.1/0.9/0.3/0.8 cut-offs are table A1's
    published constants."""
    if min_words < 0 or max_words < min_words:
        raise ValueError(
            f"need 0 <= min_words <= max_words, got "
            f"({min_words}, {max_words})"
        )
    if min_mean_word_len < 0 or max_mean_word_len < min_mean_word_len:
        raise ValueError(
            f"need 0 <= min_mean_word_len <= max_mean_word_len, got "
            f"({min_mean_word_len}, {max_mean_word_len})"
        )
    nw = c["n_words"]
    return {
        "r_word_count": (nw >= min_words) & (nw <= max_words),
        "r_mean_word_len": (
            (F.lit(min_mean_word_len) * nw <= c["n_chars_in_words"])
            & (c["n_chars_in_words"] <= F.lit(max_mean_word_len) * nw)
        ),
        "r_hash_ratio": F.lit(10) * c["hash_count"] <= nw,
        "r_ellipsis_ratio": F.lit(10) * c["ellipsis_count"] <= nw,
        "r_bullet_lines": (
            F.lit(10) * c["bullet_lines"] <= F.lit(9) * c["n_lines"]
        ),
        "r_ellipsis_lines": (
            F.lit(10) * c["ellipsis_lines"] <= F.lit(3) * c["n_lines"]
        ),
        "r_alpha_words": F.lit(5) * c["alpha_words"] >= F.lit(4) * nw,
        "r_stopwords": c["stop_hits"] >= min_stop_hits,
    }


def gopher_quality_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stop_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """Per-document Gopher rule verdicts with full observability:
    every counter the rules read plus one boolean per rule and the
    conjunction ``gopher_pass``. The word/mean-length bounds and the
    stop-hit floor are parameters (integer units); the ratio
    cut-offs are the published constants.

    Output: ``(id, n_words, n_lines, n_chars_in_words, hash_count,
    ellipsis_count, bullet_lines, ellipsis_lines, alpha_words,
    stop_hits, r_word_count, r_mean_word_len, r_hash_ratio,
    r_ellipsis_ratio, r_bullet_lines, r_ellipsis_lines,
    r_alpha_words, r_stopwords, gopher_pass)``.
    """
    c = _counters(text_col, stopwords)
    r = _rules(
        c, min_words, max_words, min_mean_word_len, max_mean_word_len,
        min_stop_hits,
    )
    allpass = None
    for expr in r.values():
        allpass = expr if allpass is None else allpass & expr
    return df.select(
        F.col(id_col),
        *[expr.alias(name) for name, expr in c.items()],
        *[expr.alias(name) for name, expr in r.items()],
        allpass.alias("gopher_pass"),
    )


def gopher_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stop_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """The gate: input rows whose document passes every Gopher rule —
    ONE filter expression, no join, no shuffle (``id_col`` is unused
    and kept for gate-API symmetry with repetition_filter). At scale
    this composes with repetition_filter and the learned classifier
    as the published three-legged quality gate."""
    del id_col  # rule verdicts are a pure function of the text
    c = _counters(text_col, stopwords)
    r = _rules(
        c, min_words, max_words, min_mean_word_len, max_mean_word_len,
        min_stop_hits,
    )
    allpass = None
    for expr in r.values():
        allpass = expr if allpass is None else allpass & expr
    return df.filter(allpass)
