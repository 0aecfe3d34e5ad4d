"""C4 line-level corpus cleaning (SURVEY.md §2.13 text-quality tier).

The published C4 heuristics (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning with a Unified Text-to-Text Transformer",
§2.2) — the line/page rule set behind the C4 dataset, still the
baseline cleaning recipe web-scale pipelines start from:

- retain only lines that end in a terminal punctuation mark
  (period, exclamation mark, question mark, end quotation mark);
- retain only lines with at least 5 words;
- drop any line containing the word "javascript" (the cookie/JS
  boilerplate tell);
- drop any PAGE containing "lorem ipsum" or a curly brace "{"
  (template/code tells), or any phrase on a deployment-supplied
  blocklist;
- drop any page with fewer than 3 retained lines ("sentences").

The three-sentence-span dedup step of the same pipeline is the
engine's q91 span-dedup tier (operators/dedup.span_dedup); this
module contributes the line/page rules. The reference notebook
(README.md) has no text-cleaning stage — BASELINE.md north-star
extension, sibling of operators/gopher.py.

Engine-exactness: rules are string predicates (ends-with, literal
lowercase contains, word counts on the repo's single-space token
convention) and integer comparisons — no float anywhere, so a SQL
engine replays verdicts and cleaned text bit-identically. "Word" =
single-space token (empty tokens from doubled separators count, in
both engines alike); "contains" is a case-insensitive LITERAL match.

Scale shape (100 TB): everything is scan-stage JVM expressions over
each document's own line array — split, higher-order filter,
array_join. Zero shuffles, zero joins, zero UDFs;
:func:`c4_clean_filter` is one projection + one filter, fully
pushable, exactly like gopher_quality_filter and fim_transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: §2.2's terminal punctuation set (the end-quote covers dialogue)
TERMINAL_PUNCT = (".", "!", "?", '"')

#: §2.2's page-level drop phrases (matched case-insensitively)
PAGE_BLOCK_PHRASES = ("lorem ipsum", "{")

#: §2.2's line-level drop word
LINE_BLOCK_WORD = "javascript"


def _line_ok(
    line: Column, min_words_per_line: int, line_block_word: str
) -> Column:
    ends = line.endswith(TERMINAL_PUNCT[0])
    for p in TERMINAL_PUNCT[1:]:
        ends = ends | line.endswith(p)
    enough_words = F.size(F.split(line, " ")) >= min_words_per_line
    no_block = ~F.lower(line).contains(line_block_word.lower())
    return ends & enough_words & no_block


def _verdict_exprs(
    text_col: str,
    min_words_per_line: int,
    min_lines: int,
    page_block_phrases: tuple[str, ...],
    line_block_word: str,
) -> tuple[Column, Column]:
    """``(kept_lines_array, page_ok)`` over the ORIGINAL text — the
    ONE construction both the stats view and the gate apply (the
    round-11 review: two inline copies had already drifted on
    argument validation)."""
    if min_words_per_line < 1:
        raise ValueError(
            f"min_words_per_line must be >= 1, got {min_words_per_line}"
        )
    if min_lines < 0:
        raise ValueError(f"min_lines must be >= 0, got {min_lines}")
    text = F.col(text_col)
    kept = F.filter(
        F.split(text, "\n"),
        lambda line: _line_ok(line, min_words_per_line, line_block_word),
    )
    page_ok = F.lit(True)
    for phrase in page_block_phrases:
        page_ok = page_ok & ~F.lower(text).contains(phrase.lower())
    return kept, page_ok


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    page_block_phrases: tuple[str, ...] = PAGE_BLOCK_PHRASES,
    line_block_word: str = LINE_BLOCK_WORD,
) -> DataFrame:
    """Per-document C4 verdicts: ``(id_col, text_clean,
    n_lines_kept, page_ok, c4_keep)``.

    ``text_clean`` re-joins the retained lines on newlines (empty
    when nothing survives); ``page_ok`` is the page-level phrase
    gate over the ORIGINAL text (a blocked page is dropped whole —
    its retained lines are still reported for observability);
    ``c4_keep = page_ok AND n_lines_kept >= min_lines``, the
    page-survival verdict :func:`c4_clean_filter` applies.
    """
    kept, page_ok = _verdict_exprs(
        text_col, min_words_per_line, min_lines, page_block_phrases,
        line_block_word,
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        page_ok.alias("page_ok"),
        (page_ok & (F.size(kept) >= min_lines)).alias("c4_keep"),
    )


def c4_clean_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    page_block_phrases: tuple[str, ...] = PAGE_BLOCK_PHRASES,
    line_block_word: str = LINE_BLOCK_WORD,
) -> DataFrame:
    """The gate: surviving pages with ``text_col`` REPLACED by the
    cleaned text (every other input column rides through). One
    projection + one filter — no join, no shuffle; ``id_col`` is
    unused and kept for gate-API symmetry."""
    del id_col  # verdicts are a pure function of the text
    kept, page_ok = _verdict_exprs(
        text_col, min_words_per_line, min_lines, page_block_phrases,
        line_block_word,
    )
    # materialize the kept array ONCE as a column: Catalyst does not
    # CSE the split + per-line HOF across Filter and Project, so the
    # inline form would evaluate it twice per surviving row
    # (round-11 review). Both predicates still read the ORIGINAL
    # text — a '{' that only occurred in dropped lines kills the
    # page, per the paper — because the temp column, not text_col,
    # carries the cleaned lines until the final projection.
    return (
        df.withColumn("__c4_kept", kept)
        .filter(page_ok & (F.size("__c4_kept") >= min_lines))
        .withColumn(text_col, F.array_join("__c4_kept", "\n"))
        .drop("__c4_kept")
    )
