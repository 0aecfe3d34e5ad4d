"""Text-analysis expressions (SURVEY.md §2.13; BASELINE.json north-star).

Everything is a Catalyst column expression over ``documents.text`` —
whole-stage-codegen'd, no Python UDFs — so text scoring runs at scan
speed and the 100 TB path is just "read parquet, project".

Determinism: tokenization is a plain split, hashes are md5 (identical
hex output in Spark and DuckDB), so every function here is
oracle-checkable cross-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker vocabularies for the n-gram/stopword
# language-ID heuristic (public common-word lists, truncated)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "他", "这", "中"),
}

DEFAULT_STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"]


def tokens(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def token_count(col: Column | str, sep: str = " ") -> Column:
    return F.size(tokens(col, sep))


def regex_token_count(col: Column | str, pattern: str = "[A-Za-z]+|[0-9]+") -> Column:
    """BPE-ish token counting: count regex-word matches (letters runs +
    digit runs). Keep patterns in the RE2 ∩ Java-regex common subset
    so oracles agree."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(f"({pattern})"), 1))


def distinct_tokens(col: Column | str, sep: str = " ") -> Column:
    return F.array_distinct(tokens(col, sep))


def stopword_ratio(
    col: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS
) -> Column:
    """|distinct tokens ∩ stopwords| / |distinct tokens| — type-token
    stopword coverage, the quality-scoring building block."""
    toks = distinct_tokens(col)
    inter = F.array_intersect(toks, F.array(*[F.lit(s) for s in stopwords]))
    return F.size(inter).cast("double") / F.size(toks)


def avg_token_length(col: Column | str) -> Column:
    """mean token length = (chars - separators) / tokens."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    return (F.length(c) - (n - 1)).cast("double") / n


def quality_score(col: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    """Composite [0,1]-ish document quality heuristic: length band +
    stopword coverage + type-token ratio. Deliberately simple and
    fully expression-based; swap weights per corpus."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    ttr = F.size(distinct_tokens(c)).cast("double") / n
    return (length_term + stopword_ratio(c, stopwords) + ttr) / F.lit(3.0)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker coverage of the distinct-token set."""
    return {lang: stopword_ratio(col, markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(col: Column | str, default: str = "und") -> Column:
    """argmax over language scores; ties broken toward the
    alphabetically smallest language code (first processed wins, later
    codes replace only on strictly greater score). Returns ``default``
    when every score is 0."""
    scores = lang_scores(col)
    best = F.lit(default)
    best_score = F.lit(0.0)
    for lang in sorted(scores):
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def fingerprint(col: Column | str) -> Column:
    """Order/multiplicity-invariant document fingerprint: md5 over the
    sorted distinct token set. Catches shuffled/duplicated-word copies
    that exact text hashing misses (cf. the token-permutation near-dups
    in the synthetic corpus)."""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(col))))


def exact_hash(col: Column | str) -> Column:
    """Exact-content hash for byte-identical dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """All word n-grams of a text IN ORDER, duplicates kept (the
    counting variant of ``dedup.word_shingles``, which distincts).
    Short texts (< n tokens) short-circuit to empty: Spark's
    ``sequence(1, 0)`` counts DOWN, so the guard is mandatory."""
    w = tokens(col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# Explicit codepoint RANGES, not \p{Script=...} classes: script
# classes drift with each engine's Unicode table version, while
# literal ranges evaluate identically in Java regex and RE2 — the
# oracle-exactness rule applied to charset profiling.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "[A-Za-z\\x{00C0}-\\x{024F}]",
    "digit": "[0-9]",
    "cjk": "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]",
    "cyrillic": "[\\x{0400}-\\x{04FF}]",
    "arabic": "[\\x{0600}-\\x{06FF}]",
    "whitespace": "[ \\t\\n\\r]",
}


def script_counts(col: Column | str) -> dict[str, Column]:
    """Per-class codepoint counts over ``SCRIPT_RANGES`` plus
    ``other`` (chars in none of the classes) and ``n_chars`` — the
    charset profile behind mixed-script spam filters and
    wrong-language routing. Pure ``regexp_count`` expressions:
    scan-speed, cross-engine exact (count matches of the same literal
    ranges in DuckDB via ``len(regexp_extract_all(...))``)."""
    c = F.col(col) if isinstance(col, str) else col
    counts = {
        name: F.regexp_count(c, F.lit(pat))
        for name, pat in SCRIPT_RANGES.items()
    }
    total = F.length(c)
    known = None
    for v in counts.values():
        known = v if known is None else known + v
    counts["other"] = total - known
    counts["n_chars"] = total
    return counts


# Normalization patterns shared with the q139 oracle: restricted to
# the regex subset Java regex and RE2 evaluate identically (no
# backrefs, no lookaround, no \p classes — the script_counts rule),
# so any engine replays the chain bit-for-bit.
_HTML_TAG = "<[^>]*>"
_URL = "https?://[^ \\t\\n\\r]+"
_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
# &amp; must decode LAST (the standard decoding order): running it
# earlier would turn author-escaped markup like "5 &amp;lt; 6" into
# "&lt;" and then DOUBLE-decode it to "<" — corrupting text the
# author explicitly escaped (round-5 review).
_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
]


def normalize_text(col: Column | str, lowercase: bool = False) -> Column:
    """Boilerplate normalization for corpus cleanup — the standard
    pre-dedup / pre-tokenize scrub: strip HTML tags, decode the six
    ubiquitous entities, drop URLs and e-mail addresses, collapse all
    whitespace runs to single spaces, trim. ``lowercase=True`` folds
    case as the final step (keep it OFF ahead of case-sensitive
    dedup).

    Pure ``regexp_replace`` chain: scan-speed, whole-stage codegen,
    no UDF — at 100 TB this runs inside the same stage as the scan
    and costs no shuffle. Order matters and is part of the contract
    (tags before entities, so ``&lt;p&gt;`` decodes to a literal
    ``<p>`` TEXT rather than becoming a strippable tag; URLs/emails
    before whitespace collapse so their removal can't join words)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, _URL, " ")
    c = F.regexp_replace(c, _EMAIL, " ")
    c = F.trim(F.regexp_replace(c, "[ \\t\\n\\r]+", " "))
    if lowercase:
        c = F.lower(c)
    return c


def url_host(col: Column | str) -> Column:
    """Normalized host from a URL column — the key for per-domain
    corpus curation (domain mix reports, per-domain caps, blocklist
    joins). Extracts the authority after ``scheme://``, lowercases,
    strips ``userinfo@``, a trailing ``:port``, a leading
    ``www.`` and a trailing dot (userinfo/FQDN-dot variants splitting
    the bucket would undercount per-domain caps — round-5 review) — so
    ``HTTPS://WWW.Ex.COM:8080/p`` and ``https://ex.com/q`` land in
    the same domain bucket. Pure anchored-regexp expression
    (scan-speed; patterns in the Java-regex/RE2-identical subset, the
    normalize_text rule); NULL / non-URL values yield NULL."""
    c = F.col(col) if isinstance(col, str) else col
    auth = F.regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(auth)
    host = F.regexp_replace(host, "^[^@]*@", "")
    host = F.regexp_replace(host, ":[0-9]+$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.regexp_replace(host, "\\.$", "")
    return F.when(host == "", None).otherwise(host)
