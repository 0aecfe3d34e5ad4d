"""PII detection and redaction expressions (LLM-training-data tier).

A 100 TB pre-training corpus must be scrubbed of emails, phone
numbers, IP addresses and national-ID-shaped strings before anything
else happens to it. Like the rest of ``functions/``, everything here
is a Catalyst column expression (``regexp_count`` / ``regexp_replace``
— JVM-side, whole-stage-codegen'd, no Python in the hot path), so
redaction runs at scan speed and composes with the corpus funnel
(operators/corpus.py) as just another projection.

Pattern dialect: every regex stays inside the Java-regex ∩ RE2 common
subset (character classes, bounded repetition, ``\\b`` word
boundaries; no lookarounds, no backreferences) so the DuckDB oracle
replays the exact same patterns — the cross-engine agreement IS the
test that the patterns mean what we think they mean.

Reference parity: the reference notebook has no PII tier (it is an
IDS notebook); this extends SURVEY.md §2.13's text-analysis family
per the mandate to cover training-data-pipeline operations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters for redact_pii: longer/more-specific first so an SSN
# isn't half-eaten by the phone pattern, and an email's domain isn't
# re-matched as a hostname.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # card-like, ordered BEFORE phone so the phone pattern can never
    # match the head of a long digit run and leak its tail ("<PHONE>
    # -1111"); RE2 has no lookarounds, so ordering IS the guard. Two
    # alternatives: a DASH-grouped-or-contiguous run of >= 13 digits
    # (a dash never joins two distinct numbers in prose, so this
    # cannot bridge adjacent phones or swallow number lists; UNBOUNDED
    # above so a 20+-digit dashed run redacts whole instead of leaking
    # a tail past a 19-digit partial match — review r03 x2), and the
    # space-grouped 4-4-4-4 form RESTRICTED to real card IIN leading
    # digits [3-6] (Visa/MC/Amex/Discover/JCB/Diners), so year lists
    # ("2019 2020 2021 2022") and most id sequences survive. Residuals
    # of lookaround-free RE2, pinned in tests: spaced 4-digit groups
    # that DO start 3-6 ("3000 4000 5000 6000") over-redact, and
    # non-IIN spaced runs ("9123 4567 8901 2345") fall through to a
    # partial phone match.
    "card": r"\b(?:[0-9](?:-?[0-9]){12,}|[3-6][0-9]{3}(?: [0-9]{4}){3})\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # \b-anchored at the start so a match can't begin mid-digit-run
    # (a 16-digit card-shaped run must not leak its head as "digits +
    # <PHONE>"); the optional country-code group also admits the bare
    # 3-3-4 form (555-123-4567). (?: ) and \b are in the Java ∩ RE2
    # subset.
    # the bare (cc-less) first group is {2,3}: admitting 4 digits
    # there makes every spaced 4-4-4 run phone-shaped and redacts year
    # lists ("2019 2020 2021"); international city codes still match
    # via the cc parse (+44 20 7946 0958 -> cc=44). Recall trade: a
    # 4-digit area code with NO country code ("0151 123 4567") is not
    # matched. SSNs stay safe (3-2-4 fails the {3,4} third group).
    # one alternative per separator style: a [- ] class would let a
    # trailing space pull an unrelated following number (a year, the
    # next phone) into the match ('555-123-4567 2024' -> one match);
    # consistent-separator alternatives can't cross that boundary.
    # The country-code group is LAZY (??): a greedy optional cc shifts
    # the groups right on 3-segment numbers and swallows a following
    # 4-digit number ('555 123 4567 2024' -> cc=555, tail=2024 —
    # review r03); lazy tries the cc-less parse first and only engages
    # the cc when the bare form cannot match (+44 20 7946 0958).
    "phone": (
        r"\+?\b(?:[0-9]{1,3}-)??[0-9]{2,3}-[0-9]{3,4}-[0-9]{4}\b"
        r"|\+?\b(?:[0-9]{1,3} )??[0-9]{2,3} [0-9]{3,4} [0-9]{4}\b"
    ),
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern in the column."""
    return F.regexp_count(_col(col), F.lit(PII_PATTERNS[kind]))


def pii_total(col: Column | str) -> Column:
    """Total PII hits across all pattern kinds (pre-redaction count,
    applied in PII_PATTERNS order on the progressively-redacted text
    so overlapping patterns aren't double-counted)."""
    c = _col(col)
    total = F.lit(0)
    for kind in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(PII_PATTERNS[kind]))
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return total


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with a ``<KIND>`` placeholder.

    Spark's ``regexp_replace`` is global (all occurrences), matching
    DuckDB's ``regexp_replace(..., 'g')``. Patterns apply in
    PII_PATTERNS order: specific → general, each over the output of
    the previous, so placeholders never re-match later patterns
    (placeholder alphabet ``<A-Z>`` is disjoint from every pattern).
    """
    c = _col(col)
    # iterate in PII_PATTERNS order even when ``kinds`` is a subset
    # passed out of order — the specific-before-general invariant is
    # the module's contract, not the caller's problem
    wanted = set(kinds) if kinds is not None else set(PII_PATTERNS)
    unknown = wanted - set(PII_PATTERNS)
    if unknown:
        raise KeyError(f"unknown PII kinds: {sorted(unknown)}")
    for kind in (k for k in PII_PATTERNS if k in wanted):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def has_pii(col: Column | str) -> Column:
    """Boolean gate for filter-style scrubbing (drop instead of
    redact). Kept as a separate expression so the filter can sit in
    front of the expensive funnel stages and push down to the scan."""
    c = _col(col)
    out = F.lit(False)
    for pat in PII_PATTERNS.values():
        out = out | (F.regexp_count(c, F.lit(pat)) > 0)
    return out
