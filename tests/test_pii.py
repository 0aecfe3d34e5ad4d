"""PII pattern semantics (functions/pii.py) — the ADVICE r02 items:
anchored phone matching, 3-3-4 support, kinds-order invariance, and
cross-engine (Spark vs DuckDB RE2) pattern agreement. The catalog's
q81_pii_scrub replays the same patterns at corpus scale; these tests
pin the single-string edge cases a corpus row may never hit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.pii import (
    PII_PATTERNS,
    has_pii,
    pii_count,
    pii_total,
    redact_pii,
)


def _one(spark, text: str, col):
    return spark.createDataFrame([(text,)], "t string").select(col.alias("v")).first().v


CASES = [
    # (text, kind, expected_count)
    ("mail me at a.b+c@example.co.uk today", "email", 1),
    ("no at-sign here", "email", 0),
    ("ssn 123-45-6789 on file", "ssn", 1),
    ("+1 555 123 4567", "phone", 1),
    ("call 555-123-4567", "phone", 1),  # 3-3-4, no country code
    ("intl +44 20 7946 0958", "phone", 1),
    ("server at 10.0.0.1 and 192.168.1.255", "ipv4", 2),
]


@pytest.mark.parametrize("text,kind,n", CASES)
def test_pii_count_cases(spark, text, kind, n):
    assert _one(spark, text, pii_count("t", kind)) == n


def test_card_shaped_runs_never_leak_fragments(spark):
    """A 16-digit card-shaped run must never leak a head or tail
    around a partial match (ADVICE r02: '912<PHONE>'; review r03:
    '<PHONE>-1111'). The card pattern, ordered before phone, consumes
    the whole run in ANY grouping."""
    for text, want in [
        ("9123456789012345 intact", "<CARD> intact"),
        ("card 4111-1111-1111-1111 on file", "card <CARD> on file"),
        ("912345-678-9012-3456", "<CARD>"),
        ("4123 4567 8901 2345 ok", "<CARD> ok"),
        ("1234-5678-9012-3456-7890 long", "<CARD> long"),
    ]:
        assert _one(spark, text, redact_pii("t")) == want
    # phones and SSNs are too short to be card-matched
    assert _one(spark, "call 555-123-4567", redact_pii("t")) == "call <PHONE>"
    assert _one(spark, "ssn 123-45-6789", redact_pii("t")) == "ssn <SSN>"


def test_card_pattern_never_bridges_adjacent_numbers(spark):
    """Space-tolerant digit runs would bridge ADJACENT distinct
    numbers into one partial card match and leak the tail (review
    r03: 'call <CARD>-6543'); the dash-run + spaced-4-group card
    alternatives cannot, and benign number lists survive."""
    cases = [
        ("call 555-123-4567 555-987-6543", "call <PHONE> <PHONE>"),
        ("score 10 20 30 40 50 60 7 points", "score 10 20 30 40 50 60 7 points"),
        ("555-123-4567 2024", "<PHONE> 2024"),
        ("meeting 555 123 4567 2024", "meeting <PHONE> 2024"),
        ("seasons 2019 2020 2021 2022 totals", "seasons 2019 2020 2021 2022 totals"),
        ("ring +44 20 7946 0958 now", "ring <PHONE> now"),
    ]
    for text, want in cases:
        assert _one(spark, text, redact_pii("t")) == want


def test_card_pattern_documented_residuals(spark):
    """Lookaround-free RE2 cannot separate every benign digit
    sequence from card-shaped ones; these two behaviors are the
    DOCUMENTED residuals (functions/pii.py) — pinned so a future
    pattern edit that shifts them is a conscious decision."""
    # spaced 4-digit groups that start with a card IIN digit [3-6]
    # over-redact...
    assert _one(spark, "ids 3000 4000 5000 6000", redact_pii("t")) \
        == "ids <CARD>"
    # ...and non-IIN spaced 16-digit runs match NO pattern: neither
    # card-shaped (wrong IIN) nor phone-shaped (4-digit groups exceed
    # the bare {2,3} first group) -> they pass through UNREDACTED
    # rather than partially redacted
    assert _one(spark, "9123 4567 8901 2345", redact_pii("t")) \
        == "9123 4567 8901 2345"


def test_redact_all_kinds(spark):
    text = "a@b.com ssn 123-45-6789 call 555-123-4567 ip 10.0.0.1"
    out = _one(spark, text, redact_pii("t"))
    assert out == "<EMAIL> ssn <SSN> call <PHONE> ip <IPV4>"


def test_redact_kinds_order_invariant(spark):
    """Caller-supplied kinds order must not break the
    specific-before-general sequencing (ADVICE r02)."""
    text = "a@b.com and 123-45-6789"
    fwd = _one(spark, text, redact_pii("t", kinds=("email", "ssn")))
    rev = _one(spark, text, redact_pii("t", kinds=("ssn", "email")))
    assert fwd == rev == "<EMAIL> and <SSN>"


def test_redact_unknown_kind_raises(spark):
    with pytest.raises(KeyError):
        redact_pii("t", kinds=("email", "passport"))


def test_total_no_double_count(spark):
    """SSN is phone-shaped-adjacent; progressive redaction must count
    each span once."""
    text = "id 123-45-6789 tel 555-123-4567"
    assert _one(spark, text, pii_total("t")) == 2
    assert _one(spark, text, has_pii("t")) is True
    assert _one(spark, "clean text", has_pii("t")) is False


def test_patterns_agree_with_re2(spark, duck):
    """Every pattern must mean the same thing to Java regex and RE2
    (DuckDB) — counts and redactions compared per case."""
    texts = [t for t, _, _ in CASES] + [
        "9123456789012345 intact",
        "912345-678-9012-3456",
        "a@b.com ssn 123-45-6789 call 555-123-4567 ip 10.0.0.1",
        "edge +1-555-123-4567, v4 255.255.255.255.",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        "t",
        *[pii_count("t", k).alias(f"n_{k}") for k in PII_PATTERNS],
        redact_pii("t").alias("red"),
    ).collect()
    for row in got:
        for k, pat in PII_PATTERNS.items():
            d = duck.sql(
                "SELECT len(regexp_extract_all(?, ?))", params=[row.t, pat]
            ).fetchone()[0]
            assert row[f"n_{k}"] == d, (row.t, k)
        red = row.t
        for k, pat in PII_PATTERNS.items():
            red_q = duck.sql(
                "SELECT regexp_replace(?, ?, ?, 'g')",
                params=[red, pat, f"<{k.upper()}>"],
            ).fetchone()[0]
            red = red_q
        assert row.red == red, row.t
