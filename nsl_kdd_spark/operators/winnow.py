"""Winnowing document fingerprints (SURVEY.md §2.13 dedup tier).

Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
algorithm) selects a position-robust subset of a document's k-gram
hashes: slide a window of ``w`` consecutive k-gram hashes over the
document and record the minimum hash of each window (rightmost
occurrence on ties), each selected position once. The guarantee: any
verbatim match of at least ``w + k - 1`` tokens between two documents
shares at least one selected fingerprint, while only ~``2/(w+1)`` of
all k-grams are kept. This complements the engine's existing
fingerprint surface (order-invariant whole-doc fingerprint in
functions/text.py, MinHash/SimHash set sketches in operators/dedup.py)
with the *localized* fingerprint family used for plagiarism/clone
detection and substring-level near-dup mining.

The reference notebook has no fingerprinting stage; this extends its
corpus-analysis capabilities per the BASELINE.json north-star.

Spark shape (100 TB):

- Fingerprint selection is embarrassingly parallel per document and
  runs entirely inside ONE projection: tokenize -> k-gram hashes ->
  per-window rightmost-argmin -> array_distinct, all with higher-order
  array functions (transform/aggregate/slice) on the JVM. No Python,
  no shuffle, no explode until the final (doc, pos, fp) unnest — a
  scan-shaped stage that scales with input splits.
- Overlap mining joins documents on selected fingerprints — an
  equi-join whose candidate space is bounded by fingerprint document
  frequency, never n². A ``max_fp_df`` stop-fingerprint guard drops
  degenerate fingerprints (boilerplate shared by thousands of docs)
  before the join, the same skew guard the jaccard/containment tiers
  use (operators/dedup.py).
- Hashes are the first 16 hex chars of md5 over the k-gram text,
  compared as fixed-width hex strings — engine-portable (identical in
  Spark and DuckDB), so results are bit-reproducible cross-engine.
  16 hex chars = 64 bits; collisions only merge fingerprints
  (~n²/2⁶⁴ odds), never corrupt selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nsl_kdd_spark.functions.text import tokens

#: above every md5 hex digit (0-9a-f) — makes the fold's first
#: comparison unconditionally take the first window element.
_HEX_TOP = "g"


def _gram_hashes(toks: Column, k: int) -> Column:
    """Array of 64-bit (16-hex-char) md5 hashes of word k-grams, one
    per position 1..len-k+1. Short docs short-circuit to empty:
    Spark's ``sequence(1, 0)`` counts DOWN (step -1) and would feed
    ``slice`` a zero start (same guard as dedup.word_shingles)."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 16
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """``(id_col, pos, fp)`` — the winnowed fingerprint set per doc.

    ``pos`` is the 1-based k-gram position the fingerprint was
    selected at; each selected position appears exactly once. Docs
    with fewer than ``w + k - 1`` tokens (no full window) produce no
    rows — winnowing's match guarantee starts at that length, so
    shorter docs have no robust fingerprint (filter or exact-hash
    them upstream).

    Selection per window j (over hash array H, windows j..j+w-1) is a
    left-to-right fold keeping ``H[x] <= acc`` — which lands on the
    RIGHTMOST minimum, the tie rule the paper specifies so repeated
    windows of one value select one position each w, not every
    position.
    """
    # Tokens and the hash array MUST be materialized columns before
    # the per-window fold references them: an inlined `hashes`
    # expression is re-evaluated by Catalyst on EVERY element_at in
    # the lambda (the whole md5 transform, O(m) work), turning the
    # O(m·w) fold into O(m²·w) — 60s instead of ~2s on the sf0.01
    # fixture. Two projection steps keep each element_at an O(1)
    # attribute lookup.
    hashes = F.col("__h")
    n_windows = F.size(hashes) - (w - 1)
    selected = F.when(
        F.size(F.col("__tk")) >= k + w - 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.aggregate(
                    F.sequence(j, j + (w - 1)),
                    F.struct(
                        F.lit(_HEX_TOP).alias("fp"), F.lit(0).alias("pos")
                    ),
                    lambda acc, x: F.when(
                        F.element_at(hashes, x) <= acc["fp"],
                        F.struct(
                            F.element_at(hashes, x).alias("fp"),
                            x.alias("pos"),
                        ),
                    ).otherwise(acc),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<fp:string,pos:int>>"))

    return (
        df.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .withColumn("__h", _gram_hashes(F.col("__tk"), k))
        .select(F.col(id_col), F.explode(selected).alias("__s"))
        .select(
            id_col,
            F.col("__s.pos").alias("pos"),
            F.col("__s.fp").alias("fp"),
        )
    )


def overlap_pairs_from_fps(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 1,
    max_fp_df: int | None = 50,
) -> DataFrame:
    """The pair join of :func:`winnow_overlap_pairs` over an ALREADY
    COMPUTED distinct ``(id_col, fp)`` table — the reuse seam for
    callers that need the fingerprint table for more than one purpose
    (the streaming registry ingest pairs the batch AND probes the
    registry from one fp table instead of fingerprinting twice)."""
    fps = fps.select(F.col(id_col).alias("__id"), "fp")
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_fp_df)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), on="fp", how="left_anti")
    a = fps.select(F.col("__id").alias("id_a"), "fp")
    b = fps.select(F.col("__id").alias("id_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
    min_shared: int = 1,
    max_fp_df: int | None = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct winnowed
    fingerprints: ``(id_a, id_b, shared)`` with ``id_a < id_b``.

    The MOSS-style report: because of the winnowing guarantee, any
    pair with a verbatim overlap of ``w + k - 1`` or more tokens is a
    candidate here. ``shared`` counts distinct fingerprint VALUES in
    common (positions differ between docs by construction).

    ``max_fp_df`` drops fingerprints present in more than that many
    documents before the pair join — the stop-fingerprint guard that
    bounds the join's fan-out (a fingerprint in d docs contributes
    d² pairs); at corpus scale boilerplate would otherwise dominate.
    ``None`` disables the guard (exact, fixture-scale only).
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w).select(
        id_col, "fp"
    ).distinct()
    return overlap_pairs_from_fps(
        fps, id_col=id_col, min_shared=min_shared, max_fp_df=max_fp_df
    )
