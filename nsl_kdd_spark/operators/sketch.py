"""Count-min sketch: fixed-memory frequency estimation (the 100 TB
scale path beside the exact heavy-hitter pass in
``ml/text_features.ngram_topk`` — same role the HLL++/GK tier in q63
plays beside exact distinct/percentiles).

Spark-first shape: the sketch is a (depth x width) counter TABLE
built with one explode + one map-side-combined count — no UDAF, no
driver-side array. ``depth * width`` rows bound the sketch size
regardless of input cardinality; point estimates are a broadcast join
of the probe keys against the sketch. Hashing is ``xxhash64(key, d)``
(seeded per row of the sketch), deterministic across runs and
partitionings — estimates are repeatable bit-for-bit, but the hash
family is Spark-specific, so cross-engine checks are tolerance-based
(rows-only driver row; the overcount contract is pinned in unit
tests: estimate >= true count, Pr[estimate > true + (e/width) * N]
< (1/e)^depth per probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key, d: int, width: int):
    return F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width))


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) with depth*width rows max.

    One pass: each input row contributes to ``depth`` counters via a
    literal-array explode (no shuffle until the tiny grouped count).
    ``weight_col`` aggregates weighted frequencies (e.g. token counts
    already rolled up per document).
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.col(key_col).alias("__k"), w.alias("__w")
    ).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _bucket(F.col("__k"), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__e"),
        "__w",
    )
    return (
        rows.groupBy(F.col("__e.d").alias("d"), F.col("__e.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-estimate each probe key: min over the depth counters.

    The probe side explodes to ``depth`` rows and equi-joins the
    sketch on (d, bucket) — the sketch is depth*width rows, so Spark
    broadcasts it; the probe table never shuffles. Missing buckets
    mean the key was never inserted: estimate 0.
    """
    probe_rows = probes.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _bucket(F.col(key_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__e"),
    ).select(key_col, F.col("__e.d").alias("d"), F.col("__e.bucket").alias("bucket"))
    return (
        probe_rows.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
