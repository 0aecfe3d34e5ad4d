"""SparkSession factory with scale-oriented defaults.

The reference pinned ``local[8]`` + ``spark.default.parallelism``
(reference README.md:76, ipynb cell 11). The engine instead turns on
AQE and lets runtime statistics pick shuffle partitioning, which is the
setting that survives a 1000-executor / 100 TB deployment unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB design point; every one of these is a
# no-op to override per-cluster via spark-submit --conf.
_ENGINE_CONF: dict[str, str] = {
    # AQE: runtime partition coalescing, skew-join splitting, and
    # broadcast-join demotion/promotion from observed sizes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas boundary (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: dims like region/nation/part stay broadcast
    # even at high SF; AQE re-checks at runtime anyway.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off: the engine mirrors the reference's permissive arithmetic
    # (divide-by-zero -> null handled explicitly, SURVEY.md §2.2 P10).
    "spark.sql.ansi.enabled": "false",
    # Stable session timezone so timestamp results match the DuckDB
    # oracle regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Optimization r13 (guide §1.2 per-task work): InferFiltersFromGenerate
    # inserts `size(e) > 0 AND e IS NOT NULL` below every non-outer
    # explode/posexplode, INLINING the generator's input expression into
    # the filter condition. Whole-stage codegen does not share
    # subexpressions across the Filter/Project boundary, so every
    # explode whose input is computed in the same stage — the engine's
    # gram/shingle/bucket arrays: tokenize + n-gram build + hash per
    # document — evaluates that whole pipeline TWICE per row. Generate
    # already skips empty/null arrays, so the inferred filter is
    # redundant work unless it can push to a scan, which never happens
    # for computed arrays (and the engine's explodes of STORED arrays
    # sit behind checkpoint/shuffle boundaries where the filter is a
    # cheap column test). Excluding the rule is semantics-preserving by
    # construction (it only ever ADDS redundant filters). Interleaved
    # same-session A/B at sf0.1, min-of-3 noop-sink: dsir_fit_select
    # 10.38 -> 4.79 s, classify_text 4.53 -> 2.45 s, duplicated_spans
    # 7.76 -> 3.84 s. Scale-independent: the duplicated evaluation is
    # per-row CPU in the scan stage at any cluster size.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # Spark's default driver memory is 1g; in local mode the driver JVM
    # IS the executor, so size it like one (overridable per-process via
    # SPARK_GRAFT_DRIVER_MEM; a real cluster sets executor memory via
    # spark-submit and this conf only affects the driver).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_session(
    app_name: str = "nsl-kdd-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so
    the same entry points serve tests (local) and cluster (spark-submit
    provides the master) without code changes.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(_ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
        # merge, don't replace, the optimizer-rule exclusion (advice
        # r13): a caller/deployment exclusion list would otherwise
        # silently re-enable InferFiltersFromGenerate (measured ~2x
        # per-row scan-stage regression on every explode-of-computed-
        # array operator) — and ours would silently drop theirs
        key = "spark.sql.optimizer.excludedRules"
        if key in extra_conf:
            ours = _ENGINE_CONF[key]
            theirs = extra_conf[key]
            if ours not in theirs.split(","):
                conf[key] = f"{theirs},{ours}"
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
