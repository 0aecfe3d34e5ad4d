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
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
