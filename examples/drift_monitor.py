"""Continuous serving-drift monitoring over the events table — the
production wiring of the PSI tier in one file:

    freeze a deterministic baseline (training-window events)
    -> drop "serving" batches as parquet files
    -> availableNow drift stream writes per-batch PSI reports
       (numeric value drift + categorical event-type mix drift)
    -> read the monitor tables, print the per-batch headline PSI
       against the classic 0.10 / 0.25 thresholds

    python examples/drift_monitor.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from nsl_kdd_spark.session import get_session  # noqa: E402
from nsl_kdd_spark.sources.parquet import load_tables  # noqa: E402
from nsl_kdd_spark.streaming.drift import (  # noqa: E402
    monitor_drift_stream,
    monitor_drift_stream_categorical,
    read_drift_reports,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="drift_"
    )
    spark = get_session(master="local[8]", shuffle_partitions=16)
    events = load_tables(spark, sf_dir).events

    # deterministic baseline: the first half of the log (a fixed
    # predicate, not an unseeded sample — the replay-identity rule)
    cut = events.agg(
        F.percentile_approx("ts", 0.5).alias("c")
    ).first().c
    baseline = events.filter(F.col("ts") < cut).persist()
    print("baseline rows:", baseline.count())

    # serving drops: an in-distribution batch (second half of the
    # log) and a synthetically drifted one (values 4x, mix
    # collapsed to refunds)
    drop_dir = f"{work}/drops"
    serving = events.filter(F.col("ts") >= cut)
    serving.coalesce(1).write.mode("append").parquet(drop_dir)

    def drain() -> None:
        for kind, kw in (
            ("value", dict(
                fn=monitor_drift_stream, value_col="value",
                out_path=f"{work}/value_monitor",
                checkpoint_dir=f"{work}/ck_v",
                lo=0.0, hi=20.0, n_bins=10)),
            ("mix", dict(
                fn=monitor_drift_stream_categorical, cat_col="event_type",
                categories=["click", "view", "purchase", "refund"],
                out_path=f"{work}/mix_monitor",
                checkpoint_dir=f"{work}/ck_m")),
        ):
            fn = kw.pop("fn")
            q = fn(
                spark, drop_dir, schema=events.schema,
                baseline=baseline, **kw,
            )
            if not q.awaitTermination(120):
                # a still-running query would absorb the NEXT drop
                # into this batch (and hold its checkpoint dir)
                raise RuntimeError(f"{kind} monitor did not drain in 120s")

    drain()
    drifted = serving.withColumn("value", F.col("value") * 4).withColumn(
        "event_type", F.lit("refund")
    )
    drifted.coalesce(1).write.mode("append").parquet(drop_dir)
    drain()

    for label, path in (("value", f"{work}/value_monitor"),
                        ("mix", f"{work}/mix_monitor")):
        totals = (
            read_drift_reports(spark, path)
            .groupBy("batch_id")
            .agg((F.sum("psi_u") / 1e6).alias("psi"))
            .orderBy("batch_id")
            .collect()
        )
        for r in totals:
            band = ("stable" if r.psi < 0.1
                    else "moderate" if r.psi < 0.25 else "ACTION")
            print(f"{label} drift batch {r.batch_id}: "
                  f"PSI={r.psi:.3f} [{band}]")
    baseline.unpersist()
    print("monitor tables under:", work)


if __name__ == "__main__":
    main()
