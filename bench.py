"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Execution = write to the noop sink: the full plan runs (scan ->
shuffle -> agg/join), nothing collects to the driver, so timings
measure the engine, not Py4J serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nsl_kdd_spark.plans.catalog import QUERIES  # noqa: E402
from nsl_kdd_spark.session import get_session  # noqa: E402

# Headline set: one per operator family (agg / star join / window /
# top-k / text / dedup-lsh / jaccard / knn / event windows / sessions).
HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q08_topk_per_group",
    "q17_date_agg",
    "q19_rollup",
    "q24_text_stats",
    "q28_jaccard_pairs",
    "q29_minhash_lsh",
    "q31_knn_bruteforce",
    "q34_tumbling_window",
    "q36_session_window",
    "q46_shipping_priority",
    "q52_percentiles",
    "q54_asof_join",
    "q65_resample_ffill",
    "q66_grouping_sets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_session(
        app_name="nsl-kdd-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM codegen + parquet footers, outside the timings
    from nsl_kdd_spark.sources.parquet import load_tables

    t = load_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "documents", "embeddings", "events"):
        t.table(name).count()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline query wall-clock, noop sink, cold cache",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
