"""Late-data semantics (append mode — the documented guarantees):

- a window is emitted exactly ONCE, only after the watermark passes
  its end (finalization);
- late-but-within-horizon rows merge into their window before it
  finalizes;
- rows arriving after their window finalized never produce another
  emission — the output stream is effectively late-proof.

(Update-mode aggregation in Spark intentionally gives weaker,
best-effort dropping — state may outlive the watermark — so the
engine's contract for exactly-once windowed output is append mode;
bounded-state dedup is covered by dropDuplicatesWithinWatermark in
test_streaming.py.)"""

from __future__ import annotations

import tempfile
import time
from datetime import datetime

from pyspark.sql import functions as F

from nsl_kdd_spark.streaming.events import tumbling_agg


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order


def test_append_mode_finalizes_once_and_ignores_too_late(spark):
    d = datetime
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        # batch 1: windows 10 and 11 accumulate
        _write_batch(spark, src, [
            (1, d(2024, 1, 1, 10, 15), 1.0),
            (2, d(2024, 1, 1, 10, 45), 1.0),
            (3, d(2024, 1, 1, 11, 0), 1.0),
        ])
        # batch 2: in-horizon late row merges into window 10 (watermark
        # is still 1970 -> 10:00 during this batch)
        _write_batch(spark, src, [(4, d(2024, 1, 1, 10, 30), 1.0)])
        # batch 3: 13:00 advances the watermark to 12:00 (effective
        # from the NEXT batch)
        _write_batch(spark, src, [(5, d(2024, 1, 1, 13, 0), 1.0)])
        # batch 4: runs with watermark 12:00 -> windows 10, 11
        # finalize and emit during this batch
        _write_batch(spark, src, [(6, d(2024, 1, 1, 13, 30), 1.0)])
        # batch 5: too late — window 10 already emitted and evicted;
        # must never produce another emission
        _write_batch(spark, src, [(7, d(2024, 1, 1, 10, 50), 1.0)])

        stream = (
            spark.readStream
            .schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = tumbling_agg(
            stream, "ts", "1 hour", keys=[],
            aggs=[F.count(F.lit(1)).alias("n")],
            watermark="1 hour",
        )
        q = (
            agg.select("window_start", "n")
            .writeStream.format("memory").queryName("t_late")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        rows = sorted(
            (r["window_start"].strftime("%H"), r["n"])
            for r in spark.sql("SELECT * FROM t_late").collect()
        )
        # exactly one emission per finalized window; late merge counted;
        # 13:00 window never finalized (stream ended), too-late row
        # produced nothing
        assert rows == [("10", 3), ("11", 1)]
