"""nsl_kdd_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-implementation of the data-processing and
query capabilities of the reference (``thinline72/nsl-kdd``, a PySpark
intrusion-detection notebook — see SURVEY.md), generalized into a
composable DataFrame-operator library and extended with the operators a
large-scale (100 TB design point) training-data pipeline needs:
deduplication, similarity search, text analysis, multimodal columns and
structured streaming.

Design rules (SURVEY.md §3/§4):
 - every operator is a pure function ``DataFrame -> DataFrame`` (or a
   small config dataclass + function), declaratively expressed so
   Catalyst sees the whole plan;
 - no row-at-a-time Python UDFs on hot paths — built-in
   ``pyspark.sql.functions`` first, Arrow-batched pandas UDFs second;
 - broadcast small dimensions, let AQE handle skew/coalescing;
 - ids are deterministic (assigned once, derived from source keys).
"""

__version__ = "0.1.0"

from nsl_kdd_spark.session import get_session  # noqa: F401
