from nsl_kdd_spark.sources.csv import load_nsl_kdd  # noqa: F401
from nsl_kdd_spark.sources.parquet import Tables, load_tables  # noqa: F401
