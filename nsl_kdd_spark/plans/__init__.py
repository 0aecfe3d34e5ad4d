from nsl_kdd_spark.plans.catalog import ORACLE, QUERIES  # noqa: F401
