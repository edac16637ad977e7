"""Training-data pipeline functions: text stats, dedup, similarity.

Each module exposes (a) Spark DataFrame builders using native
``pyspark.sql.functions`` (JVM-side, whole-stage codegen — UDFs only where
semantics require Python), and (b) matching ANSI-SQL oracle strings runnable
by DuckDB on the same parquet tables, kept aligned by sharing the formula
builders in :mod:`ocr_platform_spark.functions.common`.
"""
