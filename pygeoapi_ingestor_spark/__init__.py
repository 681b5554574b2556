"""PySpark-native analytics engine with the query and data-processing
capabilities of icisk/pygeoapi_ingestor, re-expressed Spark-first.

Reference (read-only, studied for semantics only):
/root/reference/src/pygeoapi_ingestor_plugin/

Layout:
  session     SparkSession factory (AQE, tuned shuffle partitions)
  sources     batch readers + simulated external fetchers (FTP/CDS/STAC)
  operators   the computational surface (temporal, indices, zonal, dedup, ...)
  functions   reusable column-expression helpers
  plans       the named query catalog (key -> spark fn + DuckDB oracle SQL)
  streaming   Structured Streaming pipelines + scheduler shim
  sinks       partitioned writers + collection catalog registry
"""

__version__ = "0.1.0"
