"""Batch sources: parquet table readers with schema normalization, plus
simulated external fetchers (FTP/CDS/STAC analogs).
"""

from pygeoapi_ingestor_spark.sources.readers import read_events, read_table

__all__ = ["read_events", "read_table"]
