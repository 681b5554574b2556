"""Sinks: partitioned collection writer + catalog registry."""

from pygeoapi_ingestor_spark.sinks.collections import (
    CollectionCatalog,
    write_collection,
)

__all__ = ["CollectionCatalog", "write_collection"]
