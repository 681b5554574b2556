"""Raw-SQL API surface: register the standard tables as temp views and
run ANSI SQL against them.

A user of the reference queries collections through OGC API; the
engine-native equivalent is SQL over registered views — every catalog
query in ``plans`` can also be phrased directly here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pygeoapi_ingestor_spark.session import TABLES
from pygeoapi_ingestor_spark.sources.readers import read_table


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create/replace one temp view per standard table. Returns the view
    names. The events view goes through the nanos-normalizing reader."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        read_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run SQL; if ``sf_dir`` is given, (re)register the views first."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)
