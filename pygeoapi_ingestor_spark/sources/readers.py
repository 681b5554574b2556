"""Parquet readers with schema normalization.

The events table is written with nanosecond timestamps, which Spark's
parquet reader rejects by default. We flip the session to read nanos as
raw longs, then rebuild a microsecond TimestampType column with exact
integer arithmetic (``div`` — a double round-trip would lose sub-ms
precision at 2^60 nanosecond magnitudes). The source data is
microsecond-precision, so the conversion is lossless and matches
DuckDB's own ns->us truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session-level side effect by design: the conf must remain true when
    # the (lazy) scan executes, so it cannot be restored after this call.
    # Other ns-timestamp parquet read in the same session will surface
    # those columns as raw bigint nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
