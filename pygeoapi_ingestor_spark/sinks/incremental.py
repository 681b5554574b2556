"""Incrementally-maintained rollup state: the aggregate table a 100 TB
deployment CANNOT recompute from scratch per ingest tick.

Reference parity: every scheduled ingest in the reference appends a new
time slice and re-publishes derived statistics (utils_spi.py re-runs the
whole chain per tick — affordable single-node, ruinous at cluster
scale). Here the derived stats live as MERGEABLE per-key state:

- counts / sums (exact DECIMAL) / min / max — plain monoids;
- distinct users as a DataSketches HLL binary (``hll_sketch_agg`` /
  ``hll_union_agg``) — the sketch is the canonical mergeable form of
  COUNT(DISTINCT), so an update folds a batch's sketch into the stored
  one without ever revisiting history.

``update_rollup`` aggregates ONLY the new batch (one shuffle bounded by
key cardinality), merges with the stored state by key, and swaps the
state directory atomically (tmp/bak rename — the compact_collection
dance), so readers never see a half-merged state. ``read_rollup``
finalizes: estimates the sketch and derives the mean from the exact sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_LGK = 12  # ~2.6% relative standard error


def _state_agg(batch: DataFrame, key_cols: list[str], value_col: str,
               user_col: str) -> DataFrame:
    v = F.col(value_col).cast("decimal(28,2)")
    return batch.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).alias("value_sum"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
        F.hll_sketch_agg(F.col(user_col).cast("string"), F.lit(HLL_LGK)).alias(
            "user_sketch"
        ),
    )


def _merge_states(a: DataFrame, b: DataFrame, key_cols: list[str]) -> DataFrame:
    return a.unionByName(b).groupBy(*key_cols).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("value_sum").cast("decimal(28,2)").alias("value_sum"),
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
        F.hll_union_agg("user_sketch", F.lit(True)).alias("user_sketch"),
    )


def update_rollup(
    batch: DataFrame,
    state_path: str,
    key_cols: list[str],
    value_col: str,
    user_col: str,
) -> None:
    """Fold one ingest batch into the stored rollup state (atomic swap)."""
    spark = batch.sparkSession
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())

    fresh = _state_agg(batch, key_cols, value_col, user_col)
    if not fs.exists(hadoop_path):
        fresh.write.mode("overwrite").parquet(state_path)
        return

    stored = spark.read.parquet(state_path)
    merged = _merge_states(stored, fresh, key_cols).localCheckpoint(eager=True)
    tmp = state_path.rstrip("/") + "._state_tmp"
    bak = state_path.rstrip("/") + "._state_bak"
    try:
        merged.write.mode("overwrite").parquet(tmp)
    finally:
        # blocking release at the write boundary (same contract as
        # sinks/collections): the state-swap caller may assert storage
        # is drained immediately after this returns. Leaf-walking
        # helper: survives anyone inserting a projection between the
        # checkpoint and this release (the a62aa76 silent-leak class)
        from pygeoapi_ingestor_spark.functions.storage import free_local_ckpt

        free_local_ckpt(merged, blocking=True)
    from pygeoapi_ingestor_spark.sinks.collections import atomic_dir_swap

    atomic_dir_swap(jvm, fs, state_path, tmp, bak, "rollup")


def read_rollup(spark, state_path: str) -> DataFrame:
    """Finalized view of the state: estimated distinct users + derived
    mean next to the exact monoid columns."""
    s = spark.read.parquet(state_path)
    return s.select(
        *[c for c in s.columns if c != "user_sketch"],
        F.hll_sketch_estimate("user_sketch").cast("bigint").alias("approx_users"),
    ).withColumn(
        "value_mean", F.col("value_sum").cast("double") / F.col("n")
    )
