"""Zonal and ensemble statistics.

Reference semantics:
- zonal stats: utils_spi.py:565-621 — per-basin min/max/median/p05..p95
  of the SPI field per time step (``basin_zonal_stat``).
- ensemble stats: utils_spi.py:576-590 + CDS seasonal forecasts — the
  ensemble-member dimension ``r`` is collapsed with median/min/max/
  percentiles.

Spark-first: a zone is a join key (dimension table, broadcast), the
statistics are one groupBy — percentiles via the exact interpolated
``percentile`` aggregate so results are deterministic and oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZONAL_PERCENTILES = (0.05, 0.10, 0.30, 0.50, 0.70, 0.90, 0.95)


def zonal_stats(
    fact: DataFrame,
    zones: DataFrame,
    join_key: str,
    zone_col: str,
    bucket_col,
    value_col: str,
    percentiles: tuple[float, ...] = (0.05, 0.5, 0.95),
) -> DataFrame:
    """Per (zone, bucket) min/max + interpolated percentiles.

    ``zones`` is a small dimension (basin table analog) — broadcast so
    the fact side never shuffles for the join. Percentiles come from the
    bucket drill-down (functions/ranks.exact_percentiles), never the
    buffering ``percentile`` aggregate: a (zone, week) group holds every
    event of a basin-week, which one task cannot buffer at 100 TB.
    Identical values (SQL percentile_cont interpolation) either way.
    """
    from pygeoapi_ingestor_spark.functions import ranks

    bucket = bucket_col if not isinstance(bucket_col, str) else F.col(bucket_col)
    joined = fact.join(F.broadcast(zones), on=join_key).select(
        F.col(zone_col).alias("_zone"), bucket.alias("_bucket_v"), F.col(value_col).alias("_v")
    )
    base = joined.groupBy("_zone", "_bucket_v").agg(
        F.min("_v").alias("v_min"),
        F.max("_v").alias("v_max"),
    )
    # exact_percentiles requires a non-null value column (SQL percentile
    # aggregates skip nulls); unfiltered nulls would land in bucket -1,
    # shift every percentile position and corrupt the interpolation
    pcts = ranks.exact_percentiles(
        joined.filter(F.col("_v").isNotNull()),
        series_cols=["_zone", "_bucket_v"], value_col="_v",
        ps=list(percentiles), tiebreak_cols=[],
    )
    wide = pcts.groupBy("_zone", "_bucket_v").agg(
        *[
            F.min(F.when(F.col("p") == float(p), F.col("pct"))).alias(
                f"p{int(round(p * 100)):02d}"
            )
            for p in percentiles
        ]
    )
    # left join: a (zone, bucket) group whose values are ALL null still
    # surfaces (with null percentiles) instead of vanishing
    out = base.join(wide, ["_zone", "_bucket_v"], "left")
    # derive the output name of bucket_col portably (works on classic and
    # Connect — no private _jc): the analyzed single-column projection's
    # schema carries exactly the alias the caller gave the expression
    bucket_name = fact.select(bucket_col).columns[0]
    return out.withColumnRenamed("_zone", zone_col).withColumnRenamed(
        "_bucket_v", bucket_name
    )


def ensemble_stats(
    df: DataFrame,
    bucket_cols: list,
    value_col: str,
    percentiles: tuple[float, ...] = (0.10, 0.90),
) -> DataFrame:
    """Collapse the ensemble-member dimension: per bucket median/min/max
    plus requested percentiles (reference ``spi_ensemble``/``spi_perc``).

    The buffering ``percentile`` aggregate is fine HERE: group size is
    the ensemble-member count (tens, by data model), not a data-scaled
    row count — unlike zonal_stats, which drills down instead."""
    aggs = [
        F.min(value_col).alias("ens_min"),
        F.max(value_col).alias("ens_max"),
        F.percentile(value_col, F.lit(0.5)).alias("ens_median"),
        F.count(F.lit(1)).cast("bigint").alias("ens_n"),
    ]
    for p in percentiles:
        aggs.append(
            F.percentile(value_col, F.lit(p)).alias(f"ens_p{int(round(p * 100)):02d}")
        )
    return df.groupBy(*bucket_cols).agg(*aggs)
