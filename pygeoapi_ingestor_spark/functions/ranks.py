"""Distributed ranking: exact rank / row_number / ntile without a
single-partition sort per series.

``Window.partitionBy(series)`` puts every row of a series in ONE task —
fine when series cardinality is high (the data-model assumption of the
temporal operators), a scale-killer when the catalog binds a window to a
handful of keys (the events table has 5 event types). These helpers use
the classic two-phase range-ranking construction instead:

1. bucket each row by value range (equal-width over the per-series
   min/max — one tiny aggregate, broadcast back);
2. count rows per (series, bucket) and turn the counts into exclusive
   cumulative OFFSETS (window over the series x buckets summary — tiny);
3. rank locally within (series, bucket) and add the bucket's offset.

Equal values always land in the same bucket (bucket is a function of the
value), so tie semantics are exactly those of rank(); with a unique
tiebreak column the same construction yields exact row_number(), and
ntile derives from row_number + the per-series count in closed form.
The only full-data shuffle is the local-rank window, partitioned by
(series, bucket) — parallelism scales with n_buckets, not key count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _with_buckets(
    df: DataFrame, series_cols: list[str], value_col: str, n_buckets: int
) -> DataFrame:
    """Attach _bucket (value-range bucket id) and _n (series row count)."""
    stats = df.groupBy(*series_cols).agg(
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    joined = df.join(F.broadcast(stats), series_cols)
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(n_buckets))
    # NULL values get the dedicated bucket -1 so they sort before every
    # real bucket — matching a plain window's default nulls-first order —
    # instead of dropping out of the (series, _bucket) equi-joins.
    bucket = (
        F.when(F.col(value_col).isNull(), F.lit(-1))
        .when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("_mn")) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )
    return joined.withColumn("_bucket", bucket).drop("_mn", "_mx")


def _with_offsets(df: DataFrame, series_cols: list[str]) -> DataFrame:
    """Attach _offset = rows in strictly lower buckets of the series."""
    counts = df.groupBy(*series_cols, "_bucket").agg(
        F.count(F.lit(1)).alias("_bcnt")
    )
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_bcnt").over(w), F.lit(0))
    ).drop("_bcnt")
    return df.join(F.broadcast(offsets), [*series_cols, "_bucket"])


def bucketed_rank(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    n_buckets: int = 32,
    out_col: str = "rank",
    count_col: str = "n",
) -> DataFrame:
    """Exact per-series rank() (ties share the min rank) + series count,
    with the sort partitioned by (series, bucket)."""
    b = _with_offsets(_with_buckets(df, series_cols, value_col, n_buckets), series_cols)
    w_local = Window.partitionBy(*series_cols, "_bucket").orderBy(value_col)
    return (
        b.withColumn(out_col, F.col("_offset") + F.rank().over(w_local))
        .withColumnRenamed("_n", count_col)
        .drop("_bucket", "_offset")
    )


def bucketed_row_number(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    n_buckets: int = 32,
    out_col: str = "rn",
    count_col: str = "n",
) -> DataFrame:
    """Exact per-series row_number() ordered by (value, tiebreaks) — the
    tiebreaks must make the composite order unique for the result to be
    deterministic (same contract as a plain window row_number)."""
    b = _with_offsets(_with_buckets(df, series_cols, value_col, n_buckets), series_cols)
    w_local = Window.partitionBy(*series_cols, "_bucket").orderBy(
        value_col, *tiebreak_cols
    )
    return (
        b.withColumn(out_col, F.col("_offset") + F.row_number().over(w_local))
        .withColumnRenamed("_n", count_col)
        .drop("_bucket", "_offset")
    )


def exact_percentiles(
    df: DataFrame,
    series_cols: list[str],
    value_col: str,
    ps: list[float],
    tiebreak_cols: list[str],
    n_buckets: int = 256,
    p_col: str = "p",
    out_col: str = "pct",
) -> DataFrame:
    """Exact linear-interpolated percentiles (SQL ``percentile_cont`` /
    numpy 'linear') per series, WITHOUT sorting the series.

    Spark's exact ``percentile`` aggregate buffers every value of a group
    in one task — a scale-killer when the series key is low-cardinality
    (5 event types x 100 TB = 20 TB per task). This uses bucket
    drill-down instead:

    1. range-bucket every row (`_with_buckets` — one tiny stats agg,
       broadcast back, no shuffle of the fact table);
    2. count rows per (series, bucket) and prefix-sum the counts into
       exclusive offsets (tiny);
    3. the percentile positions lo/hi = floor/ceil((n-1)*p) are known
       from the counts alone, so only buckets whose [offset,
       offset+count) range covers a needed position are ranked at all —
       the sort touches O(|ps| * n/n_buckets) rows, not n;
    4. join the two neighbour values and interpolate
       ``v_lo + (v_hi - v_lo) * frac``.

    Precondition: ``value_col`` non-null (same contract as the SQL
    aggregate, which skips nulls — callers filter first).
    """
    b = _with_buckets(df, series_cols, value_col, n_buckets)

    counts = b.groupBy(*series_cols, "_bucket").agg(
        F.count(F.lit(1)).alias("_bcnt"), F.first("_n").alias("_n")
    )
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_bcnt").over(w), F.lit(0))
    )

    # (series, p, lo, hi, frac): 0-based neighbour positions per series.
    # All-double arithmetic, mirrored verbatim in the oracle SQL so the
    # interpolation fraction is bit-identical across engines.
    ps_df = offsets.sparkSession.createDataFrame(
        [(float(p),) for p in ps], f"{p_col} double"
    )
    pos = (
        offsets.select(*series_cols, "_n").distinct()
        .crossJoin(F.broadcast(ps_df))
        .withColumn("_target", (F.col("_n") - F.lit(1)) * F.col(p_col))
        .select(
            *series_cols,
            p_col,
            F.floor("_target").cast("long").alias("_lo"),
            F.ceil("_target").cast("long").alias("_hi"),
            (F.col("_target") - F.floor("_target")).alias("_frac"),
        )
    )
    # renamed key columns break the shared lineage with `offsets`/`b`,
    # avoiding Spark's ambiguous-self-join resolution
    needed = (
        pos.select(
            *[F.col(c).alias(f"_k_{c}") for c in series_cols],
            F.explode(F.array("_lo", "_hi")).alias("_pos"),
        )
        .distinct()
    )

    # buckets whose global-position range covers a needed position
    keep = (
        offsets.join(
            F.broadcast(needed),
            [
                *[offsets[c] == needed[f"_k_{c}"] for c in series_cols],
                needed["_pos"] >= offsets["_offset"],
                needed["_pos"] < offsets["_offset"] + offsets["_bcnt"],
            ],
        )
        .select(*series_cols, "_bucket", "_offset")
        .distinct()
    )

    pruned = b.drop("_n").join(F.broadcast(keep), [*series_cols, "_bucket"])
    w_local = Window.partitionBy(*series_cols, "_bucket").orderBy(
        value_col, *tiebreak_cols
    )
    ranked = pruned.withColumn(
        "_idx", F.col("_offset") + F.row_number().over(w_local) - 1
    )

    hits = ranked.join(
        F.broadcast(needed),
        [
            *[ranked[c] == needed[f"_k_{c}"] for c in series_cols],
            ranked["_idx"] == needed["_pos"],
        ],
    ).select(*series_cols, "_idx", value_col)
    out = (
        pos.join(hits, series_cols)
        .filter((F.col("_idx") == F.col("_lo")) | (F.col("_idx") == F.col("_hi")))
        .groupBy(*series_cols, p_col)
        .agg(
            F.min(F.when(F.col("_idx") == F.col("_lo"), F.col(value_col))).alias("_vlo"),
            F.min(F.when(F.col("_idx") == F.col("_hi"), F.col(value_col))).alias("_vhi"),
            F.first("_frac").alias("_frac"),
        )
        .withColumn(
            out_col, F.col("_vlo") + (F.col("_vhi") - F.col("_vlo")) * F.col("_frac")
        )
        .drop("_vlo", "_vhi", "_frac")
    )
    return out


def ntile_expr(rn_col: str, count_col: str, n_tiles: int) -> Column:
    """SQL ntile(k) from an exact row number and the partition count:
    the first n%k tiles take ceil(n/k) rows, the rest floor(n/k) —
    closed form, no extra pass. Integer ceil via floor((a+b-1)/b)
    (exact in double well past any realistic partition size)."""
    rn, n = F.col(rn_col), F.col(count_col)
    k = F.lit(n_tiles)
    q = F.floor(n / k)
    r = n - q * k
    big_span = r * (q + 1)
    in_big = F.floor((rn + q) / (q + 1))
    in_small = r + F.floor((rn - big_span + q - 1) / q)
    return F.when(rn <= big_span, in_big).otherwise(in_small).cast("int")
