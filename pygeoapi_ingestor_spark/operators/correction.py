"""Bias correction via empirical quantile mapping.

Reference: bias_correction_cds_process.py:310-400 — per (variable,
init-month, lead-month) a monotone spline maps raw model values onto the
observed distribution, with constant adjustment beyond the fitted range.
The spline coefficients are precomputed offline; the underlying semantics
is quantile mapping: corrected = F_ref^-1(F_model(x)).

Spark-first re-expression with no fitted artifacts: compute each side's
empirical CDF with ``percent_rank`` (one window per series), then match
every model rank to the greatest reference rank <= it — an as-of join on
the rank axis, done with a union + running ``last(ignorenulls)`` window
so there is no non-equi join blowup. Tails clamp to the reference
min/max, mirroring the reference's constant out-of-range adjustment.

Scale: two shuffles (one per window partition key) bounded by series
cardinality; the match step reuses the same partitioning. Each series
sorts within ONE task — correct for the reference's real shape (many
(variable, init-month, lead-month) series, each bounded), but a single
global series degenerates to one sorted partition. For that case,
pre-bucket into quantile bins with ``approx_percentile`` and map per
bin (trades exactness for parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_curve_table(
    fact: DataFrame,
    curve: DataFrame,
    series_cols: list[str],
    x_col: str,
    y_col: str,
    value_col: str,
    out_col: str = "value_adj",
) -> DataFrame:
    """Apply a PRECOMPUTED per-series transfer curve — the reference's
    production bias-correction mode (bias_correction_cds_process.py:
    310-400: fitted ``bctf__*`` parameter artifacts are loaded per
    (variable, init, lead) and applied as a monotone map with constant
    adjustment beyond the fitted range), as opposed to ``quantile_map``
    which re-derives the map from data.

    ``curve`` is a (series..., x, y) point table, collapsed to one
    sorted array per series and BROADCAST; the fact side is corrected in
    a single projection after one broadcast hash join. In-range values
    interpolate linearly between bracketing points; out-of-range values
    get the boundary point's additive offset carried constant
    (y_edge + (value - x_edge)), mirroring the reference's tail
    handling. Rows whose series has no stored curve keep NULL."""
    curves = curve.groupBy(*series_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y")))
        ).alias("_curve")
    )
    joined = fact.join(F.broadcast(curves), series_cols, "left")
    v = F.col(value_col)
    arr = F.col("_curve")
    idx = F.size(F.filter(arr, lambda p: p.getField("x") <= v))
    n = F.size(arr)
    first, last = F.element_at(arr, 1), F.element_at(arr, -1)
    lo = F.element_at(arr, idx)
    hi = F.element_at(arr, idx + 1)
    interp = lo.getField("y") + (hi.getField("y") - lo.getField("y")) * (
        (v - lo.getField("x")) / (hi.getField("x") - lo.getField("x"))
    )
    adj = (
        F.when(arr.isNull(), F.lit(None).cast("double"))
        .when(idx == 0, first.getField("y") + (v - first.getField("x")))
        .when(idx == n, last.getField("y") + (v - last.getField("x")))
        .otherwise(interp)
    )
    return joined.withColumn(out_col, adj).drop("_curve")


def quantile_map(
    model: DataFrame,
    reference: DataFrame,
    series_cols: list[str],
    value_col: str,
    out_col: str = "value_adj",
) -> DataFrame:
    """Map model values onto the reference distribution per series.

    Returns the model rows plus ``out_col`` (step-function empirical
    quantile mapping, exact and deterministic — oracle-able with an
    ASOF JOIN on percent_rank).
    """
    w_m = Window.partitionBy(*series_cols).orderBy(value_col)
    w_r = Window.partitionBy(*series_cols).orderBy(value_col)

    m = model.withColumn("_rank", F.percent_rank().over(w_m))
    r = reference.select(
        *series_cols,
        F.col(value_col).alias("_ref_value"),
    ).withColumn("_rank", F.percent_rank().over(w_r.orderBy("_ref_value")))

    m_tag = m.withColumn("_side", F.lit(1)).withColumn(
        "_ref_value", F.lit(None).cast("double")
    )
    r_tag = r.withColumn("_side", F.lit(0))
    for c in m_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(m_tag.schema[c].dataType))
    r_tag = r_tag.select(*m_tag.columns)

    unioned = m_tag.unionByName(r_tag)
    # reference rows sort first at equal rank => "<=" match
    w_match = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col("_rank").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "_mapped", F.last("_ref_value", ignorenulls=True).over(w_match)
    )
    out_cols = [c for c in model.columns]
    return (
        matched.filter(F.col("_side") == 1)
        .withColumn(out_col, F.col("_mapped"))
        .select(*out_cols, out_col)
    )
