"""Threshold categorization (danger levels).

Reference: ll_nl_danger_levels.py:107-121 — precipitation-deficit value →
color-coded danger class via fixed breakpoints. Re-expressed as a single
CASE expression (whole-stage codegen; zero shuffles for the labeling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (upper_bound_exclusive, label) — the reference's Rijnland deficit scale
DANGER_LEVELS = (
    (50.0, "darkblue"),
    (100.0, "blue"),
    (125.0, "green"),
    (150.0, "yellow"),
    (175.0, "orange"),
    (200.0, "red"),
)
DANGER_FALLBACK = "darkred"


def categorize(value_col, levels=DANGER_LEVELS, fallback: str = DANGER_FALLBACK) -> Column:
    """value → class label by ascending breakpoints (first match wins)."""
    if not levels:
        raise ValueError("categorize needs at least one (bound, label) level")
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    expr = None
    for bound, label in levels:
        cond = col < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(fallback)


def categorize_counts(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "danger_level"
) -> DataFrame:
    """Label every row, then count per (group, label)."""
    labeled = df.withColumn(out_col, categorize(value_col))
    return labeled.groupBy(*group_cols, out_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg(value_col).alias("avg_value"),
    )
