"""Piecewise-linear curve interpolation (stage → discharge rating curves).

Reference: rer_river_discharge_arpae_process.py:325-457
(``portata_lineare``) — for a measured water level ``h``, find the
bracketing curve points (h1,q1),(h2,q2) and linearly interpolate the
discharge; outside the curve range the reference yields no value.

Spark-first: the curve is a tiny dimension — turn its points into
segments with a ``lead`` window, then broadcast range-join the fact rows
into their segment. The fact side never shuffles; the join is a
BroadcastNestedLoopJoin over a handful of segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curve_segments(curve: DataFrame, key_cols: list[str], x_col: str, y_col: str) -> DataFrame:
    """(key, x, y) points → (key, x_lo, x_hi, y_lo, y_hi) segments."""
    w = Window.partitionBy(*key_cols).orderBy(x_col)
    return (
        curve.withColumn("_x_hi", F.lead(x_col).over(w))
        .withColumn("_y_hi", F.lead(y_col).over(w))
        .filter(F.col("_x_hi").isNotNull())
        .select(
            *key_cols,
            F.col(x_col).alias("x_lo"),
            F.col("_x_hi").alias("x_hi"),
            F.col(y_col).alias("y_lo"),
            F.col("_y_hi").alias("y_hi"),
        )
    )


def interpolate_points_expr(
    points: list[tuple[float, float]], value_col: str,
    clamp_edges: bool = False,
) -> "F.Column":
    """Fast path for a single literal curve: compile the piecewise-linear
    map into one chained CASE expression — pure projection, no join, no
    shuffle; whole-stage codegen evaluates it in the scan stage. This is
    the 100 TB path for fixed rating tables (reference:
    rer_river_discharge_arpae_process.py:325-457).

    ``clamp_edges=True`` applies the reference's portata_lineare edge
    semantics (input below the curve → first Q, above → last Q);
    the default keeps NULL outside the curve's domain.
    """
    if len(points) < 2:
        raise ValueError("a piecewise-linear curve needs at least 2 points")
    pts = sorted(points)
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    expr = None
    if clamp_edges:
        expr = F.when(v <= F.lit(pts[0][0]), F.lit(pts[0][1])).when(
            v >= F.lit(pts[-1][0]), F.lit(pts[-1][1])
        )
    for (x_lo, y_lo), (x_hi, y_hi) in zip(pts, pts[1:]):
        interp = F.lit(y_lo) + (F.lit(y_hi) - F.lit(y_lo)) * (v - F.lit(x_lo)) / (
            F.lit(x_hi) - F.lit(x_lo)
        )
        cond = (v >= F.lit(x_lo)) & (v < F.lit(x_hi))
        expr = F.when(cond, interp) if expr is None else expr.when(cond, interp)
    if not clamp_edges:
        # close the final segment at the curve max
        x_max = pts[-1][0]
        expr = expr.when(v == F.lit(x_max), F.lit(pts[-1][1]))
    return expr.otherwise(F.lit(None).cast("double"))


def interpolate_on_curve(
    fact: DataFrame,
    curve: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    value_col: str,
    out_col: str = "interp_value",
) -> DataFrame:
    """Linear interpolation of ``fact[value_col]`` on the per-key curve.

    Rows outside the curve's x-range get NULL (reference behavior for
    levels off the rating table). Half-open segments [x_lo, x_hi) with the
    final segment closed so the curve max is included.
    """
    segs = curve_segments(curve, key_cols, x_col, y_col)
    maxes = curve.groupBy(*key_cols).agg(F.max(x_col).alias("_x_max"))
    segs = (
        segs.join(F.broadcast(maxes), key_cols)
        .select(
            *[F.col(k).alias(f"_seg_{k}") for k in key_cols],
            "x_lo",
            "x_hi",
            "y_lo",
            "y_hi",
            "_x_max",
        )
    )

    v = F.col(value_col)
    in_segment = (v >= F.col("x_lo")) & (
        (v < F.col("x_hi"))
        | ((F.col("x_hi") == F.col("_x_max")) & (v <= F.col("x_hi")))
    )
    key_eq = [F.col(k) == F.col(f"_seg_{k}") for k in key_cols]
    cond = in_segment
    for ke in key_eq:
        cond = cond & ke
    # left join keeps out-of-range rows with NULL interp (reference: no
    # discharge for levels off the rating table)
    joined = fact.join(F.broadcast(segs), on=cond, how="left")
    frac = (v - F.col("x_lo")) / (F.col("x_hi") - F.col("x_lo"))
    return joined.withColumn(
        out_col, F.col("y_lo") + (F.col("y_hi") - F.col("y_lo")) * frac
    ).drop(*[f"_seg_{k}" for k in key_cols], "x_lo", "x_hi", "y_lo", "y_hi", "_x_max")
