"""Grid resampling: bilinear interpolation of a gridded field onto
target points.

Reference: bias_correction_cds_process.py:272,295 — ``ds.interp(lat=...,
lon=..., method="linear")`` regrids CDS fields onto the bias-parameter
grid. Tabular re-expression: the source grid is (time, lat, lon, value)
rows; each target point finds its four bracketing grid nodes and blends
them with the standard bilinear weights.

Spark-first: the grid AXES (distinct lats, distinct lons — tiny) are
collected and inlined to compute each target's bracketing coordinates as
pure expressions; the four corner lookups are one equi-join against the
grid keyed by (time, lat, lon) — shuffle bounded by target rows x 4, no
range join, no cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bracket_expr(axis: list[float], col):
    """lo/hi bracketing coordinates on a sorted axis as CASE chains
    (first matching cell wins; NULL outside the axis envelope)."""
    lo_expr = None
    hi_expr = None
    for a, b in zip(axis, axis[1:]):
        cond = (col >= F.lit(float(a))) & (col <= F.lit(float(b)))
        lo_expr = F.when(cond, F.lit(float(a))) if lo_expr is None else lo_expr.when(cond, F.lit(float(a)))
        hi_expr = F.when(cond, F.lit(float(b))) if hi_expr is None else hi_expr.when(cond, F.lit(float(b)))
    return lo_expr, hi_expr


def bilinear_regrid(
    grid: DataFrame,
    targets: DataFrame,
    value_col: str = "tp",
    time_col: str = "time",
    lat_col: str = "lat",
    lon_col: str = "lon",
    out_col: str = "value_interp",
) -> DataFrame:
    """Interpolate ``grid[value_col]`` at each target (time, lat, lon).

    Targets outside the grid envelope get NULL. Exactly-on-node targets
    resolve via zero-width weights (0/0 guarded to take the node value).
    """
    lats = sorted(r[0] for r in grid.select(lat_col).distinct().collect())
    lons = sorted(r[0] for r in grid.select(lon_col).distinct().collect())
    if len(lats) < 2 or len(lons) < 2:
        raise ValueError("grid must have at least 2 distinct lats and lons")

    t_lat, t_lon = F.col("t_lat"), F.col("t_lon")
    lat_lo, lat_hi = _bracket_expr(lats, t_lat)
    lon_lo, lon_hi = _bracket_expr(lons, t_lon)

    t = targets.select(
        # unique row id so duplicate target points survive the corner
        # re-assembly groupBy as distinct output rows
        F.monotonically_increasing_id().alias("_tid"),
        F.col(time_col).alias("t_time"),
        F.col(lat_col).alias("t_lat"),
        F.col(lon_col).alias("t_lon"),
        *[c for c in targets.columns if c not in (time_col, lat_col, lon_col)],
    ).withColumns(
        {
            "_lat_lo": lat_lo,
            "_lat_hi": lat_hi,
            "_lon_lo": lon_lo,
            "_lon_hi": lon_hi,
        }
    )

    # four corner lookups via one explode + equi-join on (time, lat, lon)
    corners = F.array(
        *[
            F.struct(
                F.col(f"_lat_{a}").alias("c_lat"),
                F.col(f"_lon_{b}").alias("c_lon"),
                F.lit(f"{a}{b}").alias("corner"),
            )
            for a in ("lo", "hi")
            for b in ("lo", "hi")
        ]
    )
    t_exp = t.withColumn("_c", F.explode(corners)).select(
        "*", F.col("_c.c_lat").alias("c_lat"), F.col("_c.c_lon").alias("c_lon"),
        F.col("_c.corner").alias("corner"),
    ).drop("_c")

    g = grid.select(
        F.col(time_col).alias("t_time"),
        F.col(lat_col).alias("c_lat"),
        F.col(lon_col).alias("c_lon"),
        F.col(value_col).alias("_gv"),
    )
    joined = t_exp.join(g, ["t_time", "c_lat", "c_lon"], "left")

    # bilinear blend: collect the 4 corner values back to one row
    pivot = joined.groupBy(
        "_tid", "t_time", "t_lat", "t_lon", "_lat_lo", "_lat_hi", "_lon_lo", "_lon_hi",
        *[c for c in targets.columns if c not in (time_col, lat_col, lon_col)],
    ).agg(
        *[
            F.first(F.when(F.col("corner") == cc, F.col("_gv")), ignorenulls=True).alias(f"_v{cc}")
            for cc in ("lolo", "lohi", "hilo", "hihi")
        ]
    )

    dlat = F.col("_lat_hi") - F.col("_lat_lo")
    dlon = F.col("_lon_hi") - F.col("_lon_lo")
    wy = F.when(dlat > 0, (t_lat - F.col("_lat_lo")) / dlat).otherwise(F.lit(0.0))
    wx = F.when(dlon > 0, (t_lon - F.col("_lon_lo")) / dlon).otherwise(F.lit(0.0))
    interp = (
        F.col("_vlolo") * (1 - wy) * (1 - wx)
        + F.col("_vlohi") * (1 - wy) * wx
        + F.col("_vhilo") * wy * (1 - wx)
        + F.col("_vhihi") * wy * wx
    )
    in_bounds = (
        (t_lat >= F.lit(float(lats[0])))
        & (t_lat <= F.lit(float(lats[-1])))
        & (t_lon >= F.lit(float(lons[0])))
        & (t_lon <= F.lit(float(lons[-1])))
    )
    return pivot.withColumn(
        out_col, F.when(in_bounds, interp)
    ).select(
        F.col("t_time").alias(time_col),
        F.col("t_lat").alias(lat_col),
        F.col("t_lon").alias(lon_col),
        *[c for c in targets.columns if c not in (time_col, lat_col, lon_col)],
        out_col,
    )
