"""Distributed linear algebra on embedding columns.

Exact-arithmetic building blocks (integer / decimal accumulation) so the
iterative algorithms stay value-hash-gateable by an unrolled SQL twin —
the same determinism contract as ``similarity.kmeans_fit_int8``.

Reference parity: the reference computes PCA-style reductions with
single-node numpy (see SURVEY.md §2 block C provenance notes); here each
iteration is ONE map-side-combinable Spark aggregation whose state is a
``dim``-length vector, so the pass count — not the data size — is the
cost driver at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rescale target after each power-iteration step: entries of the
# iterate stay in [-PCA_SCALE, PCA_SCALE], keeping every integer
# product inside int64 on the Spark side (the SQL twin uses HUGEINT)
PCA_SCALE = 10_000


def _trunc_div(a: int, b: int) -> int:
    """Truncating (toward-zero) division on Python big-ints — pinned to
    match DuckDB's integer ``//`` (measured: ``-7 // 2 = -3``, i.e.
    truncation, NOT Python's floor ``-4``); ``int(a / b)`` would round
    through float64 and lose exactness on >2^53 products. ``b > 0``
    always (it is a max of absolute values)."""
    if a >= 0:
        return a // b
    return -((-a) // b)


def power_iteration_int8(
    df: DataFrame,
    vec_col: str,
    dim: int,
    iters: int = 3,
    scale: int = PCA_SCALE,
) -> tuple[list[int], int, int, int]:
    """Top principal direction of an int8-quantized embedding corpus via
    power iteration on the (uncentered) Gram matrix A^T A — fully
    deterministic integer arithmetic, so an unrolled SQL twin replays
    the whole run bit-for-bit.

    Per iteration: ``w = A^T (A v)`` is computed as ONE aggregation of
    ``dim`` integer sums (each ``sum(q[j] * dot)`` is map-side
    combinable; the shuffled state is ``dim`` int64s regardless of row
    count), then the iterate is rescaled on the driver with exact
    big-int truncating division: ``v' = trunc(w * scale / max|w|)``.

    Bounds: |q| <= 127, |v| <= scale (1e4) -> |dot| <= 127 * 1e4 * dim;
    the per-row product |q * dot| <= 127^2 * 1e4 * dim ~ 1e10 fits int64,
    but its SUM wraps silently above ~1e9 rows (ANSI off), so the sums
    accumulate in ``decimal(38,0)`` — exact to 1e28 rows, map-side
    combinable, and matching the twin's HUGEINT. The driver-side
    ``w * scale`` rescale runs in Python big-ints.

    Returns ``(v_final, rayleigh_num, rayleigh_den, n_rows)`` where the
    Rayleigh quotient num/den estimates the top eigenvalue of A^T A in
    the quantized space.
    """
    qcol = F.col(vec_col)
    v = [scale // 10] * dim  # deterministic start: all-ones direction
    num = den = 0
    n_rows = 0
    for it in range(iters):
        vec_lit = F.array(*[F.lit(int(x)) for x in v])
        dot = F.aggregate(
            F.zip_with(qcol, vec_lit, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        with_dot = df.select(qcol.alias("_q"), dot.alias("_dot"))
        sums = [
            F.sum(
                (F.element_at("_q", j + 1).cast("long") * F.col("_dot"))
                .cast("decimal(38,0)")
            ).alias(f"w{j}")
            for j in range(dim)
        ] + [F.count(F.lit(1)).alias("_n")]
        row = with_dot.agg(*sums).collect()[0]
        w = [int(row[f"w{j}"]) for j in range(dim)]
        n_rows = int(row["_n"])
        m = max(abs(x) for x in w) or 1
        # Rayleigh quotient of the direction that PRODUCED w (v), exact
        num = sum(vi * wi for vi, wi in zip(v, w))
        den = sum(vi * vi for vi in v)
        v = [_trunc_div(wi * scale, m) for wi in w]
    return v, num, den, n_rows


def logistic_gradient_exact(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
) -> DataFrame:
    """Exact first gradient step of logistic regression from the w=0
    init (the standard GD start): at w=0 every prediction is exactly
    0.5, so grad_j = sum((0.5 - y) * x_j) = sum((1 - 2y) * x_j) / 2 has
    an INTEGER numerator when the features are integers — no
    transcendentals anywhere, the hash gate closes exactly.

    One map-side-combinable aggregation; per-feature state is one int64.
    Returns one row per feature: (feature, g2 = 2*sum-grad as bigint,
    n rows).
    """
    y2 = F.lit(1) - F.lit(2) * F.col(label_col).cast("long")
    aggs = [
        F.sum(y2 * F.col(c).cast("long")).cast("long").alias(f"_g_{c}")
        for c in feature_cols
    ] + [F.count(F.lit(1)).cast("long").alias("_n")]
    row_df = df.agg(*aggs)
    stacked = row_df.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in feature_cols]),
                F.array(*[F.col(f"_g_{c}") for c in feature_cols]),
            )
        ).alias("feature", "g2"),
        F.col("_n").alias("n"),
    )
    return stacked
