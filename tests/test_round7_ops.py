"""Round-7 operator tests: the Georgia parametric gamma/normal quantile
mapping (georgia_cds_bias_correction_process.py:346-461), verified
against an independent reference chain (stdlib ``statistics.NormalDist``
for the normal leg; identity/clamp/inf properties for the gamma leg).
"""

from __future__ import annotations

import statistics

import numpy as np
from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.operators import correction


def _params_n(spark, rows):
    return spark.createDataFrame(
        rows,
        "leadtime int, station int, fc_mean double, fc_std double, "
        "obs_mean double, obs_std double",
    )


def _params_g(spark, rows):
    return spark.createDataFrame(
        rows,
        "leadtime int, station int, fc_alpha double, fc_scale double, "
        "obs_alpha double, obs_scale double",
    )


def _fact(spark, values, leadtime=0, station=0):
    return spark.createDataFrame(
        [(i, leadtime, station, float(v)) for i, v in enumerate(values)],
        "event_id bigint, leadtime int, station int, x double",
    )


def test_parametric_normal_matches_reference_chain(spark):
    """The affine closed form must equal the reference's literal 4-step
    scipy chain rvo.ppf(norm.cdf(norm.ppf(rv.cdf(x)))) — recomputed here
    with the stdlib's erf-exact NormalDist as the independent oracle."""
    fc = statistics.NormalDist(12.5, 4.0)
    obs = statistics.NormalDist(10.0, 3.25)
    std = statistics.NormalDist()
    xs = [-20.0, -3.1, 0.0, 5.5, 12.5, 19.75, 40.0]

    out = correction.parametric_normal_map(
        _fact(spark, xs),
        _params_n(spark, [(0, 0, 12.5, 4.0, 10.0, 3.25)]),
        ["leadtime", "station"],
        "x",
    )
    got = {r["x"]: r["value_bc"] for r in out.collect()}
    for x in xs:
        want = obs.inv_cdf(std.cdf(std.inv_cdf(fc.cdf(x))))
        z = abs(x - 12.5) / 4.0
        # beyond ~5 sigma the p-space round-trip itself loses precision
        # (dp/dz underflows), so the erf-chain oracle is only good to
        # ~1e-2 there; the affine form IS the exact limit of the chain
        tol = 1e-9 if z < 5.0 else 1e-2
        assert abs(got[x] - want) < tol, (x, got[x], want)


def test_parametric_normal_drops_unparameterized_keys(spark):
    """Inner join = the reference's .iloc[0] stored-params lookup: rows
    whose (leadtime, station) has no stored row are outside the
    corrected lead window and must drop, not null-propagate."""
    f = _fact(spark, [1.0, 2.0], leadtime=3)
    out = correction.parametric_normal_map(
        f, _params_n(spark, [(0, 0, 0.0, 1.0, 0.0, 1.0)]),
        ["leadtime", "station"], "x",
    )
    assert out.count() == 0


def test_parametric_gamma_identity_when_params_equal(spark):
    """fc == obs distribution => the quantile map is the identity; the
    Newton-inverted PPF must reproduce x to float precision."""
    xs = [0.5, 3.0, 20.0, 77.7, 150.0, 420.0]
    out = correction.parametric_gamma_map(
        _fact(spark, xs),
        _params_g(spark, [(0, 0, 1.4, 55.0, 1.4, 55.0)]),
        ["leadtime", "station"],
        "x",
    )
    for r in out.collect():
        assert abs(r["value_bc"] - r["x"]) < 1e-6 * max(1.0, r["x"])


def test_parametric_gamma_scale_only_change_is_linear(spark):
    """Same alpha, obs_scale = 2 * fc_scale => bc = 2x exactly (the
    regularized CDF depends only on x/scale) — an analytic oracle that
    exercises BOTH kernels without scipy."""
    xs = [1.0, 10.0, 42.0, 300.0]
    out = correction.parametric_gamma_map(
        _fact(spark, xs),
        _params_g(spark, [(0, 0, 2.0, 30.0, 2.0, 60.0)]),
        ["leadtime", "station"],
        "x",
    )
    for r in out.collect():
        assert abs(r["value_bc"] - 2.0 * r["x"]) < 1e-6 * max(1.0, r["x"])


def test_parametric_gamma_clamps_and_postprocess(spark):
    """Reference edge semantics: x <= 0 -> CDF 0 -> bc 0 (negative
    clamp); CDF rounding to 1.0 -> ppf +inf -> NaN (the
    xr.where(isinf, nan) post_process)."""
    out = correction.parametric_gamma_map(
        # fc_scale 0.1: x=500 -> x/scale=5000 -> P rounds to exactly 1.0
        _fact(spark, [-5.0, 0.0, 500.0]),
        _params_g(spark, [(0, 0, 1.0, 0.1, 1.5, 10.0)]),
        ["leadtime", "station"],
        "x",
    )
    got = {r["x"]: r["value_bc"] for r in out.collect()}
    assert got[-5.0] == 0.0
    assert got[0.0] == 0.0
    assert got[500.0] is None  # inf -> nan -> NULL in the DataFrame


def test_parametric_gamma_monotone(spark):
    """A quantile map must be monotone non-decreasing in x."""
    xs = np.linspace(0.1, 400.0, 80).tolist()
    out = correction.parametric_gamma_map(
        _fact(spark, xs),
        _params_g(spark, [(0, 0, 1.2, 45.0, 0.9, 52.0)]),
        ["leadtime", "station"],
        "x",
    )
    rows = sorted(out.collect(), key=lambda r: r["x"])
    bcs = [r["value_bc"] for r in rows]
    assert all(b2 >= b1 - 1e-9 for b1, b2 in zip(bcs, bcs[1:]))


def test_tp_chain_negative_diffs_clamp_to_zero(spark, sf_dir):
    """The composed tp key: lag diffs of a non-monotone field go
    negative; every negative daily_mm must correct to exactly 0 and no
    +inf may leak past the post_process."""
    from pygeoapi_ingestor_spark.plans.queries_etl import (
        q_bias_correction_parametric_tp,
    )

    rows = q_bias_correction_parametric_tp(spark, sf_dir).collect()
    assert rows
    negs = [r for r in rows if r["daily_mm"] is not None and r["daily_mm"] < 0]
    assert negs, "testdata should produce negative diffs"
    assert all(r["value_bc"] == 0.0 for r in negs)
    assert all(
        r["value_bc"] is None or np.isfinite(r["value_bc"]) for r in rows
    )


def test_parametric_normal_plan_is_broadcast_no_shuffle(spark, sf_dir):
    """Scale shape: the stored-params join must be a BroadcastHashJoin
    with no Exchange on the fact side (one scan, one projection)."""
    from pygeoapi_ingestor_spark.plans.queries_etl import (
        q_bias_correction_parametric,
    )

    plan = (
        q_bias_correction_parametric(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    fact_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in fact_side


def test_trend_cap_engages_on_long_series(spark):
    """r6 verdict item 4: a 400-day series whose first half falls and
    whose trailing 200 days rise — the capped Theil-Sen / Mann-Kendall
    must fit ONLY the trailing regime, and the cap must change the
    answer relative to the uncapped fit."""
    from pygeoapi_ingestor_spark.plans import queries_etl as qe

    rows = [("s", x, 5000 - 25 * x) for x in range(200)]
    rows += [("s", x, 2 * x) for x in range(200, 400)]
    base = spark.createDataFrame(rows, "event_type string, x bigint, yi bigint")

    capped = qe._cap_trailing(base)
    kept = capped.collect()
    assert len(kept) == qe.TREND_WINDOW_DAYS == 200
    assert min(r["x"] for r in kept) == 200  # trailing window, not leading

    ts = qe._theilsen_from_xy(capped).collect()[0]
    assert abs(ts["slope"] - 0.02) < 1e-9  # yi = 2x, yi is value*100
    assert ts["n_days"] == 200 and ts["n_pairs"] == 200 * 199 // 2

    mk = qe._mann_kendall_from_xy(capped).collect()[0]
    assert mk["trend"] == "increasing" and mk["n"] == 200

    # the uncapped fit sees the V-shape and lands elsewhere
    full = qe._theilsen_from_xy(base).collect()[0]
    assert abs(full["slope"] - ts["slope"]) > 1e-6


def test_trend_cap_invariant_on_short_series(spark, sf_dir):
    """The one-month testdata is far below TREND_WINDOW_DAYS: the cap
    must be a no-op there (which is also why the hash oracles stay
    green unchanged)."""
    from pygeoapi_ingestor_spark.plans import queries_etl as qe

    b1 = sorted(map(tuple, qe._daily_xy(spark, sf_dir).collect()))
    b2 = sorted(map(tuple, qe._daily_xy_capped(spark, sf_dir).collect()))
    assert b1 == b2


def test_token_budget_select_engages_and_respects_budget(spark, sf_dir):
    """The budgeted-selection key: every source's kept tokens must stay
    within the budget, the budget must actually engage (some docs
    dropped), and the kept set must be the QUALITY PREFIX — no dropped
    doc may outrank the cutoff quality."""
    from pygeoapi_ingestor_spark.plans.queries_llm import (
        TOKEN_BUDGET_PER_SOURCE,
        q_token_budget_select,
    )

    rows = q_token_budget_select(spark, sf_dir).collect()
    assert rows
    assert all(r["tokens_kept"] <= TOKEN_BUDGET_PER_SOURCE for r in rows)
    assert any(r["n_kept"] < r["n_docs"] for r in rows)
    assert all(0 < r["n_kept"] <= r["n_docs"] for r in rows)
    assert all(r["tokens_kept"] <= r["tokens_total"] for r in rows)
