"""Session-timezone independence: the driver's correctness gate may run
under any session timezone, while the DuckDB oracles treat naive
timestamps as pure wall-clock. Every date-bucketing operator must
therefore be wall-clock (``wall_trunc`` / ``timestamp_diff``), never
routed through the session zone — a regression here reproduces the
round-4 bug where ``date_trunc`` on TIMESTAMP_NTZ shifted day buckets
by the session offset.
"""

from __future__ import annotations

import pytest

from tests.test_queries_oracle import _duck, _normalize

from pygeoapi_ingestor_spark.plans import ORACLES, QUERIES

# the queries most exposed to session-zone leakage: date buckets,
# calendar explode, range windows, µs arithmetic, sessionization
TZ_SENSITIVE = [
    "resample_daily_sum",
    "resample_weekly_max_sun",
    "resample_monthly_scaled",
    "rolling_sum_7d_range",
    "time_weighted_avg",
    "sessionize_gap",
    "gap_fill_calendar",
    "retention_cohorts",
    "distinct_users_daily",
    "asof_join_forward",
    # round-5 continuation: day-bucketed / ts-ordered additions
    "climate_cdd",
    "qc_flags_station",
    "area_weighted_mean",
    "threshold_crossings",
    # round-6: day-bucketed PET chain + week-bucketed danger feed
    "pet_knmi",
    "pet_deficit_chain",
    "danger_levels_weekly",
    # round-7: dayofmonth-keyed parametric QM + day-bucketed ensemble
    # quantiles + the capped day-pair trend fits
    "bias_correction_parametric",
    "ensemble_quantiles",
    "theilsen_trend",
    "mann_kendall",
    # round-10 (ADVICE r9): day-bucketed KS drift (was raw date_trunc on
    # NTZ — diverged under Asia/Kathmandu) + NTZ-literal train/eval split
    "ks_drift_daily",
    "pinball_loss_eval",
]


# America/Santiago springs forward AT MIDNIGHT (Sep): local midnight
# does not exist on transition days, which broke the old zoned
# NTZ→date_trunc→NTZ round trip — the zone-free wall_trunc must hold
# Asia/Kathmandu adds a +05:45 fractional offset (sub-hour bucket shear)
ZONES = ["America/New_York", "America/Santiago", "Asia/Kathmandu"]


@pytest.mark.parametrize("key", TZ_SENSITIVE)
@pytest.mark.parametrize("zone", ZONES)
def test_query_matches_oracle_under_non_utc_session(spark, sf_dir, key, zone):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try:
        df = QUERIES[key](spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

    con = _duck(sf_dir)
    res = con.execute(ORACLES[key])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    assert len(ns) == len(nd), f"{key}: row count {len(ns)} vs {len(nd)}"
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{key}: first mismatches: {mismatches[:3]}"
