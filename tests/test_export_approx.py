from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.plans import QUERIES
from pygeoapi_ingestor_spark.sinks.collections import export
from pygeoapi_ingestor_spark.sources.readers import read_events


def test_export_all_formats_roundtrip(spark, sf_dir, tmp_path):
    daily = (
        read_events(spark, sf_dir)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("total"))
    )
    n = daily.count()
    for fmt in ("parquet", "json", "csv", "orc"):
        path = str(tmp_path / fmt)
        export(daily, path, fmt=fmt)
        reader = getattr(spark.read, fmt)
        back = (
            spark.read.option("header", "true").option("sep", ";").csv(path)
            if fmt == "csv"
            else reader(path)
        )
        assert back.count() == n, fmt

    with pytest.raises(ValueError):
        export(daily, str(tmp_path / "x"), fmt="netcdf")


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in read_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.1 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_approx_percentile_rank_error_bounded(spark, sf_dir):
    """The GK sketch's p50/p90 must sit within +/-5% rank of the target:
    the count of values at or below the sketch answer, as a fraction of
    n, brackets the requested percentile."""
    ev = read_events(spark, sf_dir)
    approx = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"])
        for r in QUERIES["approx_percentile_value"](spark, sf_dir).collect()
    }
    for et, (p50, p90) in approx.items():
        sub = ev.filter(F.col("event_type") == et)
        n = sub.count()
        for target, v in ((0.5, p50), (0.9, p90)):
            at_most = sub.filter(F.col("value") <= v).count() / n
            at_least = sub.filter(F.col("value") < v).count() / n
            assert at_least - 0.05 <= target <= at_most + 0.05, (et, target, v)
