"""Composed disaster-recovery arc (r7 verdict item 5): the operational
loop a production deployment actually runs, as ONE integration test —
the pieces (scheduler.backfill, sinks.missing_partitions,
sinks.versioned) are unit-tested separately in
test_scheduler_sinks_sources.py, but recovery only works if they
compose: ingest a partitioned collection day by day, publish it as an
immutable version, lose partitions to a disaster, have the backfill
planner find EXACTLY the hole, heal it byte-for-byte, publish the
healed state, then survive a bad publish via rollback.

Reference parity: the skip-if-exists idempotent re-ingest of
utils_spi.py:205-358 (per-tick "did this slice land?") driven as a
work list, plus the atomic-publish convention of the reference's
collection writers.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.sinks import versioned
from pygeoapi_ingestor_spark.sinks.collections import missing_partitions
from pygeoapi_ingestor_spark.sources.readers import read_events
from pygeoapi_ingestor_spark.streaming.scheduler import backfill


def _rows(df):
    out = []
    for r in df.select("day", "event_type", "total", "n").collect():
        out.append((r["day"], r["event_type"], round(r["total"], 6), r["n"]))
    return sorted(out)


def test_disaster_recovery_arc(spark, sf_dir, tmp_path):
    ev = read_events(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )

    def daily_totals(s, day):
        return (
            ev.filter(F.col("day") == day)
            .groupBy("day", "event_type")
            .agg(
                F.sum("value").alias("total"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    registry = {"daily_totals": daily_totals}
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").collect()][:4]
    assert len(days) == 4
    coll = str(tmp_path / "coll")
    vroot = str(tmp_path / "versions")

    # 1. initial ingest: an empty collection is ALL hole; the backfill
    # plans every day in range and lands each day's slice
    res = backfill(
        spark, registry, "daily_totals", coll, "day", days[0], days[-1]
    )
    assert res["planned"] == days
    assert res["landed"] == days
    assert res["failed"] == {}
    baseline = _rows(spark.read.parquet(coll))
    assert baseline

    # 2. publish the good state as immutable v1
    v1 = versioned.write_version(
        spark.read.parquet(coll), vroot, partition_by=["day"],
        meta={"job": "dr-test"},
    )
    assert v1 == 1

    # 3. disaster: two day-partitions vanish from the live collection
    for lost in (days[1], days[2]):
        shutil.rmtree(f"{coll}/day={lost}")
    assert len(_rows(spark.read.parquet(coll))) < len(baseline)

    # 4. the planner reports EXACTLY the hole - nothing more (no
    # re-ingest of surviving days: that is the idempotence contract)
    plan = missing_partitions(spark, coll, "day", days[0], days[-1])
    assert plan == [days[1], days[2]]

    # 5. heal: the same backfill call re-plans and lands only the hole,
    # and the healed collection equals the pre-disaster rows exactly
    res2 = backfill(
        spark, registry, "daily_totals", coll, "day", days[0], days[-1]
    )
    assert res2["planned"] == [days[1], days[2]]
    assert res2["landed"] == [days[1], days[2]]
    assert res2["failed"] == {}
    assert _rows(spark.read.parquet(coll)) == baseline
    assert missing_partitions(spark, coll, "day", days[0], days[-1]) == []

    # 6. publish healed state, then survive a BAD publish via rollback:
    # current flips back to the good version without data movement, and
    # the bad snapshot stays readable for forensics (time travel)
    v2 = versioned.write_version(
        spark.read.parquet(coll), vroot, partition_by=["day"]
    )
    bad = spark.read.parquet(coll).filter(F.lit(False))
    v3 = versioned.write_version(bad, vroot)
    assert versioned.read_version(spark, vroot).count() == 0  # bad is live
    versioned.rollback(spark, vroot, v2)
    assert _rows(versioned.read_version(spark, vroot)) == baseline
    assert versioned.read_version(spark, vroot, version=v3).count() == 0

    # 7. post-rollback publishes allocate ABOVE the bad version - the
    # rolled-back snapshot is never silently overwritten
    v4 = versioned.write_version(spark.read.parquet(coll), vroot)
    assert v4 == v3 + 1
    assert _rows(versioned.read_version(spark, vroot, version=v4)) == baseline
