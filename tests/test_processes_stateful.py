from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygeoapi_ingestor_spark import processes
from pygeoapi_ingestor_spark.sinks import CollectionCatalog
from pygeoapi_ingestor_spark.sources import external
from pygeoapi_ingestor_spark.sources.readers import read_events
from pygeoapi_ingestor_spark.streaming import pipeline, stateful


def _mk_process(spark, sf_dir, tmp_path, cid="ftp_daily"):
    cat = CollectionCatalog(str(tmp_path / "cat.json"))
    return processes.IngestProcess(
        collection_id=cid,
        fetch=lambda s: external.ingest(s, "ftp", str(tmp_path / "stage")),
        transform=lambda df: (
            df.groupBy("station_id", F.date_trunc("day", "obs_time").alias("day"))
            .agg(F.avg("level_m").alias("avg_level"), F.max("flow_m3s").alias("max_flow"))
        ),
        out_path=str(tmp_path / "coll"),
        catalog=cat,
        ts_col="day",
        value_cols=["avg_level"],
    ), cat


def test_ingest_process_full_arc(spark, sf_dir, tmp_path):
    proc, cat = _mk_process(spark, sf_dir, tmp_path)
    res = proc.execute(spark, {"token": "local"})
    assert res.status == processes.OK
    assert cat.exists("ftp_daily")
    assert res.extents["n_rows"] > 0

    # idempotency: second run skips
    res2 = proc.execute(spark, {"token": "local"})
    assert res2.status == processes.SKIPPED

    # force re-runs
    res3 = proc.execute(spark, {"token": "local"}, force=True)
    assert res3.status == processes.OK

    # written collection is readable and matches the transform
    got = spark.read.parquet(str(tmp_path / "coll"))
    assert got.count() == res.extents["n_rows"]


def test_ingest_process_validation(spark, tmp_path):
    proc, _ = _mk_process(spark, None, tmp_path, cid="v")
    with pytest.raises(processes.ProcessorExecuteError):
        proc.execute(spark, {})


def test_ingest_process_failure_reported(spark, tmp_path):
    cat = CollectionCatalog(str(tmp_path / "cat2.json"))
    proc = processes.IngestProcess(
        collection_id="bad",
        fetch=lambda s: s.read.parquet(str(tmp_path / "nope")),
        transform=lambda df: df,
        out_path=str(tmp_path / "out"),
        catalog=cat,
    )
    res = proc.execute(spark, {"token": "local"})
    assert res.status == processes.FAILED
    assert not cat.exists("bad")


def test_stateful_alert_transitions(spark, sf_dir, tmp_path):
    src = str(tmp_path / "alert_src")
    read_events(spark, sf_dir).coalesce(1).write.mode("overwrite").json(src)
    stream = pipeline.read_event_stream(spark, src, fmt="json")
    alerts = stateful.alert_transitions(stream, alpha=0.3)
    pipeline.run_to_memory(alerts, "alerts_tbl", mode="append")
    got = spark.sql("SELECT * FROM alerts_tbl").collect()
    assert len(got) > 0
    # transitions only: consecutive rows per series change level
    by_series: dict = {}
    for r in sorted(got, key=lambda r: (r["event_type"], r["ts"])):
        prev = by_series.get(r["event_type"])
        if prev is not None:
            assert r["level"] != prev
        by_series[r["event_type"]] = r["level"]
    # first transition per series starts from empty state
    firsts = {}
    for r in sorted(got, key=lambda r: (r["event_type"], r["ts"])):
        firsts.setdefault(r["event_type"], r)
    assert all(r["prev_level"] is None for r in firsts.values())
