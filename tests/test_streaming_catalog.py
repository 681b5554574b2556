from __future__ import annotations

from pygeoapi_ingestor_spark.sinks import CollectionCatalog
from pygeoapi_ingestor_spark.sources.readers import read_events
from pygeoapi_ingestor_spark.streaming import pipeline


def test_stream_into_registered_collection(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    read_events(spark, sf_dir).coalesce(2).write.mode("overwrite").json(src)

    cat = CollectionCatalog(str(tmp_path / "cat.json"))
    stream = pipeline.read_event_stream(spark, src, fmt="json")
    agg = pipeline.windowed_agg(stream, window_duration="1 hour")
    pipeline.run_to_collection(
        agg, "hourly_totals", str(tmp_path / "coll"), str(tmp_path / "ckpt"),
        cat, ts_col="window_start",
    )

    assert cat.exists("hourly_totals")
    assert cat.healthcheck(spark) == [
        {"id": "hourly_totals", "ok": True, "error": None}
    ]
    got = spark.read.parquet(str(tmp_path / "coll"))
    assert got.count() > 0
    assert set(got.columns) >= {"window_start", "event_type", "total_value"}


def test_empty_stream_tick_is_noop(spark, tmp_path):
    src = str(tmp_path / "empty_src")
    import os

    os.makedirs(src, exist_ok=True)
    cat = CollectionCatalog(str(tmp_path / "cat2.json"))
    stream = pipeline.read_event_stream(spark, src, fmt="json")
    agg = pipeline.windowed_agg(stream)
    # zero input files -> zero batches -> no crash, no registration
    pipeline.run_to_collection(
        agg, "never_written", str(tmp_path / "c2"), str(tmp_path / "ck2"),
        cat, ts_col="window_start",
    )
    assert not cat.exists("never_written")


def test_run_to_collection_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-written
    batch must REPLACE its own _batch partition, not append duplicates
    — simulated by re-running the same availableNow tick from a FRESH
    checkpoint (every batch re-delivers with the same ids)."""
    src = str(tmp_path / "src")
    read_events(spark, sf_dir).coalesce(2).write.mode("overwrite").json(src)
    cat = CollectionCatalog(str(tmp_path / "cat.json"))
    out = str(tmp_path / "coll")

    def tick(ckpt):
        stream = pipeline.read_event_stream(spark, src, fmt="json")
        agg = pipeline.windowed_agg(stream, window_duration="1 hour")
        pipeline.run_to_collection(
            agg, "hourly_totals", out, str(tmp_path / ckpt), cat,
            ts_col="window_start",
        )

    tick("ckpt_a")
    first = sorted(
        (str(r["window_start"]), r["event_type"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    tick("ckpt_b")  # full replay: same batches, same ids
    second = sorted(
        (str(r["window_start"]), r["event_type"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    assert first == second and first
