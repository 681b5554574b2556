"""Write-path benchmark: time the sink/layout components at a given SF
(the query bench covers the read path; this covers the other half of an
ingestor's life). Prints one JSON line.

Usage: python3 tools/sink_bench.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="sink_bench_"
    )
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.session import get_spark
    from pygeoapi_ingestor_spark.sinks import collections as C
    from pygeoapi_ingestor_spark.sinks import incremental as I
    from pygeoapi_ingestor_spark.sources.readers import read_events

    spark = get_spark(app_name="sink-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_events(spark, sf_dir).withColumn(
        "lon", (F.col("event_id") % 5760) / F.lit(16.0) - F.lit(180.0)
    ).withColumn(
        "lat", (F.col("user_id") % 2880) / F.lit(16.0) - F.lit(90.0)
    )
    n_rows = ev.count()
    times: dict[str, float] = {}

    def clock(name, fn):
        t = time.time()
        fn()
        times[name] = round(time.time() - t, 3)
        spark.catalog.clearCache()

    p = lambda name: os.path.join(out_root, name)  # noqa: E731

    clock("write_partitioned", lambda: C.write_collection(
        ev.withColumn("day", F.to_date("ts")), p("part"), partition_by=["day"]
    ))
    clock("write_zordered", lambda: C.write_zordered(
        ev, p("zorder"), lon_col="lon", lat_col="lat", n_files=16
    ))
    clock("write_chunk_grid", lambda: C.write_chunk_grid(
        ev, p("chunks"), ts_col="ts", lon_col="lon", lat_col="lat",
        chunk_days=7, bits_per_axis=2,
    ))
    clock("compact", lambda: C.compact_collection(
        spark, p("part"), target_bytes=8 * 1024 * 1024
    ))

    feed = ev.select(
        "user_id", "event_type", "ts", "event_id", "value",
        F.lit("U").alias("op"),
    )
    clock("merge_init", lambda: C.merge_into_partitioned(
        feed, p("snap"), ["user_id", "event_type"], ["ts", "event_id"],
        n_buckets=16,
    ))
    small = feed.filter(F.col("user_id") % 97 == 0)
    clock("merge_incremental", lambda: C.merge_into_partitioned(
        small, p("snap"), ["user_id", "event_type"], ["ts", "event_id"],
        n_buckets=16,
    ))

    clock("rollup_init", lambda: I.update_rollup(
        ev.filter(F.col("event_id") % 2 == 0), p("rollup"),
        ["event_type"], "value", "user_id",
    ))
    clock("rollup_update", lambda: I.update_rollup(
        ev.filter(F.col("event_id") % 2 == 1), p("rollup"),
        ["event_type"], "value", "user_id",
    ))

    clock("geojsonl_export", lambda: C.export_geojsonl(
        ev, p("geo"), "lon", "lat", ["event_id", "event_type", "value"]
    ))

    print(json.dumps({
        "metric": "sink_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "rows": n_rows,
        "sinks": times,
    }))
    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
