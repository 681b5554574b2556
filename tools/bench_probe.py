"""Per-key cold/noop probe with DRIVER GC attribution (r14 item 1).

Runs a subset of catalog keys exactly like bench.py's cold + noop cells
(fresh session, clearCache between keys) and records, per key, the
wall time AND the delta in the JVM's GarbageCollectorMXBean totals —
so a slow cell can be split into "ran tasks" vs "sat in a GC pause".
This is the instrument behind the r14 local[32] root-cause: the r13
band showed multi-second stalls landing on RANDOM keys at 32 cores
(dedup_ppjoin 18.5 s warm in one run, 0.8 s in the next), which is a
discrete stall signature, not a plan-cost signature.

Usage:
  SPARK_GRAFT_CPUS=32 python3 tools/bench_probe.py [sf_dir] key [key ...]
  SPARK_GRAFT_PROBE_CONF='{"spark.cleaner.periodicGC.interval":"30min"}' \
      ... to A/B a config hypothesis.
Prints one JSON line per key plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gc_totals(spark) -> dict[str, tuple[int, int]]:
    """{collector name: (count, total_ms)} from the driver JVM."""
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    out = {}
    for i in range(beans.size()):
        b = beans.get(i)
        out[b.getName()] = (b.getCollectionCount(), b.getCollectionTime())
    return out


def gc_delta(before, after) -> dict[str, list[int]]:
    return {
        name: [after[name][0] - before.get(name, (0, 0))[0],
               after[name][1] - before.get(name, (0, 0))[1]]
        for name in after
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from pygeoapi_ingestor_spark.plans import QUERIES
    from pygeoapi_ingestor_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    extra = json.loads(os.environ.get("SPARK_GRAFT_PROBE_CONF", "{}"))
    spark = get_spark(app_name="bench_probe", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    keys = args or list(QUERIES)
    tot_wall = tot_gc = 0.0
    t_all0 = time.perf_counter()
    for key in keys:
        if key not in QUERIES:
            print(f"?? {key}")
            continue
        rec = {"key": key}
        for phase, action in (
            ("cold", lambda df: df.count()),
            ("noop", lambda df: df.write.format("noop").mode("overwrite").save()),
        ):
            g0 = gc_totals(spark)
            t0 = time.perf_counter()
            action(QUERIES[key](spark, sf_dir))
            wall = time.perf_counter() - t0
            d = gc_delta(g0, gc_totals(spark))
            gc_ms = sum(v[1] for v in d.values())
            rec[phase] = round(wall, 3)
            rec[f"{phase}_gc_ms"] = gc_ms
            rec[f"{phase}_gc"] = d
            tot_wall += wall
            tot_gc += gc_ms / 1000.0
        spark.catalog.clearCache()
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "summary": True,
        "n_keys": len(keys),
        "wall_sec": round(time.perf_counter() - t_all0, 1),
        "timed_sec": round(tot_wall, 1),
        "gc_sec": round(tot_gc, 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "extra_conf": extra,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
