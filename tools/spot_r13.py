"""r13 spot harness: isolated cold/warm/noop reps for a few keys on a
fresh tuned session (bench.py methodology: cold = first count after
clearCache, warm = immediate reruns, noop = full-evaluation sink), with
N outer reps so a single ambient stall doesn't decide an optimization.

Usage: python3 tools/spot_r13.py [sf_dir] key [key ...]
Env: SPOT_REPS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    reps = int(os.environ.get("SPOT_REPS", "3"))

    from __spark_entry__ import queries
    from pygeoapi_ingestor_spark.session import get_spark

    spark = get_spark(app_name="spot_r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    # same worker/codegen warmup as bench.py so cold cells measure the
    # query, not the session boot
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(256).repartition(8).mapInPandas(
        (lambda it: (b for b in it)), "id long"
    ).count()

    out: dict[str, dict] = {}
    for key in args:
        cells = {"cold": [], "warm": [], "noop": []}
        for _ in range(reps):
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).count()
            cells["cold"].append(round(time.perf_counter() - t0, 3))
            t1 = time.perf_counter()
            qs[key](spark, sf_dir).count()
            cells["warm"].append(round(time.perf_counter() - t1, 3))
            t2 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            cells["noop"].append(round(time.perf_counter() - t2, 3))
        out[key] = {
            k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
            for k, v in cells.items()
        }
        print(
            f"{key:34s} cold min {out[key]['cold']['min']:6.2f} "
            f"warm min {out[key]['warm']['min']:6.2f} "
            f"noop min {out[key]['noop']['min']:6.2f}   {cells}",
            flush=True,
        )
    print(json.dumps({"sf_dir": sf_dir, "keys": out}))


if __name__ == "__main__":
    main()
