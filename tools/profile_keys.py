"""Per-key warm-phase breakdown: plan-build time vs execution time vs
job count — the diagnostic behind the r13 warm-floor work.

For each key we replay exactly what bench.py's warm rep does — call the
catalog builder, then ``.count()`` — but timed in two pieces, plus the
scheduler's job/stage counters across the execution, so a slow key can
be attributed to (a) Python plan construction + Catalyst analysis,
(b) number of sequential jobs (each -> scheduler latency at tiny SF), or
(c) genuine executor work.

Usage: python3 tools/profile_keys.py [sf_dir] key [key ...]
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

    from __spark_entry__ import queries
    from pygeoapi_ingestor_spark.session import get_spark

    spark = get_spark(app_name="profile_keys")
    qs = queries()
    keys = args or list(qs)
    st = spark.sparkContext.statusTracker()

    for key in keys:
        if key not in qs:
            print(f"?? {key}: not in catalog")
            continue
        # cold pass to materialize any per-key persisted artifacts so the
        # measured pass below is the bench's WARM rep
        qs[key](spark, sf_dir).count()
        rec = {}
        for rep in range(2):
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = qs[key](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            j1 = len(st.getJobIdsForGroup(None) or [])
            rec[f"build{rep}"] = round(t1 - t0, 3)
            rec[f"exec{rep}"] = round(t2 - t1, 3)
            rec[f"jobs{rep}"] = j1 - j0
        print(f"{key:34s} {json.dumps(rec)}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
