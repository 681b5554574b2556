"""Dump ``.explain("formatted")`` for catalog keys to plans/rNN files.

The judge cannot run Spark; these committed plan files are the evidence
behind every "plan diff" claim in OPTIMIZATION_rNN.md. Run once from
the round-start commit (suffix ``_before``) and once from HEAD
(suffix ``_after``).

Usage: python3 tools/explain_dump.py OUT_DIR SUFFIX [sf_dir] key [key ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir, suffix, *args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    os.makedirs(out_dir, exist_ok=True)

    from __spark_entry__ import queries
    from pygeoapi_ingestor_spark.session import get_spark

    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for key in args:
        if key not in qs:
            print(f"?? {key}: not in catalog", flush=True)
            continue
        try:
            df = qs[key](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{key}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
