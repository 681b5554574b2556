"""Simulate the driver's correctness gate: run every catalog query on a
vanilla SparkSession side-by-side with its DuckDB oracle and report
per-key wall time + rows/schema/hash match.

Usage: python3 tools/driver_sim.py [sf_dir] [key ...]
Defaults to /root/testdata/sf0.01 and all keys in catalog order.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    return repr(v)


def result_key(cols, rows):
    """Sort columns by name (driver convention), then rows; hash values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return [cols[i] for i in order], h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SIM_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"  # Spark-written directory datasets
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()

    out, total = {}, 0.0
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        status = {}
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
            if key in osql:
                cur = con.execute(osql[key])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                sc, sh = result_key(cols, [tuple(r) for r in rows])
                oc, oh = result_key(ocols, orows)
                status = {
                    "rows": len(rows) == len(orows),
                    "schema": sc == oc,
                    "hash": sh == oh,
                    "n": len(rows),
                    "on": len(orows),
                }
                if sc != oc:
                    status["cols"] = [sc, oc]
            else:
                status = {"rows_only": True, "n": len(rows)}
        except Exception as e:  # noqa: BLE001
            status = {"error": f"{type(e).__name__}: {e}"[:300]}
        # CACHE CONTRACT (operators/dedup.py): queries persist their
        # index artifacts and never unpersist returned lineage — the
        # driver clears blocks between keys so a full-catalog run does
        # not accumulate every key's cached partitions
        spark.catalog.clearCache()
        dt = time.time() - t0
        total += dt
        status["sec"] = round(dt, 2)
        out[key] = status
        ok = status.get("hash") or status.get("rows_only") or False
        flag = "OK " if ok else ("ERR" if "error" in status else "BAD")
        print(f"{flag} {key:32s} {dt:6.2f}s {json.dumps(status)[:160]}", flush=True)

    bad = [k for k, v in out.items() if not (v.get("hash") or v.get("rows_only"))]
    print(f"\nTOTAL {total:.1f}s over {len(out)} keys; failing: {bad}")
    # SIM_OUT=<path>: persist the full per-key ledger (the committed
    # CORRECTNESS_FULL.json artifact — the durable full-catalog evidence
    # the rotating ~50-key driver window cannot provide; r5 verdict #5)
    out_path = os.environ.get("SIM_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_keys": len(out),
                 "total_sec": round(total, 1), "failing": bad,
                 "results": out},
                f, indent=1, sort_keys=False,
            )
        print(f"wrote {out_path}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
