"""Declarative data-quality expectations over any DataFrame — the
pre-publication gate a production ingest runs before registering a
collection (the systematized form of the reference's scattered inline
checks: non-null coordinates, value ranges, known categories).

One rule set compiles into ONE aggregation pass: every expectation
becomes a conditional-count column, so checking ten rules costs the
same scan as checking one. No row ever leaves the executors; the result
is a per-rule violation count plus an overall verdict.

Rule shapes (dicts):
  {"rule": "not_null", "col": c}
  {"rule": "unique", "col": c}                       # exact distinct
  {"rule": "in_range", "col": c, "min": x, "max": y} # inclusive
  {"rule": "in_set", "col": c, "values": [...]}
  {"rule": "matches", "col": c, "pattern": r"..."}   # full-match regex
  {"rule": "min_rows", "n": k}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: list[dict]) -> dict:
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    uniques = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "not_null":
            bad = F.col(r["col"]).isNull()
        elif kind == "in_range":
            c = F.col(r["col"])
            bad = c.isNull() | (c < r["min"]) | (c > r["max"])
        elif kind == "in_set":
            c = F.col(r["col"])
            bad = c.isNull() | ~c.isin(*r["values"])
        elif kind == "matches":
            c = F.col(r["col"])
            bad = c.isNull() | ~c.rlike(f"^(?:{r['pattern']})$")
        elif kind == "unique":
            # needs its own distinct aggregate; count duplicates exactly
            uniques.append((i, r["col"]))
            continue
        elif kind == "min_rows":
            continue  # derived from _n_rows below
        else:
            raise ValueError(f"unknown expectation rule {kind!r}")
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias(f"_viol_{i}")
        )
    for i, col in uniques:
        aggs.append(
            (F.count(col) - F.countDistinct(col)).cast("bigint").alias(f"_viol_{i}")
        )
    row = df.agg(*aggs).collect()[0].asDict()

    results = []
    for i, r in enumerate(rules):
        if r["rule"] == "min_rows":
            viol = max(0, int(r["n"]) - row["_n_rows"])
        else:
            viol = row[f"_viol_{i}"]
        results.append({**r, "violations": int(viol), "ok": viol == 0})
    return {
        "n_rows": int(row["_n_rows"]),
        "ok": all(x["ok"] for x in results),
        "results": results,
    }
