#!/usr/bin/env python3
"""Two-session bench band (r12 verdict item 7): run bench.py TWICE in
fresh processes on identical code and record both series side by side,
so the official artifact carries its own variance estimate.

The r12 round exposed the problem this solves: the driver's fresh-
process run read warm_stable 205s while the builder's same-code
in-session band read 146-165s — a 40% gap that was uninterpretable
because no committed artifact held two fresh-session series from the
same code. BENCH_BAND.json records, per run: warm_total /
warm_stable_total / noop_total / vs_oracle / the 10 slowest warm keys,
plus the relative spread per total. A future round comparing its
driver artifact against this band can tell ambient variance from a
real regression.

Usage: python3 tools/bench_band.py   (runs bench.py twice at the env
SPARK_GRAFT_SF_DIR, ~6-9 min per run at sf0.1; writes BENCH_BAND.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOTALS = (
    "warm_total",
    "warm_stable_total",
    "noop_total",
    "headline_total",
    "headline_stable_total",
    "vs_oracle",
    "value",
)


def _one_run(i: int) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    if proc.returncode != 0 or not line.startswith("{"):
        return {
            "rc": proc.returncode,
            "error": (proc.stderr or proc.stdout)[-500:],
            "wall_sec": round(time.time() - t0, 1),
        }
    parsed = json.loads(line)
    full = json.load(open(os.path.join(ROOT, "BENCH_FULL.json")))
    warm = full.get("queries_warm_stable", {})
    slowest = sorted(warm.items(), key=lambda kv: -kv[1])[:10]
    # warm_stable_total lives only in BENCH_FULL, not the summary line
    for k in TOTALS:
        if k not in parsed and k in full:
            parsed[k] = full[k]
    return {
        "rc": 0,
        "wall_sec": round(time.time() - t0, 1),
        **{k: parsed.get(k) for k in TOTALS if k in parsed},
        "n_errors": parsed.get("n_errors"),
        "slowest_warm_stable": dict(slowest),
    }


def main() -> None:
    runs = [_one_run(i) for i in range(2)]
    band: dict = {"runs": runs, "sf_dir": os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")}
    ok = [r for r in runs if r.get("rc") == 0]
    if len(ok) == 2:
        spread = {}
        for k in TOTALS:
            a, b = ok[0].get(k), ok[1].get(k)
            if a and b:
                spread[k] = {
                    "lo": round(min(a, b), 2),
                    "hi": round(max(a, b), 2),
                    "rel_spread": round(abs(a - b) / min(a, b), 3),
                }
        band["band"] = spread
    with open(os.path.join(ROOT, "BENCH_BAND.json"), "w") as f:
        json.dump(band, f, indent=1, sort_keys=True)
    print(json.dumps({"band": band.get("band"), "rcs": [r.get("rc") for r in runs]}))


if __name__ == "__main__":
    main()
