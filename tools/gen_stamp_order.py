"""Regenerate the catalog's staleness-first key order (run at round START).

The driver's correctness gate stamps the first ~50 ``queries()`` entries
in dict order, so ``plans/__init__.py`` orders keys oldest-driver-stamp
first. This tool reads every committed CORRECTNESS_r*.json, computes the
newest stamp per key, and prints the ``_STAMP_ORDER`` list body to paste
into ``plans/__init__.py`` (ties keep the current catalog order, so
same-cohort keys rotate stably).

Usage: python3 tools/gen_stamp_order.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pygeoapi_ingestor_spark.plans import QUERIES

    stamps: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            rnd = int("".join(c for c in os.path.basename(f) if c.isdigit()))
        except ValueError:
            continue
        for k in json.load(open(f)):
            stamps[k] = max(stamps.get(k, 0), rnd)

    order = list(QUERIES)
    new_order = sorted(order, key=lambda k: (stamps.get(k, 0), order.index(k)))
    cur = None
    for k in new_order:
        r = stamps.get(k, 0)
        if r != cur:
            n = sum(1 for x in new_order if stamps.get(x, 0) == r)
            label = f"r{r}" if r else "never"
            print(f"    # --- newest driver stamp: {label} ({n} keys) ---")
            cur = r
        print(f'    "{k}",')


if __name__ == "__main__":
    main()
