"""Prepared-plan registry: build a catalog query's (lazy) DataFrame once
per (session, corpus) and re-execute it — the prepared-statement shape a
long-lived analytics service runs, generalized from r11's
zonal_stats_polygon finding that ~90% of several keys' warm cost is
Catalyst re-analysis + AQE re-planning + codegen of a FRESH but
identical plan (~1-2s/invocation) while the data path is 0.2-0.5s at
bench SF.

WHAT THIS IS NOT: a result or data cache. Nothing is persisted by the
registry itself; every execution of the memoized DataFrame rescans the
parquet inputs and recomputes. Plans that persist intermediates inside
their own build (rfm_segments' per-customer table) keep exactly the
semantics they had: ``catalog.clearCache()`` drops the blocks and the
next execution re-materializes them.

ELIGIBILITY — a query may register here ONLY if its plan:
- embeds NO released-on-finalize artifact (shared_verified_pairs /
  shared_dup_components / the words checkpoint): a memoized plan over a
  freed localCheckpoint would dangle after ``finalize_job`` (those keys
  re-fetch through their registry accessors per call instead);
- tolerates a frozen file listing: the InMemoryFileIndex snapshot is
  taken at build time, which is correct for the immutable per-corpus
  test/bench datasets and for production tables addressed by new paths
  per snapshot. Mutating files under an already-prepared path is out of
  contract (same rule as any cached Spark table).

Eviction: one corpus per registry entry name — switching sf_dir drops
the superseded plan (driver-side object only; no storage to free).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PLANS: dict = {}


def prepared_plan(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized DataFrame for (name, session, corpus),
    building it via ``build()`` on first use. See module docstring for
    the eligibility rules."""
    key = (name, spark.sparkContext.applicationId, sf_dir)
    hit = _PLANS.get(key)
    if hit is not None:
        return hit
    # corpus/session switch evicts this name's superseded entry
    for k in [k for k in _PLANS if k[0] == name and k != key]:
        _PLANS.pop(k)
    df = build()
    _PLANS[key] = df
    return df


def clear() -> None:
    """Drop every prepared plan (driver-side state only)."""
    _PLANS.clear()
