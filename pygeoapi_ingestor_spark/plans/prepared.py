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
the superseded plan. The registry object itself is driver-side, but a
build may have persisted intermediates (rfm_segments' per-customer
table, corpus_token_stats' gram table): those CacheManager entries
outlive the plan object, so eviction also clears the session cache —
correct at a corpus switch, where every cached block belongs to the
superseded corpus anyway (ADVICE r11).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PLANS: dict = {}

# Artifact epoch (r13): a monotone counter bumped by EVERY localCheckpoint
# release in the repo (functions/storage.free_local_ckpt — the single
# choke point all artifact eviction routes through). Plans registered
# with ``artifact_bound=True`` embed checkpoint-backed leaves on
# purpose (the verify-once dedup graph, the shared ANN ground truth);
# their memo key includes the epoch observed at registration, so the
# moment ANY checkpoint is freed the memo misses and the next call
# re-builds through the artifact accessors — a memoized plan can never
# outlive the storage it reads. Over-invalidation (a free of an
# unrelated checkpoint) costs one rebuild, never correctness.
_EPOCH = 0


def bump_artifact_epoch() -> int:
    """Called by functions.storage.free_local_ckpt after releasing
    checkpoint blocks; invalidates every artifact-bound prepared plan."""
    global _EPOCH
    _EPOCH += 1
    return _EPOCH


def prepared_plan(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
    artifact_bound: bool = False,
) -> DataFrame:
    """Return the memoized DataFrame for (name, session, corpus),
    building it via ``build()`` on first use. See module docstring for
    the eligibility rules. ``artifact_bound=True`` admits plans over
    released-on-finalize checkpoint artifacts: the memo is additionally
    keyed on the artifact epoch (invalidated by every checkpoint free),
    and the checkpoint-leaf guard is skipped — for these plans the
    embedded checkpoint is the POINT, and the epoch key guarantees the
    memo never survives its storage."""
    app = spark.sparkContext.applicationId
    key = (name, app, sf_dir, _EPOCH if artifact_bound else None)
    hit = _PLANS.get(key)
    if hit is not None:
        return hit
    # Corpus/session switch: a NEW (session, corpus) generation evicts
    # EVERY entry of any other generation at once and clears the session
    # cache ONCE (ADVICE r12: the previous per-name eviction called
    # clearCache per switched name, so each later eviction dropped the
    # CacheManager registrations of plans rebuilt moments earlier —
    # leaving those memoized plans executing UNCACHED for the registry's
    # lifetime, since an unpersisted InMemoryRelation recomputes without
    # re-storing). Batch eviction means plans rebuilt after the switch
    # keep their internal persists until the next switch. Stale-EPOCH
    # entries of the same (session, corpus) are dropped without a
    # clearCache — their checkpoint storage is already gone and the
    # session cache still belongs to this corpus.
    dead_epoch = [
        k for k in _PLANS
        if (k[1], k[2]) == (app, sf_dir)
        and k[3] is not None
        and k[3] != _EPOCH
    ]
    for k in dead_epoch:
        _PLANS.pop(k)
    stale = [k for k in _PLANS if (k[1], k[2]) != (app, sf_dir)]
    if stale:
        for k in stale:
            _PLANS.pop(k)
        if any(k[1] == app for k in stale):
            # only this session's cache holds the superseded blocks; a
            # fresh session has nothing of ours to free
            try:
                spark.catalog.clearCache()
            except Exception:  # session already stopped — nothing to free
                pass
    df = build()
    if artifact_bound:
        # epoch may have advanced DURING the build (artifact accessors
        # free superseded corpora's checkpoints while building): key the
        # memo on the epoch the finished plan actually reads, so the
        # frees the build itself performed don't dangle-invalidate it
        key = (name, app, sf_dir, _EPOCH)
        _PLANS[key] = df
        return df
    # Runtime enforcement of the no-checkpoint eligibility rule (ADVICE
    # r11): a memoized plan over a (local)checkpoint would dangle the
    # moment finalize_job releases those blocks — and a localCheckpoint
    # has no lineage to recompute from, so the failure is silent
    # wrong-results/IOException later, not here. Reject at registration
    # instead of trusting the review-time allowlist comment. LogicalRDD
    # leaves from driver-local ``createDataFrame`` (trained literals,
    # interpolation tables) are fine: their data is serialized closure
    # state, not releasable storage — only CHECKPOINT-backed leaves are
    # the hazard, so the walk tests the leaf RDD, not the node class.
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.length()):
            leaf = leaves.apply(i)
            if "LogicalRDD" not in leaf.getClass().getSimpleName():
                continue
            r = leaf.rdd()
            if r.isLocallyCheckpointed() or r.isCheckpointed():
                raise ValueError(
                    f"prepared_plan({name!r}): analyzed plan embeds a "
                    "checkpoint-backed LogicalRDD leaf — ineligible for "
                    "the prepared registry (would dangle after "
                    "finalize_job); serve it through its artifact "
                    "accessor instead (see module docstring)"
                )
    except ValueError:
        raise
    except Exception:
        pass  # Spark Connect: no JVM handle; allowlist governs
    _PLANS[key] = df
    return df


def clear() -> None:
    """Drop every prepared plan (driver-side state only)."""
    _PLANS.clear()
