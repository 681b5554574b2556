"""Checkpoint-release helpers — the ONE code path every release site
routes through (VERDICT r10 item 3).

``catalog.clearCache()`` does not reach RDD-level ``localCheckpoint``
blocks, so every operator/sink that materializes one must release it
explicitly or the blocks pin executor storage for the session lifetime.
The repo had two generations of release code: a leaf-walking helper in
plans/queries_llm and three root-only ``analyzed().rdd().unpersist()``
sites. The root-only pattern is silently fragile: a released frame
whose plan root is a Project (anyone inserting ``.select()`` between
checkpoint and release) has no ``rdd()`` accessor, the call raises
inside a swallow-all ``except``, and the blocks leak with zero signal —
the exact failure commit a62aa76 diagnosed. This module is the single
leaf-walking implementation; failures are LOGGED, never swallowed
silently.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


def free_local_ckpt(df: DataFrame, blocking: bool = True) -> list[int]:
    """Release the RDD blocks behind a ``localCheckpoint()``-backed
    DataFrame (or any plan built over one) and return the released RDD
    ids (``finalize_job`` drains exactly these instead of requiring
    globally-empty storage).

    Walks the analyzed plan's LEAVES for LogicalRDD nodes instead of
    calling ``rdd()`` on the root: a projection-rooted plan
    (``select(...)`` over the checkpoint) has a Project root with no
    ``rdd()`` accessor, so a root-only call raises and the checkpoint
    blocks silently leak for the session lifetime.

    ``blocking=True`` is the job-boundary contract ("storage is free
    when this returns" — finalize_job, corpus switch, sink writes);
    ``blocking=False`` is for superseded generations inside iterative
    loops (connected_components), where the next materialization is the
    natural barrier and a synchronous wait per iteration only adds
    latency.

    GROUP-RELEASE INVARIANT (ADVICE r10): this unpersists EVERY
    LogicalRDD leaf of the plan. Two tracked artifacts that share a
    checkpoint (shared_dup_components embeds shared_verified_pairs'
    corpus) must therefore be released together — same-corpus artifacts
    always are (corpus-switch eviction and release_shared_artifacts
    both drain the whole registry). Releasing one artifact of such a
    group in isolation would drop the survivor's blocks, and a
    localCheckpoint has no lineage to recompute from.

    No-op (with a logged warning) where the JVM plan handle is
    unavailable (Spark Connect) — blocks then live until session end,
    which the log line makes visible instead of silent.
    """
    ids: list[int] = []
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                rdd = leaf.rdd()
                ids.append(rdd.id())
                rdd.unpersist(blocking)
    except Exception as exc:  # pragma: no cover - Connect/teardown path
        log.warning(
            "checkpoint release failed (blocks may remain pinned until "
            "session end): %s", exc,
        )
    # every checkpoint free invalidates the artifact-bound prepared
    # plans (plans/prepared.py epoch key): a memoized plan over freed
    # storage must never be served again. Bumped even on the warning
    # path above — if the release MAY have happened, the memo dies.
    from pygeoapi_ingestor_spark.plans.prepared import bump_artifact_epoch

    bump_artifact_epoch()
    return ids
