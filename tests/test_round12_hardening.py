"""Round-12 hardening contracts.

1. The prepared-plan registry's runtime guard (plans/prepared.py):
   checkpoint-backed plans are REJECTED at registration (a memoized
   plan over a localCheckpoint dangles once those blocks are freed —
   the ADVICE r11 failure mode), while driver-local createDataFrame
   LogicalRDD leaves (trained literals, interpolation tables) stay
   eligible.
2. finalize_job clears the prepared registry (structural no-dangling
   instead of allowlist-by-comment) and skips caller-retained foreign
   storage it already diagnosed on a prior tick.
3. Corpus-switch eviction clears the session cache so a superseded
   build's INTERNAL persists (rfm's per-customer table) don't outlive
   the plan object.
4. The session factory pins a 32 MiB JVM thread stack: Catalyst
   canonicalization recursion over the catalog's left-associated
   64-term Add chains crashed an identical-code bench run in the r11
   driver window at the default ~1 MiB.
"""

from __future__ import annotations

import pytest

from pygeoapi_ingestor_spark.plans import _PREPARED_KEYS, prepared


def test_guard_rejects_checkpoint_backed_plan(spark, sf_dir):
    prepared.clear()
    with pytest.raises(ValueError, match="checkpoint-backed"):
        prepared.prepared_plan(
            "bad_ckpt", spark, sf_dir,
            lambda: spark.range(5).localCheckpoint(),
        )
    assert not prepared._PLANS, "rejected plan must not be registered"


def test_guard_allows_driver_local_logicalrdd(spark, sf_dir):
    """createDataFrame-from-driver-rows plans carry LogicalRDD leaves
    whose data is serialized closure state, not releasable storage —
    they must stay eligible (rfm_segments' ntile tables are this)."""
    prepared.clear()
    rows_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(1, "a"), (2, "b")]), "k int, v string"
    )
    got = prepared.prepared_plan("ok_local", spark, sf_dir, lambda: rows_df)
    assert got.count() == 2
    prepared.clear()


def test_isoband_not_prepared():
    """isoband_regions embeds a checkpoint-backed CCL fixpoint — the
    r12 guard makes it ineligible; pin the allowlist exclusion so a
    future re-add trips this test instead of the runtime guard."""
    assert "isoband_regions" not in _PREPARED_KEYS


def test_finalize_clears_prepared_registry(spark, sf_dir):
    from pygeoapi_ingestor_spark.streaming.scheduler import finalize_job

    prepared.clear()
    prepared.prepared_plan(
        "tiny", spark, sf_dir,
        lambda: spark.read.parquet(f"{sf_dir}/region.parquet"),
    )
    assert prepared._PLANS
    finalize_job(spark)
    assert not prepared._PLANS, "finalize_job must drop prepared plans"


def test_corpus_switch_eviction_clears_cache(spark, sf_dir, tmp_path):
    """Superseded-corpus eviction must drop the old build's internal
    persists (CacheManager entries), not just the driver-side plan
    object (ADVICE r11)."""
    prepared.clear()
    jsc = spark.sparkContext._jsc.sc()
    before_ids = {i.id() for i in jsc.getRDDStorageInfo()}

    def build_with_internal_persist():
        df = spark.read.parquet(f"{sf_dir}/region.parquet").persist()
        df.count()  # materialize the internal persist
        return df

    prepared.prepared_plan(
        "evict_me", spark, str(tmp_path / "corpusA"),
        build_with_internal_persist,
    )
    new_ids = {i.id() for i in jsc.getRDDStorageInfo()} - before_ids
    assert new_ids, "internal persist must be cached"
    # corpus switch for the same name -> eviction path -> clearCache
    # (other suites' verify-once CHECKPOINT artifacts survive by design
    # — assert on the build's own cache entries, not global emptiness)
    prepared.prepared_plan(
        "evict_me", spark, str(tmp_path / "corpusB"),
        lambda: spark.read.parquet(f"{sf_dir}/region.parquet"),
    )
    after_ids = {i.id() for i in jsc.getRDDStorageInfo()}
    assert not (new_ids & after_ids), (
        "eviction must clear the superseded build's cached blocks"
    )
    prepared.clear()


def test_finalize_skips_previously_diagnosed_foreign_storage(spark, sf_dir):
    """Once a tick diagnoses caller-retained blocks, later ticks must
    not re-pay the ~3 s no-progress wait for the same ids (ADVICE
    r11)."""
    import time

    from pygeoapi_ingestor_spark.streaming import scheduler

    foreign = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .localCheckpoint(eager=True)
    )
    app = spark.sparkContext.applicationId
    scheduler._FOREIGN_RETAINED.pop(app, None)
    scheduler.finalize_job(spark)  # first tick: diagnoses + remembers
    assert scheduler._FOREIGN_RETAINED.get(app), (
        "first tick must record the caller-retained ids"
    )
    t0 = time.monotonic()
    scheduler.finalize_job(spark)  # steady-state tick
    elapsed = time.monotonic() - t0
    assert elapsed < 2.5, (
        f"steady-state finalize re-paid the drain wait: {elapsed:.1f}s"
    )
    assert foreign.count() > 0  # still usable
    from pygeoapi_ingestor_spark.functions.storage import free_local_ckpt

    free_local_ckpt(foreign, blocking=True)
    scheduler._FOREIGN_RETAINED.pop(app, None)


def test_session_pins_thread_stack(spark):
    assert "-Xss32m" in spark.conf.get("spark.driver.extraJavaOptions", "")
