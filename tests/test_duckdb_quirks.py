"""Engine quirks the oracle SQL must design around, pinned so a DuckDB
upgrade (or a new oracle author) surfaces them loudly instead of as a
silent gate mismatch.

Structure (ADVICE r10): the HOUSE WORKAROUND is asserted
unconditionally — it is correct whether or not the quirk exists. The
quirk-presence assertion is gated: if an upgrade fixes the upstream
bug, the test SKIPS with a 'quirk retired' message (retire the
workaround comments at leisure) instead of failing CI red."""

from __future__ import annotations

import duckdb
import pytest


def test_recursive_prefix_degrades_nonrecursive_union():
    """Under a WITH RECURSIVE prefix, DuckDB executes a NON-recursive
    CTE's top-level UNION as UNION ALL — dedup silently dropped (found
    by quality_dup_interaction's member join fanning out; DuckDB 1.0).
    Oracle rule: inside any RECURSIVE WITH, write DISTINCT over
    UNION ALL, never bare UNION — unless the arms are provably
    disjoint (the uedges doc_a<doc_b pattern) or a downstream
    recursive fixpoint re-dedups (the reach pattern)."""
    con = duckdb.connect()
    # the house workaround restores set semantics — always required
    fixed = con.execute(
        """WITH RECURSIVE p AS (
               SELECT * FROM (VALUES (1, 2), (1, 3), (2, 3)) v(a, b)
           ), m AS (
               SELECT DISTINCT d FROM (
                   SELECT a AS d FROM p UNION ALL SELECT b FROM p
               )
           ) SELECT count(*) FROM m"""
    ).fetchone()
    assert fixed == (3,)
    rows = con.execute(
        """WITH RECURSIVE p AS (
               SELECT * FROM (VALUES (1, 2), (1, 3), (2, 3)) v(a, b)
           ), m AS (
               SELECT a AS d FROM p UNION SELECT b FROM p
           ) SELECT count(*), count(DISTINCT d) FROM m"""
    ).fetchone()
    if rows == (3, 3):
        pytest.skip(
            f"quirk RETIRED in duckdb {duckdb.__version__}: UNION under "
            "WITH RECURSIVE now deduplicates — the DISTINCT-over-UNION-ALL "
            "workarounds in the oracles stay correct but can be simplified"
        )
    # bare UNION keeps duplicates here (6 rows over 3 distinct values)
    assert rows == (6, 3)


def test_decimal_literal_overflows_without_double_cast():
    """A long decimal literal parses as DECIMAL(18,...), and
    multiplying it by a large integer raises an overflow instead of
    widening (found by hll_union_eval's alpha constant). Oracle rule:
    cast repr(float) literals with ::DOUBLE."""
    con = duckdb.connect()
    # the house workaround — always required, always correct
    val = con.execute(
        "SELECT (0.7093409548395029::DOUBLE) * 4096.0"
    ).fetchone()[0]
    assert abs(val - 0.7093409548395029 * 4096.0) < 1e-9
    try:
        con.execute("SELECT 0.7093409548395029 * 4096.0").fetchone()
    except duckdb.OutOfRangeException:
        return  # quirk still present — pinned
    pytest.skip(
        f"quirk RETIRED in duckdb {duckdb.__version__}: decimal-literal "
        "multiply now widens — the ::DOUBLE casts in the oracles stay "
        "correct but are no longer load-bearing"
    )


def test_negative_zero_collapse_convention(spark):
    """round() of a tiny negative keeps IEEE -0.0 in DuckDB but not in
    Spark, so a rounded float column that can cross zero hash-splits
    the gate (caught live by the r11 sf0.1 full ledger on
    spi_forecast_blend's ens_median — invisible at sf0.01). House rule:
    `+ 0.0` after the final round on BOTH sides (queries_ml new_weight
    precedent) — IEEE addition collapses -0.0 + 0.0 to +0.0 in every
    engine."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    raw_d = con.execute("SELECT round(-1e-9, 6)").fetchone()[0]
    fixed_d = con.execute("SELECT round(-1e-9, 6) + 0.0").fetchone()[0]
    assert repr(fixed_d) == "0.0"
    row = spark.range(1).select(
        F.round(F.lit(-1e-9), 6).alias("raw"),
        (F.round(F.lit(-1e-9), 6) + F.lit(0.0)).alias("fixed"),
    ).collect()[0]
    assert repr(row["fixed"]) == "0.0"
    # the quirk itself: engines disagree on the UNfixed repr
    if repr(raw_d) == repr(row["raw"]):
        pytest.skip(
            f"quirk RETIRED in duckdb {duckdb.__version__}: round() now "
            "agrees with Spark on signed zero — the + 0.0 collapses stay "
            "correct but are no longer load-bearing"
        )
    assert {repr(raw_d), repr(row["raw"])} == {"-0.0", "0.0"}
