"""Property tests: the window-trick operators (as-of join, quantile map,
sessionize) checked against naive per-row reference implementations on
randomized small inputs.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pygeoapi_ingestor_spark.operators import correction, temporal

BASE = datetime.datetime(2024, 1, 1)


def _ts(minutes: float) -> datetime.datetime:
    return BASE + datetime.timedelta(minutes=float(minutes))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000), st.floats(0, 100)),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_join_matches_naive(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(left)], "lid int, k int, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(k, _ts(m), round(v, 3)) for k, m, v in right],
        "rk int, rts timestamp, rv double",
    )
    out = temporal.asof_join(
        ldf, rdf, left_on="ts", right_on="rts",
        left_keys=["k"], right_keys=["rk"], right_value_cols=["rts", "rv"],
    ).collect()

    naive = {}
    for i, (k, m) in enumerate(left):
        cands = [(rm, rv) for (rk, rm, rv) in right if rk == k and _ts(rm) <= _ts(m)]
        naive[i] = max(cands)[1] if cands else None

    got = {r["lid"]: (round(r["rv"], 3) if r["rv"] is not None else None) for r in out}
    want = {i: (round(v, 3) if v is not None else None) for i, v in naive.items()}
    assert len(out) == len(left)
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000), st.floats(0, 100)),
        min_size=0,
        max_size=15,
    ),
    tol=st.sampled_from([None, 600]),
)
def test_asof_join_forward_matches_naive(spark, left, right, tol):
    ldf = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(left)], "lid int, k int, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(k, _ts(m), round(v, 3)) for k, m, v in right],
        "rk int, rts timestamp, rv double",
    )
    out = temporal.asof_join(
        ldf, rdf, left_on="ts", right_on="rts",
        left_keys=["k"], right_keys=["rk"], right_value_cols=["rts", "rv"],
        direction="forward", tolerance_seconds=tol,
    ).collect()

    naive = {}
    for i, (k, m) in enumerate(left):
        cands = [(rm, rv) for (rk, rm, rv) in right if rk == k and rm >= m]
        if not cands:
            naive[i] = None
            continue
        # nearest first (min rts; among ties the max value, matching the
        # operator's greatest-struct tiebreak), THEN the tolerance gate
        rm_min = min(rm for rm, _ in cands)
        rv_pick = max(rv for rm, rv in cands if rm == rm_min)
        naive[i] = rv_pick if tol is None or (rm_min - m) * 60 <= tol else None

    got = {r["lid"]: (round(r["rv"], 3) if r["rv"] is not None else None) for r in out}
    want = {i: (round(v, 3) if v is not None else None) for i, v in naive.items()}
    assert len(out) == len(left)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    model=st.lists(st.floats(0, 100), min_size=2, max_size=20),
    ref=st.lists(st.floats(0, 100), min_size=2, max_size=20),
)
def test_quantile_map_matches_naive(spark, model, ref):
    model = [round(x, 3) for x in model]
    ref = [round(x, 3) for x in ref]
    mdf = spark.createDataFrame(
        [(i, 1, v) for i, v in enumerate(model)], "mid int, s int, value double"
    )
    rdf = spark.createDataFrame([(1, v) for v in ref], "s int, value double")
    out = correction.quantile_map(
        mdf, rdf, series_cols=["s"], value_col="value", out_col="adj"
    ).collect()

    # naive: percent_rank on each side, adj = max ref value whose rank <= model rank
    def ranks(vals):
        n = len(vals)
        svals = sorted(vals)
        return {
            i: (svals.index(v)) / (n - 1) if n > 1 else 0.0
            for i, v in enumerate(vals)
        }

    mr = ranks(model)
    rr = ranks(ref)
    got = {r["mid"]: round(r["adj"], 6) for r in out}
    for i, v in enumerate(model):
        cands = [ref[j] for j in range(len(ref)) if rr[j] <= mr[i] + 1e-12]
        want = round(max(cands), 6)
        assert got[i] == want, (i, v, got[i], want)


def test_anomaly_keeps_rows_without_climatology(spark):
    from pygeoapi_ingestor_spark.operators import indices

    clim_src = spark.createDataFrame(
        [("a", BASE, 1.0), ("a", BASE, 3.0)], "s string, ts timestamp, v double"
    )
    clim = indices.climatology(clim_src, ["s"], "ts", "v", cycle="hour")
    # series "b" has no climatology entry: must survive with NULL zscore
    facts = spark.createDataFrame(
        [("a", BASE, 2.0), ("b", BASE, 5.0)], "s string, ts timestamp, v double"
    )
    out = indices.anomaly(facts, clim, ["s"], "ts", "v", cycle="hour").collect()
    assert len(out) == 2
    by_s = {r["s"]: r["zscore"] for r in out}
    assert by_s["a"] is not None
    assert by_s["b"] is None


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    gaps=st.lists(st.integers(1, 4000), min_size=1, max_size=20),
)
def test_sessionize_matches_naive(spark, gaps):
    # one user; cumulative offsets; gap threshold 1800 s
    times = []
    acc = 0
    for g in gaps:
        acc += g
        times.append(acc)
    df = spark.createDataFrame(
        [(1, BASE + datetime.timedelta(seconds=s)) for s in times],
        "user int, ts timestamp",
    )
    out = temporal.sessionize(df, key_cols=["user"], ts_col="ts", gap_seconds=1800)
    rows = sorted(out.collect(), key=lambda r: r["ts"])

    want_id = 0
    prev = None
    for r, s in zip(rows, sorted(times)):
        if prev is None or s - prev > 1800:
            want_id += 1
        assert r["session_id"] == want_id, (s, r["session_id"], want_id)
        prev = s


def test_chunked_ops_equal_plain_windows(spark, sf_dir):
    """Boundary exchange must be exact: chunked lag/ffill/interp with
    DAY chunks reproduce the single-partition-per-series windows
    row for row, including nulls at series heads and all-null chunks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.operators import temporal
    from pygeoapi_ingestor_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).withColumn(
        "v", F.when(F.col("value") >= 30.0, F.col("value"))
    )
    day = F.date_trunc("day", F.col("ts"))

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    plain_lag = ev.select(
        "event_id", F.lag("v").over(w).alias("x")
    ).collect()
    chunk_lag = temporal.chunked_lag(
        ev, ["event_type"], ["ts", "event_id"], "v", day, out_col="x"
    ).select("event_id", "x").collect()
    assert sorted(map(tuple, plain_lag)) == sorted(map(tuple, chunk_lag))

    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    plain_ff = ev.select(
        "event_id", F.last("v", ignorenulls=True).over(wf).alias("x")
    ).collect()
    chunk_ff = temporal.chunked_forward_fill(
        ev, ["event_type"], ["ts", "event_id"], "v", day, out_col="x"
    ).select("event_id", "x").collect()
    assert sorted(map(tuple, plain_ff)) == sorted(map(tuple, chunk_ff))

    plain_li = temporal.linear_interp_gaps(
        ev, ["event_type"], "ts", "v", out_col="x"
    ).select("event_id", F.round("x", 9).alias("x")).collect()
    chunk_li = temporal.chunked_linear_interp(
        ev, ["event_type"], "ts", "v", day, out_col="x"
    ).select("event_id", F.round("x", 9).alias("x")).collect()
    assert sorted(map(tuple, plain_li)) == sorted(map(tuple, chunk_li))


def test_bucketed_rank_equals_window_rank(spark, sf_dir):
    """bucketed_rank/row_number must equal the plain window functions for
    every bucket count, including n_buckets far above the data range."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.functions import ranks
    from pygeoapi_ingestor_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).limit(3000)
    w = Window.partitionBy("event_type").orderBy("value")
    plain = ev.select(
        "event_id", F.rank().over(w).alias("r")
    ).collect()
    for nb in (4, 32, 1000):
        got = ranks.bucketed_rank(
            ev, ["event_type"], "value", n_buckets=nb, out_col="r"
        ).select("event_id", "r").collect()
        assert sorted(map(tuple, plain)) == sorted(map(tuple, got)), nb

    w2 = Window.partitionBy("event_type").orderBy("value", "event_id")
    plain_rn = ev.select("event_id", F.row_number().over(w2).alias("r")).collect()
    got_rn = ranks.bucketed_row_number(
        ev, ["event_type"], "value", ["event_id"], out_col="r"
    ).select("event_id", "r").collect()
    assert sorted(map(tuple, plain_rn)) == sorted(map(tuple, got_rn))

    # ntile closed form vs SQL ntile for several k
    for k in (3, 4, 7):
        plain_nt = ev.select(
            "event_id", F.ntile(k).over(w2).alias("t")
        ).collect()
        got_nt = (
            ranks.bucketed_row_number(
                ev, ["event_type"], "value", ["event_id"],
                out_col="_rn", count_col="_cnt",
            )
            .select("event_id", ranks.ntile_expr("_rn", "_cnt", k).alias("t"))
            .collect()
        )
        assert sorted(map(tuple, plain_nt)) == sorted(map(tuple, got_nt)), k


def test_scrub_pii_patterns(spark):
    """The PII patterns must hit real email/IP/phone shapes (the corpus
    has none, so the catalog query exercises only the blocklist arm)."""
    from pygeoapi_ingestor_spark.operators.text import scrub

    rows = [
        (0, "contact alice.smith+x@example.org or bob@sub.domain.co"),
        (1, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (2, "call +1 555 123 4567 or 020-7946-0958 today"),
        (3, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in scrub(df, "text").collect()}
    assert out[0]["n_email"] == 2 and "[REDACTED]" in out[0]["scrubbed"]
    assert "@" not in out[0]["scrubbed"]
    assert out[1]["n_ipv4"] == 2 and "192.168.0.1" not in out[1]["scrubbed"]
    assert out[2]["n_phone"] >= 2
    assert out[3]["n_email"] == 0 and out[3]["scrubbed"] == rows[3][1]


def test_chunked_and_rank_edge_cases(spark):
    """Adversarial shapes: all-null series, single-row series, every
    value tied, chunks with no valid rows — chunked ops and bucketed
    ranks must still equal their single-partition window twins."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.functions import ranks
    from pygeoapi_ingestor_spark.operators import temporal

    rows = []
    # series A: all nulls          series B: one row
    rows += [("A", i, None) for i in range(6)]
    rows += [("B", 0, 5.0)]
    # series C: every value tied
    rows += [("C", i, 7.0) for i in range(9)]
    # series D: nulls interleaved so some chunks are entirely null
    rows += [("D", i, (None if (i // 3) % 2 == 0 else float(i))) for i in range(12)]
    df = spark.createDataFrame(rows, "s string, i int, v double").repartition(4)
    chunk = F.col("i") - F.col("i") % 3

    w = Window.partitionBy("s").orderBy("i")
    plain_lag = sorted(map(tuple, df.select("s", "i", F.lag("v").over(w).alias("x")).collect()))
    got_lag = sorted(map(tuple, temporal.chunked_lag(
        df, ["s"], ["i"], "v", chunk, out_col="x").select("s", "i", "x").collect()))
    assert plain_lag == got_lag

    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    plain_ff = sorted(map(tuple, df.select(
        "s", "i", F.last("v", ignorenulls=True).over(wf).alias("x")).collect()))
    got_ff = sorted(map(tuple, temporal.chunked_forward_fill(
        df, ["s"], ["i"], "v", chunk, out_col="x").select("s", "i", "x").collect()))
    assert plain_ff == got_ff

    plain_cs = sorted(map(tuple, df.select(
        "s", "i", F.sum("v").over(wf).alias("x")).collect()))
    got_cs = sorted(map(tuple, temporal.chunked_cumulative_sum(
        df, ["s"], ["i"], "v", chunk, out_col="x").select("s", "i", "x").collect()))
    assert plain_cs == got_cs

    plain_li = sorted(map(tuple, temporal.linear_interp_gaps(
        df, ["s"], "i", "v", out_col="x").select("s", "i", "x").collect()))
    got_li = sorted(map(tuple, temporal.chunked_linear_interp(
        df, ["s"], "i", "v", chunk, out_col="x").select("s", "i", "x").collect()))
    assert plain_li == got_li

    nn = df.filter(F.col("v").isNotNull())
    wv = Window.partitionBy("s").orderBy("v")
    plain_rank = sorted(map(tuple, nn.select(
        "s", "i", F.rank().over(wv).alias("r")).collect()))
    got_rank = sorted(map(tuple, ranks.bucketed_rank(
        nn, ["s"], "v", n_buckets=3, out_col="r").select("s", "i", "r").collect()))
    assert plain_rank == got_rank


def test_exact_percentiles_matches_percentile_agg(spark, sf_dir):
    """Bucket drill-down percentiles must equal Spark's exact
    `percentile` aggregate for every bucket count — including p=0/p=1
    edges and n_buckets far above the per-series row count."""
    from pyspark.sql import functions as F

    import pytest

    from pygeoapi_ingestor_spark.functions import ranks
    from pygeoapi_ingestor_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).limit(3000)
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    plain = {
        (r["event_type"], p): r[f"q{i}"]
        for r in ev.groupBy("event_type")
        .agg(*[F.percentile("value", F.lit(p)).alias(f"q{i}") for i, p in enumerate(ps)])
        .collect()
        for i, p in enumerate(ps)
    }
    for nb in (4, 64, 100000):
        got = {
            (r["event_type"], r["p"]): r["pct"]
            for r in ranks.exact_percentiles(
                ev, ["event_type"], "value", ps, ["event_id"], n_buckets=nb
            ).collect()
        }
        assert set(got) == set(plain), nb
        for k in plain:
            assert got[k] == pytest.approx(plain[k], abs=1e-9), (nb, k)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5000), st.floats(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    ),
    alpha=st.sampled_from([0.1, 0.5, 0.9]),
)
def test_chunked_ewma_matches_pandas(spark, data, alpha):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, i, _ts(m), round(v, 3)) for i, (k, m, v) in enumerate(data)],
        "k int, rid int, ts timestamp, v double",
    )
    got = {
        r["rid"]: r["y"]
        for r in temporal.chunked_ewma(
            df, ["k"], ["ts", "rid"], "v", alpha,
            F.date_trunc("day", F.col("ts")), out_col="y",
        ).collect()
    }
    pdf = pd.DataFrame(
        [(k, i, m, round(v, 3)) for i, (k, m, v) in enumerate(data)],
        columns=["k", "rid", "m", "v"],
    ).sort_values(["k", "m", "rid"])
    pdf["y"] = pdf.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=alpha, adjust=False).mean()
    )
    want = dict(zip(pdf["rid"], pdf["y"]))
    assert set(got) == set(want)
    for rid in want:
        assert abs(got[rid] - want[rid]) < 1e-9, (rid, got[rid], want[rid])


def test_bloom_prescreen_no_false_negatives_and_bounded_fp(spark, sf_dir):
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.operators.dedup import bloom_prescreen
    from pygeoapi_ingestor_spark.operators.text import fingerprint

    docs = fingerprint(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), text_col="text"
    ).select("doc_id", "fingerprint")
    reference = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs
    screened = bloom_prescreen(
        batch, reference, "fingerprint", "fingerprint",
        expected_items=1000, fpp=0.05,
    )
    ref_fps = {r["fingerprint"] for r in reference.collect()}
    rows = screened.collect()
    true_members = [r for r in rows if r["fingerprint"] in ref_fps]
    non_members = [r for r in rows if r["fingerprint"] not in ref_fps]
    # Bloom guarantee: every true member survives the screen
    assert all(r["_might_match"] for r in true_members)
    # false-positive rate on non-members stays near the configured fpp
    fp = sum(1 for r in non_members if r["_might_match"])
    assert fp / max(1, len(non_members)) <= 0.15
    # and the screen is actually selective
    assert fp < len(non_members)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    deficits=st.lists(
        st.floats(-50.0, 50.0, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    )
)
def test_clamped_cumsum_closed_form_property(spark, deficits):
    """The pet_deficit_chain identity on arbitrary sequences:
    c_t = max(c_{t-1} + d_t, 0) (reference recursion, init included)
    == S_t − min(0, running_min(S_t)) (the two-window closed form)."""
    import datetime as _dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        ("s", _dt.date(2024, 1, 1) + _dt.timedelta(days=i), float(d))
        for i, d in enumerate(deficits)
    ]
    df = spark.createDataFrame(rows, "k string, day date, p_def double")
    w = (
        Window.partitionBy("k").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_s = df.select("k", "day", "p_def", F.sum("p_def").over(w).alias("s"))
    out = with_s.withColumn("s_min", F.min("s").over(w)).select(
        "day", (F.col("s") - F.least(F.col("s_min"), F.lit(0.0))).alias("cum")
    )
    got = {r["day"]: r["cum"] for r in out.collect()}
    cum = 0.0
    for i, d in enumerate(deficits):
        cum = max(cum + d, 0.0)
        day = _dt.date(2024, 1, 1) + _dt.timedelta(days=i)
        assert abs(got[day] - cum) < 1e-9, (i, d, got[day], cum)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    coords=st.lists(
        st.tuples(
            st.floats(-180.0, 180.0, allow_nan=False),
            st.floats(-90.0, 90.0, allow_nan=False),
        ),
        min_size=1, max_size=20,
    ),
    bits=st.sampled_from([2, 3, 4]),
)
def test_chunk_quantizer_never_prunes_written_cells(spark, coords, bits):
    """For ANY coordinate, the chunk written by spatial.morton_cell must
    appear in the driver-side pruned cell list of a degenerate bbox at
    that coordinate — the HALF_UP fix as a universal property, not one
    boundary example."""
    from pygeoapi_ingestor_spark.operators import spatial
    from pygeoapi_ingestor_spark.sinks.collections import chunk_keys_for_bbox

    df = spark.createDataFrame(coords, "lon double, lat double")
    cells = [
        r["c"]
        for r in df.select(
            spatial.morton_cell("lon", "lat", bits_per_axis=bits).alias("c")
        ).collect()
    ]
    for (lon, lat), cell in zip(coords, cells):
        _, pruned = chunk_keys_for_bbox(
            (lon, lat, lon, lat), "2024-01-01", "2024-01-02",
            chunk_days=7, bits_per_axis=bits,
        )
        assert cell in pruned, (lon, lat, bits, cell, pruned)
