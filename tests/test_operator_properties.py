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
