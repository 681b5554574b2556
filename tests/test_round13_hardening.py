"""Round-13 hardening contracts (the four ADVICE r12 items).

1. Corpus-switch eviction in the prepared-plan registry is BATCHED:
   one clearCache per observed switch, not one per switched name —
   per-name clearing dropped the CacheManager registrations of plans
   rebuilt moments earlier, leaving them executing uncached for the
   registry's lifetime (an unpersisted InMemoryRelation recomputes
   without re-storing).
2. The verify-once artifact accessors are thread-safe: concurrent
   first calls run the expensive build exactly once and every caller
   gets the same artifact (the unsynchronized check-then-build could
   run the K·n ground-truth pass twice and leak the loser's
   localCheckpoint blocks).
3. get_spark merges caller-supplied extraJavaOptions with the
   load-bearing -Xss32m pin instead of letting extra_conf replace it.
4. (spatial.py) the bounded-summary union-find collects the run-edge
   list via Arrow — two int64 columns, not ~width² Row objects —
   covered by test_spatial's label-parity tests running through the
   same path.
"""

from __future__ import annotations

import threading

from pygeoapi_ingestor_spark.plans import prepared


def test_corpus_switch_batch_eviction_single_clear(spark, sf_dir, tmp_path, monkeypatch):
    prepared.clear()
    a, b = str(tmp_path / "corpusA"), str(tmp_path / "corpusB")
    for n in ("n1", "n2", "n3"):
        prepared.prepared_plan(n, spark, a, lambda: spark.range(3))
    calls: list[int] = []
    monkeypatch.setattr(
        spark.catalog, "clearCache", lambda: calls.append(1)
    )
    for n in ("n1", "n2", "n3"):
        prepared.prepared_plan(n, spark, b, lambda: spark.range(3))
    assert sum(calls) == 1, (
        "a corpus switch must clear the session cache exactly ONCE — "
        "per-name clears drop the persists of plans rebuilt after the "
        "first eviction"
    )
    # all three names now live under corpus B
    assert {k[0] for k in prepared._PLANS} == {"n1", "n2", "n3"}
    assert {k[2] for k in prepared._PLANS} == {b}
    prepared.clear()


def test_prepared_no_clear_without_stale_entries(spark, sf_dir, monkeypatch):
    prepared.clear()
    calls: list[int] = []
    monkeypatch.setattr(spark.catalog, "clearCache", lambda: calls.append(1))
    prepared.prepared_plan("fresh1", spark, sf_dir, lambda: spark.range(2))
    prepared.prepared_plan("fresh2", spark, sf_dir, lambda: spark.range(2))
    assert not calls, "same-corpus registrations must not clear the cache"
    prepared.clear()


def test_shared_artifact_concurrent_build_runs_once(spark, sf_dir, monkeypatch):
    from pygeoapi_ingestor_spark.plans import queries_llm as qllm

    qllm.release_shared_artifacts()
    builds: list[int] = []
    orig = qllm._build_ann_gt

    def counting(spark_, sf, key):
        builds.append(1)
        return orig(spark_, sf, key)

    monkeypatch.setattr(qllm, "_build_ann_gt", counting)
    results: list = []
    threads = [
        threading.Thread(
            target=lambda: results.append(qllm.shared_ann_gt(spark, sf_dir))
        )
        for _ in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1, "concurrent first calls must build ONCE"
    assert len({id(r) for r in results}) == 1, (
        "every caller must receive the same artifact object"
    )
    qllm.release_shared_artifacts()


def test_kmeans_cents_concurrent_build_runs_once(spark, sf_dir, monkeypatch):
    from pygeoapi_ingestor_spark.operators import similarity
    from pygeoapi_ingestor_spark.plans import queries_llm as qllm

    qllm.release_shared_artifacts()
    fits: list[int] = []
    orig = similarity.kmeans_fit_int8

    def counting(*a, **kw):
        fits.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(similarity, "kmeans_fit_int8", counting)
    results: list = []
    threads = [
        threading.Thread(
            target=lambda: results.append(qllm.shared_kmeans_cents(spark, sf_dir))
        )
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(fits) == 1
    assert all(r == results[0] for r in results)
    qllm.release_shared_artifacts()


def test_extra_java_options_merge_keeps_xss_pin():
    """extra_conf supplying its own extraJavaOptions must not replace
    the -Xss32m canonicalization-StackOverflow pin (ADVICE r12). The
    merge happens at builder time; assert on the builder's conf map
    (a live getOrCreate would no-op against the running session)."""
    from pyspark.sql import SparkSession

    from pygeoapi_ingestor_spark import session as sess

    captured: dict = {}

    class FakeBuilder:
        def appName(self, *_):
            return self

        def master(self, *_):
            return self

        def config(self, k, v):
            captured[k] = v
            return self

        def getOrCreate(self):
            return None

    # save the class ATTRIBUTE (the classproperty descriptor), not the
    # evaluated property — restoring an evaluated Builder instance would
    # pin one shared builder for the rest of the pytest session
    orig = SparkSession.__dict__["builder"]
    try:
        SparkSession.builder = FakeBuilder()
        sess.get_spark(
            extra_conf={"spark.driver.extraJavaOptions": "-Dfoo=bar"}
        )
    finally:
        SparkSession.builder = orig
    v = captured["spark.driver.extraJavaOptions"]
    assert "-Xss32m" in v and "-Dfoo=bar" in v
    # r14: the concurrent-explicit-GC pin must survive the merge too
    assert "-XX:+ExplicitGCInvokesConcurrent" in v
    # a caller explicitly choosing its own stack size wins; the GC pin
    # is still prepended (the caller did not mention the flag)
    captured.clear()
    try:
        SparkSession.builder = FakeBuilder()
        sess.get_spark(
            extra_conf={"spark.driver.extraJavaOptions": "-Xss64m"}
        )
    finally:
        SparkSession.builder = orig
    v = captured["spark.driver.extraJavaOptions"]
    assert v.endswith("-Xss64m") and "-Xss32m" not in v
    assert "-XX:+ExplicitGCInvokesConcurrent" in v
    # a caller explicitly DISABLING concurrent explicit GC wins — the
    # merge must not re-add the + form
    captured.clear()
    try:
        SparkSession.builder = FakeBuilder()
        sess.get_spark(
            extra_conf={
                "spark.driver.extraJavaOptions":
                    "-XX:-ExplicitGCInvokesConcurrent"
            }
        )
    finally:
        SparkSession.builder = orig
    v = captured["spark.driver.extraJavaOptions"]
    assert "-XX:+ExplicitGCInvokesConcurrent" not in v
    assert "-Xss32m" in v


# ---------------------------------------------------------------------------
# r13 optimization-round internals: the shuffle-free shingle projection
# and the one-pass Gram-matrix power iteration must reproduce the exact
# semantics of the r12 formulations they replaced.
# ---------------------------------------------------------------------------


def test_shingles_projection_semantics(spark):
    """Projection-based shingles == the python twin of the old
    posexplode+lead formulation: distinct word 3-grams per doc,
    short docs (< n words) yield nothing, in-doc repeats dedup."""
    import re

    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.operators import dedup

    rows = [
        (1, "the cat sat on the mat the cat sat"),  # repeated gram
        (2, "one two"),                              # too short -> none
        (3, "Alpha, beta! GAMMA delta"),             # punctuation/case
        (4, ""),                                     # empty -> none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc"], r["shingle"])
        for r in dedup.shingles(df, "doc_id", "text", n=3).collect()
    }

    def twin(doc_id, text):
        ws = [w for w in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if w]
        return {(doc_id, " ".join(ws[i:i + 3])) for i in range(len(ws) - 2)}

    want = set()
    for doc_id, text in rows:
        want |= twin(doc_id, text)
    assert got == want
    # and it must stay shuffle-free past the spread: no Window, no
    # dropDuplicates aggregate in the plan
    plan = dedup.shingles(df, "doc_id", "text", n=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_power_iteration_gram_matches_per_iteration_twin(spark):
    """The one-pass Gram formulation returns the SAME integers as the
    r12 per-iteration re-scan: w = (A^T A) v == A^T (A v) over exact
    ints. Twin computed in pure Python big-ints."""
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.operators import linalg

    vecs = [
        [3, -1, 7, 0], [2, 2, -5, 1], [-4, 0, 6, -2], [1, 1, 1, 1],
        [0, -3, 2, 9],
    ]
    dim, iters, scale = 4, 3, linalg.PCA_SCALE
    df = spark.createDataFrame([(v,) for v in vecs], "q_vec array<int>")
    v_got, num_got, den_got, n_got = linalg.power_iteration_int8(
        df, "q_vec", dim=dim, iters=iters
    )

    # twin: per-iteration A^T (A v) in exact big ints
    v = [scale // 10] * dim
    num = den = 0
    for _ in range(iters):
        dots = [sum(q[j] * v[j] for j in range(dim)) for q in vecs]
        w = [sum(q[i] * d for q, d in zip(vecs, dots)) for i in range(dim)]
        m = max(abs(x) for x in w) or 1
        num = sum(vi * wi for vi, wi in zip(v, w))
        den = sum(vi * vi for vi in v)
        v = [linalg._trunc_div(wi * scale, m) for wi in w]
    assert (v_got, num_got, den_got, n_got) == (v, num, den, len(vecs))


# ---------------------------------------------------------------------------
# r13 optimization round: catalog-wide prepared statements + the
# artifact-epoch contract for the checkpoint-embedding keys.
# ---------------------------------------------------------------------------


def test_artifact_keys_excluded_from_plain_prepared_list():
    """Every checkpoint-embedding key must be in _ARTIFACT_KEYS (epoch-
    bound memoization), never in the plain allowlist: a plain memoized
    plan over a freed localCheckpoint dangles with no lineage to
    recompute from."""
    from pygeoapi_ingestor_spark.plans import _ARTIFACT_KEYS, _PREPARED_KEYS

    assert not (_ARTIFACT_KEYS & set(_PREPARED_KEYS))
    # the full catalog is covered one way or the other
    from pygeoapi_ingestor_spark.plans import QUERIES

    assert _ARTIFACT_KEYS <= set(QUERIES)


def test_artifact_bound_plan_invalidated_by_checkpoint_free(spark, sf_dir):
    """artifact_bound memo key includes the artifact epoch: a memo hit
    before any free, a rebuild after free_local_ckpt bumps the epoch —
    the memoized plan can never outlive the storage it reads."""
    from pygeoapi_ingestor_spark.functions.storage import free_local_ckpt

    prepared.clear()
    builds: list[int] = []

    def build():
        builds.append(1)
        return spark.range(4).localCheckpoint()

    df1 = prepared.prepared_plan("ab1", spark, sf_dir, build, artifact_bound=True)
    df2 = prepared.prepared_plan("ab1", spark, sf_dir, build, artifact_bound=True)
    assert df1 is df2 and builds == [1], "same epoch must memo-hit"
    free_local_ckpt(df1)  # bumps the artifact epoch
    prepared.prepared_plan("ab1", spark, sf_dir, build, artifact_bound=True)
    assert builds == [1, 1], "a checkpoint free must force a rebuild"
    # the stale-epoch entry is purged, not leaked
    assert len([k for k in prepared._PLANS if k[0] == "ab1"]) == 1
    prepared.clear()


def test_artifact_bound_skips_checkpoint_guard(spark, sf_dir):
    """The guard rejects checkpoint leaves for PLAIN registrations only;
    artifact_bound admits them (the checkpoint is the point — the epoch
    key is what guarantees safety)."""
    import pytest

    prepared.clear()
    with pytest.raises(ValueError, match="checkpoint-backed"):
        prepared.prepared_plan(
            "plain_ck", spark, sf_dir, lambda: spark.range(3).localCheckpoint()
        )
    got = prepared.prepared_plan(
        "bound_ck", spark, sf_dir,
        lambda: spark.range(3).localCheckpoint(), artifact_bound=True,
    )
    assert got.count() == 3
    prepared.clear()


def test_simhash_arrow_kernel_matches_python_twin(spark):
    """The Arrow-kernel simhash must reproduce the r12 formulation's
    bits exactly: S_i = sum of occurrences whose md5-derived token hash
    has bit i set, sign rule 2*S_i > total. Twin in pure Python over a
    constructed corpus (repeats exercise the per-occurrence linearity
    that replaced the (doc, w) pre-aggregation)."""
    import hashlib
    import re

    from pygeoapi_ingestor_spark.operators import dedup

    rows = [
        (1, "alpha beta gamma alpha alpha beta"),
        (2, "one two, THREE three? four five six seven"),
        (3, "solo"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: r["simhash"]
        for r in dedup.simhash(df, "doc_id", "text", token_hash="md5").collect()
    }

    def h64(w: str) -> int:
        hx = hashlib.md5(w.encode()).hexdigest()
        return int(hx[:15], 16) | (int(hx[15], 16) << 60)

    want = {}
    for doc_id, text in rows:
        ws = [w for w in re.sub(r"[^A-Za-z0-9\s]", " ", text).lower().split() if w]
        if not ws:
            continue  # explode of an empty token array drops the doc
        tot = len(ws)
        sim = 0
        for i in range(64):
            s_i = sum(1 for w in ws if (h64(w) >> i) & 1)
            if 2 * s_i > tot:
                sim |= 1 << i
        # JVM long: interpret bit 63 as sign
        if sim >= 1 << 63:
            sim -= 1 << 64
        want[doc_id] = sim
    assert got == want


def test_minhash_kernel_matches_python_twin(spark):
    """The Arrow minhash kernel must reproduce h_i = h1 XOR rotl(h2,
    7i+1) with per-doc signed-min semantics, including the 60-bit md5
    ring's mask-then-shift rotation. Twin in pure Python."""
    import hashlib

    from pygeoapi_ingestor_spark.operators import dedup

    rows = [(1, "aa bb cc dd ee ff gg"), (2, "aa bb cc xx yy zz ww")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: list(r["signature"])
        for r in dedup.minhash_signatures(
            df, "doc_id", "text", n=3, num_hashes=32, shingle_hash="md5"
        ).collect()
    }

    def shingles3(text):
        ws = text.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    def rotl60(v, r):
        r %= 60
        if r == 0:
            return v
        return ((v & ((1 << (60 - r)) - 1)) << r) | (v >> (60 - r))

    want = {}
    for doc_id, text in rows:
        hs = []
        for s in shingles3(text):
            hx = hashlib.md5(s.encode()).hexdigest()
            hs.append((int(hx[:15], 16), int(hx[16:31], 16)))
        want[doc_id] = [
            min(h1 ^ rotl60(h2, 7 * i + 1) for h1, h2 in hs)
            for i in range(32)
        ]
    assert got == want


def test_quantize_int8_np_matches_jvm_expression(spark):
    """The numpy quantization twin must reproduce the JVM quantize_int8
    expression bit-for-bit, including HALF_UP ties (Spark round() rounds
    half AWAY from zero; numpy's default rounds half-to-even) and the
    zero-vector scale fallback. Adversarial rows: exact .5 ties both
    signs, near-ties one ulp away, zero vectors, denormal-ish scales."""
    import math

    import numpy as np

    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.operators.similarity import (
        quantize_int8,
        quantize_int8_np,
    )

    rows = [
        (0, [2.5, -2.5, 0.5, -0.5, 1.5, -1.5, 127.0, -127.0]),
        (1, [math.nextafter(2.5, 0.0), math.nextafter(2.5, 5.0),
             math.nextafter(-2.5, 0.0), math.nextafter(-2.5, -5.0),
             0.25, -0.25, 63.5, -63.5]),
        (2, [0.0] * 8),
        (3, [1e-12, -1e-12, 2e-12, -2e-12, 5e-13, 1e-12, 0.0, 1e-12]),
        (4, [0.1, 0.2, 0.3, -0.4, 0.05, -0.06, 0.007, 0.9999999]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    jvm = {
        r["id"]: (list(r["q_vec"]), r["q_scale"])
        for r in quantize_int8(df, "v").collect()
    }
    for rid, vec in rows:
        q, scale = quantize_int8_np(np.asarray([vec], dtype=np.float64))
        assert list(q[0]) == jvm[rid][0], f"row {rid}"
        assert float(scale[0]) == jvm[rid][1], f"row {rid} scale"


def test_cosine_topk_int8_arrow_matches_fold_path(spark, sf_dir):
    """The r13 Arrow kernel of cosine_topk_int8 (dim given) must return
    the exact rows of the fold-expression path (dim=None) on the real
    corpus — quantization, integer dots, sqrt(na)*sqrt(nb) denominator
    and (cosine desc, id asc) tie-breaks all bit-identical.

    Scope (ADVICE r13): this corpus gives every query >= k valid
    neighbors. On a corpus with FEWER than k valid rows per query the
    two paths diverge by design — the fold path ranks NULL/NaN-cosine
    rows last (they can surface when valid rows run out), the Arrow
    path drops them entirely. That divergence is documented in the
    operator docstring; the parity claim here is the >=k-valid case."""
    from pyspark.sql import functions as F

    from pygeoapi_ingestor_spark.operators.similarity import cosine_topk_int8

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = e.filter(F.col("vec_id") < 7)
    kwargs = dict(
        id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", query_vec_col="embedding", k=5,
    )
    old = cosine_topk_int8(e, q, **kwargs).collect()
    new = cosine_topk_int8(e, q, dim=64, **kwargs).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, new), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, old), key=lambda t: (t[0], t[3])
    )
