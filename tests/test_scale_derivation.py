"""Invariants of the derived-sf1 generator (tools/make_scale_sf.py).

BENCH_SCALE.json's scaling claims rest on the derivation preserving
workload SHAPE: ids stride without collisions, replica 0 is
bit-identical to the source, per-replica text permutation preserves
the word multiset (so token/tfidf/quality workloads keep their
distributions) while exact-dup groups are preserved within a replica
and no near-dups leak across replicas, and embedding rotation
preserves the norm. These run the generator's own expressions on a
tiny frame — no 163 MB dataset needed in CI.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _permuted_expr():
    # mirror of make_scale_sf.py's permutation expression
    return F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.struct(
                        F.md5(
                            F.concat(
                                F.col("_r").cast("string"), F.lit(":"), w
                            )
                        ).alias("k"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s.getField("w"),
        ),
        " ",
    )


def test_word_permutation_preserves_multiset_and_dup_groups(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "pack my box with five dozen liquor jugs",
    ]
    rows = [(i, t, r) for r in range(3) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, _r int")
    out = df.withColumn(
        "text2",
        F.when(F.col("_r") == 0, F.col("text")).otherwise(_permuted_expr()),
    ).collect()

    by_key = {(r["doc_id"], r["_r"]): r["text2"] for r in out}
    # replica 0 identical
    for i, t in enumerate(texts):
        assert by_key[(i, 0)] == t
    for r in range(3):
        # word multiset preserved per doc
        for i, t in enumerate(texts):
            assert sorted(by_key[(i, r)].split(" ")) == sorted(t.split(" "))
        # exact-dup group preserved WITHIN the replica
        assert by_key[(0, r)] == by_key[(1, r)]
    # different replicas permute differently (no cross-replica dups)
    assert by_key[(0, 1)] != by_key[(0, 2)] != by_key[(0, 0)]


def test_embedding_rotation_preserves_norm_and_kills_neighbors(spark):
    dim = 16
    rng = np.random.RandomState(3)
    vec = [float(x) for x in rng.randn(dim).astype(np.float32)]
    rows = [(r,) for r in range(1, 4)]
    df = spark.createDataFrame(rows, "_r int").withColumn(
        "embedding", F.lit(vec).cast("array<float>")
    )
    rotated = df.select(
        "_r",
        F.concat(
            F.slice(F.col("embedding"), F.col("_r") + 1, F.lit(dim) - F.col("_r")),
            F.slice(F.col("embedding"), 1, F.col("_r")),
        ).alias("rot"),
    ).collect()
    v = np.asarray(vec, dtype=np.float64)
    for r_ in rotated:
        w = np.asarray(r_["rot"], dtype=np.float64)
        # rotation: same multiset, same norm, exact element match
        assert np.array_equal(np.roll(v, -r_["_r"]), w)
        assert abs(np.linalg.norm(w) - np.linalg.norm(v)) < 1e-12
        # cosine to the original well below near-dup thresholds
        cos = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        assert cos < 0.9
