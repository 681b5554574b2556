"""Properties of the curation catalog keys (plans/queries_curation.py):
CMS never undercounts, pooled silhouette is in [0,1] because Lloyd
assignment is argmin, segment/bigram arithmetic agrees with the house
tokenizer, and DSIR weights are bounded by the bucket-model extremes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.operators import text
from pygeoapi_ingestor_spark.plans.queries_curation import (
    SEG_WORDS,
    q_cms_heavy_hitters,
    q_dsir_importance_weights,
    q_kmeans_silhouette,
    q_segment_dedup,
)


def _word_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return {
        r["doc_id"]: r["nw"]
        for r in docs.select(
            "doc_id", F.size(text.norm_words("text")).alias("nw")
        ).collect()
    }


def test_segment_dedup_counts_and_ratio(spark, sf_dir):
    nw = _word_counts(spark, sf_dir)
    rows = q_segment_dedup(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r["doc_id"])
        assert r["n_segments"] == nw[r["doc_id"]] // SEG_WORDS
        assert 0 <= r["n_shared_segments"] <= r["n_segments"]
        assert math.isclose(
            r["shared_ratio"],
            round(r["n_shared_segments"] / r["n_segments"], 6),
            abs_tol=1e-12,
        )
    # every doc with >= SEG_WORDS words has a row
    assert seen == {d for d, n in nw.items() if n >= SEG_WORDS}


def test_segment_dedup_exact_duplicates_fully_shared(spark, sf_dir):
    """Docs whose whole text appears in another doc (exact dups) must
    have every segment shared."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup_ids = [
        r["doc_id"]
        for r in docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode("ids").alias("doc_id"))
        .collect()
    ]
    if not dup_ids:
        return
    ratios = {
        r["doc_id"]: r["shared_ratio"]
        for r in q_segment_dedup(spark, sf_dir).collect()
    }
    for d in dup_ids:
        if d in ratios:
            assert ratios[d] == 1.0


def test_dsir_weights_bounded_and_counts(spark, sf_dir):
    nw = _word_counts(spark, sf_dir)
    out = q_dsir_importance_weights(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_bigrams"] == max(nw[r["doc_id"]] - 1, 0)
    # a per-doc average of bucket log-ratios is bounded by the extreme
    # bucket values; with add-one smoothing |llr| <= ln((T+B)*(max_rc+1))
    # — use a loose structural bound instead of re-deriving the model
    assert all(abs(r["avg_llr"]) < 50 for r in out)


def test_cms_never_undercounts(spark, sf_dir):
    rows = q_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"]  # CMS one-sided guarantee
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]
        assert r["exact_cnt"] > 0


def test_silhouette_pooled_in_unit_interval(spark, sf_dir):
    rows = q_kmeans_silhouette(spark, sf_dir).collect()
    assert rows
    n_total = sum(r["n"] for r in rows)
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert n_total == emb_n
    for r in rows:
        # argmin assignment -> own-centroid distance <= any other, so
        # the pooled gap is nonnegative and the ratio sits in [0, 1]
        assert r["sum_gap"] >= 0
        assert r["sum_max"] >= r["sum_gap"]
        assert 0.0 <= r["pooled_silhouette"] <= 1.0
