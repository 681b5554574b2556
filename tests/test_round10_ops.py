"""Round-10 operator properties: cluster_keep_best picks a true member
with the cluster's max quality, dup_cluster_quality's pooled jaccard is
bounded by its min/max edges, and matryoshka recall is exact-1 when the
prefix is the full dimension (the eval's self-consistency anchor)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cluster_keep_best_is_member_argmax(spark, sf_dir):
    from pygeoapi_ingestor_spark.operators import text as text_ops
    from pygeoapi_ingestor_spark.plans.queries_llm import (
        _docs,
        shared_dup_components,
    )
    from pygeoapi_ingestor_spark.plans.queries_ml import q_cluster_keep_best

    out = {r["component"]: r for r in q_cluster_keep_best(spark, sf_dir).collect()}
    comps = {}
    for r in shared_dup_components(spark, sf_dir).collect():
        comps.setdefault(r["comp"], set()).add(r["node"])
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in text_ops.quality_features(
            _docs(spark, sf_dir), text_col="text"
        ).select("doc_id", "quality_score").collect()
    }
    assert set(out) == set(comps)
    for comp, row in out.items():
        members = comps[comp]
        assert row["keep_id"] in members
        assert row["cluster_size"] == len(members)
        assert row["n_dropped"] == len(members) - 1
        best = max(quality[m] for m in members)
        # keep_id attains the max quality (round-6 output vs raw score)
        assert abs(quality[row["keep_id"]] - best) < 1e-12


def test_cluster_quality_bounds(spark, sf_dir):
    from pygeoapi_ingestor_spark.plans.queries_ml import q_dup_cluster_quality

    rows = q_dup_cluster_quality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cluster_size"] >= 2
        # pooled jaccard is a weighted mean of per-edge jaccards, so it
        # cannot sit below the min edge; every verified edge >= 0.6
        assert 0.6 <= r["min_jaccard"] <= 1.0
        assert r["min_jaccard"] - 1e-6 <= r["pooled_jaccard"] <= 1.0
        max_edges = r["cluster_size"] * (r["cluster_size"] - 1) // 2
        assert 1 <= r["n_edges"] <= max_edges
        assert 0.0 < r["edge_density"] <= 1.0 + 1e-9


def test_matryoshka_recall_is_one_at_full_dim(spark, sf_dir, monkeypatch):
    import pygeoapi_ingestor_spark.plans.queries_llm as qllm

    monkeypatch.setattr(qllm, "MATRYOSHKA_DIM", 64)
    rows = qllm.q_matryoshka_recall_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["recall_at_k"] == 1.0, (
            "prefix=full dim must reproduce the ground truth exactly"
        )


def test_matryoshka_recall_bounded(spark, sf_dir):
    from pygeoapi_ingestor_spark.plans.queries_llm import (
        TOPK,
        q_matryoshka_recall_eval,
    )

    rows = q_matryoshka_recall_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= TOPK
        assert 0.0 <= r["recall_at_k"] <= 1.0
