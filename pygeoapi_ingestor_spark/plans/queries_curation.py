r"""Training-data curation catalog queries (SURVEY.md §2 blocks B/C,
round-10 session-2 additions) on ``documents`` and ``embeddings``.

Four production actions a 100 TB curation pipeline runs after the
dedup/quality machinery the earlier rounds built:

- ``segment_dedup`` — CCNet-style cross-document segment frequency
  (the "line dedup" pass of Wenzek et al. 2020, re-keyed to fixed
  8-word segments because the synthetic corpus has no newlines): how
  much of each document is boilerplate shared with other documents.
- ``dsir_importance_weights`` — hashed-bigram importance weights
  (Xie et al. 2023, Data Selection via Importance Resampling): per-doc
  average log-likelihood ratio of a target-source bigram model vs the
  raw-corpus model, the data-selection score.
- ``cms_heavy_hitters`` — Count-Min sketch (Cormode & Muthukrishnan
  2005) token-frequency estimates next to exact counts for the top
  terms: the acceptance row for the only sketch whose state stays
  4x1024 cells at any corpus size.
- ``kmeans_silhouette`` — pooled silhouette cohesion per k-means
  cluster over the int8-quantized embeddings: the accept/reject gate
  on the trained IVF/semdedup clustering.

House parity conventions throughout (queries_ml.py docstring): integer
or decimal-exact accumulation wherever a sum crosses rows (per-row
doubles are rounded to 12 dp and summed as decimal(38,12) — the
token_zipf_fit trick), floats only in final per-row expressions,
``round(..., 6)`` applied identically on both sides, and every hash an
engine-neutral md5-substring so the DuckDB twin replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.operators import similarity, text

SEG_WORDS = 8  # segment width (words) for the cross-doc segment census
DSIR_BUCKETS = 4096  # hashed-bigram feature space (DSIR paper uses 10k)
DSIR_TARGET_SOURCE = "src0"  # the "high-quality target" corpus slice
CMS_DEPTH = 4  # count-min rows (independent hash functions)
CMS_WIDTH = 1024  # count-min buckets per row
CMS_TOPN = 100  # exact heavy hitters to score the sketch against


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def _hash60(col) -> F.Column:
    """Engine-neutral 60-bit hash: ('0x'||substr(md5(x),1,15))::BIGINT
    in DuckDB, conv(substr(md5(x),1,15),16,10) here — always positive,
    so ``%`` agrees between engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_WORDS_CTE = r"""
WITH words_t AS (
    SELECT doc_id, source,
           list_filter(
               string_split_regex(
                   lower(regexp_replace(text, '[^A-Za-z0-9\s]', ' ', 'g')),
                   '\s+'),
               w -> w <> '') AS words
    FROM documents
)
"""


# ---------------------------------------------------------------------------
# segment_dedup (block C)
# ---------------------------------------------------------------------------


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document segment census: chop every document
    into non-overlapping 8-word segments, hash each (md5 — the shuffle
    carries 16-byte digests, never text), count how many DISTINCT
    documents each segment appears in, and report per document how much
    of it is corpus-boilerplate (segments shared with >=1 other doc).

    Scale shape: one explode + one groupBy on the segment hash (map-side
    combinable counts) + one co-partitioned join back on the same key —
    AQE reuses the exchange. No text survives past the first projection;
    state per segment is (digest, two longs). The per-doc rollup is a
    second combinable groupBy on doc_id. At 100 TB this is the exact
    plan CCNet runs per shard, minus the driver ever seeing a row."""
    docs = _docs(spark, sf_dir)
    words = text.norm_words("text")
    n_full = F.floor(F.size(words) / SEG_WORDS).cast("int")
    segs = F.when(
        n_full >= 1,
        F.transform(
            F.sequence(F.lit(0), n_full - 1),
            lambda i: F.array_join(
                F.slice(words, i * SEG_WORDS + 1, SEG_WORDS), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    seg_rows = docs.select(
        "doc_id", "source", F.explode(segs).alias("seg")
    ).select("doc_id", "source", F.md5("seg").alias("seg_hash"))
    freq = seg_rows.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs_with")
    )
    joined = seg_rows.join(freq, "seg_hash")
    return (
        joined.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(
                F.when(F.col("n_docs_with") >= 2, 1).otherwise(0)
            ).cast("bigint").alias("n_shared_segments"),
        )
        .withColumn(
            "shared_ratio",
            F.round(
                F.col("n_shared_segments").cast("double")
                / F.col("n_segments").cast("double"),
                6,
            ),
        )
    )


_SEGMENT_DEDUP_ORACLE = _WORDS_CTE + f"""
, segs AS (
    SELECT doc_id, source,
           md5(array_to_string(
               words[{SEG_WORDS}*i + 1 : {SEG_WORDS}*i + {SEG_WORDS}], ' '))
               AS seg_hash
    FROM words_t, LATERAL (
        SELECT unnest(range(0, CAST(floor(len(words) / {SEG_WORDS}) AS BIGINT)))
               AS i
    )
), freq AS (
    SELECT seg_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with
    FROM segs GROUP BY 1
)
SELECT s.doc_id, s.source,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_segments,
       round(CAST(sum(CASE WHEN f.n_docs_with >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS shared_ratio
FROM segs s JOIN freq f USING (seg_hash)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# dsir_importance_weights (block C)
# ---------------------------------------------------------------------------


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection weights (Xie et al. 2023): hash every word
    bigram into {DSIR_BUCKETS} buckets, fit add-one-smoothed unigram-
    over-buckets models for the TARGET slice (source = src0) and the
    RAW corpus, and score each document by its average per-bigram
    log-likelihood ratio — documents that "look like" the target score
    high and get upweighted at sampling time.

    Scale shape: the feature space is FIXED (4096 buckets), so both
    models are one map-side-combinable groupBy ending in a 4096-row
    table that broadcasts back onto the doc-bigram stream; the per-doc
    score is a second combinable groupBy whose summand is a 12-dp
    decimal (exact, partition-order-free — the zipf-fit trick). Two
    scans of the corpus, no data-sized driver state."""
    docs = _docs(spark, sf_dir)
    words = text.norm_words("text")
    n_bi = (F.size(words) - 1).cast("int")
    bigrams = F.when(
        n_bi >= 1,
        F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(
        "doc_id", "source", F.explode(bigrams).alias("bigram")
    ).select(
        "doc_id",
        "source",
        (_hash60(F.col("bigram")) % DSIR_BUCKETS).alias("bucket"),
    )
    raw = bg.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("rc")
    )
    tgt = (
        bg.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
    )
    model = raw.join(tgt, "bucket", "left").na.fill({"tc": 0})
    totals = model.agg(
        F.sum("rc").cast("bigint").alias("R"),
        F.sum("tc").cast("bigint").alias("T"),
    )
    weights = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("tc") + 1).cast("double")
                / (F.col("T") + DSIR_BUCKETS).cast("double")
            )
            - F.log(
                (F.col("rc") + 1).cast("double")
                / (F.col("R") + DSIR_BUCKETS).cast("double")
            ),
            12,
        ).cast("decimal(38,12)").alias("llr"),
    )
    return (
        bg.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("llr").alias("_sum_llr"),
        )
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            F.round(
                F.col("_sum_llr").cast("double")
                / F.col("n_bigrams").cast("double"),
                6,
            ).alias("avg_llr"),
        )
    )


_DSIR_ORACLE = _WORDS_CTE + f"""
, bg AS (
    SELECT doc_id, source,
           (('0x' || substr(md5(words[i] || ' ' || words[i+1]), 1, 15))::BIGINT)
               % {DSIR_BUCKETS} AS bucket
    FROM words_t, LATERAL (
        SELECT unnest(range(1, CAST(greatest(len(words) - 1, 0) AS BIGINT) + 1))
               AS i
    )
), raw AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS rc FROM bg GROUP BY 1
), tgt AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS tc FROM bg
    WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY 1
), model AS (
    SELECT r.bucket, r.rc, coalesce(t.tc, 0) AS tc
    FROM raw r LEFT JOIN tgt t USING (bucket)
), tot AS (
    SELECT CAST(sum(rc) AS BIGINT) AS R, CAST(sum(tc) AS BIGINT) AS T
    FROM model
), w AS (
    SELECT bucket,
           CAST(round(
               ln(CAST(tc + 1 AS DOUBLE) / CAST(T + {DSIR_BUCKETS} AS DOUBLE))
               - ln(CAST(rc + 1 AS DOUBLE) / CAST(R + {DSIR_BUCKETS} AS DOUBLE)),
               12) AS DECIMAL(38,12)) AS llr
    FROM model CROSS JOIN tot
)
SELECT bg.doc_id, bg.source,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(w.llr) AS DOUBLE) / count(*), 6) AS avg_llr
FROM bg JOIN w USING (bucket)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# cms_heavy_hitters (block B)
# ---------------------------------------------------------------------------


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch acceptance row: build a {CMS_DEPTH}x{CMS_WIDTH}
    CMS over the corpus token stream (seeded md5 hashes — engine-
    neutral), then put the sketch's estimate NEXT TO the exact count for
    the top {CMS_TOPN} tokens, with the guaranteed-nonnegative
    overcount. The sketch is the 100 TB path (its state never exceeds
    4096 mergeable cells whatever the corpus); this row measures what
    that boundedness costs in accuracy on THIS corpus.

    Scale shape: exact term frequencies are one combinable groupBy; the
    sketch derives from the tf table (sum per (row, bucket) — identical
    to per-occurrence increments, associativity of +), so the corpus is
    scanned once. The top-N is a TakeOrdered (per-partition top-k +
    merge), and the estimate join broadcasts the 4096-cell sketch."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select(F.explode(text.norm_words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    )
    tf = tf.persist()
    hashes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    _hash60(F.concat(F.lit(f"{j}:"), F.col("token")))
                    % CMS_WIDTH
                ).alias("bucket"),
            )
            for j in range(CMS_DEPTH)
        ]
    )
    cells = (
        tf.select("exact_cnt", F.explode(hashes).alias("h"))
        .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.sum("exact_cnt").cast("bigint").alias("cell"))
    )
    top = tf.orderBy(F.desc("exact_cnt"), F.asc("token")).limit(CMS_TOPN)
    est = (
        top.select("token", "exact_cnt", F.explode(hashes).alias("h"))
        .join(
            F.broadcast(cells),
            (F.col("h.j") == F.col("j")) & (F.col("h.bucket") == F.col("bucket")),
        )
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell").cast("bigint").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
    )


def _cms_oracle_sql() -> str:
    bucket = (
        "(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token), 1, 15))"
        f"::BIGINT) % {CMS_WIDTH}"
    )
    return _WORDS_CTE + f"""
, tf AS (
    SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM (SELECT unnest(words) AS token FROM words_t)
    GROUP BY 1
), hashed AS (
    SELECT token, exact_cnt, j, {bucket} AS bucket
    FROM tf CROSS JOIN (SELECT unnest(range(0, {CMS_DEPTH})) AS j)
), cells AS (
    SELECT j, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
    FROM hashed GROUP BY 1, 2
), top AS (
    SELECT token, exact_cnt FROM tf
    ORDER BY exact_cnt DESC, token ASC LIMIT {CMS_TOPN}
), est AS (
    SELECT h.token, h.exact_cnt, CAST(min(c.cell) AS BIGINT) AS cms_est
    FROM hashed h
    JOIN top t ON t.token = h.token
    JOIN cells c ON c.j = h.j AND c.bucket = h.bucket
    GROUP BY 1, 2
)
SELECT token, exact_cnt, cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
"""


# ---------------------------------------------------------------------------
# kmeans_silhouette (block C)
# ---------------------------------------------------------------------------


def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled silhouette per k-means cluster — the accept/reject gate on
    the trained clustering that IVF probing and SemDeDup pruning both
    sit on. Reuses the EXACT deterministic integer Lloyd run of
    kmeans_clusters_int8 (same init, same iterations — the unrolled-CTE
    oracle replays it), then per point takes a = integer sq-distance to
    its own centroid and b = min sq-distance to any OTHER centroid, and
    aggregates EXACT integer sums of (b - a) and max(a, b) per cluster:
    the pooled ratio sum(b-a)/sum(max(a,b)) is the micro-averaged
    silhouette, computed with a single final float division (immune to
    double-sum order drift — the house pooled-jaccard discipline).

    Scale shape: training is the kmeans_fit_int8 contract (k x dim ints
    through the driver per iteration); scoring is ONE projection against
    the literal centroid array + one combinable groupBy."""
    from pygeoapi_ingestor_spark.plans.queries_llm import KMEANS_PARAMS

    emb = _emb(spark, sf_dir)
    cents, assigned = similarity.kmeans_fit_int8(
        emb, "vec_id", "embedding", **KMEANS_PARAMS
    )
    scored = similarity.with_centroid_dists(assigned, "_q", cents, "_dists")
    b = F.array_min(
        F.filter(F.col("_dists"), lambda s: s.cid != F.col("cluster"))
    ).getField("d")
    per_point = scored.select(
        F.col("cluster").cast("int").alias("cluster"),
        F.col("sq_dist").alias("a"),
        b.alias("b"),
    )
    return (
        per_point.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("b") - F.col("a")).cast("bigint").alias("sum_gap"),
            F.sum(F.greatest("a", "b")).cast("bigint").alias("sum_max"),
        )
        .withColumn(
            "pooled_silhouette",
            F.round(
                F.col("sum_gap").cast("double") / F.col("sum_max").cast("double"),
                6,
            ),
        )
    )


def _silhouette_oracle_sql() -> str:
    from pygeoapi_ingestor_spark.plans.queries_llm import (
        KMEANS_PARAMS,
        _kmeans_cte,
    )

    parts, prev = _kmeans_cte(
        KMEANS_PARAMS["k"], KMEANS_PARAMS["iters"], KMEANS_PARAMS["dim"]
    )
    dist = (
        "CAST(list_sum(list_transform(list_zip(q.qv, c.cv),"
        " s -> CAST((s[1] - s[2]) AS BIGINT) * (s[1] - s[2]))) AS BIGINT)"
    )
    final = f"""
pd AS (
  SELECT q.vec_id, c.cid, {dist} AS d
  FROM q CROSS JOIN {prev} c
),
ad AS (
  SELECT vec_id, cid AS cluster, d AS a FROM pd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
),
bd AS (
  SELECT pd.vec_id, CAST(min(pd.d) AS BIGINT) AS b
  FROM pd JOIN ad ON ad.vec_id = pd.vec_id AND pd.cid <> ad.cluster
  GROUP BY 1
)
SELECT CAST(ad.cluster AS INTEGER) AS cluster,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bd.b - ad.a) AS BIGINT) AS sum_gap,
       CAST(sum(greatest(ad.a, bd.b)) AS BIGINT) AS sum_max,
       round(CAST(sum(bd.b - ad.a) AS DOUBLE)
             / CAST(sum(greatest(ad.a, bd.b)) AS DOUBLE), 6)
           AS pooled_silhouette
FROM ad JOIN bd USING (vec_id)
GROUP BY 1
"""
    return "WITH " + ",".join(parts) + "," + final


CURATION_QUERIES = {
    "segment_dedup": q_segment_dedup,
    "dsir_importance_weights": q_dsir_importance_weights,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "kmeans_silhouette": q_kmeans_silhouette,
}

CURATION_ORACLES = {
    "segment_dedup": _SEGMENT_DEDUP_ORACLE,
    "dsir_importance_weights": _DSIR_ORACLE,
    "cms_heavy_hitters": _cms_oracle_sql(),
    "kmeans_silhouette": _silhouette_oracle_sql(),
}
