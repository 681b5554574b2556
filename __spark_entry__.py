"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full SURVEY.md §2 catalog (implemented in
``pygeoapi_ingestor_spark.plans``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pygeoapi_ingestor_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (see SURVEY.md §6 for
    the numeric-match conventions). Keys absent here (the gamma-fit SPI
    family, xxhash64-based MinHash/SimHash/hyperplane-LSH buckets, the
    ENGINE-INTERNAL HLL of approx_distinct_users) are non-SQL-expressible
    and take the rows-only check; the md5-derived LSH plans
    (dedup_embedding_cosine), the composed dedup_lsh_verified, and the
    from-first-principles md5 sketches (cms_heavy_hitters, bloom_fp_eval,
    hll_union_eval — the oracled estimator twins of the rows-only
    sketches) DO have full value-hash oracles."""
    return dict(ORACLES)
