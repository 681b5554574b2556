"""Named query catalog: SURVEY.md §2 key -> (spark fn, DuckDB oracle SQL).

``QUERIES`` maps each key to a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES`` holds the DuckDB twin for every SQL-expressible query.
"""

from pygeoapi_ingestor_spark.plans.queries_analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from pygeoapi_ingestor_spark.plans.queries_etl import ETL_ORACLES, ETL_QUERIES
from pygeoapi_ingestor_spark.plans.queries_llm import LLM_ORACLES, LLM_QUERIES
from pygeoapi_ingestor_spark.plans.queries_tpch import TPCH_ORACLES, TPCH_QUERIES

QUERIES = {**ETL_QUERIES, **TPCH_QUERIES, **ANALYTICS_QUERIES, **LLM_QUERIES}
ORACLES = {**ETL_ORACLES, **TPCH_ORACLES, **ANALYTICS_ORACLES, **LLM_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
