from __future__ import annotations

from pyspark.sql import functions as F

from pygeoapi_ingestor_spark import sql as sqlapi
from pygeoapi_ingestor_spark.sinks.collections import write_bucketed


def test_sql_over_registered_views(spark, sf_dir):
    names = sqlapi.register_views(spark, sf_dir)
    assert set(names) >= {"events", "lineitem", "documents"}
    out = sqlapi.sql(
        spark,
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY 1",
    ).collect()
    assert len(out) == 5 and all(r["n"] > 0 for r in out)
    # events view has normalized timestamps
    ts_type = sqlapi.sql(spark, "SELECT ts FROM events LIMIT 1").schema["ts"]
    assert ts_type.dataType.typeName().startswith("timestamp")


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    # managed tables land in the session's spark-warehouse (gitignored);
    # warehouse.dir is a static conf and cannot be retargeted at runtime
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])

    a = spark.table("li_b")
    b = spark.table("o_b")
    # disable broadcast so the join strategy depends on bucketing alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        # co-located buckets: no shuffle exchange on either join side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
