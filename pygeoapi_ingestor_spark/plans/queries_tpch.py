"""Analytics-engine core queries (SURVEY.md §2 block B): TPC-H-style
scan/agg, multi-way star joins, top-k — adapted to the driver's schema
(no partsupp table).

Join strategy: dimension sides (region/nation/customer/supplier/part) are
explicitly broadcast; only the fact-fact join (orders x lineitem) shuffles,
on the order key. Top-k orders by the ROUNDED measure + key so the result
set is deterministic and oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # route through read_table: a bare spark.read.parquet would surface
    # ns-typed timestamp columns as bigint once any earlier events read
    # flipped the session's nanosAsLong conf (readers.py rebuilds them)
    from pygeoapi_ingestor_spark.sources.readers import read_table

    return read_table(spark, sf_dir, name)


def _dec_price():
    return F.col("l_extendedprice").cast("decimal(12,2)")


def _one_minus_disc():
    return F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")


def _one_plus_tax():
    return F.lit(1).cast("decimal(4,2)") + F.col("l_tax").cast("decimal(4,2)")


def _revenue_sum():
    """Exact decimal revenue sum: order-independent, so the value is
    bit-identical between Spark and DuckDB regardless of partial-agg
    order (double sums flip rounding boundaries run-to-run)."""
    return F.sum(_dec_price() * _one_minus_disc()).cast("double")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    disc_price = _dec_price() * _one_minus_disc()
    charge = disc_price * _one_plus_tax()
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(_dec_price()).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(_dec_price()).cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / n, 6).alias("avg_disc"),
            n.cast("bigint").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = _revenue_sum()
    out = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    return out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    revenue = _revenue_sum()
    # local-supplier condition: supplier nation == customer nation
    out = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    return out


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _revenue_sum()
    out = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    return out.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    revenue = _revenue_sum()
    per_part = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        per_part.withColumn("brand_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("brand_rank") <= 3)
        .select("p_brand", "p_partkey", "p_name", "revenue", "brand_rank")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Both nation lookups and both dimension sides broadcast;
    the only shuffle is the lineitem x orders fact join."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        joined.filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.round(_revenue_sum(), 2).alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part volume sold
    into one region's customers, by order year. Conditional-sum ratio
    over exact decimal volumes."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n_cust = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("_ck")
    )
    n_supp = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("_sk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("_ck"))
    )
    vol = _dec_price() * _one_minus_disc()
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    ).cast("double")
    total_vol = F.sum(vol).cast("double")
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(nation_vol / total_vol, 6).alias("mkt_share"),
            F.round(total_vol, 2).alias("total_volume"),
        )
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many (non-URGENT)
    orders, including zero. Left join + two aggregations; the custkey
    shuffle is high-cardinality by construction."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count")).agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue in a
    quarter. The scalar max joins back as a broadcast (one lazy plan, no
    driver round-trip); equality is tested on the EXACT decimal sum so
    both engines pick the identical winner set."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_dec_price() * _one_minus_disc()).alias("_rev")
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("_rev") == F.col("_mx"))
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name",
        F.round(F.col("_rev").cast("double"), 2).alias("total_revenue"),
    )


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp re-expressed over lineitem): distinct
    suppliers per (brand, type, size) for non-excluded parts."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: weekly-ized revenue of small-quantity orders for
    one brand. The per-part average-quantity threshold is an aggregate
    of the fact table — part-cardinality output, broadcast back, so the
    fact side never self-joins with a shuffle. The threshold is derived
    from an exact decimal sum (identical comparison boundary in both
    engines)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avgq = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("_lim")
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avgq), l.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_lim"))
    )
    return joined.agg(
        F.round(F.sum(_dec_price()).cast("double") / 7.0, 2).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp re-expressed over lineitem): for each
    part of one size, the EUROPE supplier(s) offering the minimum unit
    price, via a correlated per-part min. The (part, supplier) unit-cost
    summary is a fact-table aggregate (high-cardinality shuffle); the
    per-part min joins back as a broadcast. Unit cost is a per-row IEEE
    division — identical in both engines — and the min/equality compare
    exact doubles, so the winner set is deterministic."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    unit = F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(F.min(unit).alias("_cost"))
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = (
        ps.join(F.broadcast(eu_supp), ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
    )
    minc = ps_eu.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("_cost").alias("_minc")
    )
    out = ps_eu.join(
        F.broadcast(minc),
        (ps_eu.l_partkey == F.col("_pk")) & (F.col("_cost") == F.col("_minc")),
    )
    return (
        out.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("_cost", 6).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    part family, with supply cost proxied by the part's retail price
    (no partsupp table). All money math in exact decimals so the sums
    are order-independent across engines."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.expr("CAST(0.1 AS DECIMAL(2,1))")
    )
    profit = _dec_price() * _one_minus_disc() - cost
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from one nation's
    suppliers exceeds a fraction of that nation's total — group-agg plus
    a global-scalar threshold. The 1-row total joins back as a broadcast
    (one lazy plan, no driver round-trip) and the threshold compare is
    exact decimal * decimal, so the boundary is identical in DuckDB."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    vol = _dec_price() * _one_minus_disc()
    nat = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    )
    per_part = nat.groupBy("l_partkey").agg(F.sum(vol).alias("_val"))
    total = nat.agg(F.sum(vol).alias("_tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val") > F.col("_tot") * F.expr("CAST(0.0005 AS DECIMAL(5,4))"))
        .select(
            "l_partkey", F.round(F.col("_val"), 2).cast("double").alias("value")
        )
    )


def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode column): order-priority mix by
    ship-delay bucket — how many critical vs non-critical orders fall
    into each 30-day shipping-latency band. One fact-fact shuffle on the
    order key; day arithmetic on CAST-to-date values so both engines
    count calendar days identically."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.greatest(F.least(F.floor(delay / F.lit(30)), F.lit(6)), F.lit(0))
        .cast("int")
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(high).cast("bigint").alias("high_line_count"),
            F.sum(1 - high).cast("bigint").alias("low_line_count"),
        )
    )


def q20_volume_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped more than
    2x their FAIR SHARE (part total / suppliers-for-part) of some
    'small*' part (excess-share stands in for excess-stock; no partsupp
    availqty). A fair-share multiple stays meaningful as the data grows
    — an absolute share threshold empties out once every part has many
    suppliers. Nested aggregates: per-(part, supplier) quantity vs
    per-part total, then a semi-join onto the supplier dimension; the
    threshold compare is exact decimal x integer."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qty = F.col("l_quantity").cast("decimal(12,2)")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    per_ps = lp.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty).alias("_pq"))
    per_p = per_ps.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("_pq").alias("_tq"), F.count(F.lit(1)).alias("_ns")
    )
    excess = per_ps.join(F.broadcast(per_p), per_ps.l_partkey == F.col("_pk")).filter(
        F.col("_pq") * F.col("_ns") > F.col("_tq") * F.lit(2)
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            excess.select("l_suppkey").distinct(),
            s.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the SOLE late
    shipper (ship > order date + 60 days) on a finished multi-supplier
    order. The exists / not-exists pair becomes two aggregate gates on
    the per-order supplier summary (n_suppliers >= 2, n_late == 1) —
    set algebra instead of correlated subqueries, one fact-fact shuffle
    plus order-key-partitioned aggregates."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("_late"))
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count(F.lit(1)).alias("_n_supp"), F.sum("_late").alias("_n_late")
    )
    sole_late = (
        per_os.filter(F.col("_late") == 1)
        .join(
            per_o.filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)),
            per_os.l_orderkey == F.col("_ok"),
        )
    )
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


TPCH_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_variety": q16_supplier_variety,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "top_parts_by_revenue": q_top_parts_by_revenue,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_ship_delay": q12_ship_delay,
    "q20_volume_share_suppliers": q20_volume_share_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

_DEC_VOL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

_NEW_TPCH_ORACLES = {
    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(l_extendedprice AS DOUBLE)
                       / CAST(l_quantity AS DOUBLE)) AS cost
            FROM lineitem GROUP BY 1, 2
        ), eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), pse AS (
            SELECT * FROM ps
            JOIN eu ON l_suppkey = s_suppkey
            JOIN part ON l_partkey = p_partkey
            WHERE p_size = 15
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(cost, 6) AS supply_cost
        FROM pse
        WHERE cost = (SELECT min(cost) FROM pse p2
                      WHERE p2.l_partkey = pse.l_partkey)
        ORDER BY s_acctbal DESC, s_name, p_partkey
        LIMIT 100
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(round(sum({_DEC_VOL}
                   - CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(0.1 AS DECIMAL(2,1))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    "q11_important_parts": f"""
        WITH nat AS (
            SELECT l_partkey, {_DEC_VOL} AS vol
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
        )
        SELECT l_partkey,
               CAST(round(sum(vol), 2) AS DOUBLE) AS value
        FROM nat
        GROUP BY 1
        HAVING sum(vol) > (SELECT sum(vol) FROM nat)
                          * CAST(0.0005 AS DECIMAL(5,4))
    """,
    "q12_ship_delay": """
        SELECT CAST(greatest(least(floor(date_diff('day',
                   CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) / 30), 6), 0) AS INTEGER)
                   AS delay_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q20_volume_share_suppliers": """
        WITH lp AS (
            SELECT l_partkey, l_suppkey,
                   CAST(l_quantity AS DECIMAL(12,2)) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
        ), per_ps AS (
            SELECT l_partkey, l_suppkey, sum(qty) AS pq
            FROM lp GROUP BY 1, 2
        ), per_p AS (
            SELECT l_partkey, sum(pq) AS tq, count(*) AS ns
            FROM per_ps GROUP BY 1
        ), excess AS (
            SELECT DISTINCT l_suppkey
            FROM per_ps JOIN per_p USING (l_partkey)
            WHERE pq * ns > tq * 2
        )
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_9'
          AND s_suppkey IN (SELECT l_suppkey FROM excess)
    """,
    "q21_waiting_suppliers": """
        WITH per_os AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2
        ), per_o AS (
            SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
            FROM per_os GROUP BY 1
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM per_os
        JOIN per_o USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE per_os.late = 1 AND n_supp >= 2 AND n_late = 1
          AND n_name = 'NATION_2'
        GROUP BY 1
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               round(CAST(sum({_DEC_VOL}) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                                   THEN {_DEC_VOL}
                                   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                     / CAST(sum({_DEC_VOL}) AS DOUBLE), 6) AS mkt_share,
               round(CAST(sum({_DEC_VOL}) AS DOUBLE), 2) AS total_volume
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "q13_order_distribution": """
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY 1
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, sum({_DEC_VOL}) AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name,
               round(CAST(total AS DOUBLE), 2) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total = (SELECT max(total) FROM rev)
    """,
    "q16_supplier_variety": """
        SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        GROUP BY 1, 2, 3
    """,
    "q17_small_quantity_revenue": """
        WITH avgq AS (
            SELECT l_partkey AS pk,
                   0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                          / count(*)) AS lim
            FROM lineitem GROUP BY 1
        )
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                     / 7.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN avgq ON l_partkey = pk
        WHERE p_brand = 'Brand#2' AND l_quantity < lim
    """,
}

TPCH_ORACLES = {
    **_NEW_TPCH_ORACLES,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_disc_price,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "top_parts_by_revenue": """
        SELECT p_brand, p_partkey, p_name, revenue, CAST(brand_rank AS INTEGER) AS brand_rank
        FROM (
            SELECT p_brand, p_partkey, p_name,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue,
                   row_number() OVER (
                       PARTITION BY p_brand
                       ORDER BY round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) DESC,
                                p_partkey ASC
                   ) AS brand_rank
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey, p_name
        ) WHERE brand_rank <= 3
    """,
}
