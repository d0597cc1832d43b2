"""Generic relational surface over the TPC-H-ish tables.

The reference has no general-purpose joins/aggregations (SURVEY.md §2.3) —
Spark supplies them natively; these queries exercise that surface and give
the bench its classic shapes: wide aggregation (q1), broadcast-dim join +
top-k (q3), multi-join star (q5), window analytics.

Scale notes: region/nation/customer/supplier are dimensions — joins against
them are explicitly broadcast so the 100 TB fact side never shuffles for
them; top-k uses orderBy().limit() which Spark executes as TakeOrdered
(partial per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.decimate import big_to_double, big_to_double_duck
from .sources.testdata import load_table


def _ip(expr: str) -> str:
    """Exact 2-decimal integer quantization (same text in both dialects)."""
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


#: exact integer terms shared by the Spark queries and the DuckDB oracles —
#: TPC-H money columns carry exactly 2 decimals, so these are lossless.
_QTY = _ip("l_quantity")
_PRICE = _ip("l_extendedprice")
_DISC = _ip("l_discount")
_TAX = _ip("l_tax")
_DISC_PRICE = f"{_PRICE} * (100 - {_DISC})"
_CHARGE = f"{_PRICE} * (100 - {_DISC}) * (100 + {_TAX})"


def _dsum(int_term: str, scale: int) -> F.Column:
    """Order-insensitive exact sum of an integer term, converted to double
    via the big_to_double decomposition (bit-identical on any IEEE engine —
    plain DECIMAL/HUGEINT->double casts are not correctly rounded in every
    engine) and descaled."""
    s = f"sum(CAST(({int_term}) AS DECIMAL(38,0)))"
    return F.expr(big_to_double(s)) / F.lit(float(scale))


def _sql_dsum(int_term: str, scale: int) -> str:
    s = f"sum(CAST(({int_term}) AS HUGEINT))"
    return f"({big_to_double_duck(s)} / {scale}.0)"


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: single-pass partial-aggregated groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_QTY, 100).alias("sum_qty"),
            _dsum(_PRICE, 100).alias("sum_base_price"),
            _dsum(_DISC_PRICE, 10_000).alias("sum_disc_price"),
            _dsum(_CHARGE, 1_000_000).alias("sum_charge"),
            (_dsum(_QTY, 100) / cnt).alias("avg_qty"),
            (_dsum(_PRICE, 100) / cnt).alias("avg_price"),
            (_dsum(_DISC, 100) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum(_QTY, 100)} AS sum_qty,
       {_sql_dsum(_PRICE, 100)} AS sum_base_price,
       {_sql_dsum(_DISC_PRICE, 10_000)} AS sum_disc_price,
       {_sql_dsum(_CHARGE, 1_000_000)} AS sum_charge,
       {_sql_dsum(_QTY, 100)} / count(*) AS avg_qty,
       {_sql_dsum(_PRICE, 100)} / count(*) AS avg_price,
       {_sql_dsum(_DISC, 100)} / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: broadcast customer dim, top-10 by revenue
    (TakeOrdered — no global sort at scale)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.filter(F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-01-01'"))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01'")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(_DISC_PRICE, 10_000).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_TPCH_Q3 = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       {_sql_dsum(_DISC_PRICE, 10_000)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier volume: star join with every dimension
    broadcast; only the lineitem↔orders join shuffles."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg(
            _dsum(_DISC_PRICE, 10_000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", F.desc("revenue"), "n_name")
    )


SQL_TPCH_Q5 = f"""
SELECT r_name, n_name,
       {_sql_dsum(_DISC_PRICE, 10_000)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, revenue DESC, n_name
"""


def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 surface: per-customer running order total + order rank (analytic
    window functions, absent in the reference, free in Spark)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
            F.row_number().over(w).alias("order_rank"),
        )
        .orderBy("o_custkey", "order_rank")
    )


SQL_WINDOW_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS order_rank
FROM orders
ORDER BY o_custkey, order_rank
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure scan + filter + single aggregate —
    the predicate-pushdown showcase (every filter reaches the parquet
    row-group stats; no shuffle beyond the final 1-row combine)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_i = F.expr(_ip("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1998-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1999-01-01'"))
            & (F.col("l_quantity") < 24)
        )
        .filter(disc_i.between(3, 7))
        .agg(
            _dsum(f"{_PRICE} * {_DISC}", 10_000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_TPCH_Q6 = f"""
SELECT {_sql_dsum(f"{_PRICE} * {_DISC}", 10_000)} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
  AND l_quantity < 24
  AND {_ip("l_discount")} BETWEEN 3 AND 7
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: EXISTS rewritten as a LEFT SEMI
    join with a mixed equi + non-equi condition (late-shipped orders —
    the synthetic lineitem has no commit/receipt dates)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-04-01'"))
    )
    sem = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share per brand: broadcast part dim,
    conditional exact-integer aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1998-06-01'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-07-01'"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo_term = f"CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE 0 END"
    return (
        j.groupBy("p_brand")
        .agg(
            (
                F.lit(100.0)
                * _dsum(promo_term, 10_000)
                / _dsum(_DISC_PRICE, 10_000)
            ).alias("promo_share"),
            _dsum(_DISC_PRICE, 10_000).alias("revenue"),
        )
        .orderBy("p_brand")
    )


SQL_TPCH_Q14 = f"""
SELECT p_brand,
       100.0 * {_sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE 0 END", 10_000)}
             / {_sql_dsum(_DISC_PRICE, 10_000)} AS promo_share,
       {_sql_dsum(_DISC_PRICE, 10_000)} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-06-01'
  AND l_shipdate < TIMESTAMP '1998-07-01'
GROUP BY p_brand
ORDER BY p_brand
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING over a fact aggregation,
    then joins back to orders + broadcast customer; top by quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(_QTY, 100).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


SQL_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       total_qty
FROM (SELECT l_orderkey, {_sql_dsum(_QTY, 100)} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING total_qty > 300) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


def q_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface: customers with NO order on/after 2000-01-01,
    summarized per market segment with exact-integer balance sums."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2000-01-01'")
    )
    lapsed = cust.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        lapsed.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(_ip("c_acctbal"), 100).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


SQL_LAPSED_CUSTOMERS = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       {_sql_dsum(_ip("c_acctbal"), 100)} AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""
