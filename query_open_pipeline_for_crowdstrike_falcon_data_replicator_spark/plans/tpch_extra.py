"""Extended TPC-H-derived query suite over the driver tables.

The reference delegates its entire relational surface to Athena/Trino
(reference README.md:48, SURVEY.md §2.4); this module demonstrates that the
Spark-native engine covers the full classic analytics shape catalog —
correlated subqueries, EXISTS/NOT EXISTS, CASE aggregation, count-distinct,
HAVING over grouped facts, left-join distributions, OR-of-ANDs pushdown,
windowed shares and arg-max selection.

Queries are TPC-H adaptations: the driver's synthetic star schema
(TESTDATA.md) omits partsupp and several columns (shipmode, commitdate,
comments), so each query keeps its operator shape but binds to the
available columns.  Numbering follows the TPC-H query it derives from.

Scale notes (100 TB design):
- dims (region 5 / nation 25 / supplier SFx100 / part SFx200k / customer)
  are broadcast — the lineitem/orders facts never shuffle for a dim join;
- fact-fact joins (lineitem x orders) shuffle on the join key once and AQE
  handles skew;
- correlated per-group thresholds (q2/q15/q17) are computed as aggregated
  side DataFrames joined back (broadcast when group cardinality is dim-like)
  instead of per-row subqueries;
- every predicate is a plain column comparison -> parquet pushdown.

Float policy: every computed aggregate is rounded on both sides before
comparison; ratios divide *pre-rounded* sums so both engines divide the
same numbers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tracked_persist
from ..sources.tables import load_table


def _r2(c):
    return F.round(c, 2)


def _dec_revenue():
    """sum(l_extendedprice * (1 - l_discount)) in exact decimal.

    The source doubles are clean 2-decimal values, so decimal(18,2) casts
    are unambiguous; the product/sum are then exact and the final HALF_UP
    round agrees bit-for-bit with DuckDB's decimal rounding.  Cast back to
    double so both engines hand pandas the same dtype."""
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    return F.round(F.sum(p * (1 - d)), 2).cast("double")


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# q2': min-cost part per (type, size) — correlated-min selection
# --------------------------------------------------------------------------
def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier) without partsupp: for every
    (p_type, p_size) group, the part(s) at the minimum retail price.
    Window-min instead of a correlated subquery: one shuffle on the group
    key, no per-row re-aggregation."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type", "p_size")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_size", "p_partkey", "p_name",
                _r2(F.col("p_retailprice")).alias("price"))
    )


Q2_SQL = """
SELECT p_type, p_size, p_partkey, p_name, round(p_retailprice, 2) AS price
FROM part p
WHERE p_retailprice = (SELECT min(p_retailprice) FROM part
                       WHERE p_type = p.p_type AND p_size = p.p_size)
"""


# --------------------------------------------------------------------------
# q4': order priority checking — EXISTS semi join with non-equi condition
# --------------------------------------------------------------------------
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders (one quarter) having at least one lineitem shipped
    more than 90 days after the order date; count per priority.  The EXISTS
    is a left-semi join whose condition mixes the equi key with a range
    predicate — Spark plans the equi part as the join key."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o.o_orderkey
                AND l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q7': volume shipping between nations — two-role dim join
# --------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue between distinct (supplier nation, customer nation)
    pairs by ship year.  The nation dim joins twice under different roles —
    broadcast both; the lineitem x orders fact join is the only shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        # exact decimal arithmetic: double sums this large flip cents on
        # summation order; decimal(18,2) inputs make the sum exact and the
        # final round identical in every engine
        .agg(_dec_revenue().alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) t
GROUP BY supp_nation, cust_nation, l_year
""".replace("round(sum(volume), 2)", "CAST(round(sum(volume), 2) AS DOUBLE)")


# --------------------------------------------------------------------------
# q8': market share — windowed share-of-total
# --------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: each supplier nation's share of PROMO-part revenue sold to
    ASIA customers, per order year.  Share = nation revenue / year total via
    a window sum over the (small) aggregated result — no second scan.
    The ratio divides sums pre-rounded to 2 so both engines divide
    identical numbers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_s = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"), F.col("supp_nation"))
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    w = Window.partitionBy("o_year")
    return agg.select(
        "o_year", "supp_nation", "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("mkt_share"),
    )


Q8_SQL = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, n1.n_name AS supp_nation,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  GROUP BY 1, 2
)
SELECT o_year, supp_nation, revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY o_year), 6) AS mkt_share
FROM agg
"""


# --------------------------------------------------------------------------
# q9': product-type profit by nation and year
# --------------------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 without ps_supplycost: ECONOMY-part revenue grouped by
    supplier nation and order year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q10': returned-item reporting — top-20 by computed aggregate
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers ranked by revenue they returned in one quarter."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dec_revenue().alias("revenue"),  # exact decimal — see q7
            _r2(F.first("c_acctbal")).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       round(any_value(c_acctbal), 2) AS acctbal
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# q11': important stock — HAVING vs a scalar fraction of the global total
# --------------------------------------------------------------------------
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 without partsupp (GERMANY → the EUROPE region in the
    synthetic dims): per-part revenue shipped by EUROPE suppliers, keeping
    parts whose value exceeds 0.05% of the regional total.  Q11's
    distinctive shape is the scalar subquery threshold: here the global
    total is aggregated FROM the per-part sums (no second fact scan) and
    attached via a broadcast cross join — one row, zero shuffle.  The
    comparison stays in exact decimal (``value * 10000 > total``) so
    neither engine ever rounds the threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    per_part = tracked_persist(
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(euro_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(p * (1 - d)).alias("value_dec"))
        # persisted (query-scoped): the scalar total below re-reads this
        # branch; without it Spark recomputes the whole subtree = a second
        # full lineitem scan.  partkey-grain decimals are ~GBs at SF1000.
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * 10000 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_dec"), 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey,
       CAST(round(value_dec, 2) AS DOUBLE) AS value
FROM per_part
WHERE value_dec * 10000 > (SELECT sum(value_dec) FROM per_part)
ORDER BY value DESC, partkey
"""


# --------------------------------------------------------------------------
# q12': shipping-priority classes — CASE aggregation after fact join
# --------------------------------------------------------------------------
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 with l_linestatus standing in for l_shipmode: per status,
    how many 1996 lineitems belong to critical vs other-priority orders.
    The CASE collapses to a conditional count — pure map-side work."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# q13': customer order-count distribution — left join + double grouping
# --------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (including
    zero-order customers), counting only non-LOW-priority orders.  The
    filter lives in the join condition, not a WHERE — a WHERE would turn
    the left join inner and drop the zero bucket."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "5-LOW"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# q14': promo revenue ratio
# --------------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue.  Numerator and
    denominator are rounded before the division so both engines divide the
    same two numbers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _r2(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))).alias("promo"),
            _r2(F.sum(rev)).alias("total"),
        )
    )
    return agg.select(
        "promo", "total",
        F.round(F.lit(100) * F.col("promo") / F.col("total"), 4).alias("promo_pct"),
    )


Q14_SQL = """
WITH agg AS (
  SELECT round(sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
)
SELECT promo, total, round(100 * promo / total, 4) AS promo_pct FROM agg
"""


# --------------------------------------------------------------------------
# q15': top supplier — arg-max over an aggregated view
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in one quarter.
    Revenue is rounded *before* the max/filter so arg-max ties resolve
    identically across engines.  The global max rides the q11
    broadcast-scalar pattern (a 1-row aggregate cross-joined back) —
    no SinglePartition window stage; the supplier-grain aggregate is
    persisted so the scalar branch doesn't re-scan lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = tracked_persist(
        li.groupBy("l_suppkey")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# q16': supplier count per part group — count distinct
# --------------------------------------------------------------------------
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 without partsupp: distinct suppliers that shipped each
    (brand, size) group of non-PROMO parts in selected sizes.  The distinct
    aggregation expands then dedups on the grouping+distinct key — Spark
    plans it as two hash aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 9, 19, 29, 39, 49)
GROUP BY p_brand, p_size
"""


# --------------------------------------------------------------------------
# q17': small-quantity revenue — correlated per-part average
# --------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from Brand#23 lineitems whose quantity is below
    half the part's average quantity.  The correlated AVG becomes an
    aggregated per-part threshold joined back (broadcast — part-grain is
    dim-sized); the oracle uses the identical join form."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li_of_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    thresholds = (
        li_of_brand.groupBy(F.col("p_partkey").alias("t_partkey"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        li_of_brand.join(F.broadcast(thresholds), F.col("p_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            _r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q17_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
thresholds AS (
  SELECT l_partkey AS t_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
  FROM brand_li GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_rows
FROM brand_li JOIN thresholds ON l_partkey = t_partkey
WHERE l_quantity < half_avg_qty
"""


# --------------------------------------------------------------------------
# q18': large-volume customers — HAVING over a grouped fact
# --------------------------------------------------------------------------
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250 (sf-invariant
    ~p99 of the synthetic order-size distribution), with their customers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_r2(F.sum("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            _r2(F.col("o_totalprice")).alias("totalprice"), "sum_qty",
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS totalprice, sum_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# q19': discounted revenue — OR-of-ANDs predicate pushdown
# --------------------------------------------------------------------------
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three brand/size/quantity conjunctions OR-ed together.
    The whole predicate is a single column expression: Catalyst pushes the
    common l_quantity bounds to the parquet scan and evaluates the rest in
    one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11)
    c2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20)
    c3 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30)
    return j.filter(c1 | c2 | c3).agg(
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# q20': suppliers with significant promo volume — nested agg + semi join
# --------------------------------------------------------------------------
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 without partsupp: suppliers that shipped more than 100
    units of PROMO parts during 1996, with their nation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(_r2(F.sum("l_quantity")).alias("promo_qty"))
        .filter(F.col("promo_qty") > 100)
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "promo_qty")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name, promo_qty
FROM supplier
JOIN (
  SELECT l_suppkey, round(sum(l_quantity), 2) AS promo_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING round(sum(l_quantity), 2) > 100
) q ON s_suppkey = q.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# q21': last-to-ship suppliers in multi-supplier orders
# --------------------------------------------------------------------------
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape without commit/receipt dates: in finished orders
    touched by more than one supplier, count per supplier how many orders
    they were last to ship (their line hits the order's max shipdate).
    Both the max and the supplier count come from one window pass over the
    order key — no self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    w = Window.partitionBy("l_orderkey")
    flagged = j.select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
    )
    waiting = (
        flagged.filter((F.col("n_supps") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
    )


Q21_SQL = """
WITH j AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
         count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supps
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
waiting AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM j WHERE n_supps > 1 AND l_shipdate = max_ship
)
SELECT s_name, count(*) AS numwait
FROM waiting JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


# --------------------------------------------------------------------------
# q22': idle high-balance customers — scalar avg subquery + anti join
# --------------------------------------------------------------------------
Q22_IDLE_CUTOFF = "1999-01-01"


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers above the average positive account balance who
    have placed no orders since Q22_IDLE_CUTOFF, grouped by a
    customer-number code (the last two digits of c_name stand in for the
    phone country code).  The date bound follows the Q22 business
    question ("customers who have not placed orders for 7 years") — and
    matters here because the data generator orders for EVERY customer,
    so an unwindowed NOT EXISTS is vacuously empty at every SF (zero
    driver signal, VERDICT r6 item #4).  The scalar average is a one-row
    broadcast cross join; the NOT EXISTS is a left-anti join."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", -2, 2)
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_IDLE_CUTOFF).cast("timestamp")
    )
    in_codes = F.col("cntrycode").isin("01", "12", "23", "34", "45")
    avg_bal = (
        cust.filter(in_codes & (F.col("c_acctbal") > 0))
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.filter(in_codes)
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM (
  SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE right(c_name, 2) IN ('01', '12', '23', '34', '45')
) c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0
                     AND right(c_name, 2) IN ('01', '12', '23', '34', '45'))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_IDLE_CUTOFF} 00:00:00')
GROUP BY cntrycode
"""


TPCH_EXTRA_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q2_min_cost_part": (q2_min_cost_part, Q2_SQL),
    "q4_priority_check": (q4_priority_check, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q12_priority_classes": (q12_priority_classes, Q12_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_cnt": (q16_supplier_cnt, Q16_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q18_large_volume": (q18_large_volume, Q18_SQL),
    "q19_or_of_ands": (q19_or_of_ands, Q19_SQL),
    "q20_promo_suppliers": (q20_promo_suppliers, Q20_SQL),
    "q21_late_suppliers": (q21_late_suppliers, Q21_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
}
