"""TPC-H query-shape suite (Q7..Q22) adapted to the testdata schema.

The reference ships relational work verbatim to a remote DBMS
(src/query.rs:90-97); this module is the engine-side inventory proving the
Spark port covers the standard analytic join/agg/subquery shapes a user of
any such DBMS would run. Adaptations (documented per query):

- no ``partsupp`` table -> Q2/Q9/Q11/Q16/Q20 reconstruct the
  part<->supplier edge from DISTINCT lineitem shipments and proxy
  ps_supplycost with p_retailprice — the join/subquery SHAPES are the
  reference queries', the stock semantics are stand-ins;
- lineitem has no commit/receipt dates or ship modes -> Q12 and Q21 use
  ship-lag against o_orderdate and latest-supplier-in-order respectively;
- part has no container/mfgr -> Q17/Q19 predicate on p_brand/p_size;
- customer has no phone -> Q22 groups by c_mktsegment;
- every customer has orders -> Q22's anti-join is date-bounded.

Determinism contract (matches queries/relational.py): double aggregates
go through DECIMAL(18,6) intermediates then cast to double; every LIMIT
carries a unique-key tiebreak; aliases identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odbc2parquet_spark.catalog import load_table
from odbc2parquet_spark.queries import query


def _dec(col: F.Column) -> F.Column:
    return col.cast("decimal(18,6)")


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(YEAR FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1998-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by year. The two
    nation dims broadcast; the fact chain shuffles once per join key."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") <= _ts("1998-12-31 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # pre-filter both nation dims to the pair: the 2-row broadcast joins
    # then act as early filters on the supplier/customer sides (Catalyst
    # does not infer the IN-set from the disjunctive pair predicate)
    n1 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    # nation-filtered supplier dim first: the broadcast join cuts lineitem
    # to ~2/|nations| before the orderkey/custkey shuffles
    s2 = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c2, c2.c_custkey == o.o_custkey)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_dec(_rev())).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5'
                         THEN CAST(volume AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
          AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share inside a region for one part type.
    Adaptation: p_type is a flat category here ('PROMO'), no mfgr.
    All dims (part-filtered, nation x2, region) broadcast; only the
    order/lineitem chain shuffles."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") <= _ts("1997-12-31 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _dec(_rev())
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost (returned) revenue in a
    quarter. Adaptation: no address/phone/comment columns. Quarter filter
    prunes orders before the fact join; nation broadcasts; tiebreak on
    c_custkey makes the LIMIT total-ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_dec(_rev())).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q12_ship_lag_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 365
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(SUM(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 365
                    THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q12_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority-bucketed late-shipment counting).
    Adaptation: lineitem has no ship mode or commit/receipt dates, so
    'late' is ship-lag > 365 days against o_orderdate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(lag > 365, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(lag <= 365, 1).otherwise(0)).alias("ontime_count"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count histogram (left outer so zero-order
    customers survive). Adaptation: the excluded class is a priority value
    (orders has no comment column). Two shuffles: custkey agg, count agg —
    the second is tiny (|distinct counts| rows)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (view + scalar
    subquery). The revenue0 subtree appears twice in the plan (agg + max);
    both are on the pruned quarter scan. Exact-decimal sums make the
    double equality safe across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(_rev())).cast("double").alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue0, s.s_suppkey == revenue0.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND p_size < 10
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                        / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders (correlated avg
    subquery -> per-part aggregate join). Adaptation: the part filter is
    brand + size (no container). The per-part avg aggregates BEFORE the
    join, so the fact table is shuffled once, not correlated-scanned."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg(
            (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*")).alias("avg_qty")
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very-large-volume orders (HAVING
    semi-join into a re-aggregation). Threshold 250 ~ p99 of per-order
    quantity in this corpus. The qualifying-order set is tiny ->
    broadcast semi-join; decimal compare keeps the HAVING exact."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sq"))
        .filter(F.col("sq") > F.lit(250).cast("decimal(18,6)"))
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(big), o.o_orderkey == F.col("big_orderkey"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute predicate across the join
    (brand x size x quantity bands). Adaptation: no container/shipmode
    legs. The OR spans both tables so it evaluates post-join; part is
    still broadcast and the per-leg brand/size bounds are joinable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    leg1 = (F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & q.between(1, 11)
    leg2 = (F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 25) & q.between(10, 20)
    leg3 = (F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 50) & q.between(20, 30)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(leg1 | leg2 | leg3)
        .agg(
            F.sum(_dec(_rev())).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q21_latest_supplier",
    oracle="""
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    annotated AS (
        SELECT *, MAX(supp_last) OVER (PARTITION BY l_orderkey) AS order_last,
                  COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supps
        FROM per_supp
    ),
    flagged AS (
        SELECT *, SUM(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                      OVER (PARTITION BY l_orderkey) AS n_latest
        FROM annotated
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_supps > 1 AND supp_last = order_last AND n_latest = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_latest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept multi-supplier orders waiting).
    Adaptation: no receipt/commit dates, so the 'waiting' supplier is the
    UNIQUE latest-shipping supplier of each multi-supplier order — same
    exists/not-exists composition, expressed as one window pass over the
    (orderkey, suppkey) aggregate instead of two correlated subqueries."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    w = Window.partitionBy("l_orderkey")
    annotated = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last",
        F.max("supp_last").over(w).alias("order_last"),
        F.count("*").over(w).alias("n_supps"),
    ).withColumn(
        "n_latest",
        F.sum(F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)).over(w),
    )
    latest = annotated.filter(
        (F.col("n_supps") > 1)
        & (F.col("supp_last") == F.col("order_last"))
        & (F.col("n_latest") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        latest.join(F.broadcast(s), latest.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers gone dormant (scalar-subquery
    threshold + anti-join). Adaptations: grouping is c_mktsegment (no
    phone country codes) and dormancy is date-bounded (every customer in
    this corpus has SOME order). The scalar average broadcasts; the
    anti-join streams the pruned recent-orders side."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count("*")).alias("a")
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ---- partsupp-dependent shapes (Q2/Q9/Q11/Q16/Q20), adapted: the
# supplier<->part relationship is reconstructed from lineitem (who shipped
# what), and ps_supplycost is proxied by p_retailprice where a cost is
# needed. The SHAPES under test — correlated min subquery, profit
# decomposition, group-HAVING vs global scalar, distinct-supplier
# counting, nested semi-join chains — are the reference queries'.


@query(
    "q2_min_balance_supplier",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem
    ),
    cand AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
        FROM part
        JOIN ps ON p_partkey = partkey
        JOIN supplier ON suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND r_name = 'EUROPE'
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
    FROM cand c
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery over a 5-table join.
    Adaptation: no partsupp — the part<->supplier edge comes from DISTINCT
    lineitem shipments and the minimized attribute is s_acctbal (no
    ps_supplycost). The correlated subquery becomes a per-part min
    aggregate joined back (one shuffle, never a re-scan per row)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    # p_size=15 keeps ~2% of parts, and partkey is in the distinct key, so
    # the broadcast semi-join commutes below the distinct: the edge-dedup
    # shuffle sees only matching lineitem rows instead of the full table.
    ps = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey, "left_semi")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(F.broadcast(p.select("p_partkey", "p_brand")), ps.partkey == p.p_partkey)
        .join(F.broadcast(s), ps.suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            mins,
            (cand.p_partkey == mins.m_partkey) & (cand.s_acctbal == mins.min_bal),
        )
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy("s_acctbal", "p_partkey", "s_suppkey")
        .limit(100)
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one market
    segment. Both date filters prune at the parquet scan; the segment
    filter keeps ~1/5 of customer, which joins orders on custkey before
    the lineitem join — the revenue aggregate groups on the join key
    (l_orderkey), so the final groupBy reuses the lineitem-join shuffle
    partitioning instead of adding one."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-06-15 00:00:00")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-06-15 00:00:00")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    o_seg = o.join(c, o.o_custkey == c.c_custkey, "left_semi")
    return (
        li.join(o_seg, li.l_orderkey == o_seg.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec(_rev())).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit decomposition by supplier nation and order
    year over a part-name pattern. Adaptation: cost = 0.1 * p_retailprice
    * quantity standing in for ps_supplycost (no partsupp). Part (name-
    filtered) and supplier/nation dims broadcast; one agg shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum(_dec(F.col("amount"))).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH value_per_part AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                    AS DOUBLE) AS part_value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM value_per_part
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM value_per_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value HAVING greater than a fraction of
    the GLOBAL total (group agg + 1-row scalar broadcast). Adaptation:
    value = shipped revenue per part from one nation's suppliers (no
    partsupp stock value)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec(_rev())).cast("double").alias("part_value"))
    )
    threshold = per_part.agg((F.sum("part_value") * F.lit(0.001)).alias("thr"))
    return (
        per_part.join(F.broadcast(threshold), F.col("part_value") > F.col("thr"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "q16_supplier_variety",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT suppkey) AS supplier_cnt
    FROM ps JOIN part ON partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counting per part attribute
    triple with an attribute blocklist and a NOT IN supplier exclusion
    (anti-join). Adaptation: the part<->supplier edge from lineitem; the
    excluded suppliers are negative-balance (no comment pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    # The size/brand/type filter keeps ~1/8 of parts and partkey is in the
    # distinct key — semi-join below the distinct so the edge-dedup shuffle
    # only sees lineitem rows for qualifying parts.
    ps = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey, "left_semi")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.suppkey == F.col("bad_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_heavy_shippers",
    oracle="""
    WITH vol AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    heavy AS (
        SELECT DISTINCT l_suppkey FROM vol
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
          AND qty > 40
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s_name
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain -> two stacked
    semi-joins (suppliers who moved > threshold volume of pattern-named
    parts in a year, restricted to one nation). Adaptation: shipped
    volume stands in for partsupp availability."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    # The broadcast semi-join on l_partkey commutes with the
    # (l_suppkey, l_partkey) groupBy — pushing it below the aggregate
    # shrinks the shuffled aggregation input to just the %bolt% parts
    # (~1% of lineitem) instead of aggregating the whole fact table.
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty"))
    )
    heavy = (
        vol.filter(F.col("qty") > F.lit(40).cast("decimal(18,6)"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
