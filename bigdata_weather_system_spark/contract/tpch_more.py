"""Contract queries: remaining TPC-H plan shapes (Q5, Q8, Q12, Q13, Q21).

The testdata star schema has no ``partsupp`` table and lineitem carries
only ``l_shipdate`` (no commit/receipt dates or shipmode), so each query
keeps the CANONICAL PLAN SHAPE of its TPC-H namesake while adapting the
predicates to the available columns:

- Q5  — multi-way join cycle closed on two independent keys
  (``c_nationkey = s_nationkey``): the classic "local supplier" shape.
- Q8  — market-share ratio: conditional sum over a two-level join tree,
  grouped by year.
- Q12 — fact-to-fact join with CASE-conditional counts per class.
- Q13 — outer-join count distribution (customers per order count),
  including the zero-order customers that an inner join would drop.
- Q21 — multi-supplier order semantics via semi/anti self-joins on the
  fact table.

At 100 TB: every dim side here (customer/supplier/nation/region/part) is
orders-of-magnitude smaller than the facts and is explicitly broadcast;
the only shuffles left are fact-fact joins keyed on orderkey (which
bucketing co-locates — sources/bucketed.py) and the final aggregations,
which all combine map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import register, _t


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: revenue where the customer and the supplier sit in
    the same (ASIA) nation. The join graph has a cycle — lineitem joins
    supplier on suppkey AND customer.nationkey must equal
    supplier.nationkey — which Catalyst plans as an extra join condition,
    not a post-filter. Region/nation/supplier/customer all broadcast;
    the one shuffle is orders⋈lineitem on orderkey."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(CASE WHEN n.n_name = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type LIKE '%STANDARD%'
    GROUP BY year(o.o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: one nation's fraction of total
    STANDARD-part revenue per order-year. The numerator is a conditional
    sum inside the SAME aggregation as the denominator — one pass, no
    self-join. The LIKE-filtered part dim prunes lineitem via broadcast
    before anything shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").like("%STANDARD%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_7", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped: fact-to-fact equi-join, then CASE-conditional
    counts splitting each group into priority classes (l_linestatus
    stands in for the absent l_shipmode). The ship-date range pushes to
    the lineitem scan, shrinking the join's build side a year at a
    time — the predicate that makes this query partition-prunable on a
    date-partitioned 100 TB fact table."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: two stacked aggregations over a LEFT outer join.
    The filter lives in the JOIN CONDITION, not a WHERE — a WHERE would
    silently turn the outer join inner and drop zero-order customers,
    which are exactly the point of the distribution. count(o_orderkey)
    counts matches only (nulls excluded), so unmatched customers land in
    the c_count=0 bucket."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q21_sole_returned_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped: suppliers who were the ONLY supplier with returned
    lines on finalized multi-supplier orders (returnflag stands in for
    the absent receipt/commit lateness columns). The plan shape is the
    interesting part — a semi-join (some other supplier exists on the
    order) and an anti-join (no other supplier returned) against the
    same fact table, both keyed on orderkey so they co-partition with
    the main join and AQE can reuse the exchange."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.l2_orderkey)
            & (l1.l_suppkey != l2.l2_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.l3_orderkey)
            & (l1.l_suppkey != l3.l3_suppkey),
            "left_anti",
        )
    )
    return (
        waiting.join(o, waiting.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
