"""Contract queries: TPC-H shapes that canonically need ``partsupp``
(Q2, Q11, Q16, Q20), rebuilt over a lineitem-derived supply catalog.

The testdata schema has no partsupp table, so each query first derives
one — ``supply`` = distinct (partkey, suppkey) observed in lineitem with
min unit price / total shipped quantity as the supplycost/availqty
stand-ins — then applies its namesake's characteristic plan shape:

- Q2  — correlated MIN subquery: the cheapest supplier per part, i.e. a
  per-key aggregate joined back to the detail on (key, agg-value).
- Q11 — HAVING against a global scalar subquery (value share threshold).
- Q16 — count-distinct suppliers per part attribute with a NOT-IN
  (anti-join) supplier exclusion.
- Q20 — nested semi-join chain gated by a correlated half-sum threshold.

The derived ``supply`` sub-plan repeats in each query; at 100 TB you'd
materialize it once as a bucketed table (sources/bucketed.py) — here it
stays inline so every query is self-contained for the oracle harness.
The derivation itself is one map-side-combining groupBy of lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import register, _t

#: lineitem-derived partsupp proxy, shared SQL (DuckDB) form.
_SUPPLY_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost,
             sum(l_quantity)                   AS ps_availqty
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
"""

# NOTE: ps_supplycost/ps_availqty are intentionally NOT rounded: supplycost
# is a single IEEE division (bit-identical across engines) and availqty a
# sum of integral doubles (exact) — and Q2 joins on supplycost EQUALITY, so
# rounding here (half-even vs half-up at the boundary) could change rows.
# Rounding happens only on displayed output columns.


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of ``_SUPPLY_SQL``."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.sum("l_quantity").alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    best AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM supply GROUP BY ps_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_type,
           round(sp.ps_supplycost, 6) AS ps_supplycost
    FROM part p
    JOIN supply sp  ON p.p_partkey = sp.ps_partkey
    JOIN best b     ON sp.ps_partkey = b.ps_partkey
                   AND sp.ps_supplycost = b.min_cost
    JOIN supplier s ON sp.ps_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size = 15
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped: cheapest supplier per size-15 part. The correlated
    MIN subquery decorrelates to a per-part window min filtered back on
    the same pass (ties kept, as Q2 requires) — ONE lineitem scan and one
    extra partkey exchange, where the agg-then-self-join form scanned and
    shuffled lineitem twice (AQE does not reuse the exchange across the
    join's two sub-plans). The p_size filter broadcasts to prune before
    the heavy join. Top-100 ends in the unique p_partkey so LIMIT is
    deterministic."""
    from pyspark.sql.window import Window

    supply = _supply(spark, sf_dir)
    w = Window.partitionBy("ps_partkey")
    best = supply.withColumn(
        "_min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("_min_cost"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            F.round("ps_supplycost", 6).alias("ps_supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT ps_partkey,
           round(sum(ps_supplycost * ps_availqty), 2) AS part_value
    FROM supply
    GROUP BY ps_partkey
    HAVING sum(ps_supplycost * ps_availqty) > (
      SELECT sum(ps_supplycost * ps_availqty) * 0.001 FROM supply
    )
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: parts whose stock value exceeds a fraction of the
    GLOBAL stock value — a HAVING gated on a scalar subquery. The global
    sum rolls up from the PER-PART aggregates (same value, associative
    sum) instead of from raw supply, so the scalar branch re-aggregates
    the small per-part relation rather than re-deriving supply from
    lineitem; the one-row threshold broadcasts into the HAVING filter."""
    supply = _supply(spark, sf_dir).withColumn(
        "_value", F.col("ps_supplycost") * F.col("ps_availqty")
    )
    per_part = supply.groupBy("ps_partkey").agg(
        F.sum("_value").alias("_part_value")
    )
    threshold = per_part.agg(
        (F.sum("_part_value") * F.lit(0.001)).alias("_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("_part_value") > F.col("_threshold"))
        .select(
            "ps_partkey", F.round("_part_value", 2).alias("part_value")
        )
    )


@register(
    "q16_supplier_relation_count",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT sp.ps_suppkey) AS supplier_cnt
    FROM supply sp
    JOIN part p ON p.p_partkey = sp.ps_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_size IN (5, 15, 25, 35, 45)
      AND sp.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_relation_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped: distinct-supplier counts per part attribute with a
    NOT-IN supplier blacklist. The blacklist is tiny → broadcast
    left-anti join (the NOT-IN decorrelation); count(DISTINCT) expands to
    a two-phase aggregate: dedup shuffle on the full grouping key + key,
    then count — both partial-aggregated map-side."""
    supply = _supply(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey")
    )
    return (
        supply.join(
            F.broadcast(bad),
            supply.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), supply.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(l_quantity) AS qty_1996
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT sp.ps_suppkey
      FROM supply sp
      JOIN part p ON sp.ps_partkey = p.p_partkey
      JOIN shipped sh ON sh.l_partkey = sp.ps_partkey
                     AND sh.l_suppkey = sp.ps_suppkey
      WHERE p.p_name LIKE 'small%'
        AND sp.ps_availqty > 0.5 * sh.qty_1996
    )
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped: suppliers holding excess stock of matching parts —
    a semi-join chain where the inner predicate compares the supply row
    against a CORRELATED aggregate (half the 1996 shipped quantity for
    that part+supplier). Decorrelated as CONDITIONAL aggregation: the
    1996-shipped sum is a filtered sum in the SAME groupBy that derives
    supply — one lineitem scan and one (partkey, suppkey) shuffle where
    the aggregate-then-join form scanned and shuffled lineitem twice.
    A conditional sum with no matching rows is NULL, which the excess
    filter rejects — identical to the inner join's drop semantics."""
    li = _t(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum("l_quantity").alias("ps_availqty"),
        F.sum(
            F.when(
                F.col("l_shipdate")
                >= F.lit("1996-01-01").cast("timestamp"),
                F.col("l_quantity"),
            )
        ).alias("qty_1996"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualifying = (
        supply.join(F.broadcast(p), supply.ps_partkey == p.p_partkey)
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty_1996"))
        .select("ps_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(
        qualifying, s.s_suppkey == qualifying.ps_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@register(
    "part_inventory_turns",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             max(CAST(l_quantity AS BIGINT)) AS max_order_qty
      FROM lineitem GROUP BY 1, 2
    ),
    stock AS (
      SELECT ps_partkey,
             count(*)                                   AS n_suppliers,
             CAST(10 * sum(max_order_qty) AS BIGINT)    AS rated_capacity
      FROM supply GROUP BY ps_partkey
    ),
    demand AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT s.ps_partkey                    AS partkey,
           CAST(s.n_suppliers AS BIGINT)   AS n_suppliers,
           s.rated_capacity,
           d.qty_sold,
           round(d.qty_sold * 1.0 / s.rated_capacity, 6) AS turns,
           round(365.0 * s.rated_capacity / d.qty_sold, 3) AS days_of_supply
    FROM stock s JOIN demand d ON d.l_partkey = s.ps_partkey
    """,
)
def part_inventory_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory turns and days-of-supply per part — the two numbers a
    supply planner reads first: window demand against rated capacity,
    and how long capacity lasts at the observed run rate. The capacity
    stand-in (10x the sum over suppliers of their largest single-order
    quantity — the same lineitem-derived proxy family as the partsupp
    queries above) is integer-exact, so every decision column is
    integer algebra until the two rounded divisions. Two hash aggs and
    one equi-join on the part key; every part has demand by
    construction, so the join is inner.
    """
    li = _t(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.max(F.col("l_quantity").cast("long")).alias("max_order_qty"))
    stock = supply.groupBy("partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        (10 * F.sum("max_order_qty")).cast("long").alias("rated_capacity"),
    )
    demand = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sold")
    )
    return stock.join(demand, "partkey").select(
        "partkey", "n_suppliers", "rated_capacity", "qty_sold",
        F.round(F.col("qty_sold") * 1.0 / F.col("rated_capacity"), 6).alias("turns"),
        F.round(365.0 * F.col("rated_capacity") / F.col("qty_sold"), 3).alias(
            "days_of_supply"
        ),
    )
