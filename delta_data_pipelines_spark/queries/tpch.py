"""TPC-H-shaped throughput queries over the harness star schema.

The reference's relational surface is dimension-lookup joins + one
pivot (SURVEY §2.3-2.4); these queries are the scale-stress versions
the 100 TB story needs: wide scans with tight projections, multi-way
joins with broadcastable dims, and large hash aggregations.

Plan notes (verified via .explain):
  - q1 is a two-phase hash agg (partial → final) over a 4-column scan;
    column pruning reaches the parquet reader (ReadSchema 4/16 cols).
  - q3/q5 broadcast every dimension side (customer at sf0.1 is ~15k
    rows; at 100 TB switch to shuffle join for customer — Spark's AQE
    does this automatically past the broadcast threshold).
  - money sums run in DECIMAL(18,2): exact, associative, and identical
    across engines — float sums would differ by partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table


def _dec(col: str):
    return F.col(col).cast("decimal(18,2)")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the canonical scan+agg throughput probe."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums run exact in decimal (associative, engine-identical);
            # FINAL columns are cast to double so the driver's
            # type-sensitive digest sees the same float64 on both sides
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: fact-fact join with a broadcast dim filter."""
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1997-03-15"))
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1997-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: the full dim-chain join
    (region→nation→{customer,supplier}→orders→lineitem)."""
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: the pure scan-throughput probe — every
    predicate pushes to the parquet reader, output is one row."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority buckets: fact-fact join + conditional-count
    aggregation (the CASE-inside-SUM shape, like the EAV pivot)."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).cast("long").alias("high_line_count"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (q4 shape, adapted: the harness lineitem
    has no commit/receipt dates, so "late line" = shipped after more
    than 60 days): EXISTS semi-join + count by priority."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    late = l.select("l_orderkey", "l_shipdate")
    joined = o.join(
        late,
        (o.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue: top 20 customers by lost revenue —
    fact-fact join + broadcast dims + TakeOrdered(20)."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: conditional revenue share over one month —
    CASE-inside-SUM ratio, both sums exact decimal then one double
    division (identical across engines)."""
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    disc = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )).cast("double")
                / F.sum(disc).cast("double"),
                9,
            ).alias("promo_revenue_pct")
        )
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (q18): HAVING on an aggregated fact,
    then join back to orders/customer. The inner agg's output is tiny
    after the HAVING filter → broadcast to the join."""
    l = read_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_sumq"))
        .where(F.col("_sumq") > 150)
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_sumq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


SPARK_QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q12": tpch_q12,
    "tpch_q4": tpch_q4,
    "tpch_q10": tpch_q10,
    "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
}

_DISC = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)

ORACLE_SQL = {
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_DISC}) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q3": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate  > TIMESTAMP '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 20
    """,
    "tpch_q12": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "tpch_q6": """
        SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q5": f"""
        SELECT n_name, CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "tpch_q10": f"""
        SELECT c_custkey, c_name, n_name, c_mktsegment,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q14": f"""
        SELECT ROUND(100.0 *
               CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC}
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
               CAST(SUM({_DISC}) AS DOUBLE), 9) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(big._sumq AS DOUBLE) AS sum_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS _sumq
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
}
