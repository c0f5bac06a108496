"""Generic relational operator suite (SURVEY.md §2.2-§2.5, §2.7-§2.8).

One oracle-checked query per operator family from the reference,
re-expressed on the harness star schema. Each function documents which
reference operator(s) it generalizes (P/J/A/W/SO/M/D numbering from
SURVEY §2) and its scale posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table

# --------------------------------------------------------------------------
# P — projections / filters / predicates
# --------------------------------------------------------------------------


def p_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4 — projection with rename + equality/inequality/temporal
    predicates (↔ sql_search_full_rebuild_dag.py:42-43,76-98).

    All three predicates and the 4-column projection push into the
    parquet scan (PushedFilters + ReadSchema pruning).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_linestatus") != "O")
        & (F.col("l_shipdate") > F.lit("1997-06-15 00:00:00").cast("timestamp"))
    ).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("part_id"),
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


def p_null_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P8/P10 — null-guard + membership filters
    (↔ mongodb_utils.py:24-26; divar_crawler.py:111-115)."""
    o = read_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~F.col("o_orderstatus").isin("P")
    ).select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")


def p_na_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — dropna(subset)/fillna/drop (↔ map_divar_data_to_delta.py:55-58).

    The test tables have no nulls, so nulls are manufactured first
    (nullif) exactly as the oracle does, then na.drop + na.fill apply.
    """
    li = read_table(spark, sf_dir, "lineitem")
    nulled = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("discount"),
        F.when(F.col("l_quantity") > 45.0, F.col("l_quantity")).alias("big_qty"),
        "l_tax",
    )
    return (
        nulled.na.drop(subset=["discount"])
        .na.fill({"big_qty": 0.0})
        .drop("l_tax")
    )


# --------------------------------------------------------------------------
# J / D — joins & membership
# --------------------------------------------------------------------------


def j_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-J4 — dimension-lookup left equi-join chain
    (↔ sql_search_full_rebuild_dag.py:100-105). Dims broadcast."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


def d_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2 — membership partition, "new" side: URLs not yet seen ↔
    left-anti join (↔ redis_utils.py:17-32 BF.MEXISTS split; the exact
    replacement for the bloom filter).

    Anti-joins shuffle both sides on the key; at 100 TB bucket
    `seen_urls` by key so re-checks co-locate.
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    seen = li.where(F.col("l_quantity") > 30.0).select("l_orderkey")
    return o.join(seen, o.o_orderkey == seen.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def d_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — membership partition, "duplicate" side ↔ left-semi join."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    dup = li.where(F.col("l_discount") >= 0.09).select("l_orderkey")
    return o.join(dup, o.o_orderkey == dup.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5/D6 — exact key dedup: first writer wins (↔ Mongo unique index
    insert-skip, mongodb_utils.py:21-36; seen_urls rebuild
    mongo_to_bf_dag.py:38-83).

    row_number over (key ORDER BY tiebreak) == 1 — the scalable
    MERGE-WHEN-NOT-MATCHED equivalent for a static batch.
    """
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# --------------------------------------------------------------------------
# A — aggregations / pivot / distinct
# --------------------------------------------------------------------------


def a_eav_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — conditional-aggregation pivot, EAV tall→wide
    (↔ sql_search_full_rebuild_dag.py:45-68) on the events tall table:
    one MAX(CASE WHEN type) per attribute, GROUP BY entity.

    Partial aggregation (map-side combine) makes this one shuffle of
    pre-collapsed rows — the plan that survives 100 TB.
    """
    e = read_table(spark, sf_dir, "events")

    def attr(t: str) -> F.Column:
        return F.max(F.when(F.col("event_type") == t, F.col("value"))).alias(f"max_{t}")

    return e.groupBy(F.col("user_id").alias("entity_id")).agg(
        attr("click"), attr("view"), attr("purchase"), attr("signup"), attr("error"),
        F.count("*").alias("n_events"),
    )


def a_min_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — GROUP BY key, MIN(value)
    (↔ MinUserRole, sql_search_full_rebuild_dag.py:69-75)."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def a_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — duplicate-ratio aggregate driving the crawler early-stop
    (↔ divar_crawler.py:144-155: duplicate_count/len(items) ≥ 0.5)."""
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.countDistinct("text").alias("n_unique"),
        F.round(1 - F.countDistinct("text") / F.count("*"), 9).alias("dup_ratio"),
    )


def a_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — DISTINCT projection (↔ map_divar_data_to_delta.py:59)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


def a_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — inserted/duplicate counters from a batch op
    (↔ mongo_to_bf_dag.py:63-75): conditional sums over one pass.

    Final sums are pinned to BIGINT on both engines: Spark sum(int)
    yields bigint but DuckDB SUM(int) yields HUGEINT, and the driver's
    value digest is type-sensitive.
    """
    e = read_table(spark, sf_dir, "events")
    return e.agg(
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_failed"),
        F.count("*").alias("n_total"),
    )


# --------------------------------------------------------------------------
# W — window / sort / limit
# --------------------------------------------------------------------------


def w_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W5 — global sort + limit (↔ ORDER BY d.Id DESC + page caps).

    TakeOrderedAndProject in the physical plan — no full sort
    materialization at scale.
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


def w_row_number_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — sequential id assignment id = index + 90001
    (↔ map_divar_data_to_delta.py:185).

    NOTE: a global row_number is a single-partition bottleneck; fine
    for the reference's offline 100k-row export. The scale path is
    zipWithIndex-style monotonically_increasing_id + offset rank, or
    per-partition windows.
    """
    d = read_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    return d.select(
        "doc_id",
        (F.row_number().over(w) + 90000).alias("assigned_id"),
    )


def w_batch_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — REST-sink batch numbering: slice into batches of 200
    (↔ utils_of_searchengine.py:183-196), then per-batch stats."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    batched = o.select(
        "o_orderkey",
        F.floor((F.row_number().over(w) - 1) / 200).alias("batch_id"),
    )
    return batched.groupBy("batch_id").agg(
        F.count("*").alias("batch_size"),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
    )


def w_row_number_seq_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3, the 100 TB path: same output as ``w_row_number_seq`` (exact
    sequential ids ordered by doc_id) with no full-table single-
    partition Exchange in the plan — verified in tests/test_plans.py.
    Pattern: operators.ranking.global_rank_by_range (zipWithIndex-offset
    in pure DataFrame form)."""
    from ..operators.ranking import global_rank_by_range

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    ranked = global_rank_by_range(d, "doc_id")
    return ranked.select(
        "doc_id", (F.col("global_rank") + 90000).alias("assigned_id")
    )


def w_percent_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global PERCENT_RANK without a single-partition window:
    (global_rank - 1) / (n - 1) with the rank from the range-
    partitioned pattern and n a 1-row broadcast aggregate. The order
    key is the unique composite (n_chars, doc_id), so row_number-based
    ranks equal SQL's tie-aware PERCENT_RANK exactly."""
    from ..operators.ranking import global_rank_by_range

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = d.withColumn("_okey", F.struct("n_chars", "doc_id"))
    ranked = global_rank_by_range(keyed, "_okey").drop("_okey")
    # count(*) over a zero-column projection: the scan reads parquet
    # row-group metadata, not data — not a second full pass
    n = read_table(spark, sf_dir, "documents").select().agg(
        F.count("*").alias("_n")
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_chars",
            F.when(
                F.col("_n") > 1,
                F.round(
                    (F.col("global_rank") - 1) / (F.col("_n") - 1).cast("double"),
                    9,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
        )
        .orderBy("doc_id")
    )


def w_batch_ids_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4, the 100 TB path + reference-exact global numbering contract
    (utils_of_searchengine.py:183-196 sends batch_number AND
    total_batches): scalable global rank → batch of 200 → per-batch
    stats + total_batches. The only unpartitioned windows run over the
    per-partition counts (≤32 rows) and the per-batch aggregate."""
    from ..operators.ranking import global_rank_by_range

    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    ranked = global_rank_by_range(o, "o_orderkey")
    batched = ranked.select(
        "o_orderkey",
        F.floor((F.col("global_rank") - 1) / 200).alias("batch_id"),
    )
    agg = batched.groupBy("batch_id").agg(
        F.count("*").alias("batch_size"),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
    )
    return agg.withColumn(
        "total_batches", F.count("*").over(Window.partitionBy(F.lit(1)))
    )


def w_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — first element matching a predicate
    (↔ next(w for w in widgets if ...), divar_transformer.py:63-66)."""
    d = read_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.try_element_at(F.filter(words, lambda x: F.length(x) >= 6), F.lit(1)).alias(
            "first_long_word"
        ),
    )


def w_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — positional pairing of two lists (↔ zip(label_blocks,
    price_rent_blocks), kilid_transformer.py:335,466): arrays_zip of
    the first 3 words with their lengths."""
    d = read_table(spark, sf_dir, "documents")
    words = F.slice(F.split(F.col("text"), " "), 1, 3)
    lens = F.transform(words, lambda x: F.length(x))
    pairs = F.arrays_zip(words.alias("w"), lens.alias("n"))
    return d.select(
        "doc_id",
        F.try_element_at(pairs, F.lit(2))["w"].alias("second_word"),
        F.try_element_at(pairs, F.lit(2))["n"].alias("second_len"),
    )


# --------------------------------------------------------------------------
# SO — set operations
# --------------------------------------------------------------------------


def so_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 — union of two batches then dedup (↔ new+duplicate ad batches,
    sheypoor_crawler.py:132-137)."""
    c = read_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    b = c.where(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_name")
    return a.unionByName(b).distinct()


def so_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO2 — set difference (↔ backup validation collection-set compare,
    utils_of_backup.py:114-124)."""
    p = read_table(spark, sf_dir, "part")
    all_brands = p.select(F.col("p_brand").alias("brand")).distinct()
    big_brands = (
        p.where(F.col("p_size") > 49).select(F.col("p_brand").alias("brand")).distinct()
    )
    return all_brands.exceptAll(big_brands)


def so_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO — set intersection (customers who are BOTH in the BUILDING
    segment AND high-balance; completes the union/except family)."""
    c = read_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    b = c.where(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_name")
    return a.intersect(b)


# --------------------------------------------------------------------------
# M — wide→tall melt (EAV construction) and friends
# --------------------------------------------------------------------------


def m_melt_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — wide→tall melt: one row per (entity, attribute, value)
    (↔ EAV CustomFieldValues construction,
    map_divar_data_to_delta.py:226-281). Inverse of a_eav_pivot.

    ``stack`` is narrow (no shuffle) — rows explode in place.
    """
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return li.select(
        F.col("l_orderkey").alias("entity_id"),
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) AS (attribute, value)"
        ),
    )


def m_rename_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M3/M5/M7 — rename + derived constants + cast + column reorder
    (↔ map_divar_data_to_delta.py:61-65,155,182-224,283-286)."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").cast("long").alias("Id"),
        F.col("p_name").alias("Title"),
        F.lit(1247).alias("StatusId"),
        F.col("p_retailprice").cast("double").alias("Price"),
        F.col("p_size").cast("int").alias("Size"),
    )


def a_dynamic_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 via the groupBy().pivot() API (the EAV pivot's other form).
    Explicit pivot values skip the extra distinct-scan pass Spark
    otherwise runs to discover them — required practice at scale."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .select(
            "l_orderkey",
            # sums run exact in decimal; the FINAL column is cast to
            # double on both engines (Spark decimal(28,2) vs DuckDB
            # decimal(38,2) hash differently at the driver)
            F.col("A").cast("double").alias("qty_a"),
            F.col("N").cast("double").alias("qty_n"),
            F.col("R").cast("double").alias("qty_r"),
        )
    )


def m_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 via the native unpivot/melt API (the stack() form's twin)."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return li.select("l_orderkey", "l_quantity", "l_discount", "l_tax").unpivot(
        "l_orderkey",
        ["l_quantity", "l_discount", "l_tax"],
        "attribute",
        "value",
    )


def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (two-phase: partial distinct
    then count). The approximate twin (approx_count_distinct, HLL —
    one pass, fixed memory, the 100 TB default) is tolerance-tested in
    tests/test_operators.py since HLL estimates differ per engine."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — ROLLUP (absent in the reference, free in Spark): subtotal
    rows per (returnflag), (returnflag, linestatus), and grand total.
    One shuffle; partial aggregation applies per grouping set."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            # exact decimal sum, double at the boundary (see a_dynamic_pivot)
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — CUBE over (orderstatus, orderpriority): all 4 grouping
    sets in one pass."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            # exact decimal sum, double at the boundary (see a_dynamic_pivot)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — explicit GROUPING SETS: the named subtotal combinations
    only (by-flag and by-status, no cross/grand total)."""
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


def a_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram per event type (width_bucket over the
    global min/max — the same binning primitive the Z-order layout
    uses in spirit). One narrow pass + one grouped count; the 1-row bounds
    aggregate rides in broadcast."""
    e = read_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    # explicit bin math (not width_bucket: DuckDB lacks it, and parity
    # needs the IDENTICAL float expression in both engines):
    # bucket = least(floor((v - lo) * 10 / (hi - lo)) + 1, 10)
    binned = e.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("_lo"))
                    * 10
                    / (F.col("_hi") - F.col("_lo"))
                )
                + 1,
                F.lit(10),
            ),
        ).otherwise(F.lit(1).cast("bigint")),
    )
    return (
        binned.groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


SPARK_QUERIES = {
    "a_histogram": a_histogram,
    "p_filter_project": p_filter_project,
    "p_null_membership": p_null_membership,
    "p_na_clean": p_na_clean,
    "j_dim_chain": j_dim_chain,
    "d_anti_join": d_anti_join,
    "d_semi_join": d_semi_join,
    "d_exact_dedup": d_exact_dedup,
    "a_eav_pivot": a_eav_pivot,
    "a_min_agg": a_min_agg,
    "a_dup_ratio": a_dup_ratio,
    "a_distinct": a_distinct,
    "a_counters": a_counters,
    "w_sort_limit": w_sort_limit,
    "w_row_number_seq": w_row_number_seq,
    "w_row_number_seq_scalable": w_row_number_seq_scalable,
    "w_percent_rank_scalable": w_percent_rank_scalable,
    "w_batch_ids": w_batch_ids,
    "w_batch_ids_global": w_batch_ids_global,
    "w_first_match": w_first_match,
    "w_positional_zip": w_positional_zip,
    "so_union": so_union,
    "so_except": so_except,
    "so_intersect": so_intersect,
    "m_melt_eav": m_melt_eav,
    "m_rename_reorder": m_rename_reorder,
    "a_rollup": a_rollup,
    "a_cube": a_cube,
    "a_grouping_sets": a_grouping_sets,
    "a_dynamic_pivot": a_dynamic_pivot,
    "m_unpivot": m_unpivot,
    "a_count_distinct": a_count_distinct,
}

ORACLE_SQL = {
    "a_histogram": """
        WITH bounds AS (
            SELECT MIN(value) AS _lo, MAX(value) AS _hi FROM events
        )
        SELECT event_type,
               CASE WHEN _hi > _lo
                    THEN LEAST(CAST(FLOOR((value - _lo) * 10
                                          / (_hi - _lo)) AS BIGINT) + 1, 10)
                    ELSE CAST(1 AS BIGINT) END AS bucket,
               COUNT(*) AS n
        FROM events CROSS JOIN bounds
        GROUP BY 1, 2
        ORDER BY event_type, bucket
    """,
    "p_filter_project": """
        SELECT l_orderkey AS order_id, l_partkey AS part_id, l_quantity AS qty,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus <> 'O'
          AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
    """,
    "p_null_membership": """
        SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus
        FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_orderstatus NOT IN ('P')
    """,
    "p_na_clean": """
        WITH nulled AS (
            SELECT l_orderkey, l_linenumber,
                   NULLIF(l_discount, 0.0) AS discount,
                   CASE WHEN l_quantity > 45.0 THEN l_quantity END AS big_qty
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, discount, COALESCE(big_qty, 0.0) AS big_qty
        FROM nulled WHERE discount IS NOT NULL
    """,
    "j_dim_chain": """
        SELECT o.o_orderkey AS id, c.c_name AS customer_name,
               c.c_mktsegment AS segment, n.n_name AS nation_name,
               r.r_name AS region_name
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "d_anti_join": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 30.0
        )
    """,
    "d_semi_join": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09
        )
    """,
    "d_exact_dedup": """
        SELECT doc_id, lang, source, n_chars
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    "a_eav_pivot": """
        SELECT user_id AS entity_id,
               MAX(CASE WHEN event_type = 'click' THEN value END) AS max_click,
               MAX(CASE WHEN event_type = 'view' THEN value END) AS max_view,
               MAX(CASE WHEN event_type = 'purchase' THEN value END) AS max_purchase,
               MAX(CASE WHEN event_type = 'signup' THEN value END) AS max_signup,
               MAX(CASE WHEN event_type = 'error' THEN value END) AS max_error,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "a_min_agg": """
        SELECT user_id AS entity_id, MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY user_id
    """,
    "a_dup_ratio": """
        SELECT source, COUNT(*) AS n_total, COUNT(DISTINCT text) AS n_unique,
               ROUND(1 - COUNT(DISTINCT text) / CAST(COUNT(*) AS DOUBLE), 9) AS dup_ratio
        FROM documents GROUP BY source
    """,
    "a_distinct": "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "a_counters": """
        SELECT CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
               COUNT(*) AS n_total
        FROM events
    """,
    "w_sort_limit": """
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "w_row_number_seq": """
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) + 90000 AS assigned_id
        FROM documents
    """,
    # identical output contract to w_row_number_seq — what changes is the
    # Spark plan (range-partitioned offset ranks, no global window)
    "w_row_number_seq_scalable": """
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) + 90000 AS assigned_id
        FROM documents
    """,
    # unique composite order key -> row_number ranks == tie-aware
    # PERCENT_RANK; NULLS FIRST pins DuckDB to Spark's ascending
    # default should the fixture ever carry a null n_chars
    "w_percent_rank_scalable": """
        SELECT doc_id, n_chars,
               ROUND(PERCENT_RANK() OVER (
                   ORDER BY n_chars NULLS FIRST, doc_id NULLS FIRST), 9)
                   AS pct_rank
        FROM documents ORDER BY doc_id
    """,
    "w_batch_ids_global": """
        WITH batched AS (
            SELECT o_orderkey,
                   CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) / 200) AS BIGINT) AS batch_id
            FROM orders
        ), agg AS (
            SELECT batch_id, COUNT(*) AS batch_size,
                   MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
            FROM batched GROUP BY batch_id
        )
        SELECT batch_id, batch_size, first_key, last_key,
               COUNT(*) OVER () AS total_batches
        FROM agg
    """,
    "w_batch_ids": """
        WITH batched AS (
            SELECT o_orderkey,
                   CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) / 200) AS BIGINT) AS batch_id
            FROM orders
        )
        SELECT batch_id, COUNT(*) AS batch_size,
               MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        FROM batched GROUP BY batch_id
    """,
    "w_first_match": """
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> length(x) >= 6)[1] AS first_long_word
        FROM documents
    """,
    "w_positional_zip": """
        WITH words AS (
            SELECT doc_id, string_split(text, ' ')[1:3] AS w3 FROM documents
        )
        SELECT doc_id, w3[2] AS second_word, length(w3[2]) AS second_len FROM words
    """,
    "so_union": """
        SELECT DISTINCT c_custkey, c_name FROM (
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0
        )
    """,
    "so_intersect": """
        SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0
    """,
    "so_except": """
        SELECT DISTINCT p_brand AS brand FROM part
        EXCEPT ALL
        SELECT DISTINCT p_brand AS brand FROM part WHERE p_size > 49
    """,
    "m_melt_eav": """
        SELECT l_orderkey AS entity_id, attr AS attribute, v AS value
        FROM (
            SELECT l_orderkey, 'quantity' AS attr, l_quantity AS v FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'extendedprice', l_extendedprice FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'discount', l_discount FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'tax', l_tax FROM lineitem WHERE l_linenumber = 1
        )
    """,
    "m_rename_reorder": """
        SELECT CAST(p_partkey AS BIGINT) AS Id, p_name AS Title, 1247 AS StatusId,
               CAST(p_retailprice AS DOUBLE) AS Price, CAST(p_size AS INTEGER) AS Size
        FROM part
    """,
    "a_count_distinct": """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "a_dynamic_pivot": """
        SELECT l_orderkey,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        FROM lineitem GROUP BY l_orderkey
    """,
    "m_unpivot": """
        SELECT l_orderkey, attribute, value FROM (
            SELECT l_orderkey, 'l_quantity' AS attribute, l_quantity AS value
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'l_discount', l_discount
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'l_tax', l_tax
            FROM lineitem WHERE l_linenumber = 1
        )
    """,
    "a_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "a_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "a_grouping_sets": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
}
