"""Temporal-join queries over the events table.

as-of: for each 'click' event, the most recent 'error' value by the
same user at or before it (DuckDB checks with its native ASOF JOIN).
range: click→error within 10 minutes after, per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators.temporal import asof_join, range_join


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = read_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    # unique (user_id, ts) on the right side: keep the max-value error
    # so the as-of match is deterministic in both engines
    errors = (
        e.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )
    return clicks, errors


def t_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, errors = _sides(spark, sf_dir)
    out = asof_join(
        clicks, errors, key="user_id", ts="ts", payload_cols=["err_value"]
    )
    return out.select("event_id", "user_id", "ts", "err_value", "matched_ts")


def t_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, errors = _sides(spark, sf_dir)
    out = asof_join(
        clicks,
        errors,
        key="user_id",
        ts="ts",
        payload_cols=["err_value"],
        tolerance_seconds=3600,
    )
    return out.select("event_id", "user_id", "ts", "err_value", "matched_ts")


def t_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, errors = _sides(spark, sf_dir)
    joined = range_join(
        clicks,
        errors.withColumnRenamed("ts", "err_ts"),
        key="user_id",
        left_ts="ts",
        right_ts="err_ts",
        lower_seconds=0,
        upper_seconds=600,
    )
    return joined.select("event_id", "user_id", "ts", "err_ts", "err_value")


def t_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the purchase change log: one
    validity interval per (user, ts) state, closed by the next change
    (null valid_to = current row). The dimension the as-of joins and
    point-in-time snapshots consume."""
    from ..operators.temporal import scd2_intervals

    e = read_table(spark, sf_dir, "events")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = scd2_intervals(purchases, "user_id", "ts", ["value"])
    return out.select(
        "user_id", "value", "valid_from", "valid_to", "is_current"
    )


def t_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: per user, the
    first view, the first click AT OR AFTER that view, and the first
    purchase at or after that click — order matters (a purchase before
    the click does not count), which is what separates a funnel from
    three independent MINs.

    Shape: ONE shuffle on user_id. Three chained unbounded windows
    over the same partitioning compute each stage's frontier from the
    previous one's column (a window result can't nest inside another
    window's expression, but a chained column can), and the final
    per-user collapse reuses the partitioning — plan-asserted in
    tests/test_plans.py (a join-per-stage formulation shuffles 3×)."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "_fv",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "_fc",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("_fv")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "_fp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("_fc")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    out = staged.groupBy("user_id").agg(
        F.min("_fv").alias("first_view"),
        F.min("_fc").alias("first_click"),
        F.min("_fp").alias("first_purchase"),
    )
    return out.withColumn(
        "stage",
        F.when(F.col("first_purchase").isNotNull(), 3)
        .when(F.col("first_click").isNotNull(), 2)
        .when(F.col("first_view").isNotNull(), 1)
        .otherwise(0),
    ).orderBy("user_id")


def t_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by their signup week,
    counted distinct in each subsequent activity week — the classic
    cohort triangle. Two shuffles (per-user signup min, then the
    cohort-cell distinct count); the signup frontier joins back
    broadcast because one row per user is the SMALL side only at test
    scale — at 100 TB both sides co-partition on user_id."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    signup = e.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = e.join(signup, "user_id").withColumn(
        "weeks_since",
        (
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
            / 7
        ).cast("int"),
    )
    return (
        act.where(F.col("weeks_since") >= 0)
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


def t_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularized daily series per user with forward fill: resample
    purchase values onto a dense day spine (every user × every day of
    the corpus span) and carry the last observation forward — the
    gap-fill step before any time-series modeling. Nulls before a
    user's first purchase stay null; ``is_observed`` marks real points.

    Scale shape: the spine is users × days (generated, not shuffled —
    sequence+explode); the fill is one per-user window. The global
    min/max day rides in as a broadcast 1-row aggregate."""
    e = read_table(spark, sf_dir, "events")
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.max("value").alias("v_obs"))
    )
    bounds = p.agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    users = p.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("_d0"), F.col("_d1"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day"),
    )
    joined = spine.join(p, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            "value", F.last("v_obs", ignorenulls=True).over(w)
        )
        .withColumn("is_observed", F.col("v_obs").isNotNull())
        .select("user_id", "day", "value", "is_observed")
        .orderBy("user_id", "day")
    )


def t_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling mean/std of event values over the previous 10 rows per
    event type (ordered by ts, event_id) — the anomaly-scoring baseline.
    Sums accumulate as decimals (exact, order-free) and convert to
    double only for the mean/variance arithmetic, so both engines
    compute identical windows regardless of how the frame is slid."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    dv = F.col("value").cast("decimal(20,6)")
    s1 = F.sum(dv).over(w).cast("double")
    s2 = F.sum(dv * dv).over(w).cast("double")
    n = F.count("*").over(w).cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / n
    return e.select(
        "event_id",
        "event_type",
        F.round(mean, 6).alias("roll_mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("roll_std"),
        n.cast("int").alias("n_window"),
    ).orderBy("event_id")


def t_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: 5-minute bars per event type (open = first
    value by time, high/low, close = last) — the classic time-series
    rollup a metrics store serves. (event_type, ts) is deduped to the
    max value first so first/last are well-defined in both engines;
    open/close are exact selections (``min_by``/``max_by``), never
    float sums, so no rounding is needed anywhere.

    Scale shape: one pre-aggregation + one windowed aggregation, both
    partial-then-final (map-side combine); no joins, no windows over
    rows."""
    e = read_table(spark, sf_dir, "events")
    d = e.groupBy("event_type", "ts").agg(F.max("value").alias("v"))
    return (
        d.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.expr("min_by(v, ts)").alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.expr("max_by(v, ts)").alias("close"),
            F.count("*").alias("n_points"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_points",
        )
        .orderBy("bar_start", "event_type")
    )


def t_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per (5-minute window, event type) — the
    trending-items rollup. Two-phase at scale: the rank window
    partitions on (window, type), so no global sort; ties break on
    event_id for determinism."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.select(
            F.window("ts", "5 minutes").start.alias("window_start"),
            "event_type",
            "event_id",
            "value",
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("window_start", "event_type", "event_id", "value",
                F.col("rank").cast("bigint").alias("rank"))
        .orderBy("window_start", "event_type", "rank")
    )


def t_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day distinct active users (WAU) per window end.

    Rolling COUNT(DISTINCT) does not decompose into window frames
    (distinct sets don't subtract), so the exact distributed form
    dedups to (day, user) first, fans each pair out to the ≤7 window
    ends it belongs to — a BOUNDED explode, 7× the deduped pairs, not
    the raw events — and count-distincts per window end. Edge windows
    (first/last 6 days) cover partial weeks, identically in both
    engines."""
    e = read_table(spark, sf_dir, "events")
    du = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    fan = du.select(
        "day", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("_k")
    ).select(
        F.date_add(F.col("day"), F.col("_k")).alias("win_end"), "user_id"
    )
    return (
        fan.groupBy("win_end")
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("win_end")
    )


#: the spike pattern, z-normalized then rounded to 9 dp so BOTH
#: engines consume bit-identical literals (raw [0,0,0,1,1,0,0,0])
_SPIKE_Z = [
    -0.577350269, -0.577350269, -0.577350269,
    1.732050808, 1.732050808,
    -0.577350269, -0.577350269, -0.577350269,
]


def t_subseq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence similarity search (matrix-profile
    style): the 5 windows per event type whose SHAPE is closest to a
    spike pattern — scale/offset-invariant because both window and
    pattern are z-normalized. Windows form within (series, day)
    partitions via L-1 deterministic leads (never an unbounded
    per-series window); see operators.temporal.subsequence_topk."""
    from ..operators.temporal import subsequence_topk

    e = read_table(spark, sf_dir, "events")
    return subsequence_topk(e, _SPIKE_Z, k=5).orderBy("event_type", "rank")


def t_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-transition graph: edges are consecutive
    (prev event_type → event_type) steps per user in time order, edge
    weight = transition count — "which state do user journeys
    accumulate in", the Markov-stationary view of the funnel queries
    above. Deterministic 3-round damped iteration
    (operators.graph.pagerank — decimal-summed contributions, per-
    round rounding), so the oracle unrolls the same three rounds and
    matches bit-for-bit. At corpus scale the same operator ranks a
    host-level link graph for domain-reputation cuts (the Common
    Crawl harmonic-centrality pattern)."""
    from ..operators.graph import pagerank

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = e.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).where(F.col("src").isNotNull())
    edges = steps.groupBy("src", "dst").agg(F.count("*").alias("w"))
    return pagerank(
        edges, "src", "dst", weight_col="w", damping=0.85, n_iter=3
    ).orderBy(F.col("pagerank").desc(), "node")


SPARK_QUERIES = {
    "t_event_pagerank": t_event_pagerank,
    "t_subseq_search": t_subseq_search,
    "t_asof_join": t_asof_join,
    "t_asof_join_tolerance": t_asof_join_tolerance,
    "t_range_join": t_range_join,
    "t_scd2_intervals": t_scd2_intervals,
    "t_funnel_stages": t_funnel_stages,
    "t_retention_cohorts": t_retention_cohorts,
    "t_gap_fill": t_gap_fill,
    "t_rolling_stats": t_rolling_stats,
    "t_ohlc_bars": t_ohlc_bars,
    "t_windowed_topk": t_windowed_topk,
    "t_rolling_wau": t_rolling_wau,
}

_ERRORS = """
    SELECT user_id, ts, MAX(value) AS err_value
    FROM events WHERE event_type = 'error' GROUP BY user_id, ts
"""

ORACLE_SQL = {
    "t_event_pagerank": """
        WITH steps AS (
            SELECT user_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS src,
                   event_type AS dst
            FROM events
        ), edges AS (
            SELECT src, dst, COUNT(*) AS w
            FROM steps WHERE src IS NOT NULL GROUP BY src, dst
        ), nodes AS (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), outw AS (
            SELECT src, SUM(CAST(w AS DECIMAL(28,6))) AS ow
            FROM edges GROUP BY src
        ), nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (
            SELECT node, ROUND(CAST(1.0 AS DOUBLE) / n, 9) AS r
            FROM nodes CROSS JOIN nn
        ), c1 AS (
            SELECT e.dst AS node,
                   SUM(CAST(r.r * CAST(e.w AS DOUBLE)
                            / CAST(o.ow AS DOUBLE)
                            AS DECIMAL(38,18))) AS s
            FROM edges e JOIN r0 r ON e.src = r.node
                         JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ), r1 AS (
            SELECT nodes.node,
                   ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
                         + CAST(0.85 AS DOUBLE)
                           * COALESCE(CAST(c1.s AS DOUBLE), 0.0), 9) AS r
            FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node
        ), c2 AS (
            SELECT e.dst AS node,
                   SUM(CAST(r.r * CAST(e.w AS DOUBLE)
                            / CAST(o.ow AS DOUBLE)
                            AS DECIMAL(38,18))) AS s
            FROM edges e JOIN r1 r ON e.src = r.node
                         JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ), r2 AS (
            SELECT nodes.node,
                   ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
                         + CAST(0.85 AS DOUBLE)
                           * COALESCE(CAST(c2.s AS DOUBLE), 0.0), 9) AS r
            FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node
        ), c3 AS (
            SELECT e.dst AS node,
                   SUM(CAST(r.r * CAST(e.w AS DOUBLE)
                            / CAST(o.ow AS DOUBLE)
                            AS DECIMAL(38,18))) AS s
            FROM edges e JOIN r2 r ON e.src = r.node
                         JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ), r3 AS (
            SELECT nodes.node,
                   ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
                         + CAST(0.85 AS DOUBLE)
                           * COALESCE(CAST(c3.s AS DOUBLE), 0.0), 9) AS r
            FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.node = c3.node
        )
        SELECT node, r AS pagerank FROM r3 ORDER BY pagerank DESC, node
    """,
    "t_asof_join": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), errors AS ({_ERRORS})
        SELECT c.event_id, c.user_id, c.ts, e.err_value, e.ts AS matched_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    "t_asof_join_tolerance": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), errors AS ({_ERRORS})
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN e.ts >= c.ts - INTERVAL '3600 seconds'
                    THEN e.err_value END AS err_value,
               CASE WHEN e.ts >= c.ts - INTERVAL '3600 seconds'
                    THEN e.ts END AS matched_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    "t_range_join": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), errors AS ({_ERRORS})
        SELECT c.event_id, c.user_id, c.ts, e.ts AS err_ts, e.err_value
        FROM clicks c JOIN errors e
          ON c.user_id = e.user_id
         AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL '600 seconds'
    """,
    "t_scd2_intervals": """
        WITH p AS (
            SELECT user_id, ts, MAX(value) AS value FROM events
            WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT user_id, value,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   AS is_current
        FROM p
    """,
    "t_funnel_stages": """
        WITH s1 AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
            FROM events GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, ANY_VALUE(s1.first_view) AS first_view,
                   MIN(CASE WHEN e.event_type = 'click'
                             AND e.ts >= s1.first_view THEN e.ts END)
                       AS first_click
            FROM events e JOIN s1 USING (user_id)
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, ANY_VALUE(s2.first_view) AS first_view,
                   ANY_VALUE(s2.first_click) AS first_click,
                   MIN(CASE WHEN e.event_type = 'purchase'
                             AND e.ts >= s2.first_click THEN e.ts END)
                       AS first_purchase
            FROM events e JOIN s2 USING (user_id)
            GROUP BY e.user_id
        )
        SELECT user_id, first_view, first_click, first_purchase,
               CASE WHEN first_purchase IS NOT NULL THEN 3
                    WHEN first_click IS NOT NULL THEN 2
                    WHEN first_view IS NOT NULL THEN 1
                    ELSE 0 END AS stage
        FROM s3 ORDER BY user_id
    """,
    "t_retention_cohorts": """
        WITH signup AS (
            SELECT user_id,
                   date_trunc('week', MIN(ts)) AS cohort_week
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), act AS (
            SELECT s.cohort_week,
                   CAST(date_diff('day', s.cohort_week,
                        date_trunc('week', e.ts)) / 7 AS INTEGER)
                       AS weeks_since,
                   e.user_id
            FROM events e JOIN signup s USING (user_id)
        )
        SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, weeks_since,
               COUNT(DISTINCT user_id) AS n_active
        FROM act WHERE weeks_since >= 0
        GROUP BY cohort_week, weeks_since
        ORDER BY cohort_week, weeks_since
    """,
    "t_gap_fill": """
        WITH p AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   MAX(value) AS v_obs
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, date_trunc('day', ts)
        ), bounds AS (
            SELECT MIN(day) AS _d0, MAX(day) AS _d1 FROM p
        ), spine AS (
            SELECT u.user_id, CAST(gs.day AS TIMESTAMP) AS day
            FROM (SELECT DISTINCT user_id FROM p) u
            CROSS JOIN bounds
            CROSS JOIN LATERAL (
                SELECT unnest(generate_series(_d0, _d1,
                                              INTERVAL 1 DAY)) AS day
            ) gs
        ), joined AS (
            SELECT s.user_id, s.day, p.v_obs
            FROM spine s LEFT JOIN p
              ON s.user_id = p.user_id AND s.day = p.day
        )
        SELECT user_id, day,
               last_value(v_obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value,
               v_obs IS NOT NULL AS is_observed
        FROM joined
        ORDER BY user_id, day
    """,
    "t_rolling_stats": """
        WITH w AS (
            SELECT event_id, event_type,
                   CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER fr AS DOUBLE)
                       AS s1,
                   CAST(SUM(CAST(value AS DECIMAL(20,6))
                            * CAST(value AS DECIMAL(20,6))) OVER fr AS DOUBLE)
                       AS s2,
                   CAST(COUNT(*) OVER fr AS DOUBLE) AS n
            FROM events
            WINDOW fr AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, event_type,
               ROUND(s1 / n, 6) AS roll_mean,
               ROUND(SQRT(GREATEST((s2 - s1 * s1 / n) / n, 0.0e0)), 6)
                   AS roll_std,
               CAST(n AS INTEGER) AS n_window
        FROM w
        ORDER BY event_id
    """,
    # open/close via arg_min/arg_max over the (type, ts)-deduped points
    # — exact selections, engine-identical without rounding
    "t_ohlc_bars": """
        WITH d AS (
            SELECT event_type, ts, MAX(value) AS v
            FROM events GROUP BY event_type, ts
        )
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS bar_start,
               event_type,
               arg_min(v, ts) AS open,
               MAX(v) AS high,
               MIN(v) AS low,
               arg_max(v, ts) AS close,
               COUNT(*) AS n_points
        FROM d GROUP BY 1, 2 ORDER BY bar_start, event_type
    """,
    "t_windowed_topk": """
        SELECT window_start, event_type, event_id, value, rank FROM (
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
                   event_type, event_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY time_bucket(INTERVAL '5 minutes', ts),
                                    event_type
                       ORDER BY value DESC, event_id
                   ) AS rank
            FROM events
        ) WHERE rank <= 3
        ORDER BY window_start, event_type, rank
    """,
    # bounded fan-out: each distinct (day, user) feeds the 7 window
    # ends it belongs to; DATE + int adds days in DuckDB
    "t_rolling_wau": """
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                   user_id
            FROM events
        ), fan AS (
            SELECT day + CAST(k AS INTEGER) AS win_end, user_id
            FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS k)
        )
        SELECT win_end, COUNT(DISTINCT user_id) AS wau
        FROM fan GROUP BY win_end ORDER BY win_end
    """,
    # list_reduce is DuckDB's sequential left fold — the same
    # accumulation order as Spark's aggregate(), so the float sums are
    # bit-identical; pattern literals match _SPIKE_Z exactly
    "t_subseq_search": """
        WITH wins AS (
            SELECT event_type, event_id,
                   [value,
                    lead(value, 1) OVER w, lead(value, 2) OVER w,
                    lead(value, 3) OVER w, lead(value, 4) OVER w,
                    lead(value, 5) OVER w, lead(value, 6) OVER w,
                    lead(value, 7) OVER w] AS arr
            FROM events
            WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
                         ORDER BY ts, event_id)
        ), full_w AS (
            SELECT * FROM wins
            WHERE len(list_filter(arr, x -> x IS NULL)) = 0
        ), m AS (
            SELECT *, list_reduce(arr, (a, b) -> a + b) / 8 AS mean
            FROM full_w
        ), s AS (
            SELECT *, sqrt(list_reduce(list_transform(arr,
                       x -> (x - mean) * (x - mean)), (a, b) -> a + b) / 8)
                   AS std
            FROM m
        ), scored AS (
            SELECT event_type, event_id,
                   ROUND(list_reduce(list_transform(range(1, 9),
                       i -> (((arr[i] - mean) / std) - p[i])
                          * (((arr[i] - mean) / std) - p[i])),
                       (a, b) -> a + b), 9) AS dist
            FROM (SELECT *,
                    [-0.577350269, -0.577350269, -0.577350269,
                     1.732050808, 1.732050808,
                     -0.577350269, -0.577350269, -0.577350269] AS p
                  FROM s)
            WHERE std > 0
        ), ranked AS (
            SELECT event_type, event_id AS anchor_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY dist, event_id) AS rank
            FROM scored
        )
        SELECT event_type, anchor_id, dist, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5 ORDER BY event_type, rank
    """,
}
