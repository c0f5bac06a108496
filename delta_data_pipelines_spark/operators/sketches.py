"""Mergeable cardinality sketches for corpus-scale distinct counts.

``COUNT(DISTINCT token)`` over a 100 TB corpus shuffles every distinct
value; Spark's built-in ``approx_count_distinct`` (HLL++) avoids that
but its register layout is engine-private — no cross-engine oracle can
check it. The KMV (k-minimum-values) sketch gives both: keep the k
smallest *portable* hash values (md5 is bit-identical in Spark, DuckDB,
Postgres, …) and estimate distinct = (k-1) / kth_smallest_normalized.

Properties that matter at 100 TB:
- sketches MERGE: bottom-k of a union = bottom-k of the concatenated
  bottom-ks, so per-partition / per-day sketches roll up without
  touching raw data (:func:`kmv_sketch` is that form — the shuffle
  carries one k-element array per (partition, group), never the
  distinct values themselves);
- the estimate is deterministic (no seed), so an oracle recomputes it
  exactly — unlike HLL, sampling, or anything seeded per-run.

The reference has no sketches (its largest distinct count fit in one
MongoDB index scan — mongodb_utils.py:21-36); this is north-star
surface for the LLM-corpus use case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import md5_hash64

_HASH_SPACE = float(2**32)


def portable_hash(c: Column) -> Column:
    """Uniform bigint in [0, 2^32) — the single shared portable-hash
    expression (``sampling.md5_hash64``); one definition so the sketch
    and the sampling buckets can never drift from their oracles."""
    return md5_hash64(c)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Dedups (group, value), hashes each distinct value portably, keeps
    the k smallest per group (ties broken on the value for
    determinism), and estimates distinct = (k-1) · 2³² / kth_hash.
    Groups with fewer than k distinct values short-circuit to the exact
    count (the standard KMV small-set rule).

    Output: group cols + ``n_exact`` (exact distinct), ``kth_hash``
    (the sketch boundary, null for small groups) and ``n_est`` (the
    estimate). This form carries the exact count next to the sketch so
    correctness checks and recall tests can measure the estimator's
    error on real data; it shuffles the distinct (group, value) pairs
    to do so. The production path at 100 TB is :func:`kmv_sketch`,
    whose shuffle carries only k-element arrays.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    distinct = df.select(*group_cols, value_col).distinct()
    hashed = distinct.select(
        *group_cols, portable_hash(F.col(value_col)).alias("_h"), value_col
    )
    w = Window.partitionBy(*group_cols).orderBy("_h", value_col)
    ranked = hashed.withColumn("_rn", F.row_number().over(w))
    per_group = ranked.groupBy(*group_cols).agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("kth_hash"),
    )
    est = F.when(
        F.col("n_exact") >= k,
        F.round(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth_hash"), 6
        ),
    ).otherwise(F.col("n_exact").cast("double"))
    return per_group.withColumn("n_est", est)


def bottom_k(arr: Column, k: int) -> Column:
    """Ascending k smallest of an array — the KMV merge primitive.
    ONE definition shared by the sketch builders here and the streaming
    state merge (streaming.sketch_state.merge_sketches): the stored-
    sketch-equals-batch-sketch invariant depends on both sides using
    bit-identical merge math."""
    return F.slice(F.array_sort(arr), 1, k)


def kmv_estimate(sketch: Column, k: int) -> Column:
    """Distinct-count estimate from a bottom-k sketch: (k-1)·2³²/kth,
    exact count when the sketch holds fewer than k hashes. Shared by
    kmv_sketch and the streaming merge for the same reason as
    :func:`bottom_k`."""
    kth = F.element_at(sketch, k)
    return F.when(
        F.size(sketch) >= k,
        F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth, 6),
    ).otherwise(F.size(sketch).cast("double"))


_bottom_k = bottom_k  # internal alias kept for the builders below


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group mergeable KMV sketch — the 100 TB form.

    Two-phase, all JVM-native: (1) per input partition, dedup values
    locally and keep the k smallest hashes as ONE array per
    (partition, group) — the only rows that reach the shuffle; (2)
    merge arrays per group by concat → sort → slice (associative, so
    any tree of merges gives the identical sketch). Duplicate values
    across partitions collapse on merge because equal values hash
    equally (``array_distinct`` after concat).

    Output: group cols + ``sketch`` (ascending bottom-k hash array) +
    ``n_est``. The estimate equals :func:`kmv_distinct`'s whenever the
    group has ≥ k distinct values (asserted in tests); below k the
    sketch holds all distinct hashes and the estimate is their count
    (exact up to md5 collisions).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = df.select(
        *group_cols, portable_hash(F.col(value_col)).alias("_h")
    )
    partial = (
        hashed.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", *group_cols)
        .agg(_bottom_k(F.collect_set("_h"), k).alias("_bk"))
    )
    merged = partial.groupBy(*group_cols).agg(
        _bottom_k(
            F.array_distinct(F.flatten(F.collect_list("_bk"))), k
        ).alias("sketch")
    )
    return merged.withColumn("n_est", kmv_estimate(F.col("sketch"), k))


def binned_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 100,
) -> DataFrame:
    """Fixed-bin histogram per group over KNOWN bounds — the mergeable
    quantile sketch (sk_binned_quantiles' building block): two
    histograms over the same (lo, hi, bins) geometry merge by ADDING
    counts, so per-partition / per-day histograms roll up without
    touching raw data, exactly like the KMV bottom-k arrays.

    Bounds are parameters (not computed here) because mergeability
    requires every participant to share the bin geometry; compute them
    once upstream or use domain constants. Values outside [lo, hi]
    clamp into the edge bins.

    Output: group cols + ``bucket`` (1-based) + ``n``.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    bucket = bucket_expr(F.col(value_col), F.lit(lo), F.lit(hi), bins)
    return (
        df.withColumn("bucket", bucket.cast("bigint"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("n"))
    )


def bucket_expr(v: Column, lo: Column, hi: Column, bins: int) -> Column:
    """The ONE fixed-bin bucket expression (1-based, edge-clamped),
    shared by :func:`binned_histogram` and the oracle-checked
    sk_binned_quantiles query so the bin math can never drift from
    what the oracle mirrors. ``floor((v-lo)·bins/(hi-lo)) + 1``,
    clamped into [1, bins]."""
    raw = F.floor((v - lo) * bins / (hi - lo)) + 1
    return F.greatest(F.least(raw, F.lit(bins)), F.lit(1))


def quantile_from_histogram(
    hist: DataFrame, group_cols: list[str], ps: list[float], lo: float, hi: float,
    bins: int = 100,
) -> DataFrame:
    """Quantile estimates from a (possibly merged) binned histogram:
    the upper edge of the first bucket whose cumulative fraction
    reaches p. Error ≤ one bin width. Runs over the tiny histogram
    table (groups × bins rows), never the raw data."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    w_cum = Window.partitionBy(*group_cols).orderBy("bucket")
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.withColumn("_cum", F.sum("n").over(w_cum)).withColumn(
        "_tot", F.sum("n").over(w_tot)
    )
    p_df = spark.createDataFrame([(float(p),) for p in ps], "p double")
    return (
        cum.crossJoin(F.broadcast(p_df))
        .where(F.col("_cum") >= F.col("p") * F.col("_tot"))
        .groupBy(*group_cols, "p")
        .agg(F.min("bucket").alias("_qb"))
        .withColumn(
            "q_est",
            F.round(F.lit(lo) + F.col("_qb") * F.lit((hi - lo)) / bins, 6),
        )
        .drop("_qb")
    )


def misra_gries_candidates(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries — the
    bounded-memory heavy-hitter candidate pass.

    Each partition keeps at most ``k-1`` counters regardless of how
    many distinct items stream through it (the mergeable-summaries
    bound, Agarwal et al. PODS'12: per-batch exact counts fold into
    the summary; when it overflows, every counter drops by the k-th
    largest and non-positives are evicted — total undercount ≤ n_p/k).
    Guarantee the exact pass relies on: any item with GLOBAL frequency
    > n/k has per-partition frequency > n_p/k in at least one
    partition (pigeonhole), and that partition's summary retains it —
    so the union of partition summaries is a superset of every true
    heavy hitter. Arrow-batched (mapInPandas); per-batch counting is
    vectorized ``value_counts``, only the ≤ k-1-entry fold is Python.

    Output: (item, mg_count) — mg_count is a LOWER bound on the
    partition-local frequency, for diagnostics; the exact verify pass
    recomputes true counts.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(F.col(item_col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k - 1:
                kth = sorted(counters.values(), reverse=True)[k - 1]
                counters = {
                    i: c - kth for i, c in counters.items() if c - kth > 0
                }
        yield pd.DataFrame(
            {"item": list(counters), "mg_count": list(counters.values())}
        ).astype({"item": "string", "mg_count": "int64"})

    return src.mapInPandas(summarize, "item string, mg_count bigint")


def heavy_hitters_exact(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """EXACT heavy hitters (frequency > n/k) at bounded memory — the
    two-pass pattern that replaces a full-distinct groupBy when the
    item domain is enormous (corpus tokens at 100 TB): (1) Misra-Gries
    candidate summaries per partition — a provable superset of the
    answer in ≤ (k-1)·partitions rows; (2) exact counts for the
    candidate set only (left-semi prune, then a partial-aggregable
    groupBy over the surviving rows), filtered by the true threshold.
    The result is exactly the naive groupBy-filter answer (tests and
    the sk_heavy_hitters oracle pin this), but the wide aggregation
    only ever sees candidate items.

    Output: (item, cnt) for every item with cnt > n/k.
    """
    items = df.select(F.col(item_col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )
    cand = misra_gries_candidates(df, item_col, k).select("item").distinct()
    tot = items.agg(F.count("*").alias("_n"))
    return (
        items.join(cand, "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") > F.col("_n") / k)
        .select("item", "cnt")
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimates between groups from KMV sketches
    — distinct-value union, intersection, and Jaccard for every group
    pair WITHOUT ever joining the raw values.

    The estimator (Beyer et al., SIGMOD'07 "On synopses for distinct-
    value estimation"): for groups A and B with bottom-k sketches
    S_A, S_B,

    - ``merged`` = bottom-k of S_A ∪ S_B  — a valid KMV sketch of
      A ∪ B (bottom-k of a union = bottom-k of the concatenated
      bottom-ks), so ``n_union_est`` = (k-1)·2³²/kth as usual;
    - ρ̂ = |merged ∩ S_A ∩ S_B| / |merged| is an unbiased Jaccard
      estimate (every member of ``merged`` is a uniform sample of
      A ∪ B, and it lies in the intersection iff both sketches hold
      it);
    - ``n_inter_est`` = ρ̂ · n_union_est.

    100 TB posture: the pair table is |groups|² rows of k-element
    arrays — group count is small (sources, languages, shards) even
    when the value space is billions, and the raw values are touched
    exactly once (sketch build, :func:`kmv_sketch`'s two-phase
    partial-agg shape). Everything downstream of the sketches is
    arithmetic on k-element arrays. Deterministic (portable md5, no
    seed), so an oracle recomputes every estimate bit-for-bit.

    Output: (group_a, group_b) for group_a < group_b, with
    ``n_union_est``, ``jaccard_est`` (ratio of ints, rounded 9) and
    ``n_inter_est`` (rounded 6). Groups whose union holds < k distinct
    hashes short-circuit to exact counts (the standard KMV small-set
    rule, inherited from :func:`kmv_estimate`).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    sk = kmv_sketch(df, [group_col], value_col, k=k).select(
        group_col, "sketch"
    )
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("_sa")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("_sb")
    )
    merged = _bottom_k(F.array_distinct(F.concat("_sa", "_sb")), k)
    pairs = a.join(
        F.broadcast(b), F.col("group_a") < F.col("group_b")
    ).withColumn("_merged", merged)
    common = F.size(
        F.array_intersect(F.col("_merged"), F.array_intersect("_sa", "_sb"))
    )
    union_est = kmv_estimate(F.col("_merged"), k)
    jacc = common / F.size("_merged")
    return pairs.select(
        "group_a",
        "group_b",
        union_est.alias("n_union_est"),
        F.round(jacc, 9).alias("jaccard_est"),
        F.round(jacc * union_est, 6).alias("n_inter_est"),
    )


def cm_sketch(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05): d×w counters
    answering point frequency queries with one-sided error — the
    estimate never undercounts, and overcounts by ≤ n/w per row with
    probability 1-(1/2)^d under the min.

    Complements the family: KMV answers "how many distinct", Misra-
    Gries "which items are frequent", CM "how frequent is THIS item"
    — without carrying the item space. Like the others it MERGES (two
    sketches over the same (d, w) geometry add cell-wise, so
    per-partition / per-day sketches roll up by addition, exactly
    like binned_histogram) and is hash-DETERMINISTIC: row i's bucket
    is portable-md5 of "i:item", so an oracle recomputes every cell
    and every estimate bit-for-bit — impossible with seeded
    murmur-based CM implementations.

    Output: (row, bucket, cnt), at most d·w rows however large the
    input — the shuffle carries counters, never items.
    """
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    items = df.select(F.col(item_col).cast("string").alias("_it")).where(
        F.col("_it").isNotNull()
    )
    rows_df = items.sparkSession.range(d).select(
        F.col("id").cast("int").alias("row")
    )
    return (
        items.crossJoin(F.broadcast(rows_df))
        .select(
            "row",
            (
                portable_hash(
                    F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_it"))
                )
                % w
            ).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point frequency estimates from a (possibly merged) CM sketch:
    min over the d rows of the item's counter. Runs over the tiny
    counter table (≤ d·w rows, broadcast) — the probe set never
    touches the data the sketch summarized.

    Output: (item, n_est). Items hashing to untouched counters
    estimate 0 (counter absent → coalesce), preserving the
    never-undercount guarantee."""
    probes = (
        items.select(F.col(item_col).cast("string").alias("item"))
        .distinct()
        .crossJoin(
            F.broadcast(
                items.sparkSession.range(d).select(
                    F.col("id").cast("int").alias("row")
                )
            )
        )
        .select(
            "item",
            "row",
            (
                portable_hash(
                    F.concat(F.col("row").cast("string"), F.lit(":"), F.col("item"))
                )
                % w
            ).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("n_est"))
    )


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. '07) on the portable
    hash — the fixed-size counterpart of the KMV sketch: ``m``
    registers per group regardless of k or cardinality, merging by
    per-register MAX (associative/idempotent — replay-safe, unlike
    the additive CM merge).

    Register math is INTEGER/STRING only, so both engines agree
    exactly: j = h mod m, w = h div m (the remaining 32-lg(m) bits),
    rho = 1 + leading zeros of w = (32 - lg(m) + 1) - bitlength(w) —
    bitlength computed as the length of the binary-string rendering
    (``conv``/``bin``), never floor(log2(double)) whose rounding
    could differ per engine at power-of-two boundaries.

    Output: group cols + (j, mx) — only TOUCHED registers (absent row
    = register 0); ≤ m rows per group reach the shuffle."""
    if m < 16 or (m & (m - 1)) != 0:
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    width = 32 - (m.bit_length() - 1)  # bits in w
    h = portable_hash(F.col(value_col))
    j = (h % m).cast("int")
    w = F.floor(h / m).cast("bigint")  # exact: h < 2^32
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.conv(w, 10, 2))
    )
    return (
        # NULL values carry no register (a NULL hash would otherwise
        # form a phantom (j NULL, mx NULL) row that inflates the
        # estimate's register count)
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, j.alias("j"), rho.cast("int").alias("_rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("_rho").alias("mx"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    m: int = 256,
) -> DataFrame:
    """Cardinality estimate from (possibly merged) HLL registers:
    E = alpha_m·m²/Σ2^(-M_j), with the standard small-range linear
    counting correction (E ≤ 2.5m and empty registers exist →
    m·ln(m/V)). Runs over the register table only (≤ m rows/group).

    Determinism note: the 2^(-M_j) terms are exact binary fractions
    whose sum fits the double mantissa at m ≤ 4096, so the partial-agg
    order cannot change the sum; alpha is spelled as the SAME
    arithmetic expression both engines evaluate (never a pre-rounded
    literal). ``n_est`` rounds to 6."""
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("_s_touched"),
        F.count("*").alias("_r"),
    )
    s = F.col("_s_touched") + (F.lit(m) - F.col("_r")).cast("double")
    v = (F.lit(m) - F.col("_r")).cast("double")
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return per_group.select(
        *group_cols, F.round(est, 6).alias("n_est")
    )
