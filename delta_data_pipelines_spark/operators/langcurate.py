"""Language-aware curation: per-language quality gates and a
per-language LM tail cut.

Published web-corpus pipelines gate PER LANGUAGE, not globally: CCNet
(Wenzek et al. 2020) buckets each language's pages by the perplexity
of a per-language LM and keeps the head/middle; RedPajama-v2 and
FineWeb-2 ship per-language threshold sets for the Gopher/C4 rule
families, because a stopword-density floor tuned for English rejects
most of any other language and a whitespace token window is
meaningless for Chinese. This module composes the engine's existing
signals (``operators.textstats``) into that shape:

- :data:`DEFAULT_LANG_GATES` — per-language thresholds for the four
  Gopher-style gate signals, with a ``default`` fallback row.
- :func:`lang_gate` — one narrow projection computing the signals +
  predicted language, one broadcast join against the tiny threshold
  table, one WHERE. No shuffle beyond the broadcast.
- :func:`lang_lm_scores` — per-language unigram log-prob (the corpus
  LM is fit WITHIN each language: token frequencies grouped by
  (lang, token), totals per language via a grouped partial aggregate
  broadcast back onto the frequency table — never a per-language
  window sort, never a driver count, never a cross join of the
  corpus).
- :func:`lang_lm_tail_cut` — drop each language's worst ``tail``
  fraction by mean log-prob (the CCNet tail bucket), exact-rank form,
  deterministic via a doc-id tiebreak (bounded reports; this is what
  the oracle checks).
- :func:`lang_lm_threshold_cut` — the corpus-scale form of the same
  cut: per-language percentile floor (partial-agg over a 3-dp
  quantized score, broadcast back), never a per-language window sort.

Scale shape: the gate is map-only + one broadcast; the LM is one
(lang, token) partial-agg shuffle over the exploded corpus. The
threshold table is O(languages), the frequency table O(vocabulary);
the curation-path cut (threshold form) adds one bounded aggregate.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import textstats
from .staging import stage

# (min_tokens, max_tokens, max_dup_ratio, max_top_bigram, min_quality)
# The non-English rows relax the quality floor (its stopword component
# is English-only) and zh relaxes the token window (whitespace tokens
# under-count CJK). 'default' covers 'und' and any unlisted language.
# zh is reachable via the heuristic router: marker_score falls back to
# marker-CHAR counting for space-free scripts (unsegmented Chinese
# never matches whole whitespace tokens), so zh routing does not
# require an external lang label.
DEFAULT_LANG_GATES: dict[str, tuple[int, int, float, float, float]] = {
    "en": (10, 10000, 0.55, 0.20, 0.40),
    "es": (10, 10000, 0.60, 0.25, 0.30),
    "de": (10, 10000, 0.60, 0.25, 0.30),
    "fr": (10, 10000, 0.60, 0.25, 0.30),
    "zh": (5, 20000, 0.70, 0.30, 0.15),
    "default": (10, 10000, 0.50, 0.20, 0.35),
}

_GATE_COLS = (
    "min_tokens",
    "max_tokens",
    "max_dup_ratio",
    "max_top_bigram",
    "min_quality",
)


def gate_signals(text: Column) -> dict[str, Column]:
    """The four gate signals, UNROUNDED where thresholds compare raw
    (dup/top-bigram) and 9-dp-rounded where the shared definition is
    rounded (quality) — exactly the td_gopher_filter discipline, so a
    threshold can never flip a row between engines."""
    return {
        "n_tokens": textstats.token_count_ws(text),
        "_dup": textstats._dup_token_ratio_raw(text),
        "_topbg": textstats._top_bigram_ratio_raw(text),
        "quality": textstats.quality_score(text),
    }


def join_thresholds(
    df: DataFrame,
    lang_col: str,
    gates: dict[str, tuple[int, int, float, float, float]] | None = None,
) -> tuple[DataFrame, dict[str, Column]]:
    """Broadcast-join the per-language threshold table onto ``df`` by
    ``lang_col`` and return ``(joined, thresholds)`` where each
    threshold column is coalesced with the ``default`` row's value —
    the ONE place the threshold-routing semantics live, shared by the
    oracle-facing :func:`lang_gate` and the curation job's
    full-row gate so the two can never drift. Callers apply their
    keep predicate and then drop ``_GATE_COLS``."""
    gates = gates or DEFAULT_LANG_GATES
    if "default" not in gates:
        raise ValueError("gates must include a 'default' fallback row")
    clash = set(_GATE_COLS) & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has threshold column(s) {sorted(clash)}; "
            "rename them before joining the gates table"
        )
    gdf = df.sparkSession.createDataFrame(
        [
            (l, *(float(x) for x in v))
            for l, v in gates.items()
            if l != "default"
        ],
        f"{lang_col} string, "
        + ", ".join(f"{c} double" for c in _GATE_COLS),
    )
    dflt = gates["default"]
    joined = df.join(F.broadcast(gdf), lang_col, "left")
    th = {
        c: F.coalesce(F.col(c), F.lit(float(dflt[i])))
        for i, c in enumerate(_GATE_COLS)
    }
    return joined, th


def gate_keep_expr(
    th: dict[str, Column],
    n_tokens: Column,
    dup: Column,
    topbg: Column,
    quality: Column,
) -> Column:
    """The four-way gate predicate against a row's (possibly
    coalesced) thresholds — shared by every caller of
    :func:`join_thresholds`."""
    return (
        n_tokens.between(th["min_tokens"], th["max_tokens"])
        & (dup <= th["max_dup_ratio"])
        & (topbg <= th["max_top_bigram"])
        & (quality >= th["min_quality"])
    )


def lang_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str | None = None,
    gates: dict[str, tuple[int, int, float, float, float]] | None = None,
    keep_cols: tuple[str, ...] = (),
    flag_col: str | None = None,
) -> DataFrame:
    """Per-language Gopher-style quality gate.

    ``lang_col=None`` routes on the heuristic
    :func:`textstats.lang_id` prediction (the scale posture: gold
    labels don't exist on a crawl); pass a column name to route on an
    existing label. Unlisted languages fall back to the ``default``
    thresholds via a left join + coalesce, so arbitrary lang values
    are safe.

    Returns kept rows: (id, ``keep_cols``..., lang, n_tokens,
    dup_token_ratio, top_bigram_ratio, quality) — ratios rounded to
    9 dp for display, thresholds applied on the unrounded values.
    ``flag_col`` keeps EVERY row and emits the verdict as a boolean
    column instead — the shape a funnel report wants, so one staged
    signal pass can feed both the per-language totals and the kept
    set without recomputing the signals per consumer.
    """
    reserved = {"lang", "n_tokens", "dup_token_ratio", "top_bigram_ratio",
                "quality"}
    clash = reserved & set(keep_cols)
    if clash:
        raise ValueError(
            f"keep_cols {sorted(clash)} collide with the gate's output "
            "columns; alias them in a prior select"
        )
    t = F.col(text_col)
    lang = F.col(lang_col) if lang_col else textstats.lang_id(t)
    sig = df.select(
        id_col,
        *keep_cols,
        lang.alias("lang"),
        *[c.alias(n) for n, c in gate_signals(t).items()],
    )
    joined, th = join_thresholds(sig, "lang", gates)
    keep = gate_keep_expr(
        th,
        F.col("n_tokens"),
        F.col("_dup"),
        F.col("_topbg"),
        F.col("quality"),
    )
    out_cols = [
        id_col,
        *keep_cols,
        "lang",
        "n_tokens",
        F.round("_dup", 9).alias("dup_token_ratio"),
        F.round("_topbg", 9).alias("top_bigram_ratio"),
        "quality",
    ]
    if flag_col is not None:
        return joined.select(*out_cols, keep.alias(flag_col))
    return joined.where(keep).select(*out_cols)


def lang_lm_scores(
    df: DataFrame, id_col: str, text_col: str, lang_col: str = "lang"
) -> DataFrame:
    """Per-doc mean unigram log-prob under the document's OWN
    language's unigram distribution — the per-language analogue of
    :func:`textstats.unigram_logprob_scores`, with the ln quantized at
    6 dp (not 9): the tail cut ORDERS on this score, and the unigram
    precedent showed engines' libm can disagree on ln's 9th decimal —
    at 6 dp the ~1e-15 ulp leaves no flip room against the 5e-7 half
    boundary. DECIMAL sum (associative), one final float division.

    The frequency table is grouped by (lang, token); each language's
    total is a ``groupBy(lang)`` partial aggregate broadcast back onto
    the frequency table — an O(languages) table, the frozen-model
    shape (``jobs/incremental_curate.py``). A window partitioned by
    language would put one web-scale language's whole vocabulary
    (1e8+ distinct tokens at 100 TB) through a single task's sort;
    the grouped sum is map-side-combined and the join is a broadcast,
    so no task ever holds a language's vocabulary. Sums are identical
    either way, so scores (and the td_lang_keep_rate oracle hash) are
    unchanged. No language's model sees another's tokens and nothing
    touches the driver. Output: (id, lang, n_tokens, avg_logprob)."""
    toks = df.select(
        id_col,
        F.col(lang_col).alias("_lang"),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    )
    # freq has TWO consumers (the per-language totals agg and the
    # score join): unstaged, each would replay the corpus explode +
    # grouped count (measured: the td_lang_keep_rate pass went 2.2s
    # -> ~3s when this was first rewritten without the stage). The
    # table is vocabulary-sized; r15 moved the persist to the staged
    # eager checkpoint (the r14 non-reuse finding: a persist keeps
    # lineage, so the totals' broadcast build and the score join race
    # the first materialization and can both replay the explode; the
    # checkpoint materializes exactly once, and the staging.dir conf
    # swaps in the written-table form — this IS the frozen per-lang
    # LM table the curation jobs store).
    freq = stage(
        toks.groupBy("_lang", "_tok").agg(F.count("*").alias("_tf")),
        "lang_freq",
    )
    lang_totals = freq.groupBy("_lang").agg(F.sum("_tf").alias("_total"))
    totals = freq.join(F.broadcast(lang_totals), "_lang")
    return (
        toks.join(totals, ["_lang", "_tok"])
        .withColumn(
            "_lp",
            F.round(
                F.log(F.col("_tf").cast("double") / F.col("_total")), 6
            ).cast("decimal(28,6)"),
        )
        .groupBy(id_col, "_lang")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum("_lp").cast("double") / F.count("*")).alias("avg_logprob"),
        )
        .withColumnRenamed("_lang", "lang")
    )


def lang_lm_tail_cut(
    scores: DataFrame,
    id_col: str,
    lang_col: str = "lang",
    score_col: str = "avg_logprob",
    tail: float = 0.1,
) -> DataFrame:
    """Drop each language's worst ``tail`` fraction by LM score — the
    CCNet tail bucket, EXACT form: keep rows whose ascending
    (score, id) rank fraction ``rn / n`` exceeds ``tail``. With the
    total tiebreak this IS cume_dist — written as
    ROW_NUMBER + COUNT-over (and a single identical float division in
    both engines) because those constructs hold driver-green
    precedent while cume_dist would be a first use, the risk class
    that kept the unigram pair red for three rounds. A language's
    single document keeps (1/1 > tail) where percent_rank's 0.0 would
    spuriously drop it; ties are deterministic and oracle-exact.

    Scale caveat: the window partitions by language, so one dominant
    language is ONE task's sort — exact and fine at report scale
    (this is what the oracle-checked td_lang_keep_rate runs), but a
    100 TB curation pass should use
    :func:`lang_lm_threshold_cut` instead, whose per-language
    percentile partial-aggregates and broadcasts (the
    lm_filter_stage posture; no per-language global sort)."""
    w = Window.partitionBy(lang_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    n = Window.partitionBy(lang_col)
    return (
        scores.withColumn(
            "_cd",
            F.row_number().over(w)
            / F.count("*").over(n).cast("double"),
        )
        .where(F.col("_cd") > F.lit(tail))
        .drop("_cd")
    )


def lang_lm_threshold_cut(
    scores: DataFrame,
    lang_col: str = "lang",
    score_col: str = "avg_logprob",
    tail: float = 0.1,
    quantize_dp: int | None = 3,
) -> DataFrame:
    """Scalable form of the per-language tail cut: each language's
    keep floor is its own ``tail`` percentile of the LM score —
    computed as a partial-aggregating GROUP BY (never a per-language
    window sort: one dominant language would otherwise be a single
    task at corpus scale) and re-entered as a broadcast join. Ties AT
    the floor are kept (``>=``), matching lm_filter_stage's global
    rule; the exact-rank semantics (strict fraction, id tiebreak)
    belong to :func:`lang_lm_tail_cut`.

    ``quantize_dp`` bounds the aggregation state: Spark's exact
    ``percentile`` buffers a value→count map, and raw per-doc scores
    are near-all-distinct — O(docs-per-language) map entries at
    corpus scale, the blow-up this form exists to avoid. The floor is
    therefore computed over the score ROUNDED to ``quantize_dp``
    decimals (mean log-probs live in roughly [-40, 0], so 3 dp keeps
    the map ≤ ~40k entries per language) while the keep compare stays
    on the raw score — the floor moves by < 10^-quantize_dp, a
    sub-noise shift in a heuristic cut, and the result remains
    deterministic (unlike approx_percentile, whose t-digest merge
    order follows partitioning). ``None`` disables quantization for
    bounded inputs that want the exact percentile."""
    floor_src = (
        F.col(score_col)
        if quantize_dp is None
        else F.round(F.col(score_col), quantize_dp)
    )
    thr = scores.groupBy(lang_col).agg(
        F.percentile(floor_src, F.lit(tail)).alias("_thr")
    )
    return (
        scores.join(F.broadcast(thr), lang_col)
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )
