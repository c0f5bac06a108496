"""Unigram-LM tokenizer (SentencePiece-style, Kudo '18) — the second
tokenizer family next to BPE (operators/bpe.py): pieces carry
log-probabilities and a word's tokenization is the VITERBI-best
segmentation under them, rather than a greedy merge replay.

Same scale discipline as the BPE pair: everything runs over the
DISTINCT-WORD vocabulary (corpus reduces once to (word, n)), the
corpus itself is only ever touched by a broadcast join back — so the
cost of candidate extraction, Viterbi and refitting follows the
vocabulary, not the token stream. All math is native Spark
expressions (substring explodes, per-word lookup maps, one
``F.aggregate`` fold per DP direction): no UDFs anywhere, and every
step is deterministic with pinned tie-breaks, so a DuckDB oracle
recomputes segmentations exactly (recursive-CTE DP, the same
smallest-piece-wins tie rule).

The DP itself runs in SCALED INTEGERS: each piece's 6-decimal
log-probability becomes ``round(logp * 1e6)`` as a BIGINT, so every
prefix score is an exact integer sum and the back-pointer selection
(``best == candidate``) is exact integer equality — no float-
equality control flow anywhere, which is what makes the recursive-
CTE oracle engine-version-proof (float ``greatest``/CASE chains are
sensitive to evaluation order; 64-bit integer adds are not). The
6-dp quantization of ``ln`` is itself libm-proof: an ulp of ``ln``
at |x| ≤ 60 is ~7e-15, five orders of magnitude below a 6-dp
half-boundary (5e-7), so no cross-version libm difference can flip
a piece's integer score (at 9 dp the margin was only ~1e5× and a
near-boundary value DID flip between engines). Scores stay tiny for
the representation: |logp| ≤ 60 → ≤ 6e7 per piece, words are
bounded by max_len · pieces, so sums sit far below 2^63 (and below
2^53, so the final ``/ 1e6`` division back to a double is exact
too).

The training loop here is HARD-EM, one round per call
(:func:`unigram_refit`): segment every word under the current piece
probabilities, recount pieces by their Viterbi usage (weighted by
word frequency), re-normalize with add-one smoothing over the fixed
inventory. Classic SentencePiece runs soft-EM with subword-lattice
expectations and prunes the inventory on loss deltas; hard-EM with a
fixed inventory keeps every step exactly recomputable cross-engine
(the same determinism trade the BPE trainer makes, bpe.py:1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NEG = -(10**18)  # -inf sentinel, BIGINT (scores are logp·1e6 sums)
_NEG_GATE = -(10**17)  # "was reachable" test (real scores ≥ -6e10)


def _substr_explode(
    words: DataFrame, word_col: str, max_len: int, keep_pos: bool
) -> DataFrame:
    """One row per (word, start, len<=max_len) substring — the shared
    enumeration for candidate counting and Viterbi lookup tables."""
    pos = F.explode(
        F.expr(
            f"flatten(transform(sequence(1, length({word_col})), "
            f"s -> transform(sequence(1, least({max_len}, "
            f"length({word_col}) - s + 1)), l -> struct(s, l))))"
        )
    ).alias("_sl")
    out = words.select("*", pos)
    sel = [F.col(c) for c in words.columns] + [
        F.col(word_col).substr(F.col("_sl.s"), F.col("_sl.l")).alias("piece")
    ]
    if keep_pos:
        sel += [
            (F.col("_sl.s") + F.col("_sl.l") - 1).cast("int").alias("pos_end"),
            F.col("_sl.l").cast("int").alias("l"),
        ]
    return out.select(*sel)


def unigram_candidates(
    vocab: DataFrame,
    word_col: str = "word",
    n_col: str = "n",
    max_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Candidate piece inventory: every substring (length ≤ max_len)
    of every vocabulary word, counted once per occurrence position and
    weighted by the word's corpus frequency. Pieces below ``min_count``
    are dropped EXCEPT single characters — they stay unconditionally
    so every word remains segmentable (the coverage floor).

    Output: (piece, cnt)."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    subs = _substr_explode(
        vocab.select(word_col, n_col), word_col, max_len, keep_pos=False
    )
    counts = subs.groupBy("piece").agg(F.sum(n_col).alias("cnt"))
    return counts.where(
        (F.length("piece") == 1) | (F.col("cnt") >= min_count)
    )


def piece_logprobs(cands: DataFrame, cnt_col: str = "cnt") -> DataFrame:
    """(piece, cnt, logp): unigram log-probabilities over the
    inventory — ln(cnt / total), total as an exact decimal 1-row
    broadcast aggregate, per-piece result rounded to 6 (both engines
    compute the identical double: the 6-dp grid leaves ~5 orders of
    magnitude between a libm ulp and the nearest half-boundary, so
    the rounding can never flip cross-engine — see module doc)."""
    total = cands.agg(
        F.sum(F.col(cnt_col).cast("decimal(28,0)")).alias("_tot")
    )
    return cands.crossJoin(F.broadcast(total)).select(
        "piece",
        F.col(cnt_col).alias("cnt"),
        F.round(
            F.log(
                F.col(cnt_col).cast("double") / F.col("_tot").cast("double")
            ),
            6,
        ).alias("logp"),
    )


def _dp_fold(word: Column, maps: list[Column]) -> Column:
    """The forward Viterbi fold: best[p+1] = best score of a
    segmentation of word[1..p] (best[1] = 0 at position 0), back[p+1]
    = the chosen last-piece length. Ties break to the SHORTEST piece
    (the CASE order — pinned, and mirrored in the oracle's DP).

    Scores are BIGINT (logp·1e6), so ``best_i == cands[l-1]`` is
    exact integer equality — the back-pointer can never flip on an
    engine's float evaluation order."""
    n = F.length(word)
    init = F.struct(
        F.array(F.lit(0).cast("long")).alias("best"),
        F.array(F.lit(0)).alias("back"),
    )

    def step(acc, i):
        cands = []
        for idx, m in enumerate(maps):
            l = idx + 1
            prev = F.try_element_at(
                acc["best"], F.greatest(i - l + 1, F.lit(1))
            )
            lp = F.try_element_at(m, i)
            cands.append(
                F.when(
                    (i >= l) & lp.isNotNull() & (prev > F.lit(_NEG_GATE)),
                    prev + lp,
                ).otherwise(F.lit(_NEG).cast("long"))
            )
        best_i = F.greatest(*cands) if len(cands) > 1 else cands[0]
        back_i = F.lit(0)
        for l in range(len(maps), 0, -1):
            back_i = F.when(
                (best_i > F.lit(_NEG_GATE)) & (best_i == cands[l - 1]),
                F.lit(l),
            ).otherwise(back_i)
        return F.struct(
            F.concat(acc["best"], F.array(best_i)).alias("best"),
            F.concat(acc["back"], F.array(back_i)).alias("back"),
        )

    return F.aggregate(F.sequence(F.lit(1), n), init, step)


def _walk_fold(word: Column, back: Column) -> Column:
    """Backward path reconstruction: from position n, repeatedly cut
    the chosen last piece. Bounded by word length (one dummy loop
    step per character)."""
    n = F.length(word)
    init = F.struct(
        n.cast("int").alias("pos"),
        F.array().cast("array<string>").alias("parts"),
    )

    def step(acc, _):
        l = F.try_element_at(back, acc["pos"] + 1)
        piece = word.substr(acc["pos"] - l + 1, l)
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - l).alias("pos"),
                F.concat(F.array(piece), acc["parts"]).alias("parts"),
            ),
        ).otherwise(acc)

    return F.aggregate(F.sequence(F.lit(1), n), init, step)["parts"]


def viterbi_segment(
    words: DataFrame,
    pieces: DataFrame,
    word_col: str = "word",
    max_len: int = 4,
) -> DataFrame:
    """Viterbi-best segmentation of each distinct word under the
    piece table (piece, logp): output (word, pieces array<string>,
    logp double, logp_int bigint), with NULL pieces/logp/logp_int for
    unsegmentable words (an inventory missing one of the word's
    characters). ``logp_int`` is the raw integer DP score
    (``round(logp·1e6)`` sums) — the exact value the fold computed,
    exposed so downstream queries can stay in pure BIGINT arithmetic
    end-to-end (no float/decimal output surface at all).

    Shape: substring-enumerate the word (≤ len·max_len rows), inner-
    join the inventory, collapse back to ONE row per word carrying
    max_len position-keyed lookup maps, then two native folds (DP
    forward, path backward). No UDFs, no per-row Python."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    w = words.select(word_col).where(
        F.col(word_col).isNotNull() & (F.length(word_col) > 0)
    ).distinct()
    subs = _substr_explode(w, word_col, max_len, keep_pos=True)
    ent = subs.join(
        pieces.select("piece", "logp"), "piece"
    ).select(
        word_col,
        "pos_end",
        "l",
        # exact-integer DP domain: round(logp·1e6) as BIGINT (logp is
        # already a 6-dp decimal, so this is the same integer in any
        # IEEE-754 engine)
        F.round(F.col("logp") * F.lit(1e6), 0).cast("long").alias("li"),
    )
    per_word = ent.groupBy(word_col).agg(
        F.collect_list(F.struct("pos_end", "l", "li")).alias("_es")
    )
    base = w.join(per_word, word_col, "left").withColumn(
        "_es", F.coalesce(F.col("_es"), F.expr(
            "CAST(array() AS array<struct<pos_end:int,l:int,li:bigint>>)"
        ))
    )
    maps = []
    for l in range(1, max_len + 1):
        base = base.withColumn(
            f"_m{l}",
            F.map_from_entries(
                F.expr(
                    f"transform(filter(_es, e -> e.l = {l}), "
                    f"e -> struct(e.pos_end, e.li))"
                )
            ),
        )
        maps.append(F.col(f"_m{l}"))
    word = F.col(word_col)
    dp = _dp_fold(word, maps)
    scored = base.withColumn("_dp", dp).withColumn(
        "_score", F.try_element_at(F.col("_dp.best"), F.length(word) + 1)
    )
    ok = F.col("_score") > F.lit(_NEG_GATE)
    return scored.select(
        word_col,
        F.when(ok, _walk_fold(word, F.col("_dp.back"))).alias("pieces"),
        # exact: |score| < 2^53, so the double divide reproduces the
        # 6-dp decimal sum of the chosen pieces' logps bit-for-bit
        F.when(
            ok, F.round(F.col("_score").cast("double") / F.lit(1e6), 6)
        ).alias("logp"),
        F.when(ok, F.col("_score")).alias("logp_int"),
    )


def unigram_refit(
    vocab: DataFrame,
    pieces: DataFrame,
    word_col: str = "word",
    n_col: str = "n",
    max_len: int = 4,
) -> DataFrame:
    """One hard-EM round: segment every vocabulary word under the
    current inventory, recount each piece by its Viterbi usage
    (weighted by word frequency), re-normalize with add-one smoothing
    over the FIXED inventory (every piece stays alive — the
    cross-engine-exact stand-in for SentencePiece's probability
    floor). Returns the new (piece, cnt, logp) table; iterate by
    feeding it back in."""
    seg = viterbi_segment(
        vocab.select(word_col, n_col), pieces, word_col, max_len
    )
    usage = (
        seg.join(vocab.select(word_col, n_col), word_col)
        .where(F.col("pieces").isNotNull())
        .select(F.explode("pieces").alias("piece"), F.col(n_col))
        .groupBy("piece")
        .agg(F.sum(n_col).alias("_used"))
    )
    recounted = (
        pieces.select("piece")
        .join(usage, "piece", "left")
        .select(
            "piece",
            (F.coalesce(F.col("_used"), F.lit(0)) + 1).alias("cnt"),
        )
    )
    return piece_logprobs(recounted)
