"""Property-based tests (hypothesis): scalar-function parity against
pure-Python models over generated inputs. Each test builds ONE Spark
job from a generated batch of examples, keeping run time bounded."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_data_pipelines_spark.functions.fa import (
    english_to_persian_digits,
    persian_to_english_digits,
    safe_int,
)
from delta_data_pipelines_spark.operators.dedup import jaccard

_SETTINGS = dict(max_examples=5, deadline=None)

# printable-ish text incl. digits & Persian letters, no surrogates
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs", "Cc"), max_codepoint=0x2600
    ),
    min_size=0,
    max_size=40,
)


@settings(**_SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=50))
def test_digit_fold_round_trip(spark, samples):
    """en→fa→en digit translation restores every ASCII digit; all other
    characters pass through untouched (both directions)."""
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    out = df.select(
        persian_to_english_digits(english_to_persian_digits(F.col("s"))).alias("r"),
        "s",
    ).collect()
    fa = "۰۱۲۳۴۵۶۷۸۹"
    for r in out:
        expect = "".join(
            str(fa.index(ch)) if ch in fa else ch for ch in r["s"]
        )
        assert r["r"] == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.integers(-(10**12), 10**12).map(str),
            st.floats(
                allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
            ).map(str),
            TEXT,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_safe_int_matches_python_model(spark, samples):
    """safe_int == int(float(v)) with default 0 on failure
    (utils_of_searchengine.py:64-68)."""
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["i"] for r in df.select("s", safe_int(F.col("s")).alias("i")).collect()}
    for s in samples:
        try:
            expect = int(float(s))
        except (ValueError, OverflowError):
            expect = 0
        assert got[s] == expect, (s, got[s], expect)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=8).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=20,
    )
)
def test_jaccard_bounds_symmetry_identity(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    words = df.select(
        "id", F.array_distinct(F.split(F.col("t"), " ")).alias("w")
    )
    a = words.alias("a")
    b = words.alias("b")
    pairs = (
        a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            jaccard(F.col("a.w"), F.col("b.w")).alias("j"),
        )
        .collect()
    )
    j = {(r["ia"], r["ib"]): r["j"] for r in pairs}
    n = len(texts)
    for i in range(n):
        assert abs(j[(i, i)] - 1.0) < 1e-12  # identity
        for k in range(n):
            assert 0.0 <= j[(i, k)] <= 1.0  # bounds
            assert abs(j[(i, k)] - j[(k, i)]) < 1e-12  # symmetry
