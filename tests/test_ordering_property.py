"""Property-based checks for the total-order rewrites: on arbitrary value
multisets (duplicates, skew, negatives, float extremes), the bucketed
global-ordinal / running-total plans must agree row-for-row with the
naive single-partition window, and BPE training must agree merge-for-
merge with the straight-line reference implementation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_workflows_spark.operators.ordering import (
    global_cumsum,
    global_ordinals,
    numeric_cut_buckets,
)

_vals = st.lists(
    st.one_of(
        st.integers(-50, 50),  # heavy tie mass
        st.integers(-(10**9), 10**9),
        st.just(0),
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals, n_buckets=st.sampled_from([1, 2, 7, 32]))
def test_ordinals_equal_window_on_any_multiset(spark, vals, n_buckets):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "k long, v double"
    ).repartition(5)
    out = global_ordinals(
        df, ["v", "k"], numeric_cut_buckets(df, "v", n_buckets)
    )
    naive = df.withColumn("e", F.row_number().over(W.orderBy("v", "k")))
    bad = (
        out.join(naive, ["k", "v"])
        .filter(F.col("ordinal") != F.col("e"))
        .count()
    )
    assert bad == 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(-20, 20), st.integers(0, 1000)),
        min_size=1,
        max_size=100,
    )
)
def test_cumsum_equals_window_on_any_multiset(spark, rows):
    df = spark.createDataFrame(
        [(i, float(v), c) for i, (v, c) in enumerate(rows)],
        "k long, v double, c long",
    ).repartition(4)
    out = global_cumsum(df, ["v", "k"], "c", numeric_cut_buckets(df, "v", 8))
    w = W.orderBy("v", "k").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = df.withColumn("e", F.sum("c").over(w))
    bad = (
        out.join(naive, ["k", "v", "c"])
        .filter(F.col("cumsum") != F.col("e"))
        .count()
    )
    assert bad == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(1, 6),
)
def test_bpe_matches_reference_on_random_corpora(spark, words, n_merges):
    from etl_workflows_spark.operators.bpe import train_bpe
    from tests.test_bpe import _corpus_df, _ref_bpe

    got = train_bpe(_corpus_df(spark, words), n_merges)
    assert got == _ref_bpe(words, n_merges)
