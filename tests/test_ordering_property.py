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


_diffs = st.lists(
    st.one_of(st.integers(0, 8), st.integers(0, 10**6), st.none()),
    min_size=1,
    max_size=100,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(diffs=_diffs, n_stages=st.sampled_from([2, 3, 4, 7]))
def test_curriculum_properties_on_any_multiset(spark, diffs, n_stages):
    """On arbitrary difficulty multisets (heavy ties, NULLs, huge gaps):
    stages are monotone in difficulty, equal difficulties never split,
    per-stage positions are dense 1..N, unlock steps are the exact
    competence formula, and every input row survives exactly once."""
    from etl_workflows_spark.operators.ordering import competence_curriculum

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(diffs)], "doc_id long, diff long"
    ).repartition(5)
    rows = competence_curriculum(
        df, "diff", n_stages=n_stages, total_steps=9_999
    ).collect()
    assert len(rows) == len(diffs) and len({r["doc_id"] for r in rows}) == len(diffs)
    by_diff, by_stage = {}, {}
    for r in rows:
        by_diff.setdefault(r["diff"], set()).add(r["stage"])
        by_stage.setdefault(r["stage"], []).append(r["pos"])
        s = r["stage"]
        assert r["unlock_step"] == -(-9_999 * (s + 1) * (s + 1) // n_stages**2)
    for d, stages in by_diff.items():
        assert len(stages) == 1, f"difficulty {d} split across {stages}"
    non_null = sorted(d for d in by_diff if d is not None)
    stage_of = {d: next(iter(by_diff[d])) for d in non_null}
    assert all(
        stage_of[a] <= stage_of[b] for a, b in zip(non_null, non_null[1:])
    )
    if None in by_diff:
        assert by_diff[None] == {n_stages - 1}
    for s, poss in by_stage.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),                      # user
            st.integers(0, 30),                     # minute offset (ties!)
            st.sampled_from(["A", "B", "C", None]),  # state
        ),
        min_size=1,
        max_size=80,
    )
)
def test_state_intervals_partition_property(spark, events):
    """Intervals exactly tile each user's event run: n_events sums to the
    user's event count, versions are dense 1..K, valid_to chains to the
    next valid_from (NULL only on the last), and a straight-line replay
    of the sorted events reproduces the same run structure."""
    import datetime as _dt

    from etl_workflows_spark.operators.scd import state_intervals

    base = _dt.datetime(2024, 1, 1)
    rows = [
        (u, s, base + _dt.timedelta(minutes=m), i)
        for i, (u, m, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, state string, ts timestamp, event_id long"
    ).repartition(5)
    out = state_intervals(df, "user_id", "state", "ts", "event_id").collect()
    per_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["version"])):
        per_user.setdefault(r["user_id"], []).append(r)
    # straight-line replay oracle
    expect = {}
    for u, s, ts, i in sorted(rows, key=lambda t: (t[0], t[2], t[3])):
        runs = expect.setdefault(u, [])
        if runs and runs[-1][0] == s:
            runs[-1][2] += 1
        else:
            runs.append([s, ts, 1])
    assert set(per_user) == set(expect)
    for u, got in per_user.items():
        want = expect[u]
        assert [r["version"] for r in got] == list(range(1, len(want) + 1))
        assert [(r["state"], r["valid_from"], r["n_events"]) for r in got] == [
            tuple(w) for w in want
        ]
        for a, b in zip(got, got[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert got[-1]["valid_to"] is None
