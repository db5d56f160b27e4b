"""Global ordinals / epoch shuffle: exactness vs the naive global window,
plan shape (no single-partition exchange), and the permutation contract."""

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.window import Window as W

from etl_workflows_spark.operators.ordering import (
    epoch_shuffle,
    global_ordinals,
    global_rank_and_cumsum,
    hash_prefix_bucket,
    numeric_cut_buckets,
    shard_for_epoch,
)


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_ordinals_match_naive_window_with_duplicates(spark):
    # heavy duplication + skew: value 5.0 holds half the rows
    rows = [Row(k=i, v=5.0 if i % 2 == 0 else float(i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows).repartition(8)
    out = global_ordinals(
        df, ["v", "k"], numeric_cut_buckets(df, "v", 8)
    )
    naive = df.withColumn(
        "expect", F.row_number().over(W.orderBy("v", "k"))
    )
    joined = out.join(naive, ["k", "v"])
    assert joined.filter(F.col("ordinal") != F.col("expect")).count() == 0


def test_rank_and_cumsum_match_naive_window(spark):
    rows = [Row(k=i, v=5.0 if i % 2 == 0 else float(i % 7), m=i % 11 + 1)
            for i in range(400)]
    df = spark.createDataFrame(rows).repartition(8)
    out = global_rank_and_cumsum(
        df, ["v", "k"], "m", numeric_cut_buckets(df, "v", 8)
    )
    w = W.orderBy("v", "k")
    naive = df.withColumn("er", F.row_number().over(w)).withColumn(
        "ec", F.sum("m").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    joined = out.join(naive, ["k", "v", "m"])
    assert joined.count() == 400
    assert joined.filter(
        (F.col("ordinal") != F.col("er")) | (F.col("cumsum") != F.col("ec"))
    ).count() == 0
    # and the fused plan stays bucket-partitioned
    assert "SinglePartition" not in _executed_plan(out)


def test_ordinals_dense_and_start_offset(spark):
    df = spark.range(50).withColumnRenamed("id", "k").withColumn(
        "v", (F.col("k") % 5).cast("double")
    )
    out = global_ordinals(
        df, ["v", "k"], numeric_cut_buckets(df, "v", 4), start=100
    )
    got = sorted(r["ordinal"] for r in out.collect())
    assert got == list(range(100, 150))


def test_ordinals_plan_has_no_single_partition_exchange(spark):
    df = spark.range(1000).withColumnRenamed("id", "k").withColumn(
        "v", (F.col("k") * 37 % 101).cast("double")
    )
    out = global_ordinals(df, ["v", "k"], numeric_cut_buckets(df, "v", 16))
    plan = _executed_plan(out)
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(__bucket" in plan, plan
    # the naive form, for contrast, IS a single-partition window
    naive = df.withColumn("o", F.row_number().over(W.orderBy("v", "k")))
    assert "SinglePartition" in _executed_plan(naive)


def test_null_sort_key_raises(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=1.0), Row(k=2, v=None)]
    )
    with pytest.raises(ValueError, match="non-null"):
        global_ordinals(df, ["v", "k"], numeric_cut_buckets(df, "v", 4))


def test_epoch_shuffle_is_permutation_and_seeded(spark):
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    e1 = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, 1).collect()}
    assert sorted(e1.values()) == list(range(1, 301))
    e1b = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, 1).collect()}
    assert e1 == e1b  # same epoch → identical permutation
    e2 = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, 2).collect()}
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > 250  # different epoch → a genuinely different order


def test_shards_partition_the_epoch(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    n_shards = 4
    shards = [
        {r["doc_id"] for r in shard_for_epoch(df, 5, s, n_shards).collect()}
        for s in range(n_shards)
    ]
    all_ids = set().union(*shards)
    assert all_ids == set(range(200))
    assert sum(len(s) for s in shards) == 200  # disjoint
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_shard_args_validated(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="shard"):
        shard_for_epoch(df, 1, 4, 4)


def test_hash_prefix_bucket_monotone_with_hash_order(spark):
    df = spark.range(500).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    out = df.select(
        "h", hash_prefix_bucket(F.col("h")).alias("b")
    ).orderBy("h")
    rows = out.collect()
    buckets = [r["b"] for r in rows]
    assert buckets == sorted(buckets)  # bucket never decreases in hash order
    assert all(0 <= b <= 255 for b in buckets)


def test_interleave_sources_round_robin_property(spark):
    from etl_workflows_spark.operators.ordering import interleave_sources

    # unequal sources: a=6 rows, b=3, c=1 → rounds 2+: c absent; 4+: b absent
    rows = (
        [(i, "a") for i in range(6)]
        + [(10 + i, "b") for i in range(3)]
        + [(20, "c")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        ((r["pos"], r["source"]) for r in interleave_sources(df).collect())
    )
    assert [p for p, _ in out] == list(range(1, 11))  # dense permutation
    seq = [s for _, s in out]
    # round 1 holds all three sources, round-robin in source order
    assert seq[:3] == ["a", "b", "c"]
    # rounds 2-3: a and b alternate; rounds 4-6: only a remains
    assert seq[3:7] == ["a", "b", "a", "b"]
    assert seq[7:] == ["a", "a", "a"]
    # any prefix of length >= 3 contains every source that still has rows
    assert set(seq[:3]) == {"a", "b", "c"}


def test_interleave_deterministic_and_plan_bounded(spark):
    from etl_workflows_spark.operators.ordering import interleave_sources

    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(6)
    a = {(r["doc_id"], r["pos"]) for r in interleave_sources(df).collect()}
    b = {(r["doc_id"], r["pos"]) for r in interleave_sources(df).collect()}
    assert a == b
    plan = (
        interleave_sources(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan, plan  # no global ordering pass

def test_interleave_bucketed_path_matches_literal(spark, monkeypatch):
    """Past _INTERLEAVE_LITERAL_MAX sources the closed-form literal fold
    is replaced by a bucketed (round, source) rank — same permutation,
    bit for bit."""
    import etl_workflows_spark.operators.ordering as ordering

    rows = (
        [(i, "a") for i in range(6)]
        + [(10 + i, "b") for i in range(3)]
        + [(20, "c")]
        + [(30 + i, "d") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    literal = {
        (r["doc_id"], r["pos"])
        for r in ordering.interleave_sources(df).collect()
    }
    monkeypatch.setattr(ordering, "_INTERLEAVE_LITERAL_MAX", 0)
    bucketed = {
        (r["doc_id"], r["pos"])
        for r in ordering.interleave_sources(df).collect()
    }
    assert bucketed == literal


def test_interleave_many_sources_scale_path(spark):
    """~2k sources: the literal fold would be a ~4000-node codegen bomb;
    the scale path must auto-engage, stay off SinglePartition, and still
    emit the exact interleave permutation (pos order == lexicographic
    (round, source) order)."""
    from etl_workflows_spark.operators.ordering import interleave_sources

    rows = []
    did = 0
    for s in range(2000):
        for _ in range(1 + s % 3):  # 1-3 rows per source
            rows.append((did, f"src{s:04d}"))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(8)
    out = interleave_sources(df).collect()
    assert sorted(r["pos"] for r in out) == list(range(1, len(rows) + 1))
    # re-derive each row's round from its within-source pos order, then
    # check global pos order IS (round, source) lexicographic order
    by_source = {}
    for r in sorted(out, key=lambda r: r["pos"]):
        by_source.setdefault(r["source"], []).append(r)
    keyed = []
    for src, rs in by_source.items():
        for rnd, r in enumerate(rs, start=1):
            keyed.append(((rnd, src), r["pos"]))
    keyed.sort()
    assert [p for _, p in keyed] == list(range(1, len(rows) + 1))
    plan = _executed_plan(interleave_sources(df))
    assert "SinglePartition" not in plan, plan


def test_rank_cumsum_empty_frame_keeps_sum_type(spark):
    """Empty input must produce the same cum_col type as non-empty input
    (double val_col → double cumsum), on BOTH offset paths."""
    df = spark.createDataFrame([], "k long, g string, v double")
    plain = global_rank_and_cumsum(
        df, ["k"], "v", (F.col("k") % 4).cast("int")
    )
    assert plain.schema["cumsum"].dataType.typeName() == "double"
    grouped = global_rank_and_cumsum(
        df, ["k"], "v", (F.col("k") % 4).cast("int"), partition_cols=["g"]
    )
    assert grouped.schema["cumsum"].dataType.typeName() == "double"
    # and the non-empty schema is identical
    df2 = spark.createDataFrame([(1, "a", 1.5)], "k long, g string, v double")
    full = global_rank_and_cumsum(
        df2, ["k"], "v", (F.col("k") % 4).cast("int"), partition_cols=["g"]
    )
    assert full.schema["cumsum"].dataType == grouped.schema["cumsum"].dataType


def test_interleave_cut_points_cover_both_regimes():
    """Round-10 review fix: cuts must be (round, source) pairs. Round-
    only cuts collapse to ONE bucket when every source has one row."""
    from etl_workflows_spark.operators.ordering import (
        _interleave_round_source_cuts,
    )

    # many tiny sources: all rows are round 1 — cuts must spread across
    # SOURCES inside the single round
    tiny = [(f"s{i:05d}", 1) for i in range(5000)]
    cuts = _interleave_round_source_cuts(tiny, 256)
    assert len(cuts) >= 200, len(cuts)
    assert all(r == 1 for r, _ in cuts)
    assert len({s for _, s in cuts}) == len(cuts)  # distinct sources
    # few big sources: cuts must spread across ROUNDS
    big = [("a", 100_000), ("b", 100_000), ("c", 50_000)]
    cuts = _interleave_round_source_cuts(big, 256)
    assert len(cuts) >= 200, len(cuts)
    assert len({r for r, _ in cuts}) >= 100  # round spread
    # cuts are sorted in (round, source) order and unique
    assert cuts == sorted(set(cuts))


def test_interleave_single_round_many_sources_exact(spark):
    """5000 one-row sources: interleave order IS alphabetical source
    order (all rows are round 1), positions must be that exact rank and
    the plan must stay off SinglePartition with spread buckets."""
    from etl_workflows_spark.operators.ordering import interleave_sources

    rows = [(i, f"src{i:05d}") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(8)
    out = interleave_sources(df).collect()
    expect = {f"src{i:05d}": i + 1 for i in range(5000)}
    assert all(expect[r["source"]] == r["pos"] for r in out)
    plan = _executed_plan(interleave_sources(df))
    assert "SinglePartition" not in plan, plan


def test_competence_curriculum_stages_and_unlocks(spark):
    """Uniform 1..100 difficulties → exact quartile stages (cut at the
    smallest value reaching k/4 of rows), pacing steps at T·((s+1)/4)²."""
    from etl_workflows_spark.operators.ordering import competence_curriculum

    df = spark.createDataFrame(
        [(i, i) for i in range(1, 101)], "doc_id long, diff long"
    )
    out = competence_curriculum(df, "diff", n_stages=4, total_steps=10_000)
    rows = out.collect()
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
    assert {s: len(v) for s, v in by_stage.items()} == {0: 25, 1: 25, 2: 25, 3: 25}
    assert max(r["diff"] for r in by_stage[0]) == 25
    assert min(r["diff"] for r in by_stage[3]) == 76
    assert {r["unlock_step"] for r in rows} == {625, 2500, 5625, 10000}
    # per-stage positions are dense 1..N
    for s, v in by_stage.items():
        assert sorted(r["pos"] for r in v) == list(range(1, 26))


def test_competence_curriculum_ties_share_a_stage(spark):
    """VALUE quantiles, not row-NTILE: every row with the same difficulty
    lands in one stage even when the tie straddles a quartile boundary."""
    from etl_workflows_spark.operators.ordering import competence_curriculum

    # 10 rows of difficulty 1, 2 rows of difficulty 9 — q1..q3 all = 1
    rows = [(i, 1) for i in range(10)] + [(100, 9), (101, 9)]
    df = spark.createDataFrame(rows, "doc_id long, diff long")
    out = competence_curriculum(df, "diff", n_stages=4).collect()
    stages = {r["diff"]: set() for r in out}
    for r in out:
        stages[r["diff"]].add(r["stage"])
    assert stages[1] == {0}  # all ties together, never split
    assert stages[9] == {3}


def test_competence_curriculum_null_difficulty_hardest_stage(spark):
    """NULL difficulty is excluded from the cut distribution and falls
    through to the final stage (matches SQL CASE fall-through)."""
    from etl_workflows_spark.operators.ordering import competence_curriculum

    rows = [(i, i) for i in range(1, 9)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, diff long")
    out = {r["doc_id"]: r for r in competence_curriculum(df, "diff").collect()}
    assert out[99]["stage"] == 3
    # cuts computed over the 8 NON-NULL rows: 2 per stage
    assert out[2]["stage"] == 0 and out[8]["stage"] == 3

    with pytest.raises(ValueError, match="n_stages"):
        competence_curriculum(df, "diff", n_stages=1)


def test_competence_curriculum_plan_stays_partitioned(spark):
    """The row-sized ranking window is (stage, hash-bucket)-partitioned
    and the cuts row arrives broadcast. Exactly ONE SinglePartition is
    allowed: the cumulative-histogram window, whose input is one row per
    DISTINCT difficulty value (cardinality-bounded, never row-sized —
    same accepted class as the mixture manifest's post-agg window)."""
    from etl_workflows_spark.operators.ordering import competence_curriculum

    df = spark.createDataFrame(
        [(i, i % 37) for i in range(500)], "doc_id long, diff long"
    ).repartition(8)
    plan = _executed_plan(competence_curriculum(df, "diff"))
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "hashpartitioning(stage" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_competence_curriculum_rejects_colliding_columns(spark):
    from etl_workflows_spark.operators.ordering import competence_curriculum

    df = spark.createDataFrame([(1, 2, 3)], "doc_id long, diff long, pos int")
    with pytest.raises(ValueError, match="pos"):
        competence_curriculum(df, "diff")
