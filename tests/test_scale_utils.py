"""Scale utilities: salted joins, two-phase agg, bucketed tables, UDTF."""

from pyspark.sql import functions as F

from etl_workflows_spark.operators.skew import (
    key_skew_profile,
    salted_join,
    two_phase_agg,
)
from etl_workflows_spark.sinks.writer import write_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, cust, "o_custkey", salt=8).groupBy(
        "c_mktsegment"
    ).count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_two_phase_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_orderkey"]: r["s"]
        for r in li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"))
        .limit(50)
        .collect()
    }
    two = {
        r["l_orderkey"]: r["sum_l_quantity"]
        for r in two_phase_agg(
            li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(18,2)")),
            "l_orderkey",
            "l_quantity",
            salt=4,
        ).collect()
    }
    for k, v in plain.items():
        assert two[k] == v


def test_skew_profile(spark, sf_dir):
    from etl_workflows_spark.queries.base import table

    ev = table(spark, sf_dir, "events")  # nanos-ts normalization
    prof = key_skew_profile(ev, "event_type", top=3).collect()
    assert len(prof) == 3
    assert prof[0]["n_rows"] >= prof[1]["n_rows"] >= prof[2]["n_rows"]
    assert 0 < prof[0]["share"] < 1


def test_bucketed_table_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key ⇒ the join plan contains no
    Exchange (the co-location bought at write time pays at read time)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    write_table(orders, "bkt.orders_b", bucket_by=(8, ["o_custkey"]))
    write_table(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "bkt.cust_b",
        bucket_by=(8, ["o_custkey"]),
    )
    # force the shuffle-join path (broadcast would hide the bucket effect —
    # at real scale neither side broadcasts)
    joined = (
        spark.table("bkt.orders_b")
        .hint("merge")
        .join(spark.table("bkt.cust_b"), "o_custkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # bucketing removed shuffles
    assert "SortMergeJoin" in plan
    assert joined.count() == orders.count()


def test_ngram_udtf(spark):
    from etl_workflows_spark.functions.udfs import ngram_udtf

    spark.udtf.register("test_ngrams", ngram_udtf())
    rows = spark.sql(
        "SELECT * FROM test_ngrams('a b c', 2)"
    ).collect()
    assert [(r["ngram"], r["pos"]) for r in rows] == [("a b", 0), ("b c", 1)]


def test_append_if_absent_idempotent(spark, sf_dir):
    from etl_workflows_spark.sinks.writer import append_if_absent

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    spark.sql("CREATE DATABASE IF NOT EXISTS idem")
    spark.sql("DROP TABLE IF EXISTS idem.orders")
    append_if_absent(orders, "idem.orders", ["o_orderkey"])
    n1 = spark.table("idem.orders").count()
    # retry with the same batch: no duplicates
    append_if_absent(orders, "idem.orders", ["o_orderkey"])
    assert spark.table("idem.orders").count() == n1
    # genuinely new rows still append
    more = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(150)
    append_if_absent(more, "idem.orders", ["o_orderkey"])
    assert spark.table("idem.orders").count() == 150


def test_incremental_rollup_maintenance(spark, sf_dir):
    """Merging per-slice partial aggregates equals recomputing from
    scratch (additive IVM)."""
    from etl_workflows_spark.operators.rollup_maintenance import (
        hourly_rollup_delta,
        merge_rollup,
    )
    from etl_workflows_spark.queries.base import table

    ev = table(spark, sf_dir, "events")
    split_ts = ev.agg(F.expr("min(ts) + INTERVAL 10 DAYS")).first()[0]
    first, second = ev.filter(F.col("ts") <= split_ts), ev.filter(F.col("ts") > split_ts)

    spark.sql("CREATE DATABASE IF NOT EXISTS ivm")
    spark.sql("DROP TABLE IF EXISTS ivm.rollup")
    merge_rollup(spark, "ivm.rollup", hourly_rollup_delta(first))
    merge_rollup(spark, "ivm.rollup", hourly_rollup_delta(second))

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("ivm.rollup").collect()
    }
    full = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hourly_rollup_delta(ev).collect()
    }
    assert got == full


def test_rollup_retractions_match_recompute(spark, sf_dir):
    """IVM with deletes: insert everything, retract a slice as D-ops —
    the maintained rollup must equal a recompute over the surviving
    facts, and fully-retracted groups must disappear."""
    from etl_workflows_spark.operators.rollup_maintenance import (
        hourly_rollup_delta,
        merge_rollup,
        rollup_apply_changes,
    )
    from etl_workflows_spark.queries.base import table

    ev = table(spark, sf_dir, "events")
    split_ts = ev.agg(F.expr("min(ts) + INTERVAL 5 DAYS")).first()[0]
    doomed = ev.filter(F.col("ts") <= split_ts)
    surviving = ev.filter(F.col("ts") > split_ts)

    spark.sql("CREATE DATABASE IF NOT EXISTS ivm")
    spark.sql("DROP TABLE IF EXISTS ivm.rollup_r")
    merge_rollup(spark, "ivm.rollup_r", hourly_rollup_delta(ev))
    rollup_apply_changes(
        spark, "ivm.rollup_r", doomed.withColumn("op", F.lit("D"))
    )

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("ivm.rollup_r").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in hourly_rollup_delta(surviving).collect()
    }
    assert got == want  # incl. absence of fully-retracted groups

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown change op"):
        rollup_apply_changes(
            spark, "ivm.rollup_r", ev.limit(1).withColumn("op", F.lit("U"))
        )
    spark.sql("DROP TABLE IF EXISTS ivm.rollup_r")


def test_dedup_embedding_cosine(spark):
    """Semantic dedup: high-cosine embedding pairs collapse to one doc."""
    from etl_workflows_spark.operators.dedup import dedup_embedding_cosine

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),   # near-dup of 1
            (3, [0.0, 1.0, 0.0]),      # distinct
        ],
        "vec_id long, embedding array<float>",
    )
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in dedup_embedding_cosine(emb, docs, 0.95).collect()}
    assert kept == {1, 3}


def test_salted_join_shuffles_on_key_plus_salt(spark, sf_dir):
    """The point of salting is the PLAN: the exchange must hash on
    (key, __salt) so one hot key spreads across `salt` reducers."""
    from pyspark.sql import functions as F
    from etl_workflows_spark.queries.base import table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = table(spark, sf_dir, "events").select(
            F.lit(1).alias("cust_id"), "value"  # 100% hot key
        )
        cust = table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust_id"), "c_mktsegment"
        )
        out = salted_join(ev, cust, "cust_id", salt=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan, plan
        # both exchanges carry the salt in their partitioning key
        import re

        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        # the literal hot key is constant-folded out of the partitioning,
        # leaving __salt as the ONLY distribution key — exactly the spread
        # the rewrite promises; both join-side exchanges must carry it
        join_parts = [p for p in parts if "__salt" in p]
        assert len(join_parts) >= 2, parts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
