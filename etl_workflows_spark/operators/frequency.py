"""Distributed heavy hitters: Misra-Gries candidates + exact recount.

The problem at 100 TB: "which tokens / URLs / user-ids appear more than
n/k times" — a full ``GROUP BY`` materializes every distinct key (billions
of groups, giant shuffle) when only the ≤ k heavy keys are wanted.

The classic two-pass fix (Misra & Gries 1982; merged summaries per
Agarwal et al., "Mergeable Summaries", PODS 2012):

1. **Candidate pass** — each partition keeps a k-counter Misra-Gries
   summary (``mapInPandas``, Arrow-batched, O(k) memory). By the standard
   averaging argument, any key with GLOBAL frequency > n/k exceeds its
   partition quota n_p/k in at least one partition, so the union of
   per-partition survivors is a superset of every true heavy hitter.
   Output size is bounded by k × num_partitions, independent of n.
2. **Exact pass** — one tiny shuffle: rows are tagged candidate/other and
   counted per tag, giving exact candidate frequencies AND the total row
   count in a single aggregation; the n/k threshold then filters false
   positives.

Result: exact counts, exact threshold semantics (``freq * k > n``), but
the only wide operation is a groupBy over ≤ k × partitions keys instead of
every distinct key in the corpus. No reference counterpart (net-new per
SURVEY.md §2.7's north-star mandate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL


def misra_gries_candidates(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Per-partition Misra-Gries survivors: ≤ k candidate values per
    partition, guaranteed to include every value with global frequency
    > n/k. Deterministic (counter algebra has no randomness)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    field = df.schema[col]
    out_schema = T.StructType([field])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # NULLs are excluded from the summary (a NULL "key" is junk
            # data, not a heavy hitter — filter it upstream if frequent)
            for v in pdf[col].dropna():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Exact frequencies of every value occurring more than n/k times.

    Returns (col, freq) with exact counts, containing EXACTLY the set
    ``{v : freq(v) * k > n}`` — the Misra-Gries pass only bounds the
    candidate set; the final filter is exact, so the result is
    deterministic and SQL-oracle-checkable despite the sketch inside.

    Cost: one narrow candidate pass + ONE aggregation whose key space is
    ≤ k × num_partitions + 1 (the "other" bucket), never the full distinct
    key space.
    """
    # counts is tiny (≤ k·partitions + 1 rows) but its lineage is the full
    # corpus scan — checkpoint before the total collect so the returned
    # frame doesn't replay the scan for a second full pass
    counts = _candidate_tag_counts(df, col, k).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    total = counts.agg(F.sum("freq").alias("n")).collect()[0]["n"] or 0
    return (
        counts.filter(F.col("__cand").isNotNull())
        .filter(F.col("freq") * k > F.lit(total))
        .select(F.col("__cand").alias(col), "freq")
    )


def _candidate_tag_counts(df: DataFrame, col: str, k: int) -> DataFrame:
    """(__cand, freq): exact candidate frequencies plus the NULL "other"
    bucket, in one shuffle. Rows are tagged as their candidate value or
    NULL via a broadcast left join — candidates never leave the cluster;
    at k × num_partitions keys an isin literal list would be a
    multi-million-node driver expression tree at 100 TB. (Split out so
    the plan-quality test can assert the broadcast-join shape that
    heavy_hitters' checkpoint truncates away.)"""
    cands = (
        misra_gries_candidates(df, col, k)
        .distinct()
        .withColumnRenamed(col, "__cand")
    )
    tagged = df.select(F.col(col).alias("__v")).join(
        F.broadcast(cands), F.col("__v") == F.col("__cand"), "left"
    )
    return tagged.groupBy("__cand").agg(F.count(F.lit(1)).alias("freq"))


def _batch_candidate_counts(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact within-batch counts of the batch's Misra-Gries candidates:
    (value, count) with ≤ k × partitions rows."""
    cands = misra_gries_candidates(df, col, k).distinct()
    return (
        df.select(col)
        .join(F.broadcast(cands), col, "leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def merge_mg_summaries(a: DataFrame, b: DataFrame, col: str, k: int) -> DataFrame:
    """Merge two Misra-Gries-style (value, freq) summaries into one of
    size ≤ k, per the mergeable-summaries construction (Agarwal et al.,
    PODS 2012): add counts, then subtract the (k+1)-largest count from
    every counter and drop non-positives. Each merge adds ≤ n_b/k
    undercount; the global bound stays freq_true - freq_stored ≤ n/k.
    """
    u = (
        a.unionByName(b)
        .groupBy(col)
        .agg(F.sum("freq").alias("freq"))
    )
    top = u.orderBy(F.col("freq").desc()).limit(k + 1).collect()
    if len(top) <= k:
        return u
    sub = top[-1]["freq"]
    return (
        u.select(col, (F.col("freq") - F.lit(sub)).alias("freq"))
        .filter(F.col("freq") > 0)
    )


def _cms_pos_expr(key_expr: str, r: int, w: int) -> str:
    """Spark SQL: row-r counter index of the key in [0, w). Same
    md5-prefix construction as operators/bloom.py — portable bit-for-bit
    to DuckDB (``('0x' || ...)::BIGINT``)."""
    return (
        f"cast(conv(substr(md5(concat('cms', '{r}', ':', {key_expr})), 1, 12), "
        f"16, 10) as bigint) % {w}"
    )


def _cms_pos_sql(key_expr: str, r: int, w: int) -> str:
    return (
        f"('0x' || SUBSTR(MD5(CONCAT('cms', '{r}', ':', {key_expr})), 1, 12))"
        f"::BIGINT % {w}"
    )


def cms_build(
    df: DataFrame,
    col: str,
    w: int = 1024,
    d: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key column:
    d hash rows × w counters as a DataFrame (row, pos, cnt) — ≤ d·w rows
    regardless of input cardinality, built with one explode + one
    groupBy whose key space is the sketch geometry, never the data's.

    Guarantees (classic): estimate ≥ true always; estimate ≤ true +
    ε·n with probability ≥ 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Sketches
    with the same (w, d) merge by counter addition (:func:`cms_merge`) —
    the shard/epoch rollup story. Deterministic md5 positions make the
    sketch itself exact-oracle-checkable.

    ``weight_col``: each key contributes that many occurrences — pass a
    pre-aggregated (key, count) relation when one is already at hand,
    so the d position hashes run once per DISTINCT key instead of once
    per occurrence (identical counters by construction; guide §1.2,
    don't recompute per occurrence what an aggregation already holds)."""
    if w < 2 or d < 1:
        raise ValueError(f"need w >= 2 and d >= 1, got w={w} d={d}")
    wcol = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    rows = df.select(
        wcol.alias("__w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        F.expr(_cms_pos_expr(col, r, w)).alias("pos"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rp"),
    )
    return (
        rows.select("rp.row", "rp.pos", "__w")
        .groupBy("row", "pos")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two same-geometry sketches: counter-wise addition."""
    return (
        a.unionByName(b)
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    col: str,
    w: int = 1024,
    d: int = 4,
    out_col: str = "est_freq",
) -> DataFrame:
    """Point-frequency estimates: for each key, MIN over the d rows of
    its counter (missing counter ⇒ 0 ⇒ key definitely unseen). d
    broadcast joins against the ≤ d·w-row sketch — the probed side never
    shuffles (same firewall shape as bloom_probe)."""
    out = keys
    est = None
    for r in range(d):
        s = sketch.filter(F.col("row") == r).select(
            F.col("pos").alias(f"__pos{r}"), F.col("cnt").alias(f"__cnt{r}")
        )
        out = out.withColumn(f"__pos{r}", F.expr(_cms_pos_expr(col, r, w)))
        out = out.join(F.broadcast(s), f"__pos{r}", "left")
        c = F.coalesce(F.col(f"__cnt{r}"), F.lit(0))
        est = c if est is None else F.least(est, c)
    drop = [c for r in range(d) for c in (f"__pos{r}", f"__cnt{r}")]
    return out.withColumn(out_col, est.cast("long")).drop(*drop)


def cms_oracle_sql(
    build_sql: str,
    probe_sql: str,
    key_expr: str = "key",
    w: int = 1024,
    d: int = 4,
) -> str:
    """DuckDB twin of :func:`cms_build` + :func:`cms_estimate`:
    ``build_sql`` selects the counted keys, ``probe_sql`` the probe rows
    (any columns + the key); returns probe rows + est_freq."""
    pos_union = " UNION ALL ".join(
        f"SELECT {r} AS row, {_cms_pos_sql(key_expr, r, w)} AS pos FROM build"
        for r in range(d)
    )
    joins, ests = [], []
    for r in range(d):
        p = _cms_pos_sql(key_expr, r, w)
        joins.append(
            f"LEFT JOIN sketch s{r} ON s{r}.row = {r} AND s{r}.pos = ({p})"
        )
        ests.append(f"COALESCE(s{r}.cnt, 0)")
    return f"""
WITH build AS ({build_sql}),
probe AS ({probe_sql}),
positions AS ({pos_union}),
sketch AS (SELECT row, pos, COUNT(*) AS cnt FROM positions GROUP BY 1, 2)
SELECT probe.*, CAST(LEAST({", ".join(ests)}) AS BIGINT) AS est_freq
FROM probe {" ".join(joins)}
"""


def streaming_cms(
    stream: DataFrame,
    col: str,
    state_table: str,
    checkpoint_dir: str,
    w: int = 1024,
    d: int = 4,
):
    """Maintain a Count-Min sketch over an unbounded stream: each
    micro-batch's sketch is counter-added into the state table (≤ d·w
    rows forever — the table IS the sketch). Because CMS merge is exact
    (addition), the maintained sketch equals the batch sketch over the
    full prefix: est_freq answers are IDENTICAL to a from-scratch build,
    which test_streaming_cms_equals_batch asserts across micro-batch
    boundaries.

    Exactly-once under foreachBatch's at-least-once replay: the state
    table carries a sentinel row (row = -1, pos = last merged batch id —
    the bloom-sidecar idiom) written in the SAME overwrite as the
    counters, so a re-delivered batch id is detected and skipped; the
    marker and the merge share one atomic(ish) table swap, never two
    writes that can diverge. Read the counters with
    :func:`read_cms_state` (strips the sentinel); ``cms_estimate``
    ignores it naturally (its joins bind row ∈ [0, d))."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        summary = cms_build(batch_df, col, w, d)
        if spark.catalog.tableExists(state_table):
            cur = spark.table(state_table)
            done = cur.filter(F.col("row") == -1).select("pos").head()
            if done is not None and done["pos"] >= batch_id:
                return  # replayed batch — already merged, no-op
            merged = cms_merge(cur.filter(F.col("row") >= 0), summary)
        else:
            merged = summary
        sentinel = spark.createDataFrame(
            [(-1, int(batch_id), 0)], merged.schema
        )
        merged.unionByName(sentinel).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL).write.mode("overwrite").saveAsTable(state_table)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_state(spark, state_table: str) -> DataFrame:
    """The maintained CMS counters, without the idempotence sentinel."""
    return spark.table(state_table).filter(F.col("row") >= 0)


def read_mg_state(spark, state_table: str) -> DataFrame:
    """The maintained Misra-Gries summary, without the idempotence
    sentinel (the NULL-value row carrying the last merged batch id)."""
    t = spark.table(state_table)
    return t.filter(F.col(t.columns[0]).isNotNull())


def streaming_heavy_hitters(
    stream: DataFrame,
    col: str,
    k: int,
    state_table: str,
    checkpoint_dir: str,
):
    """Frequent items over an UNBOUNDED stream with O(k) persistent state.

    Each micro-batch contributes its exact candidate counts; the state
    table is a merged Misra-Gries summary capped at k rows (a few KB
    regardless of stream length — the table is the summary, not the
    data). Guarantee after any prefix of length n: every value with
    true frequency > n/k is present, with stored_freq ∈
    [true - n/k, true].

    Returns the started streaming query (AvailableNow trigger: drains
    what exists, then stops — rerun to process new arrivals; the
    checkpoint makes each file count exactly once).

    Exactly-once under foreachBatch's at-least-once replay: a sentinel
    row (NULL value, freq = last merged batch id — NULLs can never be
    real candidates, Misra-Gries excludes them) rides the same overwrite
    as the summary, so a re-delivered batch id is skipped. Read the
    summary with :func:`read_mg_state` (strips the sentinel).
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        summary = _batch_candidate_counts(batch_df, col, k)
        if spark.catalog.tableExists(state_table):
            cur = spark.table(state_table)
            done = cur.filter(F.col(col).isNull()).select("freq").head()
            if done is not None and done["freq"] >= batch_id:
                return  # replayed batch — already merged, no-op
            prev = cur.filter(F.col(col).isNotNull())
            merged = merge_mg_summaries(prev, summary, col, k)
        else:
            merged = merge_mg_summaries(
                summary, spark.createDataFrame([], summary.schema), col, k
            )
        sentinel = spark.createDataFrame(
            [(None, int(batch_id))], merged.schema
        )
        # tiny table (≤ k rows): cut the self-read lineage, then overwrite
        merged.unionByName(sentinel).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL).write.mode("overwrite").saveAsTable(state_table)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
