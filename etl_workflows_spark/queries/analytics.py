"""Event-analytics operators: cohort retention and funnel conversion.

The canonical product-analytics queries a warehouse engine must express —
both are pure window/aggregation compositions (no custom state), so they
ride Catalyst and scale like any agg: one shuffle on user_id, one on the
cohort/funnel key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_workflows_spark.queries.base import dec, dsum, ntz_micros, table


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention: users bucketed by first-seen day; for each
    (cohort_day, days_since) cell, how many distinct cohort members were
    active.

    Shape: min-over-window for the cohort key (one shuffle on user_id),
    then a distinct-count grid (one shuffle on the cell key).
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    with_cohort = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.min(F.date_trunc("day", F.col("ts"))).over(w).alias("cohort_day"),
    )
    return (
        with_cohort.withColumn(
            "days_since",
            F.datediff(F.col("day"), F.col("cohort_day")),
        )
        .groupBy("cohort_day", "days_since")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


_COHORT_ORACLE = """
WITH e AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day,
         MIN(DATE_TRUNC('day', ts)) OVER (PARTITION BY user_id) AS cohort_day
  FROM events
)
SELECT cohort_day,
       CAST(DATE_DIFF('day', cohort_day, day) AS INTEGER) AS days_since,
       COUNT(DISTINCT user_id) AS active_users
FROM e GROUP BY cohort_day, days_since
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: per user, did each stage
    happen *after* the previous stage's first occurrence; then corpus-level
    conversion counts.

    Expressed as conditional min-timestamps per user (single groupBy —
    no joins, no explosion), then one global rollup. The strictly-ordered
    semantics (stage N counts only if it occurs at-or-after the first
    stage N-1) is the standard product-funnel definition.
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_view"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") >= F.col("t_click")
    )
    staged = per_user.select(
        "user_id", s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("s1").cast("long")).alias("viewed"),
        F.sum(F.col("s2").cast("long")).alias("clicked_after_view"),
        F.sum(F.col("s3").cast("long")).alias("purchased_after_click"),
    )


_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
staged AS (
  SELECT user_id,
         t_view IS NOT NULL AS s1,
         (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view) AS s2,
         (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view
          AND t_purchase IS NOT NULL AND t_purchase >= t_click) AS s3
  FROM per_user
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
       CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
FROM staged
"""


def string_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second scalar battery: regex extraction, padding, translation,
    position, repetition — the string surface beyond scalar_functions."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.lpad("p_type", 12, ".").alias("type_padded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_tr"),
        F.instr("p_name", "a").alias("first_a"),
        F.repeat(F.substring("p_brand", 1, 1), 3).alias("bbb"),
        F.reverse("p_type").alias("type_rev"),
        F.left("p_name", F.lit(5)).alias("name5"),
    )


_STRING_EXT_ORACLE = """
SELECT p_partkey,
       REGEXP_EXTRACT(p_brand, '#(\\d+)', 1) AS brand_num,
       LPAD(p_type, 12, '.') AS type_padded,
       TRANSLATE(p_name, 'aeiou', 'AEIOU') AS name_tr,
       CAST(STRPOS(p_name, 'a') AS INTEGER) AS first_a,
       REPEAT(SUBSTRING(p_brand, 1, 1), 3) AS bbb,
       REVERSE(p_type) AS type_rev,
       LEFT(p_name, 5) AS name5
FROM part
"""


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation surface: sorted distinct collect, emitted as a
    joined string (array *values* cross the pandas bridge differently per
    engine — string them for representation-stable comparison)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ","
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_AGG_COLLECT_ORACLE = """
SELECT o_orderpriority,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with position over the token arrays (posexplode /
    UNNEST+subscripts): the row-generating surface beyond plain explode."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    )


_POSEXPLODE_ORACLE = """
SELECT doc_id,
       CAST(GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) - 1 AS INTEGER) AS pos,
       UNNEST(STRING_SPLIT(text, ' ')) AS token
FROM documents WHERE doc_id < 50
"""


def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour activity (value-range frame over event
    time): the batch twin of a sliding-window stream aggregation.

    Spark's DataFrame rangeBetween is numeric-only, so the frame rides on
    epoch microseconds — identical semantics to RANGE INTERVAL, engine-
    portable, and tie-order-independent like any value-range frame.
    """
    ev = table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(ntz_micros(F.col("ts")))
        .rangeBetween(-hour_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("value_last_hour"),
    )


_ROLLING_ORACLE = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style salient terms per document (ratio idf, no log — keeps
    the score in exact rational arithmetic for cross-engine determinism;
    ranking is monotone-equivalent to log idf for per-doc top-k).
    """
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df_, "token").select(
        "doc_id",
        "token",
        (F.col("tf") * F.lit(float(n_docs)) / F.col("df")).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "score", F.col("rnk").cast("int").alias("rnk"))
    )


_TFIDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
tfc AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tf GROUP BY doc_id, token
),
dfc AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY token
),
scored AS (
  SELECT tfc.doc_id, tfc.token,
         tfc.tf * (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / dfc.df AS score
  FROM tfc JOIN dfc ON tfc.token = dfc.token
)
SELECT doc_id, token, score, rnk FROM (
  SELECT doc_id, token, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INTEGER) AS rnk
  FROM scored
) t WHERE rnk <= 3
"""


def events_multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour/day/week aggregates
    in ONE scan and ONE shuffle — each event row explodes into its three
    (grain, bucket) memberships before the aggregation, instead of three
    passes over the fact (at 100 TB, scan count dominates; 3× explode rows
    collapse map-side in partial aggregation).

    Both engines truncate weeks to ISO Monday.
    """
    ev = table(spark, sf_dir, "events")
    gb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(g).alias("grain"),
                    F.date_trunc(g, F.col("ts")).alias("bucket"),
                )
                for g in ("hour", "day", "week")
            ]
        )
    ).alias("gb")
    return (
        ev.select(gb, "value")
        .select("gb.grain", "gb.bucket", "value")
        .groupBy("grain", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


_MULTIGRAIN_ORACLE = """
WITH exploded AS (
  SELECT 'hour' AS grain, DATE_TRUNC('hour', ts) AS bucket, value FROM events
  UNION ALL
  SELECT 'day', DATE_TRUNC('day', ts), value FROM events
  UNION ALL
  SELECT 'week', DATE_TRUNC('week', ts), value FROM events
)
SELECT grain, bucket, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM exploded GROUP BY grain, bucket
"""


def session_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: each purchase event matched to the enclosing
    activity episode — episodes are 6-hour-gap islands built from
    non-purchase events only, so the purchase is a *point in an interval*,
    not a member of the sessionized stream.

    Scale: the join key is (user_id equi) + (ts BETWEEN start AND end)
    non-equi — Spark plans the equi part as a hash/sort-merge join and
    applies the range predicate as a post-join filter, so the shuffle is
    on user_id only. Episodes per user are few; no quadratic blowup.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 6 * 3600 * 1_000_000
    browse = ev.filter(F.col("event_type") != "purchase")
    flagged = browse.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            ntz_micros(F.col("ts")) - ntz_micros(F.lag("ts").over(w)) > gap_us, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = (
        flagged.withColumn("session_id", F.sum("new_session").over(w2))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        purchases.join(
            sessions,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("s_start"))
            & (F.col("p_ts") <= F.col("s_end")),
        )
        .select("event_id", "user_id", "session_id")
    )


_SESSION_JOIN_ORACLE = """
WITH browse AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type <> 'purchase'
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > CAST(6 AS BIGINT) * 3600 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM browse
),
sessions AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
         ts
  FROM flagged
),
bounds AS (
  SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sessions GROUP BY user_id, session_id
)
SELECT p.event_id, b.user_id, b.session_id
FROM events p JOIN bounds b
  ON p.user_id = b.user_id AND p.ts >= b.s_start AND p.ts <= b.s_end
WHERE p.event_type = 'purchase'
"""


def events_hopping_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time window: 1-hour windows every 15
    minutes — each event lands in 4 overlapping windows. Completes the
    event-time window family (tumbling: events_hourly; trailing range:
    events_rolling_1h; sessions: sessionize).

    Scale: ``F.window`` with a slide expands each row to its window
    memberships before the shuffle (4× rows), and map-side partial
    aggregation collapses them — same pattern as the multigrain rollup.
    The oracle reproduces the epoch-aligned membership arithmetic
    explicitly.
    """
    ev = table(spark, sf_dir, "events")
    hop = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )
    return hop.select(
        F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value"
    )


_HOPPING_ORACLE = """
SELECT MAKE_TIMESTAMP(EPOCH_US(ts) - EPOCH_US(ts) % 900000000
                      - k * 900000000) AS w_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) t(k)
GROUP BY 1, 2
"""


def approx_event_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregations per event type: HyperLogLog++ distinct users
    (2% target rsd) and approximate value percentiles (Greenwald-Khanna).

    At 100 TB these replace exact distinct/percentile when the shuffle of
    full key sets is the bottleneck: sketches are fixed-size, mergeable
    partials — the shuffle carries KBs per group regardless of row count.
    Approximate by construction → rows-only check; the error-bound test
    (tests/test_sketches.py) pins accuracy against the exact twins.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_value"),
        F.percentile_approx("value", 0.9, 10000).alias("p90_value"),
    )


def _hourly_filled(ev: DataFrame) -> DataFrame:
    """Gap-free hourly (event_type, hour) grid: aggregate to hours, then
    left-join onto each type's min..max hour spine. The spine explode is
    per-type (25 rows in, thousands out) — negligible next to the fact
    scan; the join keys are (type, hour) so AQE broadcasts the tiny spine.
    """
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("v"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
        )
    )
    return spine.join(hourly, ["event_type", "hour"], "left")


def gap_fill_hourly(ev: DataFrame) -> DataFrame:
    """Gap fill / resample an events DataFrame (event_type, ts, value):
    densify each type's hourly series over its min..max hour, zero-fill
    counts, forward-fill the hourly value sum (``last IGNORE NULLS``)."""
    filled = _hourly_filled(ev)
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
        F.last("v", ignorenulls=True).over(w).alias("carried_value"),
    )


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill / resample on the events table — the standard
    regularization step before any downstream time-series model."""
    return gap_fill_hourly(table(spark, sf_dir, "events"))


_GAP_FILL_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
           FROM hourly GROUP BY 1),
spine AS (SELECT event_type,
                 UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds)
SELECT s.event_type, s.hour,
       COALESCE(h.n, 0) AS n_events,
       h.n IS NULL AS is_gap,
       LAST_VALUE(h.v IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value
FROM spine s LEFT JOIN hourly h
  ON s.event_type = h.event_type AND s.hour = h.hour
"""


def hourly_anomaly(ev: DataFrame, min_history: int = 12) -> DataFrame:
    """Trailing-window z-score anomaly detection on the gap-filled hourly
    count series: each hour scored against the previous 24 hours' mean and
    sample stddev; anomalous at |z| > 3 (needs >= min_history trailing
    hours).

    Determinism note: the variance is computed from integer window sums
    (sum, sum-of-squares, count — exact in doubles) with the identical
    expression in both engines, NOT the engines' one-pass STDDEV (whose
    intermediate rounding differs). ``greatest(0, ·)`` clamps the
    catastrophic-cancellation epsilon when variance is ~0.
    """
    filled = _hourly_filled(ev)
    cnt = F.coalesce(F.col("n"), F.lit(0))
    base = filled.select("event_type", "hour", cnt.alias("n_events"))
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    n = F.col("n_events")
    stats = base.select(
        "event_type",
        "hour",
        "n_events",
        F.sum(n).over(w).alias("s"),
        F.sum(n * n).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    m, s, s2 = F.col("m"), F.col("s"), F.col("s2")
    mu = s / m
    var = F.greatest(F.lit(0.0), (s2 - s * s / m) / (m - 1))
    z = F.when((m >= min_history) & (var > 0), (n - mu) / F.sqrt(var))
    return stats.select(
        "event_type",
        "hour",
        "n_events",
        F.when(m >= min_history, mu).alias("trailing_mean"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
    )


def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly flags on the events table's hourly counts
    (gap-filled; see ``hourly_anomaly``)."""
    return hourly_anomaly(table(spark, sf_dir, "events"))


_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
           FROM hourly GROUP BY 1),
spine AS (SELECT event_type,
                 UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
base AS (
  SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n_events
  FROM spine s LEFT JOIN hourly h
    ON s.event_type = h.event_type AND s.hour = h.hour
),
stats AS (
  SELECT event_type, hour, n_events,
         SUM(n_events) OVER w AS s,
         SUM(n_events * n_events) OVER w AS s2,
         COUNT(*) OVER w AS m
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n_events,
       CASE WHEN m >= 12 THEN s / m END AS trailing_mean,
       CASE WHEN m >= 12 AND GREATEST(0.0, (s2 - s * s / m) / (m - 1)) > 0
            THEN (n_events - s / m)
                 / SQRT(GREATEST(0.0, (s2 - s * s / m) / (m - 1)))
       END AS zscore,
       COALESCE(ABS(CASE WHEN m >= 12
                          AND GREATEST(0.0, (s2 - s * s / m) / (m - 1)) > 0
                         THEN (n_events - s / m)
                              / SQRT(GREATEST(0.0, (s2 - s * s / m) / (m - 1)))
                    END) > 3, FALSE) AS is_anomaly
FROM stats
"""


def zorder_keys_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) curve key over (p_size, price-cents) — the layout
    key behind sinks/layout.py's multi-dimensional clustering, computed
    with integer-only arithmetic so the value is engine-portable and
    oracle-checkable bit for bit.

    Shape: one tiny stats agg broadcast back over the scan (no shuffle of
    the fact side); the interleave itself is pure shift/or codegen.
    """
    from etl_workflows_spark.sinks.layout import interleave_bits

    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("s"),
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias("v"),
    )
    st = p.agg(
        F.min("s").alias("mns"),
        F.max("s").alias("mxs"),
        F.min("v").alias("mnv"),
        F.max("v").alias("mxv"),
    )
    sc = p.crossJoin(F.broadcast(st)).select(
        "p_partkey",
        F.expr("((s - mns) * 255) div (mxs - mns)").alias("ss"),
        F.expr("((v - mnv) * 255) div (mxv - mnv)").alias("sv"),
    )
    return sc.select(
        "p_partkey",
        interleave_bits([F.col("ss"), F.col("sv")], 8).alias("zkey"),
    )


def _zorder_oracle() -> str:
    # exact mirror of interleave_bits([ss, sv], 8): bit b of ss lands at
    # position 2b, bit b of sv at 2b+1
    terms = []
    for b in range(8):
        terms.append(f"(((ss >> {b}) & 1) << {2 * b})")
        terms.append(f"(((sv >> {b}) & 1) << {2 * b + 1})")
    z = " | ".join(terms)
    return f"""
WITH c AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS s,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS v
  FROM part
), st AS (
  SELECT MIN(s) AS mns, MAX(s) AS mxs, MIN(v) AS mnv, MAX(v) AS mxv FROM c
), sc AS (
  SELECT p_partkey,
         ((s - mns) * 255) // (mxs - mns) AS ss,
         ((v - mnv) * 255) // (mxv - mnv) AS sv
  FROM c, st
)
SELECT p_partkey, {z} AS zkey FROM sc
"""


def attribution_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of the stream-stream attribution join
    (streaming/joins.py): purchases joined to the same user's views in the
    preceding hour. The identical function body runs on two readStream
    inputs with bounded state — test_streaming proves stream/batch parity;
    this entry proves value-exactness against the SQL oracle."""
    from etl_workflows_spark.streaming.joins import attribution_join

    ev = table(spark, sf_dir, "events")
    return attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )


_ATTRIBUTION_ORACLE = """
SELECT p.user_id,
       v.event_id AS trigger_id,
       v.ts AS trigger_ts,
       p.event_id AS conversion_id,
       p.ts AS conversion_ts,
       p.value
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 1 HOUR
 AND v.ts <= p.ts
WHERE p.event_type = 'purchase'
  AND v.event_type = 'view'
"""


def events_distinct_hll_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type over the full range, answered from
    per-day mergeable HLL sketches (operators/sketch_rollup.py) — the
    any-range-without-rescanning path. Approximate by contract → rows-only
    check; error bounds and mergeability are pinned in
    test_sketch_rollup."""
    from etl_workflows_spark.operators.sketch_rollup import (
        daily_distinct_sketches,
        estimate_range,
    )

    ev = table(spark, sf_dir, "events")
    sk = daily_distinct_sketches(ev, dims=["event_type"])
    return estimate_range(sk, "1990-01-01", "2100-01-01", dims=["event_type"])


def user_journey_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: each user's event-time-ordered journey
    as a compact initial-letter string, plus a regex subsequence match
    (view → … → click → … → purchase).

    Shape: one shuffle on user_id; the per-user ordering happens inside
    the aggregation buffer (array_sort over (ts, event_id) structs — the
    unique key breaks ties so the string is deterministic), then a codegen
    regex. The regex-over-journey idiom is the poor man's MATCH_RECOGNIZE
    and covers most funnel/path questions in one pass.
    """
    ev = table(spark, sf_dir, "events")
    journey = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id"),
                        F.substring("event_type", 1, 1).alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(journey.alias("journey"))
        .select(
            "user_id",
            "journey",
            F.col("journey").rlike("v.*c.*p").alias("has_funnel"),
        )
    )


_JOURNEY_ORACLE = """
SELECT user_id,
       STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id)
         AS journey,
       REGEXP_MATCHES(
         STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id),
         'v.*c.*p') AS has_funnel
FROM events
GROUP BY user_id
"""


def grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend: slope/intercept of value over time per
    event_type, computed from exact-decimal sufficient statistics.

    Spark has regr_slope/regr_intercept, but their float partial sums are
    order-dependent (same reason queries/base.py bans plain AVG); the
    closed form from DECIMAL(18,2)-exact Σx, Σy, Σxy, Σx² is bitwise
    deterministic AND cross-engine — the per-row double division at the
    end is IEEE-identical everywhere. One shuffle, map-side partials.

    x = hours since epoch (integer), y = value.
    """
    ev = table(spark, sf_dir, "events")
    x = (ntz_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long")
    d = ev.select(
        "event_type",
        x.alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    denom = n * F.col("sxx").cast("double") - sx * sx
    slope = (n * F.col("sxy") - sx * F.col("sy")) / denom
    return agg.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * sx) / n).alias("intercept"),
    )


_GROUPED_REGRESSION_ORACLE = """
WITH d AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH_US(ts) / 3600000000) AS BIGINT) AS x,
         CAST(value AS DECIMAL(18,2)) AS y
  FROM events
), a AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(x) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         SUM(x * x) AS sxx
  FROM d GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
FROM a
"""


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed event values per event_type series
    (operators/timeseries.py — the recursive op no window frame can
    express; applyInPandas per series). Oracle-checked HASH-EXACT: the
    kernel's state update is the literal IEEE expression
    ``(1-α)·s + α·x`` in fixed operand order, and the DuckDB twin runs
    the identical expression through a recursive CTE — same doubles,
    same bits (previously rows-only; closeness to pandas' own ewm is
    still pinned in test_timeseries_stateful)."""
    from etl_workflows_spark.operators.timeseries import ewma

    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    return ewma(ev, ["event_type"], "ts", "value", alpha=0.3)


_EWMA_ORACLE = """
WITH RECURSIVE base AS (
  SELECT event_type, ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY ts, value
         ) AS rn
  FROM events
), r AS (
  SELECT event_type, ts, value, rn, CAST(value AS DOUBLE) AS ewma
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.event_type, b.ts, b.value, b.rn,
         (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * r.ewma
           + CAST(0.3 AS DOUBLE) * CAST(b.value AS DOUBLE)
  FROM r JOIN base b ON b.event_type = r.event_type AND b.rn = r.rn + 1
)
SELECT event_type, ts, value, ewma FROM r
"""


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: 20 buckets of (near-)equal
    row count with per-bucket bounds — the quantile-bucketing twin of the
    equi-width `numeric_histogram`, and the statistic a CBO wants for
    skewed columns (equal-width buckets collapse under skew; equal-depth
    ones don't).

    NTILE over (value, unique key) is deterministic; one global sort —
    at 100 TB swap in approx percentile cut points and a range join,
    trading exactness for no total order.
    """
    o = table(spark, sf_dir, "orders")
    t = o.select(
        "o_totalprice",
        F.ntile(20)
        .over(W.orderBy(F.col("o_totalprice"), F.col("o_orderkey")))
        .alias("bucket"),
    )
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through a bucketed-storage join
    (operators/bucketed.py): orders and lineitem are persisted bucketed
    on orderkey with the same bucket count, so the fact⋈fact join is a
    SortMergeJoin with ZERO Exchange and zero Sort — the shuffle is paid
    once at write time, never again per query. The plan shape is
    asserted in tests/test_bucketed_join.py; at 100 TB this is the
    difference between re-shuffling the fact tables nightly and
    streaming co-located bucket files.

    Results are layout-independent, so the oracle is the plain join.
    """
    from etl_workflows_spark.operators.bucketed import bucketed_pair_join

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    j = bucketed_pair_join(
        spark,
        o,
        li,
        "o_orderkey",
        "l_orderkey",
        ("orders_rev", "lineitem_rev"),
        n_buckets=8,
        scope=sf_dir,
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
        .select("o_orderpriority", "n_items", "revenue")
    )


_BUCKETED_JOIN_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavily-skewed equi-join executed through ``salted_join``
    (operators/skew.py): a synthetic hot key absorbs ~4/5 of all events
    (every user_id ≢ 0 mod 5 collapses to key 1 — the 'default user id'
    pathology), then joins customer attributes on that key.

    The salt explodes the hot key across ``salt`` reducers; the right
    side is replicated salt×. Results are salt-invariant, so the oracle
    is the plain join — correctness of the rewrite is exactly what the
    hash-match checks. Unsalted-vs-salted timing is measured in bench.py
    (broadcast disabled there so the skewed shuffle is real).
    """
    from etl_workflows_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 != 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("cust_id"),
        "value",
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, "cust_id", salt=32, how="inner")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


def skewed_join_unsalted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control twin of ``skewed_join_salted``: the identical join without
    salting — same oracle; exists so bench.py can time the hot-key
    shuffle both ways (broadcast disabled there)."""
    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 != 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("cust_id"),
        "value",
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    return (
        ev.join(cust, "cust_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


_SKEWED_JOIN_ORACLE = """
WITH ev AS (
  SELECT CASE WHEN user_id % 5 <> 0 THEN 1 ELSE user_id END AS cust_id, value
  FROM events
)
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM ev JOIN customer ON c_custkey = cust_id
GROUP BY c_mktsegment
"""


def equidepth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of ``equidepth_histogram``: approx-percentile cut points
    + codegen bucket assignment — NO total-order sort anywhere.

    The exact form NTILEs over a global ORDER BY: a single-reducer sort
    that dies at 100 TB. Here one tree-aggregated ``percentile_approx``
    (GK sketch, rank error ≤ n/accuracy) yields the 19 interior cut
    points; each row's bucket is then 1 + #cuts-below-it, a chain of 19
    comparisons inside whole-stage codegen (no join, no sort, no window
    — the cut list is a driver-side constant of n_buckets-1 doubles,
    bounded regardless of data size). Only shuffle: the 20-key final agg.

    Rows-only catalog entry (bucket boundaries are sketch-approximate);
    exactness bound vs the NTILE twin is pinned in test_plan_quality.
    """
    n_buckets = 20
    o = table(spark, sf_dir, "orders")
    cuts = o.select(
        F.percentile_approx(
            "o_totalprice",
            [i / n_buckets for i in range(1, n_buckets)],
            100_000,
        ).alias("cuts")
    ).collect()[0]["cuts"]
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + F.when(
            F.col("o_totalprice") > F.lit(float(c)), 1
        ).otherwise(0)
    return (
        o.select("o_totalprice", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


_EQUIDEPTH_ORACLE = """
WITH t AS (
  SELECT o_totalprice,
         CAST(NTILE(20) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER)
           AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n_rows,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM t GROUP BY bucket
"""


def global_rowids_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dense global row numbers over orders by (o_totalprice,
    o_orderkey) — the single-reducer-free form of
    ``row_number() OVER (ORDER BY ...)``.

    Plan: approx-percentile range buckets (driver constant), per-bucket
    counts (one tiny agg), literal-map offsets, bucket-partitioned
    row_number window. No ``Exchange SinglePartition`` on the data path —
    see operators/ordering.py.
    """
    from etl_workflows_spark.operators import ordering

    o = table(spark, sf_dir, "orders")
    d = o.select("o_orderkey", "o_totalprice")
    return ordering.global_ordinals(
        d,
        sort_cols=["o_totalprice", "o_orderkey"],
        bucket=ordering.numeric_cut_buckets(d, "o_totalprice", 64),
    ).select("o_orderkey", "ordinal")


_GLOBAL_ROWIDS_ORACLE = """
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER)
         AS ordinal
FROM orders
"""


def purchase_state_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row point-in-time join (operators/scd.py temporal_join): each
    purchase picks the user's browsing state (last view/click interval)
    valid at the purchase's own timestamp. Equi-join on user_id with the
    validity window as residual — hash-join strategies stay available,
    unlike a pure interval join."""
    from etl_workflows_spark.operators.scd import temporal_join

    ev = table(spark, sf_dir, "events")
    states = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("event_type").alias("state"),
            F.lead("ts")
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("valid_to"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = temporal_join(facts, states, key="user_id", ts_col="ts")
    return out.select("event_id", "user_id", "state")


_TEMPORAL_JOIN_ORACLE = """
WITH st AS (
  SELECT user_id, ts AS valid_from, event_type AS state,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events WHERE event_type <> 'purchase'
),
f AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, st.state
FROM f LEFT JOIN st
  ON st.user_id = f.user_id
 AND st.valid_from <= f.ts
 AND (st.valid_to IS NULL OR st.valid_to > f.ts)
"""


def purchase_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (purchase, click) pairs of the same user within ±600 s
    (operators/timeseries.py interval_join): the window is discretized
    into w-sized buckets so the plan is an ordinary equi-join on
    (user_id, bucket) + exact micros filter — never a nested loop."""
    from etl_workflows_spark.operators.timeseries import interval_join

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    out = interval_join(p, c, "p_ts", "c_ts", 600, key="user_id")
    return out.select(
        "user_id",
        "p_id",
        "c_id",
        F.timestamp_diff(
            "MICROSECOND", F.col("c_ts"), F.col("p_ts")
        ).alias("delta_us"),
    )


_INTERVAL_JOIN_ORACLE = """
SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id,
       EPOCH_US(p.ts) - EPOCH_US(c.ts) AS delta_us
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND ABS(EPOCH_US(p.ts) - EPOCH_US(c.ts)) <= 600000000
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join (operators/fuzzy.py): customer
    pairs whose names are within Levenshtein distance 1 — exact results
    via the FastSS deletion-variant equi-join (candidates complete by
    theorem, engine-native levenshtein verify), never a cross join. The
    oracle IS the O(n²) cross join, so the hash-match proves the
    pruned join loses nothing."""
    from etl_workflows_spark.operators import fuzzy

    c = table(spark, sf_dir, "customer")
    return fuzzy.fuzzy_self_pairs(c, "c_custkey", "c_name", max_dist=1).select(
        F.col("id_a"),
        F.col("id_b"),
        F.col("dist").cast("int").alias("dist"),
    )


_FUZZY_PAIRS_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(LEVENSHTEIN(a.c_name, b.c_name) AS INTEGER) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE LEVENSHTEIN(a.c_name, b.c_name) <= 1
"""


def golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (fuzzy.golden_record) demonstrated on exact
    clusters (nation groups): latest name by the unique c_custkey
    recency, exact-decimal balance sum, member count — one algebraic
    agg, deterministic, mirrored by DuckDB's ARG_MAX."""
    from etl_workflows_spark.operators.fuzzy import golden_record

    c = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    out = golden_record(
        c,
        "c_nationkey",
        {"c_name": "latest", "bal": "sum"},
        recency_col="c_custkey",
    )
    return out.select(
        "c_nationkey",
        "c_name",
        F.col("bal").cast("double").alias("bal_sum"),
        F.col("n_members").cast("long").alias("n_members"),
    )


_GOLDEN_RECORD_ORACLE = """
SELECT c_nationkey,
       ARG_MAX(c_name, c_custkey) AS c_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
       COUNT(*) AS n_members
FROM customer GROUP BY c_nationkey
"""


def outlier_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per event_type, flag values more than
    3 MAD (median absolute deviation) from the median — the robust
    z-score that survives the very outliers it hunts (stddev-based
    flags inflate their own threshold). Exact interpolated medians
    (Spark ``percentile`` == DuckDB ``quantile_cont``, verified
    bitwise in agg_median); two grouped medians + one broadcast join
    back — no window over the fact."""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "value", F.abs(F.col("value") - F.col("med")).alias("absdev"), "med"
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", 0.5).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("absdev") > 3 * F.col("mad"))
        .select("event_type", "event_id", "value", "med", "mad")
    )


_OUTLIER_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value,
         ABS(e.value - m.med) AS absdev, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, QUANTILE_CONT(absdev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.value, d.med, m.mad
FROM dev d JOIN mad m USING (event_type)
WHERE d.absdev > 3 * m.mad
"""


def benford_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed leading-digit
    frequencies vs the Benford expectation P(d)=log10(1+1/d), with the
    per-digit chi-square contribution — the classic fabricated-numbers
    screen. Expected probabilities are LITERALS (12 decimals), so both
    engines compute identical arithmetic from identical counts."""
    benford = {
        1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
        4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
        7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
    }
    bmap = F.create_map(
        *[F.lit(x) for d, p in benford.items() for x in (d, p)]
    )
    o = table(spark, sf_dir, "orders")
    # leading digit via string, not floor(x/10^floor(log10 x)) — log10
    # of exact powers of ten lands a hair under the integer in some
    # libm builds and misclassifies 1000.00 as digit 9
    digits = o.select(
        F.substring(
            F.regexp_replace(
                F.abs(F.col("o_totalprice")).cast("string"), r"[^1-9]", ""
            ),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    ).filter(F.col("digit").isNotNull())
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = digits.count()
    return (
        counts.withColumn("expected_p", F.element_at(bmap, F.col("digit")))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.lit(float(total)), 9).alias("observed_p"),
            F.round("expected_p", 9).alias("expected_p"),
            F.round(
                F.pow(
                    F.col("n") - F.lit(float(total)) * F.col("expected_p"), 2
                )
                / (F.lit(float(total)) * F.col("expected_p")),
                6,
            ).alias("chi2_term"),
        )
    )


_BENFORD_ORACLE = """
WITH b(digit, expected_p) AS (
  VALUES (1, 0.301029995664), (2, 0.176091259056), (3, 0.124938736608),
         (4, 0.096910013008), (5, 0.079181246048), (6, 0.066946789631),
         (7, 0.057991946978), (8, 0.051152522447), (9, 0.045757490561)
),
d AS (
  SELECT CAST(SUBSTR(REGEXP_REPLACE(CAST(ABS(o_totalprice) AS VARCHAR), '[^1-9]', '', 'g'), 1, 1) AS INTEGER) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS n FROM d WHERE digit IS NOT NULL GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
SELECT c.digit, c.n,
       ROUND(c.n / t.total, 9) AS observed_p,
       ROUND(b.expected_p, 9) AS expected_p,
       ROUND(POW(c.n - t.total * b.expected_p, 2) / (t.total * b.expected_p), 6) AS chi2_term
FROM c JOIN b USING (digit), t
"""


def seasonal_decompose_hourly(ev: DataFrame, period: int = 24) -> DataFrame:
    """Classical seasonal decomposition of the gap-filled hourly count
    series: trend = centered ``period``-hour moving average, seasonal =
    per-hour-of-day mean deviation from trend, resid = n - trend -
    seasonal. The moving-average decomposition every monitoring stack
    runs before alerting on a daily-cyclic series.

    Determinism (same discipline as ``hourly_anomaly``): every divided
    quantity is an INTEGER window/group sum — trend = s/period only
    where the centered window is complete (m == period), seasonal =
    A/c - S/(period·c) from integer sums A, S — so both engines evaluate
    identical IEEE expressions on identical operands and agree
    bit-for-bit, no rounding needed. Seasonal is uncentered (the mean
    over hours-of-day is NOT subtracted — that would need a float sum
    whose order differs across engines); trend+seasonal+resid still
    reconstructs n exactly where defined.

    Scale: one shuffle to the hourly grid, one window pass per type, one
    24-row-per-type seasonal aggregate broadcast back.
    """
    half = period // 2
    filled = _hourly_filled(ev)
    base = filled.select(
        "event_type", "hour", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-half, period - half - 1)
    )
    n = F.col("n_events")
    stats = base.select(
        "event_type",
        "hour",
        "n_events",
        F.sum(n).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    complete = F.col("m") == period
    t1 = stats.select(
        "event_type",
        "hour",
        "n_events",
        F.when(complete, F.col("s") / period).alias("trend"),
        F.col("s").alias("s"),
        complete.alias("ok"),
        F.hour("hour").alias("hod"),
    )
    seas = (
        t1.filter("ok")
        .groupBy("event_type", "hod")
        .agg(
            F.sum("n_events").alias("a"),
            F.sum("s").alias("ss"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            "event_type",
            "hod",
            (
                F.col("a") / F.col("c")
                - F.col("ss") / (F.lit(period) * F.col("c"))
            ).alias("seasonal"),
        )
    )
    return (
        t1.join(F.broadcast(seas), ["event_type", "hod"], "left")
        .select(
            "event_type",
            "hour",
            "n_events",
            "trend",
            "seasonal",
            F.when(
                F.col("ok") & F.col("seasonal").isNotNull(),
                F.col("n_events") - F.col("trend") - F.col("seasonal"),
            ).alias("resid"),
        )
    )


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend / daily-seasonal / residual split of the events table's
    hourly counts (see ``seasonal_decompose_hourly``)."""
    return seasonal_decompose_hourly(table(spark, sf_dir, "events"))


_SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
           FROM hourly GROUP BY 1),
spine AS (SELECT event_type,
                 UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
base AS (
  SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n_events
  FROM spine s LEFT JOIN hourly h
    ON s.event_type = h.event_type AND s.hour = h.hour),
stats AS (
  SELECT event_type, hour, n_events,
         SUM(n_events) OVER (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS s,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING) AS m
  FROM base),
t1 AS (
  SELECT event_type, hour, n_events,
         CASE WHEN m = 24 THEN s / 24 END AS trend,
         s, (m = 24) AS ok,
         CAST(EXTRACT(HOUR FROM hour) AS INTEGER) AS hod
  FROM stats),
seas AS (
  SELECT event_type, hod,
         SUM(n_events) / COUNT(*) - SUM(s) / (24 * COUNT(*)) AS seasonal
  FROM t1 WHERE ok GROUP BY 1, 2)
SELECT t1.event_type, t1.hour, t1.n_events, t1.trend, seas.seasonal,
       CASE WHEN t1.ok AND seas.seasonal IS NOT NULL
            THEN t1.n_events - t1.trend - seas.seasonal END AS resid
FROM t1 LEFT JOIN seas
  ON t1.event_type = seas.event_type AND t1.hod = seas.hod
"""


def forecast_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: hold out each event type's last
    24 gap-filled hours, forecast each as the count 24 hours earlier,
    and score MAE plus the MASE-style ratio against the naive-1
    (previous-hour) forecast — the baseline every fancier model must
    beat, and the exact-arithmetic twin of the iterative ``holt_forecast``
    (whose float recursion is rows-only by contract).

    Exactness: errors are integer differences; MAE = integer sum / 24;
    the ratio divides two such rationals — identical IEEE ops in both
    engines. Series too short for a full holdout+lag drop out via the
    lag being NULL (mirrored in the oracle).
    """
    filled = _hourly_filled(table(spark, sf_dir, "events"))
    base = filled.select(
        "event_type", "hour", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )
    w = W.partitionBy("event_type").orderBy("hour")
    lagged = base.select(
        "event_type",
        "hour",
        "n_events",
        F.lag("n_events", 24).over(w).alias("pred_seasonal"),
        F.lag("n_events", 1).over(w).alias("pred_naive"),
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("hour").desc())
        ).alias("rn_desc"),
    )
    test = lagged.filter(
        (F.col("rn_desc") <= 24)
        & F.col("pred_seasonal").isNotNull()
        & F.col("pred_naive").isNotNull()
    )
    return (
        test.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.abs(F.col("n_events") - F.col("pred_seasonal"))).alias("ae_s"),
            F.sum(F.abs(F.col("n_events") - F.col("pred_naive"))).alias("ae_n"),
        )
        .select(
            "event_type",
            "n_test",
            (F.col("ae_s") / F.col("n_test")).alias("mae_seasonal"),
            (F.col("ae_n") / F.col("n_test")).alias("mae_naive"),
            F.when(
                F.col("ae_n") > 0, F.col("ae_s") / F.col("ae_n")
            ).alias("mase_ratio"),
        )
    )


_FORECAST_BACKTEST_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
           FROM hourly GROUP BY 1),
spine AS (SELECT event_type,
                 UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
base AS (
  SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n_events
  FROM spine s LEFT JOIN hourly h
    ON s.event_type = h.event_type AND s.hour = h.hour),
lagged AS (
  SELECT event_type, hour, n_events,
         LAG(n_events, 24) OVER (PARTITION BY event_type ORDER BY hour)
           AS pred_seasonal,
         LAG(n_events, 1) OVER (PARTITION BY event_type ORDER BY hour)
           AS pred_naive,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour DESC)
           AS rn_desc
  FROM base),
test AS (
  SELECT * FROM lagged
  WHERE rn_desc <= 24 AND pred_seasonal IS NOT NULL
    AND pred_naive IS NOT NULL)
SELECT event_type,
       COUNT(*) AS n_test,
       SUM(ABS(n_events - pred_seasonal)) / COUNT(*) AS mae_seasonal,
       SUM(ABS(n_events - pred_naive)) / COUNT(*) AS mae_naive,
       CASE WHEN SUM(ABS(n_events - pred_naive)) > 0
            THEN SUM(ABS(n_events - pred_seasonal))
                 / CAST(SUM(ABS(n_events - pred_naive)) AS DOUBLE) END
         AS mase_ratio
FROM test GROUP BY event_type
"""


def holt_forecast_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing forecast of each event type's
    hourly counts (operators/timeseries.py:holt_forecast). Oracle-checked
    HASH-EXACT (previously rows-only): the kernel's level/trend updates
    are literal fixed-operand-order IEEE expressions, and the DuckDB
    recursive-CTE twin replays the identical expressions over the same
    gap-filled hourly series — same doubles, same bits. The
    exact-arithmetic backtest twin remains ``forecast_backtest_events``;
    the linear-trend property stays pinned in test_timeseries_stateful.
    """
    from etl_workflows_spark.operators.timeseries import holt_forecast

    filled = _hourly_filled(table(spark, sf_dir, "events"))
    base = filled.select(
        "event_type", "hour", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )
    return holt_forecast(base, ["event_type"], "hour", "n_events", horizon=24)


# the level/trend updates below mirror timeseries.holt_forecast's kernel
# EXPRESSION-FOR-EXPRESSION (alpha=0.5, beta=0.3, horizon=24): bit-exact
# equality is the contract, so operand order matters
_HOLT_ORACLE = """
WITH RECURSIVE hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
           FROM hourly GROUP BY 1),
spine AS (SELECT event_type,
                 UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
numbered AS (
  SELECT s.event_type,
         CAST(COALESCE(h.n, 0) AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY s.event_type ORDER BY s.hour)
           AS rn,
         LEAD(CAST(COALESCE(h.n, 0) AS DOUBLE)) OVER (
           PARTITION BY s.event_type ORDER BY s.hour) AS x_next,
         COUNT(*) OVER (PARTITION BY s.event_type) AS n_obs
  FROM spine s LEFT JOIN hourly h
    ON s.event_type = h.event_type AND s.hour = h.hour
),
r AS (
  SELECT event_type, rn, n_obs,
         x AS l,
         COALESCE(x_next - x, CAST(0 AS DOUBLE)) AS b
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.rn, n.n_obs,
         CAST(0.5 AS DOUBLE) * n.x
           + (CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)) * (r.l + r.b),
         CAST(0.3 AS DOUBLE) * (
             (CAST(0.5 AS DOUBLE) * n.x
               + (CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)) * (r.l + r.b))
             - r.l)
           + (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * r.b
  FROM r JOIN numbered n
    ON n.event_type = r.event_type AND n.rn = r.rn + 1
)
SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs,
       l AS level, b AS trend,
       l + 24 * b AS forecast
FROM r WHERE rn = n_obs
"""


def skewed_sum_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation on the hot-key events projection
    (operators/skew.py:two_phase_agg): partial sums per (key, salt) then
    a final sum — the manual fix for single-key reducer overload in
    AQE-blind shapes. Summed quantity is integer cents, so the salted
    regrouping is exactly the plain GROUP BY (integer addition is
    order-independent) and the entry is oracle-checked."""
    from etl_workflows_spark.operators.skew import two_phase_agg

    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 != 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("cust_id"),
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return two_phase_agg(ev, "cust_id", "v_cents")


_TWO_PHASE_ORACLE = """
SELECT CASE WHEN user_id % 5 != 0 THEN 1 ELSE user_id END AS cust_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_v_cents
FROM events GROUP BY 1
"""


def audience_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-segment audience overlap WITHOUT rescanning raw events:
    inclusion-exclusion over mergeable per-day HLL sketches
    (operators/sketch_rollup.py). Rows-only by contract (HLL estimates);
    the error bound vs exact overlap is asserted in test_sketch_rollup."""
    from etl_workflows_spark.operators.sketch_rollup import (
        audience_overlap,
        daily_distinct_sketches,
    )

    ev = table(spark, sf_dir, "events")
    sk = daily_distinct_sketches(ev, dims=["event_type"])
    return audience_overlap(sk, "event_type", "click", "purchase")


def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT users per (event_type, hour) — the query SQL
    engines write as ``COUNT(DISTINCT x) OVER (ORDER BY t)``, which Spark
    does not support and naive ports emulate with
    ``size(collect_set() OVER ...)`` (per-row set state — a memory bomb
    at scale). The engine-grade rewrite: a user's FIRST hour is an
    aggregation, new-users-per-hour is another, and the cumulative count
    is a running integer sum over the tiny (type, hour) grid. All
    integer arithmetic; hash-exact against DuckDB's native distinct
    window."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
    )
    first = ev.groupBy("event_type", "user_id").agg(
        F.min("hour").alias("hour")
    )
    new_per_hour = first.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("newu")
    )
    hours = ev.select("event_type", "hour").distinct()
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        hours.join(new_per_hour, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("newu", F.lit(0)).alias("newu"),
        )
        .select(
            "event_type",
            "hour",
            F.sum("newu").over(w).alias("cum_distinct_users"),
        )
    )


_WINDOW_DISTINCT_ORACLE = """
WITH h AS (
  SELECT DISTINCT event_type, DATE_TRUNC('hour', ts) AS hour, user_id
  FROM events
)
SELECT DISTINCT event_type, hour,
       COUNT(DISTINCT user_id) OVER (
         PARTITION BY event_type ORDER BY hour
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS cum_distinct_users
FROM h
"""


def link_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-link-graph authority: PageRank (5 iterations, d=0.85)
    over the props.k browse graph — the link-based corpus-quality prior a
    web-scale curation pipeline attaches to each page before sampling.

    Exact-oracle-checkable despite being iterative: ranks are fixed-point
    BIGINTs updated with order-independent integer arithmetic
    (operators/graph.py), so Spark and DuckDB agree bit-for-bit.
    """
    from etl_workflows_spark.operators import graph

    ev = table(spark, sf_dir, "events")
    return graph.pagerank(graph.browse_graph(ev), iterations=5)


def link_graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the browse graph: outflow splits by
    transition COUNT (revisit frequency carries signal the simple-graph
    variant discards). Fixed-point integer arithmetic — exact-oracle-
    checked like the unweighted twin."""
    from etl_workflows_spark.operators import graph

    ev = table(spark, sf_dir, "events")
    weighted = (
        graph.browse_graph(ev)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return graph.pagerank_weighted(weighted, iterations=5)


def _pagerank_weighted_oracle() -> str:
    from etl_workflows_spark.operators import graph

    edges = (
        "SELECT src, dst, COUNT(*) AS weight FROM "
        f"({graph.BROWSE_EDGES_SQL}) GROUP BY src, dst"
    )
    return graph.pagerank_weighted_oracle_sql(edges, iterations=5)


_PAGERANK_WEIGHTED_ORACLE = _pagerank_weighted_oracle()


def link_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the pages reached by 'purchase' events
    (seeds = props.k of purchases): proximity-to-conversion scores for
    every page — the related-items / graph-retrieval primitive.
    Fixed-point integer math, exact-oracle-checked like its siblings."""
    from etl_workflows_spark.operators import graph

    ev = table(spark, sf_dir, "events")
    seeds = ev.filter(F.col("event_type") == "purchase").select(
        F.expr("cast(get_json_object(props, '$.k') as bigint)").alias("node")
    ).filter(F.col("node").isNotNull())
    return graph.pagerank_personalized(
        graph.browse_graph(ev), seeds, iterations=5
    )


def _ppr_oracle() -> str:
    from etl_workflows_spark.operators import graph

    seeds = (
        "SELECT CAST(props->>'$.k' AS BIGINT) AS node FROM events "
        "WHERE event_type = 'purchase' "
        "AND CAST(props->>'$.k' AS BIGINT) IS NOT NULL"
    )
    return graph.pagerank_personalized_oracle_sql(
        graph.BROWSE_EDGES_SQL, seeds, iterations=5
    )


_PPR_ORACLE = _ppr_oracle()


def _pagerank_oracle() -> str:
    from etl_workflows_spark.operators import graph

    return graph.pagerank_oracle_sql(graph.BROWSE_EDGES_SQL, iterations=5)


_PAGERANK_ORACLE = _pagerank_oracle()


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event_type: cumulative sum of (hourly count
    − series mean); the change point is the hour where |CUSUM| peaks
    (ties → earliest hour). The classic "when did the level shift"
    detector, entirely in window expressions.

    Scale: one hourly-grain agg (map-side combined), then windows
    PARTITIONED BY the series key — each series scans independently, so
    the only global structure is the per-key shuffle. The mean is exact
    (integer sums), and the cumulative sum runs in the same hour order
    on any engine, so the result is engine-portable to the rounding.
    """
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wk = W.partitionBy("event_type")
    scored = hourly.withColumn(
        "mean_n", F.avg("n").over(wk)
    ).withColumn(
        "cusum",
        F.sum(F.col("n") - F.col("mean_n")).over(
            wk.orderBy("hour").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    pick = wk.orderBy(F.abs(F.col("cusum")).desc(), F.asc("hour"))
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("changepoint_hour"),
            F.round(F.abs(F.col("cusum")), 4).alias("max_abs_cusum"),
        )
    )


_CUSUM_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, hour,
         SUM(n - mean_n) OVER (PARTITION BY event_type ORDER BY hour
                               ROWS UNBOUNDED PRECEDING) AS cusum
  FROM (SELECT *, AVG(n) OVER (PARTITION BY event_type) AS mean_n
        FROM hourly)
)
SELECT event_type, hour AS changepoint_hour,
       ROUND(ABS(cusum), 4) AS max_abs_cusum
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY ABS(cusum) DESC, hour) AS rn
      FROM scored)
WHERE rn = 1
"""


def aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with error bars
    (sampling.aqp_sum_estimate): per-returnflag revenue estimated from
    the deterministic 5% content-hash Bernoulli sample — Horvitz-Thompson
    Σv/p plus the ±1.96σ half-width from the Bernoulli variance
    (1−p)/p²·Σv². At 100 TB this answers the dashboard from 1/20 of the
    IO with quantified error; here it is hash-exact against DuckDB
    because the sample membership is the shared md5 recipe, p is the
    exact rational the hash compare implements, the sample sums are
    exact decimals, and the estimate is a mirrored fixed-association
    double expression (decimal→double via VARCHAR on the DuckDB side —
    its direct int128-decimal cast can land one ulp off)."""
    from etl_workflows_spark.operators.sampling import aqp_sum_estimate

    li = table(spark, sf_dir, "lineitem")
    v = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return aqp_sum_estimate(
        li,
        value_col=v,
        key=key,
        fraction=0.05,
        group_cols=["l_returnflag"],
        salt="aqp",
    )


def _aqp_oracle() -> str:
    from etl_workflows_spark.operators.sampling import aqp_oracle_math_sql

    thr_hex, p, cf = aqp_oracle_math_sql(0.05)
    return f"""
WITH s AS (
  SELECT l_returnflag,
         -- DECIMAL(19,4): int128-backed so v*v cannot overflow DuckDB's
         -- int64 multiply, and 19+19=38 satisfies its width rule; the
         -- VALUES are identical to Spark's (18,4) cast
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(19,4)) AS v
  FROM lineitem
  WHERE substr(md5('aqp:' || CAST(l_orderkey AS VARCHAR) || '|'
                   || CAST(l_linenumber AS VARCHAR)), 1, 8) < '{thr_hex}'
),
g AS (
  SELECT l_returnflag, COUNT(*) AS n_sampled,
         SUM(v) AS sv, SUM(v * v) AS sv2
  FROM s GROUP BY l_returnflag
),
gd AS (
  SELECT l_returnflag, n_sampled,
         CAST(CAST(sv AS VARCHAR) AS DOUBLE) AS svd,
         CAST(CAST(sv2 AS VARCHAR) AS DOUBLE) AS sv2d
  FROM g
)
SELECT l_returnflag, n_sampled,
       svd / {p} AS est_total,
       CASE WHEN n_sampled >= 2
            THEN SQRT({cf} * sv2d)
       END AS ci_half,
       CAST(n_sampled AS DOUBLE) / {p} AS est_count,
       CASE WHEN n_sampled >= 2
            THEN SQRT({cf} * CAST(n_sampled AS DOUBLE))
       END AS count_ci_half
FROM gd
"""


def link_components_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the FREQUENT-transition browse graph:
    edges are page→page transitions seen ≥4 times (graph.browse_graph +
    a count filter), symmetrized; every page gets the min page id of its
    component via the distributed min-label propagation the dedup
    clustering uses (dedup.cluster_duplicates — one join+agg per
    iteration, localCheckpoint-truncated lineage, loud on
    non-convergence). The iterative-graph class made oracle-checkable:
    the fixpoint is exactly "min REACHABLE id", which DuckDB computes
    with a recursive reachability CTE — convergence dynamics cancel out
    of the answer, so the hash check is exact."""
    from etl_workflows_spark.operators.dedup import cluster_duplicates
    from etl_workflows_spark.operators.graph import browse_graph

    ev = table(spark, sf_dir, "events")
    raw = browse_graph(ev)
    freq = (
        raw.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 4)
        .select("src", "dst")
    )
    pairs = freq.select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    labels = cluster_duplicates(pairs, max_iterations=64)
    return labels.select(
        F.col("doc_id").alias("page"), F.col("cluster").alias("component")
    )


_LINK_COMPONENTS_ORACLE = """
WITH RECURSIVE raw AS (
  SELECT prev AS src, page AS dst FROM (
    SELECT LAG(page) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev,
           page
    FROM (SELECT user_id, ts, event_id,
                 CAST(props->>'$.k' AS BIGINT) AS page
          FROM events
          WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL)
  ) WHERE prev IS NOT NULL
),
freq AS (SELECT src, dst FROM raw GROUP BY src, dst HAVING COUNT(*) >= 4),
e AS (SELECT src, dst FROM freq UNION SELECT dst, src FROM freq),
nodes AS (SELECT DISTINCT src AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id
)
SELECT id AS page, MIN(r) AS component
FROM reach GROUP BY id
"""


def scd2_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history REBUILD from the raw event stream
    (operators/scd.py state_intervals): per user, consecutive runs of an
    equal event_type collapse into validity intervals (version, state,
    valid_from, valid_to half-open, n_events) — the backfill/bootstrap
    twin of scd2_apply's incremental merge, and the gaps-and-islands
    window recipe (LAG change flag → running-sum island id → one agg per
    island → LEAD to close). Output feeds as_of/temporal_join unchanged.

    Reference scope: the reference pipeline rebuilds destination tables
    from full file snapshots (truncate-and-load); this is the same
    rebuild stance applied to a Type-2 dimension. Hash-exact vs the
    identical islands SQL in DuckDB.
    """
    from etl_workflows_spark.operators.scd import state_intervals

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return state_intervals(
        ev, key="user_id", state_col="event_type", ts_col="ts",
        tiebreak="event_id",
    )


_SCD2_INTERVALS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
              WHEN LAG(event_type) OVER w IS NOT DISTINCT FROM event_type
                THEN 0
              ELSE 1 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, event_type, ts,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS INTEGER)
           AS version
  FROM ordered
),
runs AS (
  SELECT user_id, version,
         MIN(event_type) AS state,
         MIN(ts) AS valid_from,
         COUNT(*) AS n_events
  FROM islands
  GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to,
       n_events
FROM runs
"""


QUERIES = {
    "aqp_revenue_estimate": aqp_revenue_estimate,
    "link_components_events": link_components_events,
    "scd2_intervals_events": scd2_intervals_events,
    "events_cusum_changepoint": events_cusum_changepoint,
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "golden_record_customers": golden_record_customers,
    "outlier_mad_events": outlier_mad_events,
    "benford_audit_orders": benford_audit_orders,
    "events_rolling_1h": events_rolling_1h,
    "tfidf_top_terms": tfidf_top_terms,
    "cohort_retention": cohort_retention,
    "funnel_conversion": funnel_conversion,
    "string_functions_ext": string_functions_ext,
    "agg_collect": agg_collect,
    "posexplode_tokens": posexplode_tokens,
    "events_multigrain_rollup": events_multigrain_rollup,
    "session_purchase_join": session_purchase_join,
    "approx_event_sketches": approx_event_sketches,
    "events_hopping_1h_15m": events_hopping_1h_15m,
    "events_gap_fill": events_gap_fill,
    "events_hourly_anomaly": events_hourly_anomaly,
    "zorder_keys_parts": zorder_keys_parts,
    "attribution_view_purchase": attribution_view_purchase,
    "events_distinct_hll_range": events_distinct_hll_range,
    "user_journey_pattern": user_journey_pattern,
    "grouped_regression": grouped_regression,
    "events_ewma": events_ewma,
    "equidepth_histogram": equidepth_histogram,
    "equidepth_histogram_approx": equidepth_histogram_approx,
    "bucketed_join_revenue": bucketed_join_revenue,
    "skewed_join_salted": skewed_join_salted,
    "skewed_join_unsalted": skewed_join_unsalted,
    "global_rowids_orders": global_rowids_orders,
    "purchase_state_temporal_join": purchase_state_temporal_join,
    "purchase_click_interval_join": purchase_click_interval_join,
    "link_graph_pagerank": link_graph_pagerank,
    "events_seasonal_decompose": events_seasonal_decompose,
    "forecast_backtest_events": forecast_backtest_events,
    "holt_forecast_events": holt_forecast_events,
    "skewed_sum_two_phase": skewed_sum_two_phase,
    "audience_overlap_events": audience_overlap_events,
    "link_graph_pagerank_weighted": link_graph_pagerank_weighted,
    "link_graph_ppr": link_graph_ppr,
    "window_distinct_running": window_distinct_running,
}

ORACLE_SQL = {
    "aqp_revenue_estimate": _aqp_oracle(),
    "link_components_events": _LINK_COMPONENTS_ORACLE,
    "scd2_intervals_events": _SCD2_INTERVALS_ORACLE,
    "events_ewma": _EWMA_ORACLE,
    "holt_forecast_events": _HOLT_ORACLE,
    "events_cusum_changepoint": _CUSUM_ORACLE,
    "fuzzy_name_pairs": _FUZZY_PAIRS_ORACLE,
    "golden_record_customers": _GOLDEN_RECORD_ORACLE,
    "outlier_mad_events": _OUTLIER_MAD_ORACLE,
    "benford_audit_orders": _BENFORD_ORACLE,
    "events_rolling_1h": _ROLLING_ORACLE,
    "tfidf_top_terms": _TFIDF_ORACLE,
    "cohort_retention": _COHORT_ORACLE,
    "funnel_conversion": _FUNNEL_ORACLE,
    "string_functions_ext": _STRING_EXT_ORACLE,
    "agg_collect": _AGG_COLLECT_ORACLE,
    "posexplode_tokens": _POSEXPLODE_ORACLE,
    "events_multigrain_rollup": _MULTIGRAIN_ORACLE,
    "session_purchase_join": _SESSION_JOIN_ORACLE,
    "events_hopping_1h_15m": _HOPPING_ORACLE,
    "events_gap_fill": _GAP_FILL_ORACLE,
    "events_hourly_anomaly": _ANOMALY_ORACLE,
    "zorder_keys_parts": _zorder_oracle(),
    "attribution_view_purchase": _ATTRIBUTION_ORACLE,
    "user_journey_pattern": _JOURNEY_ORACLE,
    "grouped_regression": _GROUPED_REGRESSION_ORACLE,
    "equidepth_histogram": _EQUIDEPTH_ORACLE,
    "bucketed_join_revenue": _BUCKETED_JOIN_ORACLE,
    "skewed_join_salted": _SKEWED_JOIN_ORACLE,
    "skewed_join_unsalted": _SKEWED_JOIN_ORACLE,
    "global_rowids_orders": _GLOBAL_ROWIDS_ORACLE,
    "purchase_state_temporal_join": _TEMPORAL_JOIN_ORACLE,
    "purchase_click_interval_join": _INTERVAL_JOIN_ORACLE,
    "link_graph_pagerank": _PAGERANK_ORACLE,
    "events_seasonal_decompose": _SEASONAL_ORACLE,
    "forecast_backtest_events": _FORECAST_BACKTEST_ORACLE,
    "skewed_sum_two_phase": _TWO_PHASE_ORACLE,
    "link_graph_pagerank_weighted": _PAGERANK_WEIGHTED_ORACLE,
    "link_graph_ppr": _PPR_ORACLE,
    "window_distinct_running": _WINDOW_DISTINCT_ORACLE,
}
