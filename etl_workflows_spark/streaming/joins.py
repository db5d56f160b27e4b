"""Stream-stream joins with bounded state.

The scale problem: joining two UNBOUNDED streams naively requires keeping
every past row of both sides. Structured Streaming bounds the buffered
state when (a) both sides carry a watermark and (b) the join condition
constrains event time across sides — then each side's buffer is evicted
past ``watermark + join window``, independent of stream length.

The operator here is the canonical attribution shape: join each
conversion event to the same user's trigger events in the preceding
``window``. The same function body runs in batch (watermark is a no-op)
— one definition, two execution modes, which is how the engine keeps
stream/batch semantic parity testable (cf. the streaming twins in
streaming/incremental.py).

Reference parity: none (the reference has no streaming — SURVEY.md §2.6);
net-new north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    triggers: DataFrame,
    conversions: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each conversion to all same-key trigger events in the
    preceding ``window`` (inclusive bounds: t_ts ∈ [c_ts - window, c_ts]).

    Both inputs may be streaming DataFrames — each gets ``watermark`` on
    its event-time column, and the time-range predicate lets the engine
    evict buffered rows, so state is O(rate × (watermark + window)) per
    side, not O(stream).

    Output columns: key, trigger_id, trigger_ts, conversion_id,
    conversion_ts, value (the conversion's value).
    """
    # Stateful ops need LTZ event time; corpus timestamps are NTZ (see
    # streaming_hourly_rollup for the same dance). Cast in, cast out.
    def _ltz(df: DataFrame) -> tuple[DataFrame, bool]:
        ntz = dict(df.dtypes).get(time_col) == "timestamp_ntz"
        return (
            df.withColumn(time_col, F.col(time_col).cast("timestamp")) if ntz else df,
            ntz,
        )

    trig, t_ntz = _ltz(triggers)
    conv, c_ntz = _ltz(conversions)
    t = trig.withWatermark(time_col, watermark).select(
        F.col(key).alias("__tk"),
        F.col("event_id").alias("trigger_id"),
        F.col(time_col).alias("trigger_ts"),
    )
    c = conv.withWatermark(time_col, watermark).select(
        F.col(key).alias(key),
        F.col("event_id").alias("conversion_id"),
        F.col(time_col).alias("conversion_ts"),
        F.col("value"),
    )
    joined = c.join(
        t,
        (F.col(key) == F.col("__tk"))
        & (F.col("trigger_ts") >= F.col("conversion_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("trigger_ts") <= F.col("conversion_ts")),
    ).drop("__tk")
    if t_ntz or c_ntz:
        joined = joined.withColumn(
            "trigger_ts", F.col("trigger_ts").cast("timestamp_ntz")
        ).withColumn("conversion_ts", F.col("conversion_ts").cast("timestamp_ntz"))
    return joined.select(
        key, "trigger_id", "trigger_ts", "conversion_id", "conversion_ts", "value"
    )


def enrich_stream(
    events: DataFrame,
    dim_table: str,
    keys: list[str],
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment against a dimension TABLE (by name,
    not by captured DataFrame): the dim side's DATA is re-read every
    micro-batch, and because resolution goes through the catalog each
    run, dimension updates (a ``merge_into`` upsert, a CDC apply)
    are visible to the next ``Trigger.AvailableNow`` run over the same
    checkpoint — the incremental-cron pattern. (Within one long-running
    query, a file-backed table's FILE LISTING is captured at start;
    refresh the table or use per-run triggers to pick up new files —
    this is engine behavior worth encoding, not fighting.)

    Broadcast is requested explicitly: the dim side of a stream-static
    join should never shuffle the stream (each micro-batch would pay a
    full exchange); if the dimension outgrows broadcast, restructure to
    a stream-stream join or pre-key the stream.

    ``how='left'`` (default) keeps unmatched events with NULL dim
    columns — an enrichment must not drop facts because a dimension row
    is late. Returns a streaming DataFrame; compose with any sink.
    """
    spark = events.sparkSession
    dim = spark.table(dim_table)
    if dim_cols is not None:
        dim = dim.select(*keys, *dim_cols)
    # same guard as operators/scd.temporal_join: a shared non-key column
    # name would produce ambiguous duplicate columns that only blow up
    # at stream runtime on the first downstream reference
    overlap = [c for c in dim.columns if c in events.columns and c not in keys]
    if overlap:
        raise ValueError(
            f"dim columns collide with event columns: {overlap}; pass "
            "dim_cols or rename before enriching"
        )
    return events.join(F.broadcast(dim), keys, how)
