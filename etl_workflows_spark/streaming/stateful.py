"""Custom stateful streaming operators.

The reference has no streaming surface (SURVEY.md §2.6) — its
newest-file-then-archive loop is hand-rolled micro-batching. This module
supplies the stateful-operator tier a production pipeline needs on top of
``incremental.py``'s ingestion:

- ``streaming_sessionize_native``: gap-based sessions with Spark's
  built-in ``session_window`` — the idiomatic, fully JVM-side path. Use
  this whenever plain gap semantics are enough: state is managed by the
  engine, merge-sorted, and spillable.
- ``streaming_state_intervals``: stateful SCD2 maintenance — each key's
  open (state, valid_from, count) run persists across micro-batches;
  a state change emits the closed validity interval. The streaming twin
  of ``operators/scd.state_intervals`` (batch-parity-pinned).
- ``streaming_sessionize``: the same semantics via
  ``applyInPandasWithState``, PLUS a ``max_events`` session cap —
  a policy ``session_window`` cannot express (the built-in merges any
  events within the gap; it has no per-session row budget). This is the
  template for arbitrary custom state machines: explicit state schema,
  event-time timeouts, and an audited ``closed_by`` provenance column.

Scale notes (100 TB): state is per-user and O(1) per open session — the
pandas path keeps only (start, last, n) per key, never the events
themselves, so state size is #active-users × 24 bytes regardless of event
volume. Both paths shuffle once on the session key; watermark bounds state
lifetime. Timestamps cross the Python boundary as epoch-millis longs
(cheap, tz-unambiguous), not as pandas Timestamps.

Forward path: Spark 4's ``transformWithStateInPandas`` (StatefulProcessor
with named ValueState/ListState/MapState, timers, TTL) supersedes
``applyInPandasWithState`` for new custom operators; it needs a working
``protobuf`` install for its driver-side runner, which this build
environment lacks (ImportError at runner init — verified), so the
operators here stay on the stable API.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_OUT_COLS = ["session_start", "session_end", "n_events", "closed_by"]


def _output_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            key_field,
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("closed_by", T.StringType()),
        ]
    )


def _session_fn(gap_ms: int, max_events: int | None, key_name: str):
    """Build the per-group state machine. State = (start_ms, last_ms, n)
    of the single open session; closed sessions are emitted immediately."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(start: int, last: int, n: int, why: str) -> dict[str, Any]:
            return {
                key_name: key[0],
                "session_start": pd.Timestamp(start, unit="ms"),
                "session_end": pd.Timestamp(last, unit="ms"),
                "n_events": n,
                "closed_by": why,
            }

        cols = [key_name, *_OUT_COLS]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n, "timeout")], columns=cols)
            return

        times: list[int] = []
        for pdf in pdfs:
            # NULL ts (NaN) has no event-time position — int() would
            # crash the micro-batch; skip like streaming_ewma does
            times.extend(int(t) for t in pdf["__ts_ms"] if not pd.isna(t))
        times.sort()

        start, last, n = state.get if state.exists else (None, 0, 0)
        closed: list[dict[str, Any]] = []
        for t in times:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:
                closed.append(row(start, last, n, "gap"))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
            if max_events is not None and n >= max_events:
                closed.append(row(start, last, n, "cap"))
                start = None
        if start is None:
            state.remove()
        else:
            state.update((start, last, n))
            # fires once the event-time watermark passes last + gap
            state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_events: int | None = None,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator
    (``applyInPandasWithState``, event-time timeout).

    Emits one row per *closed* session: ``(user, session_start,
    session_end, n_events, closed_by)`` where ``closed_by`` is ``gap`` (a
    later event opened a new session), ``timeout`` (watermark passed
    last_event + gap), or ``cap`` (``max_events`` reached — the policy the
    built-in ``session_window`` cannot express; see
    ``streaming_sessionize_native`` for the plain-gap idiomatic form).

    Batch-twin parity: on the same input, closed ``gap`` sessions match
    the batch ``sessionize`` query (queries/relational.py) exactly; the
    final still-open session per user is withheld until it times out.
    """
    gap_ms = _parse_duration_ms(gap)
    # Watermark machinery requires an LTZ event-time column (NTZ corpus
    # timestamps cast through; session TZ is pinned UTC ⇒ wall-time id).
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    ev = ev.withWatermark(ts_col, watermark).withColumn(
        "__ts_ms", (F.unix_micros(F.col(ts_col)) / 1000).cast("long")
    )
    key_field = T.StructField(
        user_col, events.schema[user_col].dataType, nullable=True
    )
    return ev.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_ms, max_events, user_col),
        outputStructType=_output_schema(key_field),
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_sessionize_native(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions with the built-in ``session_window`` — fully
    JVM-side, engine-managed mergeable state. Prefer this form unless the
    session policy needs custom state (see ``streaming_sessionize``)."""
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        ev.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # session_end = LAST EVENT ts, matching streaming_sessionize
            # and the batch twin — win.end is last_ts + gap, a different
            # contract that would silently shift every session by +gap
            F.max(F.col(ts_col)).alias("session_end"),
        )
        .select(
            F.col(user_col),
            F.col("win.start").alias("session_start"),
            "session_end",
            "n_events",
        )
    )


def _parse_duration_ms(s: str) -> int:
    """'30 minutes' / '90 seconds' / '2 hours' → milliseconds."""
    qty, unit = s.split()
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(qty) * mult


_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ms", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def streaming_ewma(
    events: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of the batch EWMA (operators/timeseries.py): per-key
    exponential smoothing whose state — ONE (last_ts, ewma) pair per key —
    persists across micro-batches via ``applyInPandasWithState``.

    Emits every input row with its smoothed value, in event-time order
    within the key. Rows arriving out of order ACROSS micro-batches
    (event time older than the state's last emitted point) are emitted
    with null ewma rather than silently corrupting the recursion — the
    recursion is order-defined, so late data needs an upstream
    watermark+sort stage if it must participate.

    Scale: state is O(keys), not O(events); each micro-batch shuffles
    once on the key like the batch twin.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    key_type = events.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            for t, v in zip(pdf["__ts_ms"], pdf[value_col]):
                # NULL ts (NaN here) has no event-time position — int()
                # would crash the whole micro-batch; NULL value would
                # poison the recursion with NaN FOREVER (NaN is not None,
                # so it would be persisted as state). Both are skipped:
                # a row without a time or a value is not an observation.
                if pd.isna(t) or pd.isna(v):
                    continue
                rows.append((int(t), float(v)))
        rows.sort()
        last_ms, s = state.get if state.exists else (-(2**62), None)
        out = []
        for t, v in rows:
            if t < last_ms:
                out.append((key[0], t, v, None))  # late vs emitted state
                continue
            s = v if s is None else alpha * v + (1 - alpha) * s
            last_ms = t
            out.append((key[0], t, v, s))
        if s is not None:
            # s is None ⇔ no observation ever seen for this key — storing a
            # fabricated 0.0 would seed the recursion with a fake datum
            state.update((last_ms, s))
        yield pd.DataFrame(out, columns=[key_col, "ts_ms", value_col, "ewma"])

    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withColumn(
        "__ts_ms", (F.unix_micros(F.col(ts_col)) / 1000).cast("long")
    )
    return ev.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_INTERVALS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("state_val", T.StringType()),
        T.StructField("state_is_null", T.BooleanType()),
        T.StructField("valid_from_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("last_tie", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ]
)


def streaming_state_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``operators/scd.state_intervals``: maintains each
    key's OPEN run — (state value, valid_from, last event position, count,
    version) — across micro-batches via ``applyInPandasWithState`` and
    emits an SCD2 interval row the moment a state change CLOSES a run.

    Emitted rows carry (key, version, state, valid_from_ms, valid_to_ms,
    n_events, late=false) and are exactly the closed intervals the batch
    rebuild would produce on the same prefix — the still-open run lives
    only in state (append mode cannot retract; read the final open run
    from state by ending the stream, or rebuild with the batch twin).
    Rows arriving out of order ACROSS micro-batches — event position
    (ts, tiebreak) at or before the last folded position — are emitted
    with ``late=true`` and NULL interval fields rather than silently
    corrupting the run structure (same stance as ``streaming_ewma``:
    islands are order-defined; late data needs an upstream
    watermark+sort). NULL-ts rows are skipped: no event-time position.
    NULL STATES are legal runs (mirroring the batch twin) — the state
    row encodes them with an explicit is-null flag.

    Scale: state is O(keys) × one small row, never the events; one
    shuffle per micro-batch on the key — identical to the batch twin's
    partitioning.
    """
    key_type = events.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("version", T.IntegerType()),
            T.StructField("state", T.StringType()),
            T.StructField("valid_from_ms", T.LongType()),
            T.StructField("valid_to_ms", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("late", T.BooleanType()),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            for t, tie, sv in zip(
                pdf["__ts_ms"], pdf[tiebreak_col], pdf[state_col]
            ):
                if pd.isna(t):
                    continue  # no event-time position — not an observation
                # normalize pandas NaN to Python None (null string cell);
                # a NULL tiebreak sorts first, like the batch twin's
                # NULLS FIRST window order
                rows.append(
                    (
                        int(t),
                        -(2**62) if pd.isna(tie) else int(tie),
                        None if pd.isna(sv) else str(sv),
                    )
                )
        rows.sort(key=lambda r: (r[0], r[1]))
        if state.exists:
            sv, is_null, vfrom, last_ms, last_tie, n, ver = state.get
            cur = (None if is_null else sv, vfrom, last_ms, last_tie, n, ver)
        else:
            cur = None
        out = []
        for t, tie, sv in rows:
            if cur is not None and (t, tie) <= (cur[2], cur[3]):
                out.append((key[0], None, sv, t, None, None, True))
                continue
            if cur is None:
                cur = (sv, t, t, tie, 1, 1)
            elif sv == cur[0]:
                cur = (cur[0], cur[1], t, tie, cur[4] + 1, cur[5])
            else:
                # state change: the open run closes AT this event's time
                out.append(
                    (key[0], cur[5], cur[0], cur[1], t, cur[4], False)
                )
                cur = (sv, t, t, tie, 1, cur[5] + 1)
        if cur is not None:
            state.update(
                (
                    cur[0],
                    cur[0] is None,
                    cur[1],
                    cur[2],
                    cur[3],
                    cur[4],
                    cur[5],
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                key_col,
                "version",
                "state",
                "valid_from_ms",
                "valid_to_ms",
                "n_events",
                "late",
            ],
        )

    ev = events.withColumn(
        "__ts_ms", (F.unix_micros(F.col(ts_col).cast("timestamp")) / 1000).cast("long")
    )
    return ev.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_INTERVALS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
