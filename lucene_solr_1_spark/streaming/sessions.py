"""Event sessionization — gap-based session windows, three ways:

1. batch: built-in `session_window` aggregation (Catalyst-native; the
   'prefer built-in operators' path) — the DuckDB oracle twin is the
   classic gap-and-island SQL generated from the SAME gap constant;
2. streaming: the same session_window aggregation under a watermark
   (append mode emits a session once the watermark passes its close);
3. streaming, custom stateful: `applyInPandasWithState` with event-time
   timeouts — the template for session logic Spark's built-in windows
   cannot express (per-session custom state machines).

Semantics (all three): events of a user belong to one session while each
gap to the previous event is <= GAP; session_end = last event + GAP
(Spark session_window contract). Streaming == batch is pytest-asserted;
batch == DuckDB is driver-gate hashed.

Scale notes: sessions shuffle on user_id (high-cardinality, uniform);
watermark bounds state; the stateful path keeps ONE open session per
user (constant state per key).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .analytics import load_events

GAP = "30 minutes"
GAP_SECONDS = 30 * 60
WATERMARK = "60 minutes"

_EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
_SESSION_DDL = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)


def _session_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (session_window built-in)."""
    return _session_agg(load_events(spark, sf_dir)).orderBy(
        "user_id", "session_start"
    )


def sessionize_duck() -> str:
    """Gap-and-island twin generated from the same GAP constant."""
    return f"""
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {GAP_SECONDS} SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL {GAP_SECONDS} SECOND AS session_end,
       count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_start
""".strip()


def sessionize_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
):
    """Streaming sessionization with the BUILT-IN session_window under a
    watermark (append mode: sessions emit once finalized)."""
    events = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .parquet(source_dir)
        .withWatermark("ts", WATERMARK)
    )
    return (
        _session_agg(events)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir)
    )


def _sessionize_state_func(key, pdf_iter, state):
    """applyInPandasWithState kernel: one open session per user in state
    (start_us, last_us, n, sum_value as int64/float64); CLOSED sessions
    are emitted as soon as a later event proves the gap, or when the
    event-time timeout (watermark past last+GAP) fires.

    Late (within-watermark, out-of-order ACROSS micro-batches) events
    MERGE into the open session when they fall within its gap-extended
    span [start-GAP, last]: start/last track min/max, so a late event
    never moves the session backwards (ADVICE r2 fix). A straggler older
    than start-GAP emits immediately as its own single-event session —
    the one divergence from the built-in session_window, which would
    hold it to merge with even-later stragglers (documented trade-off:
    constant state per key instead of a session list)."""
    gap_us = GAP_SECONDS * 1_000_000
    out = []

    def emit(start_us, last_us, n, sv):
        out.append(
            (
                key[0],
                pd.Timestamp(start_us, unit="us"),
                pd.Timestamp(last_us + gap_us, unit="us"),
                int(n),
                round(float(sv), 4),
            )
        )

    if state.hasTimedOut:
        start_us, last_us, n, sv = state.get
        emit(start_us, last_us, n, sv)
        state.remove()
    else:
        rows = [p for p in pdf_iter if len(p)]
        if rows:
            events = pd.concat(rows).sort_values("ts")
            ts_us = events["ts"].astype("int64").to_numpy() // 1000
            vals = events["value"].to_numpy()
            if state.exists:
                start_us, last_us, n, sv = state.get
            else:
                start_us, last_us, n, sv = None, None, 0, 0.0
            for t, v in zip(ts_us, vals):
                t = int(t)
                if last_us is None:
                    start_us, last_us, n, sv = t, t, 1, float(v)
                    continue
                if t > last_us + gap_us:
                    emit(start_us, last_us, n, sv)
                    start_us, last_us, n, sv = t, t, 1, float(v)
                    continue
                if t < start_us - gap_us:
                    # straggler older than the open session's reach: its
                    # own (already-gap-closed) session, emitted now
                    emit(t, t, 1, float(v))
                    continue
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1
                sv += float(v)
            state.update((int(start_us), int(last_us), int(n), float(sv)))
            state.setTimeoutTimestamp(last_us // 1000 + GAP_SECONDS * 1000)
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_start", "session_end", "n_events", "sum_value",
            ],
        )


def sessionize_stateful_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
):
    """Custom stateful sessionization: applyInPandasWithState + event-time
    timeout — same semantics as session_window, written as an explicit
    per-key state machine (the extension point for session logic the
    built-in cannot express)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .parquet(source_dir)
        .withWatermark("ts", WATERMARK)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _sessionize_state_func,
        outputStructType=_SESSION_DDL,
        stateStructType="start_us long, last_us long, n long, sv double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir)
    )
