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
watermark bounds state; the stateful path keeps a session LIST per user
whose size the watermark bounds at WATERMARK/GAP + 1 (sessions are >=
GAP apart and anything ending before the watermark is emitted and
dropped) — constant state per key with true session_window semantics.
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
_STATE_DDL = (
    "starts array<long>, lasts array<long>, ns array<long>, svs array<double>"
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
    """applyInPandasWithState kernel with TRUE session_window semantics:
    state holds a LIST of open sessions (parallel arrays starts/lasts/
    ns/svs, sorted by start); a session is emitted only once the
    watermark passes its end (last + GAP) — exactly the built-in's
    append-mode contract, so arbitrarily-reordered within-watermark
    events (including stragglers older than every open session) always
    merge correctly: they are just more intervals in the merge.

    Per batch: events are sessionized vectorized (sort → np.diff > GAP
    boundaries → reduceat aggregates), then interval-merged with the
    state's sessions (two sessions merge when next.start <= cur.last +
    GAP — the same inclusive-gap rule as session_window and the DuckDB
    gap-and-island twin). Sessions ending strictly before the watermark
    can never absorb another event (Spark drops rows with ts < watermark
    before this function) → emitted and dropped from state; the rest
    persist with an event-time timeout at the earliest open end, so
    tail sessions flush on watermark advance with no further data.

    The list is bounded: open sessions are > GAP apart and all end at or
    after the watermark, so a key holds at most WATERMARK/GAP + 1 of
    them (3 with the module constants)."""
    import numpy as np

    gap_us = GAP_SECONDS * 1_000_000
    wm_us = state.getCurrentWatermarkMs() * 1000

    sessions = []  # [(start_us, last_us, n, sv)] sorted by start
    if state.exists:
        starts, lasts, ns, svs = state.get
        sessions = [
            (int(a), int(b), int(c), float(d))
            for a, b, c, d in zip(starts, lasts, ns, svs)
        ]

    if not state.hasTimedOut:
        rows = [p for p in pdf_iter if len(p)]
        if rows:
            events = pd.concat(rows)
            order = np.argsort(events["ts"].to_numpy(), kind="stable")
            ts_us = (events["ts"].astype("int64").to_numpy() // 1000)[order]
            vals = events["value"].to_numpy(dtype="float64")[order]
            brk = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
            seg = np.concatenate(([0], brk))
            seg_end = np.concatenate((brk, [len(ts_us)]))
            seg_sv = np.add.reduceat(vals, seg)
            sessions.extend(
                (int(ts_us[i]), int(ts_us[j - 1]), int(j - i), float(sv))
                for i, j, sv in zip(seg, seg_end, seg_sv)
            )
            sessions.sort(key=lambda s: s[0])
            merged = []
            for s in sessions:
                if merged and s[0] <= merged[-1][1] + gap_us:
                    m = merged[-1]
                    merged[-1] = (
                        m[0], max(m[1], s[1]), m[2] + s[2], m[3] + s[3]
                    )
                else:
                    merged.append(s)
            sessions = merged

    closed = [s for s in sessions if s[1] + gap_us < wm_us]
    open_ = [s for s in sessions if s[1] + gap_us >= wm_us]
    if open_:
        state.update((
            [s[0] for s in open_],
            [s[1] for s in open_],
            [s[2] for s in open_],
            [s[3] for s in open_],
        ))
        min_end_ms = min(s[1] for s in open_) // 1000 + GAP_SECONDS * 1000
        state.setTimeoutTimestamp(max(min_end_ms, wm_us // 1000 + 1))
    elif state.exists:
        state.remove()

    if closed:
        yield pd.DataFrame(
            [
                (
                    key[0],
                    pd.Timestamp(s[0], unit="us"),
                    pd.Timestamp(s[1] + gap_us, unit="us"),
                    int(s[2]),
                    round(float(s[3]), 4),
                )
                for s in closed
            ],
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
        stateStructType=_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir)
    )
