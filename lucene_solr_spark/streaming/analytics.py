"""Event-time streaming analytics: watermarked windows + sessionization.

Reference semantics (SURVEY.md §2.8 / §2.13): Solr's streaming
expressions expose rolling/windowed aggregation over tuple streams
(solrj/io/stream/RollupStream.java:41, TimeSeriesStream), and the
analytics contract a webtext event pipeline needs on top of that is
gap-based sessionization — the canonical stateful-stream operator.

Spark mapping (idiomatic Structured Streaming, not a translation):

- `windowed_counts` is ONE logical plan applied to either a batch or a
  streaming DataFrame: `groupBy(window(ts))` + aggregates. In streaming
  form the caller attaches `withWatermark` so Spark can evict window
  state once event time passes; in batch form the identical plan is
  DuckDB-oracle-verifiable (the contract entry).
- `sessionize` (batch) is pure declarative window functions: a session
  break is `ts - lag(ts) > gap` per user; a running sum of breaks names
  the session; one groupBy aggregates per-session stats. Two shuffles
  total (user-partitioned sort + session groupBy), no Python in the hot
  path — this is the 100 TB path (sessionization of N events is one
  repartition by user_id + per-partition sort, exactly what
  Window.partitionBy compiles to).
- `sessionize_stateful` is the streaming form: applyInPandasWithState
  with EventTimeTimeout. State per user = the open session (start, last
  ts, count, sum). A new event either extends the open session or
  closes it (gap exceeded) and emits the closed one; watermark timeout
  flushes sessions whose gap can no longer be breached by late data.
  State is O(active users), not O(events) — the property that makes it
  run forever on an unbounded stream.

Parity contract (tests/test_streaming_analytics.py): the stateful
sessionizer run as a real streaming query (availableNow trigger, memory
sink, a max-event-time sentinel to advance the final watermark) emits
exactly the batch `sessionize` result.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


# ---------------------------------------------------------------------------
# Windowed counts: one logical plan, batch or streaming input.
# ---------------------------------------------------------------------------


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts + value sum.

    Pass a streaming DataFrame and a `watermark` (e.g. "2 hours") for
    the Structured Streaming form — the watermark bounds state so the
    agg runs indefinitely; late rows beyond it are dropped, exactly the
    late-data contract of the reference's time-series facets. Pass a
    batch DataFrame (watermark=None) for the oracle-checkable form:
    the logical plan is identical.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return events.groupBy(F.window("ts", window).alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch form flattened for contract comparison (window start only)."""
    return (
        windowed_counts(events, window=window)
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_value")
        .orderBy("win_start")
    )


# ---------------------------------------------------------------------------
# Gap sessionization, batch (declarative) form.
# ---------------------------------------------------------------------------


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user, pure window functions.

    A session ends when the user is silent for > gap_minutes. Output is
    one row per (user_id, session): start/end timestamps, event count,
    value sum. Plan: one hash-partition by user_id with in-partition
    sort (the Window), one groupBy on (user_id, session_no) that reuses
    the same partitioning — Catalyst collapses it to a single exchange.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    marked = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            # tz-free epoch micros (ts is TIMESTAMP_NTZ in the webtext
            # tables; unix_micros would force a session-tz cast)
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
        )
        .withColumn(
            "new_session",
            F.when(
                F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_no", F.sum("new_session").over(w))
    )
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("user_id").cast("long"),
            F.col("session_no").cast("long"),
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Gap sessionization, stateful streaming form.
# ---------------------------------------------------------------------------

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# state: open session for this user
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                st, last, n, s = state.get
                closed.append((user_id, st, last, n, s))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            # pandas datetime64[ns] -> int64 ns; convert to micros
            ts_us = rows["ts"].astype("int64") // 1000
            vals = rows["value"].astype("float64")
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                if cur is None:
                    cur = [t, t, 1, v]
                elif t - cur[1] > gap_us:
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [t, t, 1, v]
                else:
                    # late (out-of-order within the watermark) events
                    # extend the span, never shrink it
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += v
            state.update(tuple(cur))
            # time out once the watermark passes last_ts + gap: no
            # on-time event can extend this session any more. Clamp
            # above the current watermark — setTimeoutTimestamp
            # REJECTS timestamps at/behind it (a late batch for an
            # old session would otherwise kill the query).
            want_ms = cur[1] // 1000 + gap_minutes * 60 * 1000
            state.setTimeoutTimestamp(
                max(want_ms, state.getCurrentWatermarkMs() + 1)
            )

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                    "sum_value": [round(c[4], 4) for c in closed],
                }
            )

    return fn


def sessionize_stateful(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming gap sessionizer: applyInPandasWithState.

    `events_stream` must be a streaming DataFrame with columns
    (user_id, ts, event_id, value). Emits one row per CLOSED session —
    closed either by a later event past the gap or by the event-time
    timeout once the watermark passes session_end + gap. State per key
    is a single 4-tuple, so total state is O(active users).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def dedup_pages_stream(
    pages_stream: DataFrame,
    watermark: str = "24 hours",
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming URL-level dedup of a crawl feed.

    Canonicalizes each page's URL (ops/urls.py — RFC 3986 syntax
    normalization + tracking-param removal, pure built-in expressions)
    and keeps the FIRST capture per canonical URL seen within the
    watermark horizon, via dropDuplicatesWithinWatermark — the
    streaming twin of `dedup_by_canonical_url`. State is one key per
    distinct canonical URL inside the watermark window and is evicted
    as event time advances, so the query runs indefinitely; re-crawls
    farther apart than the watermark are NOT deduped (that's the
    documented horizon trade — widen the watermark or run the batch
    op over the sink to fold the tail).
    """
    from lucene_solr_spark.ops.urls import canonical_url

    return (
        pages_stream.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )


def run_sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    gap_minutes: int = 30,
    query_name: str = "sessions",
) -> DataFrame:
    """Drive the stateful sessionizer over a parquet directory with an
    availableNow trigger and a memory sink; returns the emitted rows.

    Test/sandbox harness — production would writeStream to a real sink
    with a checkpoint location.
    """
    src = spark.readStream.schema(schema).parquet(source_dir)
    out = sessionize_stateful(src, gap_minutes=gap_minutes)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
