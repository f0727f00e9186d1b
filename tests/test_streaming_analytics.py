"""Event-time streaming analytics: windowed aggs + sessionization.

Pins (1) the batch sessionizer against a plain-python reference, (2)
the applyInPandasWithState streaming sessionizer against the batch one
(run as a REAL streaming query — parquet source, availableNow trigger,
memory sink, event-time timeout flushed by a max-ts sentinel), and (3)
the watermarked streaming windowed agg against its batch twin.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from lucene_solr_spark.streaming.analytics import (
    run_sessionize_stream,
    sessionize,
    windowed_counts,
    windowed_counts_batch,
)

from tests.conftest import SF_MID

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

GAP_MIN = 60


def _events_subset(spark, n_users: int = 12):
    return (
        spark.read.parquet(f"{SF_MID}/events.parquet")
        .where(F.col("user_id") < n_users)
        .select("user_id", "ts", "event_id", "value")
    )


def _sessions_ref(pdf: pd.DataFrame, gap_minutes: int) -> pd.DataFrame:
    """Plain-python gap sessionizer (the semantic oracle)."""
    gap = dt.timedelta(minutes=gap_minutes)
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        cur = None
        for _, r in g.iterrows():
            if cur is None or r["ts"] - cur["end"] > gap:
                if cur is not None:
                    out.append((uid, cur["start"], cur["end"], cur["n"], cur["s"]))
                cur = {"start": r["ts"], "end": r["ts"], "n": 1, "s": r["value"]}
            else:
                cur["end"] = r["ts"]
                cur["n"] += 1
                cur["s"] += r["value"]
        if cur is not None:
            out.append((uid, cur["start"], cur["end"], cur["n"], cur["s"]))
    return pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events", "sv"]
    )


def test_sessionize_batch_matches_reference(spark):
    ev = _events_subset(spark, n_users=12)
    got = (
        sessionize(ev, gap_minutes=GAP_MIN)
        .orderBy("user_id", "session_no")
        .toPandas()
    )
    ref = _sessions_ref(ev.toPandas(), GAP_MIN)
    assert len(got) == len(ref)
    # session_no must be dense 0..k per user
    for _, g in got.groupby("user_id"):
        assert list(g["session_no"]) == list(range(len(g)))
    for col in ("user_id", "session_start", "session_end", "n_events"):
        assert list(got[col]) == list(ref[col]), col
    assert got["sum_value"].to_numpy() == pytest.approx(
        ref["sv"].round(4).to_numpy(), abs=1e-3
    )


def test_sessionize_stateful_stream_parity(spark, tmp_path):
    ev = _events_subset(spark, n_users=12)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # Sentinel: one far-future event advances the watermark past every
    # real session's (end + gap), so EventTimeTimeout flushes all state
    # before the availableNow query terminates.
    sentinel = spark.createDataFrame(
        [(-1, max_ts + dt.timedelta(days=365), -1, 0.0)], EVENT_SCHEMA
    )
    src = tmp_path / "events_src"
    ev.select("user_id", "ts", "event_id", "value").unionByName(sentinel).coalesce(
        2
    ).write.parquet(str(src))

    got = (
        run_sessionize_stream(
            spark, str(src), EVENT_SCHEMA, gap_minutes=GAP_MIN, query_name="sess_t"
        )
        .where(F.col("user_id") >= 0)
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    want = (
        sessionize(ev, gap_minutes=GAP_MIN)
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    assert len(got) == len(want)
    for col in ("user_id", "session_start", "session_end", "n_events"):
        assert list(got[col]) == list(want[col]), col
    assert got["sum_value"].to_numpy() == pytest.approx(
        want["sum_value"].to_numpy(), abs=1e-3
    )


def test_sessionize_plan_single_exchange(spark):
    """The 100 TB shape: ONE hash exchange on user_id feeds both window
    functions AND the (user_id, session_no) aggregate — Catalyst must
    recognize the partitioning subset, and the scan must prune to the
    4 referenced columns (no props/event_type)."""
    ev = spark.read.parquet(f"{SF_MID}/events.parquet")
    plan = sessionize(ev, gap_minutes=GAP_MIN)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "props" not in plan and "event_type" not in plan


def test_sessionize_matches_native_session_window(spark):
    """Cross-validation against Spark's built-in session_window
    primitive: same gap => same (start, end, count) per user-session.
    (We keep the window-function form as the primary path because it
    also yields the dense per-user session_no the contract exposes.)"""
    ev = _events_subset(spark, n_users=12)
    ours = (
        sessionize(ev, gap_minutes=GAP_MIN)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )
    native = (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{GAP_MIN} minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select("user_id", "sw", "n_events")
        .orderBy("user_id", "sw.start")
        .collect()
    )
    assert len(ours) == len(native)
    for a, b in zip(ours, native):
        assert a["user_id"] == b["user_id"]
        assert a["session_start"] == b["sw"]["start"]
        assert a["n_events"] == b["n_events"]


def test_windowed_counts_stream_parity(spark, tmp_path):
    ev = _events_subset(spark, n_users=20)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts + dt.timedelta(days=365), -1, 0.0)], EVENT_SCHEMA
    )
    src = tmp_path / "wc_src"
    ev.unionByName(sentinel).coalesce(2).write.parquet(str(src))

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
    q = (
        windowed_counts(stream, window="1 hour", watermark="2 hours")
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_value")
        .writeStream.format("memory")
        .queryName("wc_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("wc_t")
        .where(F.col("win_start") <= max_ts)  # sentinel's own window excluded
        .orderBy("win_start")
        .toPandas()
    )
    want = windowed_counts_batch(ev, window="1 hour").toPandas()
    assert list(got["win_start"]) == list(want["win_start"])
    assert list(got["cnt"]) == list(want["cnt"])
    assert got["sum_value"].to_numpy() == pytest.approx(
        want["sum_value"].to_numpy(), abs=1e-3
    )


def test_dedup_pages_stream(spark, tmp_path):
    """Streaming URL dedup: canonical dupes collapse to the first
    capture within the watermark; distinct canonicals all survive."""
    import pandas as pd

    from pyspark.sql.types import StringType

    from lucene_solr_spark.streaming.analytics import dedup_pages_stream

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("https://example.com/p?b=2&a=1", t0),
        ("https://Example.com/p/?a=1&b=2&utm_source=x", t0 + dt.timedelta(hours=1)),
        ("HTTPS://EXAMPLE.COM:443/p?a=1&b=2", t0 + dt.timedelta(hours=2)),
        ("https://example.com/q", t0 + dt.timedelta(hours=1)),
        ("https://example.com/q?utm_source=y", t0 + dt.timedelta(hours=3)),
        ("https://example.com/r", t0 + dt.timedelta(hours=2)),
    ]
    schema = StructType(
        [StructField("url", StringType()), StructField("warc_ts", TimestampType())]
    )
    src = tmp_path / "pages_src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        dedup_pages_stream(stream, watermark="24 hours")
        .writeStream.format("memory")
        .queryName("pdedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("pdedup_t").toPandas().sort_values("canonical_url")
    assert list(got["canonical_url"]) == [
        "https://example.com/p?a=1&b=2",
        "https://example.com/q",
        "https://example.com/r",
    ]
    # first capture per canonical survives (single-batch: min-ts row wins
    # is NOT guaranteed by dropDuplicatesWithinWatermark ordering — it
    # keeps the first row ENCOUNTERED; with one input file written in
    # row order that is the earliest here)
    p = got[got["canonical_url"] == "https://example.com/p?a=1&b=2"].iloc[0]
    assert p["url"] == "https://example.com/p?b=2&a=1"


def test_sessionize_stateful_out_of_order_across_batches(spark, tmp_path):
    """A second micro-batch delivers an event OLDER than the open
    session's end (late but inside the watermark): the session span
    must extend/merge, never shrink, and the timeout clamp must keep
    the query alive. Two parquet files + maxFilesPerTrigger=1 force
    two micro-batches in file order."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)

    src = tmp_path / "ooo_src"
    # batch 1: user 1 session [12:00, 12:20]
    mk([(1, t0, 1, 1.0), (1, t0 + dt.timedelta(minutes=20), 2, 1.0)]).write.parquet(
        str(src / "b=1")
    )
    # batch 2: late event 12:10 (inside the open session), a new event
    # 12:30 extending it, and the far-future sentinel to flush state
    mk(
        [
            (1, t0 + dt.timedelta(minutes=10), 3, 1.0),
            (1, t0 + dt.timedelta(minutes=30), 4, 1.0),
            (-1, t0 + dt.timedelta(days=365), -1, 0.0),
        ]
    ).write.parquet(str(src / "b=2"))

    from lucene_solr_spark.streaming.analytics import sessionize_stateful

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/b=*")
    )
    q = (
        sessionize_stateful(stream, gap_minutes=GAP_MIN, watermark="10 days")
        .writeStream.format("memory")
        .queryName("ooo_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("ooo_t").where(F.col("user_id") == 1).collect()
    assert len(got) == 1
    s = got[0]
    assert s["session_start"] == t0
    assert s["session_end"] == t0 + dt.timedelta(minutes=30)
    assert s["n_events"] == 4
