"""Structured Streaming operators for the events stream.

The crawl engine itself is wave-structured batch (SURVEY.md §2.7: each
wave is one snapshot/checkpoint, which is what reproduces the
reference's scheduler semantics), but a production deployment also
tails live feeds — fetch logs, item emissions, scheduler metrics. These
builders express those as Structured Streaming jobs; every
transformation is also valid on a batch DataFrame, so each has an
exactly-equivalent batch twin that the DuckDB oracle can check
(`__spark_entry__.events_hourly`).

Design notes (scale):
* watermarking bounds state: late fetch-log lines beyond the watermark
  are dropped instead of growing the window state forever;
* aggregations are per (window, key) — shuffle on the same composite
  key in every micro-batch, so state-store partitioning is stable;
* `foreachBatch` is the sink adapter for the SnapshotStore (parquet
  append per micro-batch == Iceberg append per commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(
    spark,
    path: str,
    schema,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream over a directory of parquet drops (the
    batch-upload analog of the reference's scrapyd items_dir)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def hourly_event_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data bound.

    Works identically on batch and stream input (the streaming case adds
    the watermark; batch ignores it).
    """
    ts = F.col("ts").cast("timestamp")
    df = events.withColumn("_ts", ts)
    if events.isStreaming:
        df = df.withWatermark("_ts", watermark)
    return df.groupBy(
        F.window("_ts", window).alias("win"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def host_fetch_rates(
    fetch_log: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Per-host fetch rate + error ratio over sliding minutes — the
    live twin of the per-wave metrics table (feeds AutoThrottle)."""
    ts = F.col("ts").cast("timestamp")
    df = fetch_log.withColumn("_ts", ts)
    if fetch_log.isStreaming:
        df = df.withWatermark("_ts", watermark)
    return df.groupBy(F.window("_ts", window).alias("win"), F.col("host")).agg(
        F.count("*").alias("fetched"),
        F.avg(F.col("latency_ms")).alias("avg_latency_ms"),
        F.sum((F.col("status") != 200).cast("long")).alias("errors"),
    ).select(
        F.col("win.start").alias("window_start"),
        "host",
        "fetched",
        F.round("avg_latency_ms", 2).alias("avg_latency_ms"),
        "errors",
    )


def sessionize_with_state(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (the engine-level analog of Scrapy's
    per-spider in-memory accumulation, but partitioned by key and
    checkpointable).

    State per user: (last_epoch, session_no, n_events, session_start).
    Each micro-batch emits one row per session touched in the batch —
    completed sessions are final; the still-open session is provisional
    and re-emitted (updated) if a later batch extends it. Batch-mode
    equivalence: with all data in one batch the emitted rows equal the
    batch ``sessionize`` aggregation.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_no long, n_events long, session_start string"
    )
    state_schema = "last_epoch long, session_no long, n long, start string"

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_epoch, session_no, n, start = state.get
        else:
            last_epoch, session_no, n, start = None, 0, 0, None
        touched = {}
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["_epoch", "event_id"])
            for ep, _eid in zip(pdf["_epoch"], pdf["event_id"]):
                ep = int(ep)
                if last_epoch is None or ep - last_epoch > gap_s:
                    session_no += 1
                    n = 1
                    start = pd.Timestamp(ep, unit="s").strftime("%Y-%m-%d %H:%M:%S")
                else:
                    n += 1
                last_epoch = ep
                touched[session_no] = (n, start)
        state.update((last_epoch, session_no, n, start))
        yield pd.DataFrame(
            [
                (user_id, sn, cnt, st)
                for sn, (cnt, st) in sorted(touched.items())
            ],
            columns=["user_id", "session_no", "n_events", "session_start"],
        )

    prepped = events.withColumn(
        "_epoch", F.col("ts").cast("timestamp").cast("long")
    ).select("user_id", "event_id", "_epoch")
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, timeout_s: int = 120, mode: str = "complete"
):
    """Drain an availableNow stream into an in-memory table (tests) and
    return the completed query. Complete mode for the windowed
    aggregations (running state); append for applyInPandasWithState."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
