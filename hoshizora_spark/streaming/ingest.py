"""Structured Streaming surface: dynamic-graph edge ingestion.

The reference lists "Support dynamic graph" as unimplemented WIP
(/root/reference/README.md:63). On Spark this is Structured Streaming:
edges arrive as files (or Kafka at cluster scale — same unbounded
DataFrame, different ``format``), and the engine maintains incremental
aggregates. Batch algorithms then run on snapshots: streaming keeps the
edge table and degree materializations fresh; the BSP loops (pagerank &
co.) are triggered per snapshot — the standard lambda split for iterative
graph analytics, since a BSP fixpoint is not a streaming-incremental
computation.

Scale notes: stateful aggregations shuffle on their keys exactly like the
batch ops, so the same skew reasoning applies (hot dst ⇒ salting or the
per-partition partial fold). Watermarks bound state for the windowed op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_edges_from_text(spark: SparkSession, path: str) -> DataFrame:
    """Unbounded (src, dst) stream from whitespace pair-per-line files.

    Streaming analogue of ``io.read_edge_list`` (same parse contract:
    ``#`` comments and blank lines skipped, one pair per line).
    """
    lines = (
        spark.readStream.format("text")
        .load(path)
        .select(F.trim("value").alias("line"))
    )
    toks = lines.filter((F.col("line") != "") & ~F.col("line").startswith("#")).select(
        F.split("line", r"\s+").alias("t")
    )
    # try_cast: malformed tokens -> NULL -> dropped (ANSI cast would abort)
    return toks.select(
        F.element_at("t", 1).try_cast("long").alias("src"),
        F.element_at("t", 2).try_cast("long").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())


def streaming_degrees(edge_stream: DataFrame) -> DataFrame:
    """Continuously-maintained out/in degree per vertex.

    ``update`` output mode + a sink (Delta/Iceberg/parquet at cluster
    scale) gives a live degree table; the skew histogram that drives
    salting decisions reads from it for free.

    State note: this keeps one state row per vertex EVER seen — that is
    the point of a total-degree table, but at a 10^12-vertex domain the
    state store becomes the bottleneck. When only recent activity matters
    (the common case for salting decisions — hot NOW is what skews the
    next superstep), use ``streaming_degrees_windowed``: its watermark
    expires state so the store holds only the active window.
    """
    out_deg = edge_stream.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    return out_deg


def streaming_degrees_windowed(
    edge_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-vertex out-degree within tumbling event-time windows — the
    state-bounded degree view for unbounded vertex domains.

    The watermark finalizes and DROPS window state older than
    max(event time) − watermark, so the state store is O(active vertices
    per window), not O(vertices ever seen). Requires an event-time column
    (``ts_col``); file/Kafka edge feeds carry one naturally.
    """
    st = edge_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        st.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "vid",
            "out_deg",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-type event counts in (sliding) time windows with late-data bound.

    Works on any stream with (ts: timestamp, event_type: string) — e.g. a
    commit/push event feed refreshing the corpus. The watermark caps state:
    windows older than max(ts) - watermark are finalized and dropped.
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # parquet often carries TIMESTAMP_NTZ; watermarks need TimestampType
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
