"""Structured Streaming ops: file-source edge ingestion + windowed counts."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hoshizora_spark.streaming import (
    stream_edges_from_text,
    streaming_degrees,
    windowed_event_counts,
)


def _run_until_batch(query, timeout_s: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        query.processAllAvailable()
        return
    raise TimeoutError


def test_stream_edges_and_degrees(spark, tmp_path):
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "a.txt").write_text("# header\n0 1\n0 2\n1 2\n")
    stream = stream_edges_from_text(spark, str(src_dir))
    assert stream.isStreaming
    deg = streaming_degrees(stream)
    q = (
        deg.writeStream.format("memory")
        .queryName("deg_sink")
        .outputMode("complete")
        .start()
    )
    try:
        _run_until_batch(q)
        got = {r["vid"]: r["out_deg"] for r in spark.sql("SELECT * FROM deg_sink").collect()}
        assert got == {0: 2, 1: 1}
        # late-arriving file updates the aggregate
        (src_dir / "b.txt").write_text("2 0\n0 9\n")
        q.processAllAvailable()
        got = {r["vid"]: r["out_deg"] for r in spark.sql("SELECT * FROM deg_sink").collect()}
        assert got == {0: 3, 1: 1, 2: 1}
    finally:
        q.stop()


def test_windowed_event_counts_batch_semantics(spark, sf_dir):
    # the op is stream-agnostic: same plan on a bounded frame must equal a
    # plain SQL window count (watermark is a no-op on batch data)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = windowed_event_counts(events, window="1 hour").orderBy(
        "window_start", "event_type"
    )
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_windowed_event_counts_streaming(spark, sf_dir, tmp_path):
    # replay the events table as a file stream; totals must match batch
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_dir = tmp_path / "ev"
    events.coalesce(2).write.parquet(str(stream_dir))
    stream = spark.readStream.schema(events.schema).parquet(str(stream_dir))
    res = windowed_event_counts(stream, window="1 hour")
    q = (
        res.writeStream.format("memory")
        .queryName("ev_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits only watermark-finalized windows: a subset of
        # batch results with identical values
        got = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM ev_sink").collect()
        }
        want = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in windowed_event_counts(events, window="1 hour").collect()
        }
        assert got, "no finalized windows emitted"
        for k, v in got.items():
            assert want[k] == v
    finally:
        q.stop()


def test_streaming_degrees_windowed_state_bounded(spark, tmp_path):
    """Windowed degrees: state expires past the watermark (the TTL story
    streaming_degrees lacks by design), values match a batch window count."""
    from hoshizora_spark.streaming.ingest import streaming_degrees_windowed

    events = spark.createDataFrame(
        [("2024-01-01 00:01:00", 0, 1), ("2024-01-01 00:02:00", 0, 2),
         ("2024-01-01 00:03:00", 1, 2), ("2024-01-01 02:00:00", 0, 3)],
        schema="ts string, src long, dst long",
    )
    # batch semantics check (watermark no-op on bounded data)
    got = {
        (str(r["window_start"]), r["vid"]): r["out_deg"]
        for r in streaming_degrees_windowed(events, window="10 minutes").collect()
    }
    assert got[("2024-01-01 00:00:00", 0)] == 2
    assert got[("2024-01-01 00:00:00", 1)] == 1
    assert got[("2024-01-01 02:00:00", 0)] == 1

    # streaming: finalized (watermark-expired) windows are emitted in append
    # mode — exactly the state-dropping behavior the TTL relies on
    stream_dir = tmp_path / "edges_ts"
    events.coalesce(1).write.parquet(str(stream_dir))
    stream = spark.readStream.schema(events.schema).parquet(str(stream_dir))
    res = streaming_degrees_windowed(stream, window="10 minutes", watermark="30 minutes")
    q = res.writeStream.format("memory").queryName("degw_sink").outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM degw_sink").collect()
        finalized = {(str(r["window_start"]), r["vid"]): r["out_deg"] for r in rows}
        # the 00:00 window is > 30 min behind max(ts)=02:00 -> finalized
        assert finalized[("2024-01-01 00:00:00", 0)] == 2
        assert finalized[("2024-01-01 00:00:00", 1)] == 1
        # the 02:00 window is still open -> not emitted
        assert ("2024-01-01 02:00:00", 0) not in finalized
    finally:
        q.stop()


def test_windowed_degrees_drive_salting_decisions(spark):
    """The live histogram → salting bridge: hot_keys_from_degrees reads the
    streaming_degrees_windowed sink shape and feeds salted_join_edges_state.
    Only the LATEST window's degree decides hotness — a vertex hot in an
    old window but quiet now is not salted."""
    from hoshizora_spark.runtime.skew import (
        SALT_COL,
        hot_keys_from_degrees,
        salted_join_edges_state,
    )
    from hoshizora_spark.streaming.ingest import streaming_degrees_windowed

    rows = (
        # window 1 (00:00): vertex 7 bursts, vertex 3 quiet
        [("2024-01-01 00:01:00", 7, i) for i in range(6)]
        + [("2024-01-01 00:02:00", 3, 0)]
        # window 2 (01:00, the latest): 3 bursts, 7 goes quiet
        + [("2024-01-01 01:01:00", 3, i) for i in range(6)]
        + [("2024-01-01 01:03:00", 7, 9)]
    )
    events = spark.createDataFrame(rows, schema="ts string, src long, dst long")
    deg = streaming_degrees_windowed(events, window="10 minutes")

    hot = hot_keys_from_degrees(deg, min_count=3, key_col="vid", out_key="src")
    assert {r["src"] for r in hot.collect()} == {3}

    # the hot set plugs straight into the skew-join transform
    edges = events.select("src", "dst")
    state = spark.createDataFrame(
        [(v, float(v) * 10) for v in (0, 3, 7, 9)], schema="src long, rank double"
    )
    joined = salted_join_edges_state(edges, state, key="src", hot=hot, num_salts=4)
    got = [(r["src"], r["dst"], r["rank"]) for r in joined.collect()]
    plain = [
        (r["src"], r["dst"], r["rank"])
        for r in edges.join(state, "src").collect()
    ]
    assert sorted(got) == sorted(plain)
    assert SALT_COL not in joined.columns
