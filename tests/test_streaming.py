"""Structured Streaming tests: each streaming operator is driven with
an availableNow trigger over file input and compared against its batch
twin on the same data (the engine's cross-engine pattern, applied to
batch-vs-stream)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators.time_ops import bucket_end_labeled, peak_category
from tomasz_weight_tracker_spark.streaming import (
    incremental_file_sync,
    stream_dedup_keep_first,
    stream_fifteen_minute_usage,
    stream_sessionize,
)

SCHEMA = "meter string, ts timestamp, value double"


def write_events(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def run_stream(spark, df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("complete").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def run_stream_append(spark, df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def minute_rows(start: str, n: int, meter="m1", value=1.0):
    t0 = dt.datetime.fromisoformat(start)
    return [(meter, t0 + dt.timedelta(minutes=i), value) for i in range(1, n + 1)]


class TestStreamFifteenMinute:
    def test_matches_batch_bucketing(self, spark, tmp_path):
        src = str(tmp_path / "events")
        rows = minute_rows("2024-06-01 10:00:00", 45)  # minutes 10:01..10:45
        write_events(spark, src, rows)

        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = run_stream(
            spark,
            stream_fifteen_minute_usage(stream, series_keys=("meter",)),
            "s15",
        ).collect()

        batch = (
            spark.read.parquet(src)
            .withColumn("Bucket", bucket_end_labeled(F.col("ts")))
            .withColumn("cat", peak_category(F.col("ts")))
            .groupBy("meter", "Bucket")
            .agg(
                F.count(F.lit(1)).alias("Minutes"),
                F.sum(F.when(F.col("cat") == "P", F.col("value"))).alias("P_Usage"),
            )
            .collect()
        )
        got = {(r.meter, r.Bucket): (r.Minutes, r.P_Usage) for r in out}
        want = {(r.meter, r.Bucket): (r.Minutes, r.P_Usage) for r in batch}
        assert got == want
        assert len(got) == 3  # 10:00, 10:15, 10:30 end-labeled buckets


class TestStreamDedup:
    def test_first_arrival_kept(self, spark, tmp_path):
        src = str(tmp_path / "dups")
        t = dt.datetime(2024, 6, 1, 10, 0)
        write_events(spark, src, [("m1", t, 1.0), ("m1", t, 2.0), ("m2", t, 3.0)])
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = run_stream_append(
            spark, stream_dedup_keep_first(stream, ["meter", "ts"]), "sdedup"
        ).collect()
        assert len(out) == 2
        assert {r.meter for r in out} == {"m1", "m2"}


class TestStreamSessionize:
    def test_gap_splits_sessions(self, spark, tmp_path):
        src = str(tmp_path / "sess")
        t0 = dt.datetime(2024, 6, 1, 10, 0)
        rows = [
            ("u1", t0, 1.0),
            ("u1", t0 + dt.timedelta(minutes=10), 1.0),  # same session (gap 30m)
            ("u1", t0 + dt.timedelta(minutes=90), 1.0),  # new session
        ]
        spark.createDataFrame(rows, "user_id string, ts timestamp, value double").write.mode(
            "overwrite"
        ).parquet(src)
        stream = spark.readStream.schema("user_id string, ts timestamp, value double").parquet(src)
        out = run_stream(spark, stream_sessionize(stream), "ssess").collect()
        assert len(out) == 2
        assert sorted(r.n_events for r in out) == [1, 2]


class TestIncrementalFileSync:
    def test_each_file_processed_exactly_once(self, spark, tmp_path):
        src, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
        write_events(spark, src, minute_rows("2024-06-01 10:00:00", 3))
        q = incremental_file_sync(spark, src, ckpt, out, SCHEMA)
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 3

        # Second batch of files: only the NEW rows are appended.
        write_events(spark, src, minute_rows("2024-06-01 11:00:00", 2))
        q = incremental_file_sync(spark, src, ckpt, out, SCHEMA)
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 5  # 3 + 2, no reprocessing


class TestRunningStats:
    def test_state_persists_across_runs(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.streaming.pipelines import stream_running_stats

        src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        write_events(spark, src, [("m1", dt.datetime(2024, 6, 1, 10, 0), 2.0),
                                  ("m1", dt.datetime(2024, 6, 1, 10, 1), 4.0),
                                  ("m2", dt.datetime(2024, 6, 1, 10, 0), 10.0)])

        def run(name):
            # foreachBatch sink: memory sinks cannot recover a checkpoint.
            captured = {}

            def sink(batch_df, batch_id):
                for r in batch_df.collect():
                    captured[r.meter] = r

            stream = spark.readStream.schema(SCHEMA).parquet(src)
            q = (stream_running_stats(stream)
                 .writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("update").trigger(availableNow=True).start())
            q.awaitTermination(120)
            return captured

        out1 = run("rs1")
        assert out1["m1"].n == 2 and out1["m1"].total == 6.0 and out1["m1"].mean == 3.0
        assert out1["m2"].n == 1 and out1["m2"].mean == 10.0

        # New files -> second availableNow run resumes from checkpointed
        # state: counts ACCUMULATE rather than restart.
        write_events(spark, src, [("m1", dt.datetime(2024, 6, 1, 11, 0), 6.0)])
        out2 = run("rs2")
        assert out2["m1"].n == 3 and out2["m1"].total == 12.0 and out2["m1"].mean == 4.0


class TestProgressReporter:
    def test_listener_collects_batches(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.streaming.progress import ProgressReporter

        src = str(tmp_path / "pr")
        write_events(spark, src, minute_rows("2024-06-01 10:00:00", 5))
        lines = []
        listener = ProgressReporter(on_line=lines.append)
        spark.streams.addListener(listener)
        try:
            stream = spark.readStream.schema(SCHEMA).parquet(src)
            q = (stream.groupBy("meter").count()
                 .writeStream.format("memory").queryName("prog")
                 .outputMode("complete").trigger(availableNow=True).start())
            q.awaitTermination(120)
            # Listener events arrive asynchronously after termination.
            import time
            for _ in range(50):
                if listener.stats.batches:
                    break
                time.sleep(0.2)
        finally:
            spark.streams.removeListener(listener)
        assert listener.stats.batches >= 1
        assert listener.stats.total_rows == 5
        assert lines and "rows" in lines[0]


class TestStreamStaticJoin:
    def test_stream_enriched_by_broadcast_dim(self, spark, tmp_path):
        """Stream-static join: each micro-batch joins against a static
        dimension (broadcast - no stream state, no watermark needed)."""
        src = str(tmp_path / "ssj")
        write_events(spark, src, minute_rows("2024-06-01 10:00:00", 3, meter="m1")
                     + minute_rows("2024-06-01 10:00:00", 2, meter="m2"))
        dim = spark.createDataFrame(
            [("m1", "kitchen"), ("m2", "bedroom")], "meter string, room string"
        )
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        enriched = stream.join(F.broadcast(dim), "meter")
        out = run_stream_append(spark, enriched, "ssjoin").collect()
        assert len(out) == 5
        rooms = {r.meter: r.room for r in out}
        assert rooms == {"m1": "kitchen", "m2": "bedroom"}
