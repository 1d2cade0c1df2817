"""Chaos-replay idempotence for every foreachBatch sink.

foreachBatch gives AT-LEAST-ONCE semantics: after a crash between a
successful sink write and the checkpoint commit, Structured Streaming
re-invokes the batch function with the SAME batch id and data.  Round
11 found (by inspection) that the url/line dedup sinks double-counted
partials under exactly this replay; the verdict asked for the test
that would have caught it RED (r11 item 4).

Each case drives the exact production sink function (the module-level
``make_*_batch`` factories) through two schedules against fresh state:

    clean:   b0, b1
    chaos:   b0, b0, b1, b1        (every batch replayed once)

and asserts the DRAINED state — via the same fold the catalog query
uses — is identical.  This is the precise at-least-once contract: a
replay may rewrite or re-append, but must never change what draining
observes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _drained(df):
    rows = df.collect()
    return sorted(tuple(r) for r in rows)


def _run_schedule(apply_batch, batches, schedule):
    for bid in schedule:
        apply_batch(batches[bid], bid)


def _docs_batches(spark, n_batches, cols):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(*cols)
    return {
        r: docs.filter(F.col("doc_id") % n_batches == r) for r in range(n_batches)
    }


class TestUrlDedupReplay:
    def test_replayed_batches_drain_identically(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.plans.round10 import (
            make_url_dedup_batch,
            url_dedup_fold,
        )

        batches = _docs_batches(spark, 2, ["doc_id"])
        clean_log = str(tmp_path / "clean")
        chaos_log = str(tmp_path / "chaos")
        _run_schedule(make_url_dedup_batch(clean_log), batches, [0, 1])
        _run_schedule(make_url_dedup_batch(chaos_log), batches, [0, 0, 1, 1])
        clean = _drained(url_dedup_fold(spark, clean_log))
        chaos = _drained(url_dedup_fold(spark, chaos_log))
        assert clean == chaos and len(clean) > 0

    def test_append_mode_would_fail(self, spark, tmp_path):
        """The instrument detects the r11 bug class: an APPEND-log twin
        of the same sink must drain DIFFERENTLY under replay (the sum
        leg doubles).  If this stops failing, the test above has lost
        its teeth."""
        from tomasz_weight_tracker_spark.plans.round10 import (
            _url_gen_spark,
            url_canonicalize,
            url_dedup_fold,
        )

        def buggy_append_batch(log):
            def apply_batch(batch_df, _batch_id):
                canon = batch_df.select(
                    "doc_id", _url_gen_spark(F.col("doc_id")).alias("url")
                ).select("doc_id", url_canonicalize(F.col("url")).alias("curl"))
                partial = canon.groupBy("curl").agg(
                    F.min("doc_id").alias("min_doc"),
                    F.count(F.lit(1)).cast("long").alias("cnt"),
                )
                partial.write.mode("append").parquet(log)

            return apply_batch

        batches = _docs_batches(spark, 2, ["doc_id"])
        clean_log = str(tmp_path / "clean")
        chaos_log = str(tmp_path / "chaos")
        _run_schedule(buggy_append_batch(clean_log), batches, [0, 1])
        _run_schedule(buggy_append_batch(chaos_log), batches, [0, 0, 1, 1])
        clean = _drained(url_dedup_fold(spark, clean_log))
        chaos = _drained(url_dedup_fold(spark, chaos_log))
        assert clean != chaos


class TestLineDedupReplay:
    def test_replayed_batches_drain_identically(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.plans.round10b import (
            line_dedup_fold,
            make_line_dedup_batch,
        )

        batches = _docs_batches(spark, 2, ["doc_id", "text"])
        clean_log = str(tmp_path / "clean")
        chaos_log = str(tmp_path / "chaos")
        _run_schedule(make_line_dedup_batch(clean_log), batches, [0, 1])
        _run_schedule(make_line_dedup_batch(chaos_log), batches, [0, 0, 1, 1])
        clean = _drained(line_dedup_fold(spark, clean_log))
        chaos = _drained(line_dedup_fold(spark, chaos_log))
        assert clean == chaos and len(clean) > 0


class TestLshAssignReplay:
    def test_replayed_batches_drain_identically(self, spark, tmp_path):
        """Replay safety by ABSORPTION (append + min-fold) rather than
        overwrite: the replayed batch re-appends updates and store
        signatures; the drained keyed MIN must not move.  This also
        covers the store leg — the replayed batch probes a store that
        already contains its own signatures (same-id rows must never
        become self-assignments)."""
        from tomasz_weight_tracker_spark.plans.round9 import (
            lsh_assign_fold,
            make_lsh_assign_batch,
        )

        batches = _docs_batches(spark, 2, ["doc_id", "text"])
        out = {}
        for label, schedule in (("clean", [0, 1]), ("chaos", [0, 0, 1, 1])):
            sig = str(tmp_path / label / "sig")
            upd = str(tmp_path / label / "upd")
            _run_schedule(make_lsh_assign_batch(sig, upd), batches, schedule)
            out[label] = _drained(lsh_assign_fold(spark, upd))
        assert out["clean"] == out["chaos"] and len(out["clean"]) > 0


class TestUpsertReplay:
    def test_replayed_batches_drain_identically(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.streaming.pipelines import (
            make_upsert_batch,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "source", "n_chars"
        )
        batches = {r: docs.filter(F.col("doc_id") % 2 == r) for r in range(2)}
        out = {}
        for label, schedule in (("clean", [0, 1]), ("chaos", [0, 0, 1, 1])):
            path = str(tmp_path / label)
            _run_schedule(
                make_upsert_batch(path, ["doc_id"], order_by=["n_chars", "doc_id"]),
                batches,
                schedule,
            )
            out[label] = _drained(spark.read.parquet(path))
        assert out["clean"] == out["chaos"] and len(out["clean"]) > 0
