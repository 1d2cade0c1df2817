"""Sink tests: keyed upsert (MERGE semantics) over parquet paths."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.sources.writers import upsert_by_key


def read_state(spark, path):
    return {
        r.id: (r.v, r.day)
        for r in spark.read.parquet(str(path)).collect()
    }


class TestUpsertByKey:
    def test_insert_update_append(self, spark, tmp_path):
        path = tmp_path / "state"
        base = spark.createDataFrame(
            [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")], "id long, v string, day string"
        )
        upsert_by_key(spark, base, path, keys=["id"])
        assert read_state(spark, path) == {1: ("a", "d1"), 2: ("b", "d1"), 3: ("c", "d2")}

        batch = spark.createDataFrame(
            [(2, "B", "d1"), (4, "d", "d2")], "id long, v string, day string"
        )
        upsert_by_key(spark, batch, path, keys=["id"])
        # id 2 updated in place, id 4 appended, others untouched.
        assert read_state(spark, path) == {
            1: ("a", "d1"), 2: ("B", "d1"), 3: ("c", "d2"), 4: ("d", "d2"),
        }

    def test_rerun_is_idempotent(self, spark, tmp_path):
        path = tmp_path / "state"
        base = spark.createDataFrame([(1, "a", "d1")], "id long, v string, day string")
        upsert_by_key(spark, base, path, keys=["id"])
        batch = spark.createDataFrame(
            [(1, "A", "d1"), (9, "z", "d1")], "id long, v string, day string"
        )
        upsert_by_key(spark, batch, path, keys=["id"])
        first = read_state(spark, path)
        upsert_by_key(spark, batch, path, keys=["id"])  # same batch again
        assert read_state(spark, path) == first == {1: ("A", "d1"), 9: ("z", "d1")}

    def test_partitioned_upsert_rewrites_only_touched_partitions(self, spark, tmp_path):
        path = tmp_path / "state"
        base = spark.createDataFrame(
            [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3")], "id long, v string, day string"
        )
        upsert_by_key(spark, base, path, keys=["id"], partition_by=["day"])
        # Record the physical files of the untouched partition.
        d3_dir = path / "day=d3"
        before = {f: os.path.getmtime(d3_dir / f) for f in os.listdir(d3_dir)}

        batch = spark.createDataFrame(
            [(1, "A", "d1"), (4, "d", "d2")], "id long, v string, day string"
        )
        upsert_by_key(spark, batch, path, keys=["id"], partition_by=["day"])
        after = {f: os.path.getmtime(d3_dir / f) for f in os.listdir(d3_dir)}
        assert after == before  # d3 files not rewritten
        got = read_state(spark, path)
        assert got == {1: ("A", "d1"), 2: ("b", "d2"), 3: ("c", "d3"), 4: ("d", "d2")}

    def test_wide_batch_prunes_via_semi_join_not_or_chain(self, spark, tmp_path):
        """Round-4 advice: a batch touching ~1k partitions must not
        build a 1k-term OR predicate (analyzer blowup, pushdown
        defeat) — above _MAX_STATIC_PRUNE the prune is a broadcast
        semi-join against the touched-partition list."""
        import time

        path = tmp_path / "state"
        n = 900
        base = spark.createDataFrame(
            [(i, "a", f"d{i % 1000:04d}") for i in range(n)],
            "id long, v string, day string",
        )
        upsert_by_key(spark, base, path, keys=["id"], partition_by=["day"])
        batch = spark.createDataFrame(
            [(i, "B", f"d{i % 1000:04d}") for i in range(n)],
            "id long, v string, day string",
        )
        t0 = time.time()
        upsert_by_key(spark, batch, path, keys=["id"], partition_by=["day"])
        wall = time.time() - t0
        got = read_state(spark, path)
        assert len(got) == n and all(v == "B" for v, _ in got.values())
        # 900 touched partitions: the OR-chain form took minutes in the
        # analyzer; the semi-join form is bounded by the write itself.
        assert wall < 120, f"wide-batch upsert took {wall:.0f}s"

    def test_null_partition_rows_survive_merge(self, spark, tmp_path):
        """Round-5 advice: lit(None) equality is null, so the prune
        paths silently dropped non-updated keys living in the NULL
        partition while dynamic overwrite still rewrote it — the
        eqNullSafe prune must keep them."""
        path = tmp_path / "state"
        base = spark.createDataFrame(
            [(1, "a", None), (2, "b", None), (3, "c", "d1")],
            "id long, v string, day string",
        )
        upsert_by_key(spark, base, path, keys=["id"], partition_by=["day"])
        # Update id 1 (stays in the null partition); id 2 must survive.
        batch = spark.createDataFrame(
            [(1, "A", None)], "id long, v string, day string"
        )
        upsert_by_key(spark, batch, path, keys=["id"], partition_by=["day"])
        assert read_state(spark, path) == {
            1: ("A", None), 2: ("b", None), 3: ("c", "d1"),
        }

    def test_null_partition_rows_survive_semi_join_prune(self, spark, tmp_path):
        """Same defect on the wide-batch path: the left-semi prune must
        be null-safe when a touched partition tuple contains NULL."""
        from tomasz_weight_tracker_spark.sources import writers

        path = tmp_path / "state"
        base_rows = [(i, "a", f"d{i:04d}") for i in range(80)]
        base_rows += [(900, "keep", None), (901, "upd", None)]
        base = spark.createDataFrame(base_rows, "id long, v string, day string")
        upsert_by_key(spark, base, path, keys=["id"], partition_by=["day"])
        # Touch more partitions than the static-prune cutoff, including
        # the null partition (update 901; 900 must survive untouched).
        batch_rows = [(i, "B", f"d{i:04d}") for i in range(80)]
        batch_rows += [(901, "UPD", None)]
        assert len({r[2] for r in batch_rows}) > writers._MAX_STATIC_PRUNE
        batch = spark.createDataFrame(batch_rows, "id long, v string, day string")
        upsert_by_key(spark, batch, path, keys=["id"], partition_by=["day"])
        got = read_state(spark, path)
        assert got[900] == ("keep", None) and got[901] == ("UPD", None)
        assert all(got[i] == ("B", f"d{i:04d}") for i in range(80))

    def test_multi_column_key(self, spark, tmp_path):
        path = tmp_path / "state"
        base = spark.createDataFrame(
            [(1, "x", "d1"), (1, "y", "d2")], "id long, v string, day string"
        )
        upsert_by_key(spark, base, path, keys=["id", "day"])
        batch = spark.createDataFrame([(1, "Y", "d2")], "id long, v string, day string")
        upsert_by_key(spark, batch, path, keys=["id", "day"])
        rows = {(r.id, r.day): r.v for r in spark.read.parquet(str(path)).collect()}
        assert rows == {(1, "d1"): "x", (1, "d2"): "Y"}


class TestCompaction:
    def test_many_small_files_become_few(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.sources.writers import compact_table

        path = tmp_path / "t"
        # 12 appends -> at least 12 small files.
        for i in range(12):
            spark.createDataFrame([(i, f"v{i}")], "id long, v string").coalesce(
                1
            ).write.mode("append").parquet(str(path))
        import glob

        before = len(glob.glob(str(path / "*.parquet")))
        assert before >= 12
        rows_before = {(r.id, r.v) for r in spark.read.parquet(str(path)).collect()}

        n = compact_table(spark, path)
        after = len(glob.glob(str(path / "*.parquet")))
        assert n == 1 and after == 1
        assert {(r.id, r.v) for r in spark.read.parquet(str(path)).collect()} == rows_before


class TestSchemaEvolution:
    def test_merge_schema_reads_old_and_new_files(self, spark, tmp_path):
        # A table accretes a column over its lifetime: old files lack
        # it, new files carry it.  mergeSchema unions the schemas and
        # NULL-fills the old files -- the read-side contract an
        # evolving 100 TB table depends on (no rewrite of old data).
        path = tmp_path / "evolving"
        spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
            "append"
        ).parquet(str(path))
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, v string, score double"
        ).write.mode("append").parquet(str(path))

        merged = spark.read.option("mergeSchema", "true").parquet(str(path))
        assert set(merged.columns) == {"id", "v", "score"}
        rows = {r.id: (r.v, r.score) for r in merged.collect()}
        assert rows == {1: ("a", None), 2: ("b", 9.5)}

    def test_upsert_rejects_schema_drift(self, spark, tmp_path):
        # The WRITE side stays strict: upsert_by_key refuses a batch
        # whose schema drifted from the table (silent column loss is
        # the failure mode), while the read side above stays lenient.
        import pytest as _pytest

        from tomasz_weight_tracker_spark.sources.writers import upsert_by_key

        path = tmp_path / "strict"
        base = spark.createDataFrame([(1, "x")], "id long, v string")
        upsert_by_key(spark, base, path, keys=["id"])
        drifted = spark.createDataFrame([(1, "y", 1.0)], "id long, v string, extra double")
        with _pytest.raises(ValueError, match="schema must match"):
            upsert_by_key(spark, drifted, path, keys=["id"])
