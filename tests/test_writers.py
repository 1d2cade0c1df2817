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
