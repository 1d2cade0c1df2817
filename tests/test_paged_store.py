"""S6 paged-store DataSource tests: recursive walk, suffix filter,
pagination -> partitions, content delivery, integration with the
weight parse + incremental sync."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.sources.paged_store import PagedStoreDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(PagedStoreDataSource)
    return spark


def make_store(tmp_path):
    (tmp_path / "sub" / "deeper").mkdir(parents=True)
    (tmp_path / "a.txt").write_text("alpha")
    (tmp_path / "b.txt").write_text("bravo")
    (tmp_path / "skip.csv").write_text("not me")
    (tmp_path / "sub" / "c.txt").write_text("charlie")
    (tmp_path / "sub" / "deeper" / "d.txt").write_text("delta")
    return tmp_path


def read_store(spark, root, **opts):
    r = spark.read.format("paged_store").option("path", str(root))
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_recursive_walk_and_suffix_filter(registered, tmp_path):
    store = make_store(tmp_path)
    df = read_store(registered, store, suffix=".txt")
    rows = df.collect()
    assert sorted(r.name for r in rows) == ["a.txt", "b.txt", "c.txt", "d.txt"]
    assert all(r.size == len(bytes(r.content)) for r in rows)
    by_name = {r.name: bytes(r.content).decode() for r in rows}
    assert by_name["d.txt"] == "delta"


def test_pagination_becomes_partitions(registered, tmp_path):
    store = make_store(tmp_path)
    df = read_store(registered, store, suffix=".txt", page_size=2)
    assert df.rdd.getNumPartitions() == 2  # 4 files / page_size 2
    assert df.count() == 4


def test_ids_stable_and_unique(registered, tmp_path):
    store = make_store(tmp_path)
    df = read_store(registered, store, suffix=".txt")
    ids1 = sorted(r.file_id for r in df.collect())
    ids2 = sorted(r.file_id for r in read_store(registered, store, suffix=".txt").collect())
    assert ids1 == ids2 and len(set(ids1)) == 4


def test_integration_with_incremental_sync(registered, tmp_path):
    """The ST1 flow over the paged store: parse only unseen file ids."""
    from tomasz_weight_tracker_spark.pipelines.weight import (
        incremental_sync,
        parse_weight_txt,
    )

    sample = "hdr\nTime:08:22, Fri,12/ 19/2025\nWeight:90.4kg\n"
    (tmp_path / "w1.txt").write_text(sample)
    blobs = read_store(registered, tmp_path, suffix=".txt").select(
        F.col("file_id"), F.col("content").cast("string").alias("content")
    )
    master = parse_weight_txt(blobs)
    assert master.count() == 1

    (tmp_path / "w2.txt").write_text(sample.replace("90.4", "89.9"))
    blobs2 = read_store(registered, tmp_path, suffix=".txt").select(
        F.col("file_id"), F.col("content").cast("string").alias("content")
    )
    merged = incremental_sync(master, blobs2)
    assert merged.count() == 2
    assert merged.select("source_file_id").distinct().count() == 2
