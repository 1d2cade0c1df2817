"""Connected-components unit tests, partitioned-write pruning, and
approximate-sketch error bounds."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators.clusters import (
    canonicalize,
    connected_components,
)


class TestConnectedComponents:
    def test_chain_and_isolated_pair(self, spark):
        # Chain 1-2-3-4 (A~B, B~C, C~D) plus separate pair 10-11.
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
        )
        comp = {r.id: r.component for r in connected_components(pairs).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_canonicalize(self, spark):
        pairs = spark.createDataFrame([(5, 3), (3, 9)], "id_a bigint, id_b bigint")
        out = {r.component: (r.n_members, r.canonical_id) for r in canonicalize(
            connected_components(pairs)
        ).collect()}
        assert out == {3: (3, 3)}

    def test_converges_on_long_chain(self, spark):
        # Diameter 12 chain: label propagation needs several rounds but
        # must converge well inside the iteration cap.
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "id_a bigint, id_b bigint"
        )
        comp = {r.id: r.component for r in connected_components(pairs).collect()}
        assert set(comp.values()) == {0}

    def test_raises_instead_of_returning_nonconverged(self, spark):
        # A chain longer than the iteration cap must raise, not silently
        # return half-merged components (min-label moves one hop/round).
        import pytest

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "id_a bigint, id_b bigint"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iterations=2)
        # The same graph converges once the cap accommodates the diameter.
        comp = {
            r.id: r.component
            for r in connected_components(pairs, max_iterations=10).collect()
        }
        assert set(comp.values()) == {0}


class TestPartitionedWrites:
    def test_partition_pruning_in_plan(self, spark, tmp_path):
        """Hive-style partitioned layout: a filter on the partition
        column prunes directories at planning time — the scan must show
        a PartitionFilters entry and read only the matching partition."""
        path = str(tmp_path / "by_type")
        df = spark.createDataFrame(
            [("click", 1.0), ("view", 2.0), ("click", 3.0)], "event_type string, v double"
        )
        df.write.mode("overwrite").partitionBy("event_type").parquet(path)

        q = spark.read.parquet(path).filter(F.col("event_type") == "click")
        plan = q._jdf.queryExecution().explainString(
            q._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert re.search(r"PartitionFilters: \[.*event_type.*\]", plan)
        assert q.count() == 2


class TestApproxSketches:
    def test_approx_count_distinct_bound(self, spark):
        df = spark.range(10_000).select((F.col("id") % 2_000).alias("k"))
        approx = df.agg(F.approx_count_distinct("k", rsd=0.02)).first()[0]
        assert abs(approx - 2_000) / 2_000 < 0.1  # well inside 3 sigma

    def test_approx_percentile_near_exact(self, spark):
        df = spark.range(10_001).select(F.col("id").cast("double").alias("v"))
        approx = df.agg(F.percentile_approx("v", 0.5, 10_000)).first()[0]
        assert abs(approx - 5_000.0) <= 10
