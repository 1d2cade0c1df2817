"""Sketch / sampling / layout operators (operators/sketches.py,
operators/layout.py zorder) beyond what the parity gate covers:
accuracy bounds, determinism under repartitioning, and the physical
locality property Z-order exists for.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators import sketches as SK
from tomasz_weight_tracker_spark.operators.layout import cluster_by_zorder, zorder_key


class TestHll:
    def test_lc_table_matches_formula(self):
        # The embedded lookup table IS the linear-counting formula;
        # re-derive it so a drive-by edit can't silently skew estimates.
        assert len(SK.LC_TABLE) == SK.M - 1
        for v in (1, 2, 100, 255):
            assert SK.LC_TABLE[v - 1] == SK.M * math.log(SK.M / v)

    @pytest.mark.parametrize("n_distinct", [50, 500, 5000])
    def test_estimate_within_bounds(self, spark, n_distinct):
        # 3x the theoretical standard error 1.04/sqrt(256) ~ 6.5%.
        df = spark.range(n_distinct * 3).select(
            F.lit("g").alias("g"), (F.col("id") % n_distinct).alias("v")
        )
        est = SK.hll_distinct(df, ["g"], "v").first().hll_distinct
        assert abs(est - n_distinct) / n_distinct < 0.20

    def test_partitioning_invariant(self, spark):
        # Register max() commutes -> same estimate however rows shard.
        df = spark.range(2000).select(
            F.lit("g").alias("g"), (F.col("id") % 777).alias("v")
        )
        a = SK.hll_distinct(df.repartition(1), ["g"], "v").first().hll_distinct
        b = SK.hll_distinct(df.repartition(13, "v"), ["g"], "v").first().hll_distinct
        assert a == b


class TestStratifiedSample:
    def test_rates_and_determinism(self, spark):
        df = spark.range(20000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, "bulk").otherwise("rare").alias("s"),
        )
        rates = {"bulk": 0.1, "rare": 1.0}
        out = SK.stratified_sample(df, "s", rates, "k")
        counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
        assert counts["rare"] == 10000  # rate-1.0 stratum kept whole
        assert abs(counts["bulk"] - 1000) < 150  # ~10% of 10000
        # Deterministic: the same physical rows are chosen on re-run.
        again = sorted(r.k for r in SK.stratified_sample(df, "s", rates, "k").collect())
        assert sorted(r.k for r in out.collect()) == again

    def test_unknown_stratum_uses_default(self, spark):
        df = spark.range(100).select(F.col("id").alias("k"), F.lit("other").alias("s"))
        assert SK.stratified_sample(df, "s", {"x": 1.0}, "k").count() == 0
        assert SK.stratified_sample(df, "s", {"x": 0.0}, "k", default_rate=1.0).count() == 100


class TestZorder:
    def test_interleave_exact(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
        )
        out = df.select(zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
        # bit i of a -> 2i+1, bit i of b -> 2i
        assert [r.z for r in out] == [0, 2, 1, 27, (1 << 32) - 1]

    def test_quadrant_ordering(self, spark):
        # All keys in the low-low quadrant sort below any key in the
        # high-high quadrant — the property range-pruning relies on.
        rows = [(a, b) for a in (0, 1, 200, 255) for b in (0, 3, 199, 255)]
        df = spark.createDataFrame(rows, "a long, b long")
        z = {(r.a, r.b): r.z for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 8).alias("z")).collect()}
        low = max(v for (a, b), v in z.items() if a < 128 and b < 128)
        high = min(v for (a, b), v in z.items() if a >= 128 and b >= 128)
        assert low < high

    def test_cluster_shrinks_bounding_boxes(self, spark):
        # After Z-clustering, each output partition covers a compact
        # (a, b) box; in row order the same rows cover ~the full space.
        n = 4096
        df = spark.range(n).select(
            (F.col("id") % 64).alias("a"),
            ((F.col("id") * 2654435761) % 64).alias("b"),
        )
        clustered = cluster_by_zorder(df, F.col("a"), F.col("b"), bits=6, n_files=16)
        boxes = (
            clustered.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("a") - F.min("a")).alias("da"),
                (F.max("b") - F.min("b")).alias("db"),
            )
            .collect()
        )
        mean_area = sum((r.da + 1) * (r.db + 1) for r in boxes) / len(boxes)
        assert mean_area < 0.35 * 64 * 64  # naive layout boxes ~ full 64x64
