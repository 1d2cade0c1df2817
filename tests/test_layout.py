"""Layout-operator tests: salted aggregation/join correctness (vs the
plain plans) and bucketed-join exchange elimination (plan assertion)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators.layout import (
    salted_agg,
    salted_join,
    write_bucketed,
)


def skewed_df(spark):
    # 90% of rows on one hot key.
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    rest = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(rest)


class TestSaltedAgg:
    def test_matches_plain_aggregation(self, spark):
        df = skewed_df(spark)
        plain = {
            r.k: (r.n, r.total, r.mx)
            for r in df.groupBy("k")
            .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
            .collect()
        }
        salted = {
            r.k: (r.n, r.total, r.mx)
            for r in salted_agg(
                df, ["k"], {"n": ("v", "count"), "total": ("v", "sum"), "mx": ("v", "max")}
            ).collect()
        }
        assert salted == plain

    def test_rejects_non_decomposable(self, spark):
        with pytest.raises(ValueError):
            salted_agg(skewed_df(spark), ["k"], {"m": ("v", "median")})


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        left = skewed_df(spark)
        right = spark.createDataFrame(
            [("hot", 1), ("k1", 2), ("k2", 3)], "k string, tag int"
        )
        plain = sorted((r.k, r.v, r.tag) for r in left.join(right, "k").collect())
        salted = sorted((r.k, r.v, r.tag) for r in salted_join(left, right, "k").collect())
        assert salted == plain
        assert len(plain) == 9000 + 2 * 20  # hot rows + k1/k2 matches


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
        b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
        write_bucketed(a, "bt_a", ["k"], n_buckets=8, sort_keys=["k"], path=str(tmp_path / "a"))
        write_bucketed(b, "bt_b", ["k"], n_buckets=8, sort_keys=["k"], path=str(tmp_path / "b"))
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().explainString(
            joined._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # Both sides pre-hashed on k: the join needs NO shuffle at all.
        assert not re.findall(r"\(\d+\) Exchange", plan), plan
        assert joined.count() == 1000
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
