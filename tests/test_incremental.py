"""Incremental top-k maintenance (operators/incremental.py): the
merge-with-state refresh must equal a full recompute at every step.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators.incremental import incremental_topk


def _rows(seed, n):
    rng = random.Random(seed)
    return [(rng.randrange(10_000), f"u{rng.randrange(500)}") for _ in range(n)]


class TestIncrementalTopk:
    def test_matches_full_recompute_across_batches(self, spark, tmp_path):
        state = tmp_path / "topk"
        full = []
        for seed in (1, 2, 3):
            batch_rows = _rows(seed, 200)
            full += batch_rows
            batch = spark.createDataFrame(batch_rows, "score long, user string")
            top = incremental_topk(
                spark, batch, state, order_col="score", k=10, tiebreak_cols=["user"]
            )
            got = [(r.score, r.user) for r in top.orderBy(F.desc("score"), "user").collect()]
            want = sorted(full, key=lambda t: (-t[0], t[1]))[:10]
            assert got == want, f"diverged after seed {seed}"

    def test_refresh_cost_reads_state_not_history(self, spark, tmp_path):
        # The state file holds k rows, so the merge input is k + |batch|
        # regardless of how much history has flowed through.
        state = tmp_path / "topk"
        for seed in range(5):
            batch = spark.createDataFrame(_rows(seed, 100), "score long, user string")
            incremental_topk(spark, batch, state, "score", 7, ["user"])
        assert spark.read.parquet(str(state)).count() == 7


class TestIncrementalAgg:
    def test_matches_full_recompute_any_batching(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.operators.incremental import (
            incremental_agg,
        )

        rows = [(i, i % 7, (i * 13) % 101) for i in range(300)]
        full = spark.createDataFrame(rows, "event_id long, k long, qv long")
        want = {
            r.k: (r.n, r.sum_v, r.min_v, r.max_v)
            for r in full.groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("qv").alias("sum_v"),
                F.min("qv").alias("min_v"),
                F.max("qv").alias("max_v"),
            )
            .collect()
        }
        # Two different batchings must converge to the same state.
        for n_batches, sub in ((3, "a"), (5, "b")):
            state = tmp_path / f"agg_{sub}"
            out = None
            for r in range(n_batches):
                out = incremental_agg(
                    spark,
                    full.filter(F.col("event_id") % n_batches == r),
                    state,
                    keys=["k"],
                    value_col="qv",
                )
            got = {r.k: (r.n, r.sum_v, r.min_v, r.max_v) for r in out.collect()}
            assert got == want

    def test_empty_batch_is_noop(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.operators.incremental import (
            incremental_agg,
        )

        state = tmp_path / "agg"
        df = spark.createDataFrame([(1, 1, 10)], "event_id long, k long, qv long")
        incremental_agg(spark, df, state, keys=["k"], value_col="qv")
        before = {tuple(r) for r in spark.read.parquet(str(state)).collect()}
        incremental_agg(spark, df.limit(0), state, keys=["k"], value_col="qv")
        after = {tuple(r) for r in spark.read.parquet(str(state)).collect()}
        assert before == after
