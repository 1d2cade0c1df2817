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
