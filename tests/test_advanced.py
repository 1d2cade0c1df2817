"""plans/advanced.py: SCD2 history, fixed-iteration PageRank,
sorted-neighborhood near-dup, bitmap exact-distinct — semantic
invariants beyond the parity gate's hash equality.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.plans.advanced import (
    _SNM_WINDOW,
    q_bitmap_distinct_users,
    q_pagerank_part_supplier,
    q_scd2_user_state,
    q_snm_near_dup,
)
from tomasz_weight_tracker_spark.streaming.tuning import state_partitions

SF = "/root/testdata/sf0.001"


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


class TestScd2:
    def test_history_semantics_on_crafted_stream(self, spark, tmp_path):
        # user 1: a a b a  -> 3 versions; user 2: c -> 1 version.
        rows = [
            (1, 1, _ts(9), "a", 0.0, ""),
            (2, 1, _ts(10), "a", 0.0, ""),
            (3, 1, _ts(11), "b", 0.0, ""),
            (4, 1, _ts(12), "a", 0.0, ""),
            (5, 2, _ts(9), "c", 0.0, ""),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
        )
        path = str(tmp_path / "ev")
        df.write.parquet(path + "/events.parquet")
        out = q_scd2_user_state(spark, path).collect()
        u1 = sorted((r for r in out if r.user_id == 1), key=lambda r: r.version)
        assert [r.state for r in u1] == ["a", "b", "a"]
        # Intervals tile: each valid_to equals the next valid_from.
        assert u1[0].valid_to == u1[1].valid_from
        assert u1[1].valid_to == u1[2].valid_from
        assert u1[2].valid_to is None and u1[2].is_current
        assert sum(r.is_current for r in out) == 2  # exactly one per user

    def test_current_rows_match_latest_event(self, spark):
        out = q_scd2_user_state(spark, SF)
        cur = out.filter("is_current").groupBy("user_id").count()
        assert cur.filter("count != 1").count() == 0


class TestPageRank:
    def test_mass_and_node_domain(self, spark):
        out = q_pagerank_part_supplier(spark, SF).collect()
        # Every node gets the damping floor; symmetric edges leak no mass,
        # so total rank stays within damping bounds of node count.
        assert all(r.rank >= 0.15 for r in out)
        n = len(out)
        total = sum(r.rank for r in out)
        assert abs(total - n) / n < 0.02  # conservation up to quantization
        kinds = {r.kind for r in out}
        assert kinds == {"part", "supplier"}

    def test_deterministic_across_runs(self, spark):
        a = {r.id: r.rank for r in q_pagerank_part_supplier(spark, SF).collect()}
        b = {r.id: r.rank for r in q_pagerank_part_supplier(spark, SF).collect()}
        assert a == b


class TestSortedNeighborhood:
    def test_pair_budget_and_orientation(self, spark):
        out = q_snm_near_dup(spark, SF).collect()
        assert all(r.doc_a != r.doc_b for r in out)
        # Each doc opens at most w comparisons -> no quadratic blowup.
        from collections import Counter

        per_doc = Counter(r.doc_a for r in out)
        assert all(v <= _SNM_WINDOW for v in per_doc.values())

    def test_finds_injected_near_duplicate(self, spark, tmp_path):
        base = "the quick brown fox jumps over the lazy dog " * 3
        rows = [
            (1, base, "en", "s", len(base)),
            (2, base[:-1] + "!", "en", "s", len(base)),  # 1 edit away
            (3, "zzz completely unrelated text qqq", "en", "s", 33),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        path = str(tmp_path / "docs")
        df.write.parquet(path + "/documents.parquet")
        pairs = {(r.doc_a, r.doc_b) for r in q_snm_near_dup(spark, path).collect()}
        assert (1, 2) in pairs


class TestBitmapDistinct:
    def test_equals_exact_count_distinct(self, spark):
        got = {
            r.event_type: r.n_users
            for r in q_bitmap_distinct_users(spark, SF).collect()
        }
        from tomasz_weight_tracker_spark.plans.catalog import load

        want = {
            r.event_type: r.n
            for r in load(spark, SF, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert got == want

    def test_partitioning_invariant(self, spark):
        # bit_or commutes; the count cannot depend on row sharding.
        df = spark.range(5000).select(
            F.lit("t").alias("event_type"), (F.col("id") % 321).alias("user_id")
        )
        import tomasz_weight_tracker_spark.plans.advanced as A

        def count(frame):
            words = frame.groupBy(
                "event_type", F.expr("user_id div 64").alias("word")
            ).agg(
                F.expr(
                    "bit_or(shiftleft(1L, cast(pmod(user_id, 64) as int)))"
                ).alias("bits")
            )
            return (
                words.groupBy("event_type")
                .agg(F.sum(F.bit_count("bits")).alias("n"))
                .first()
                .n
            )

        assert count(df.repartition(1)) == count(df.repartition(7, "user_id")) == 321
        assert A is not None


class TestStatePartitions:
    def test_restores_session_conf(self, spark):
        key = "spark.sql.shuffle.partitions"
        before = spark.conf.get(key)
        with state_partitions(spark, 3):
            assert spark.conf.get(key) == "3"
        assert spark.conf.get(key) == before

    def test_restores_on_error(self, spark):
        key = "spark.sql.shuffle.partitions"
        before = spark.conf.get(key)
        try:
            with state_partitions(spark, 2):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert spark.conf.get(key) == before
