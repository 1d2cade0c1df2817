"""Python-surface operators (operators/vectorized.py): edge cases the
parity corpus doesn't hit — degenerate groups, null blobs, and the
exactness discipline inside Python.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators import vectorized as V


class TestZscoreGroupedMap:
    def test_values_match_closed_form(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 1.0), (1, 11, 2.0), (1, 12, 3.0)],
            "user_id long, event_id long, value double",
        )
        out = {r.event_id: r.zscore for r in V.zscore_grouped_map(df).collect()}
        # q = 100,200,300; z = (3q-600)/sqrt(3*140000-360000)
        den = math.sqrt(3 * 140000 - 600 * 600)
        assert out[10] == (3 * 100 - 600) / den
        assert out[11] == 0.0
        assert out[12] == (3 * 300 - 600) / den

    def test_constant_group_yields_null_not_crash(self, spark):
        # Spark (ANSI off) and DuckDB both return NULL for x/0.0; the
        # Python path must match, not raise ZeroDivisionError.
        df = spark.createDataFrame(
            [(1, 10, 5.0), (1, 11, 5.0)], "user_id long, event_id long, value double"
        )
        zs = [r.zscore for r in V.zscore_grouped_map(df).collect()]
        assert zs == [None, None]


class TestOutlierUdaf:
    def test_integer_decision_rule(self):
        import pandas as pd

        # one extreme value among ten: exactly one |z|>2 outlier
        s = pd.Series([10] * 9 + [1000])
        assert V.outlier_count_series(s) == 1
        assert V.outlier_count_series(pd.Series([7, 7, 7])) == 0

    def test_no_int64_overflow_at_scale(self):
        import pandas as pd

        # python-int arithmetic: n*q products beyond int64 must not wrap
        s = pd.Series([2**40, 2**40 + 1] * 50)
        assert V.outlier_count_series(s) == 0


class TestSentenceUdtf:
    def test_splits_and_null_safe(self, spark):
        spark.udtf.register("sentence_split_t", V.make_sentence_udtf())
        spark.createDataFrame(
            [(1, "One. Two! Three? Four"), (2, None), (3, "")],
            "doc_id long, text string",
        ).createOrReplaceTempView("__t_udtf")
        rows = spark.sql(
            "SELECT d.doc_id, s.sent_idx, s.sentence "
            "FROM __t_udtf d, LATERAL sentence_split_t(d.text) s"
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
        assert by_doc[1] == [(1, "One"), (2, "Two"), (3, "Three"), (4, "Four")]
        assert 2 not in by_doc  # null text yields no rows
        assert by_doc[3] == [(1, "")]  # empty text = one empty sentence (SQL twin)
