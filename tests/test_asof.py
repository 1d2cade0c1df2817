"""As-of join operator tests (>= semantics, per-key isolation, no-match
nulls, tie at equal timestamps)."""

from __future__ import annotations

import datetime as dt

from tomasz_weight_tracker_spark.operators.asof import asof_join


def ts(minute):
    return dt.datetime(2024, 6, 1, 10, minute)


def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", ts(0), 100),  # before any right row -> null
            ("u1", ts(5), 101),  # exactly at right ts(5) -> 5.0 (>= semantics)
            ("u1", ts(7), 102),  # between 5 and 10 -> 5.0
            ("u1", ts(30), 103),  # after all -> 10.0
            ("u2", ts(7), 200),  # other key: only u2's rights visible
        ],
        "user_id string, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [("u1", ts(5), 5.0), ("u1", ts(10), 10.0), ("u2", ts(6), 66.0)],
        "user_id string, ts timestamp, value double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = frames(spark)
    out = {r.event_id: r.value_asof for r in asof_join(left, right, ["user_id"]).collect()}
    assert out == {100: None, 101: 5.0, 102: 5.0, 103: 10.0, 200: 66.0}


def test_left_rows_preserved(spark):
    left, right = frames(spark)
    assert asof_join(left, right, ["user_id"]).count() == left.count()
