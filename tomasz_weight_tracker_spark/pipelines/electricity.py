"""W3: electricity meter pipeline (SURVEY.md §2, §3.1, §7.2 phase 1).

Cumulative P/OP meter readings -> DST-aware UTC -> lead deltas ->
1-minute interval explode -> peak/off-peak rate allocation -> 15-minute
end-labeled bucket aggregation.

The reference implements this FOUR times with identical semantics
(utils/pandas_electricity.py, utils/polars_electricity.py,
utils/duckdb_electricity_1-minute.py, utils/15-minute-duckdb_electricity.py);
this is the single Spark-first implementation.  Differences from the
reference's physical strategy, on purpose:

- The per-year BST boundary dim table + join
  (utils/duckdb_electricity_1-minute.py:21-55) is replaced entirely by
  ``to_utc_timestamp(ts, 'Europe/London')``.
- The per-interval minute-count self-join
  (utils/duckdb_electricity_1-minute.py:112-143) is replaced by
  per-row array aggregation over the minute grid BEFORE it is
  exploded — zero shuffles and no window sort over the amplified
  rows.
- The interpreted per-row interval loops
  (utils/pandas_electricity.py:69-122) are ``explode(sequence(...))``,
  whole-stage-codegen'd.
- Windows partition by ``series_keys`` (meter id) so the plan scales
  beyond the reference's single meter (SURVEY §7.4 item 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.time_ops import (
    bucket_end_labeled,
    combine_date_time,
    lead_next,
    local_to_utc,
    peak_category,
)


def read_meter_csv(spark, path: str) -> DataFrame:
    """S1: typed CSV scan of ``Date,Time,P,OP`` cumulative readings
    (utils/For Pandas and Polars --- Electricity.csv)."""
    schema = "Date string, Time string, P bigint, OP bigint"
    df = spark.read.option("header", True).schema(schema).csv(path)
    return df.select(
        combine_date_time(F.col("Date"), F.col("Time")).alias("LocalDateTime"),
        "P",
        "OP",
    )


def fifteen_minute_usage(
    readings: DataFrame,
    series_keys: Sequence[str] = (),
    ts_col: str = "LocalDateTime",
    tz: str | None = "Europe/London",
    max_gap_minutes: int | None = None,
    bucket_minutes: int = 15,
) -> DataFrame:
    """The full W3 chain on a DataFrame of cumulative (ts, P, OP) readings.

    Returns ``series_keys + [Bucket, MinDateTime, MaxDateTime, Minutes,
    P_Usage, OP_Usage]`` ordered by Bucket, matching the reference output
    shape (utils/duckdb_electricity_1-minute.py:163-172).
    """
    keys = list(series_keys)
    ts = F.col(ts_col)
    utc = local_to_utc(ts, tz) if tz else ts
    df = readings.select(*keys, utc.alias("UTC_DateTime"), "P", "OP")

    # W1: deltas to the next reading, per series.
    df = lead_next(df, "UTC_DateTime", keys, ["UTC_DateTime", "P", "OP"])
    # Deltas cast to double AFTER the subtraction so cumulative counters
    # may be exact decimals while the per-minute rate math stays double.
    df = (
        df.filter(F.col("next_UTC_DateTime").isNotNull())
        .withColumn("Delta_P", (F.col("next_P") - F.col("P")).cast("double"))
        .withColumn("Delta_OP", (F.col("next_OP") - F.col("OP")).cast("double"))
    )

    # T4: minute grid (start, end].  The grid is built as an ARRAY first
    # so the per-interval P/OP minute counts (the reference's self-join
    # J2, utils/duckdb_electricity_1-minute.py:112-143) collapse to
    # per-row array aggregations — no shuffle, no window sort over the
    # exploded (~1440x amplified) rows.  Only then do we explode.
    start = F.col("UTC_DateTime")
    end = F.col("next_UTC_DateTime")
    if max_gap_minutes is not None:
        end = F.least(end, start + F.expr(f"INTERVAL {max_gap_minutes} MINUTES"))
    one_min = F.expr("INTERVAL 1 MINUTE")
    # sequence() errors on start > stop: sub-minute intervals contribute
    # no grid rows, so they are filtered, matching the oracle's
    # generate_series yielding an empty set.
    df = df.filter(end >= start + one_min).withColumn(
        "minutes_arr", F.sequence(start + one_min, end, one_min)
    )

    def is_peak(m):
        mod = F.hour(m) * 60 + F.minute(m)
        return (mod > 390) & (mod <= 1410)

    df = (
        df.withColumn(
            "P_Mins", F.size(F.filter(F.col("minutes_arr"), is_peak)).cast("long")
        )
        .withColumn(
            "OP_Mins", (F.size(F.col("minutes_arr")) - F.col("P_Mins")).cast("long")
        )
        .withColumn("minute_ts", F.explode(F.col("minutes_arr")))
        .drop("minutes_arr")
        .withColumn("Category", peak_category(F.col("minute_ts")))
    )

    # T6: allocate the interval's delta evenly over its minutes of the
    # matching category.
    df = df.withColumn(
        "P_Usage_min",
        F.when(
            (F.col("Category") == "P") & (F.col("P_Mins") > 0),
            F.col("Delta_P") / F.col("P_Mins"),
        ),
    ).withColumn(
        "OP_Usage_min",
        F.when(
            (F.col("Category") == "OP") & (F.col("OP_Mins") > 0),
            F.col("Delta_OP") / F.col("OP_Mins"),
        ),
    )

    # T7 + A1: end-labeled 15-minute bucket aggregation.
    df = df.withColumn("Bucket", bucket_end_labeled(F.col("minute_ts"), bucket_minutes))
    out = (
        df.groupBy(*keys, "Bucket")
        .agg(
            F.min("minute_ts").alias("MinDateTime"),
            F.max("minute_ts").alias("MaxDateTime"),
            F.count(F.lit(1)).alias("Minutes"),
            # Decimal-cast sums: exact and summation-order-independent, so
            # results are reproducible across partitionings (and match the
            # DuckDB oracle bit-for-bit).
            F.sum(F.col("P_Usage_min").cast("decimal(18,12)")).cast("double").alias("P_Usage"),
            F.sum(F.col("OP_Usage_min").cast("decimal(18,12)")).cast("double").alias("OP_Usage"),
        )
        .orderBy(*keys, "Bucket")
    )
    return out


def conservation_check(readings: DataFrame, usage: DataFrame) -> dict[str, float]:
    """SURVEY §5.1.3 invariant: total allocated usage equals the meter
    delta over the covered span (driver-side, test support)."""
    first_last = readings.orderBy("LocalDateTime").agg(
        (F.max("P") - F.min("P")).alias("dP"), (F.max("OP") - F.min("OP")).alias("dOP")
    ).first()
    sums = usage.agg(
        F.sum("P_Usage").alias("sP"), F.sum("OP_Usage").alias("sOP")
    ).first()
    return {
        "meter_dP": float(first_last["dP"]),
        "meter_dOP": float(first_last["dOP"]),
        "allocated_P": float(sums["sP"] or 0.0),
        "allocated_OP": float(sums["sOP"] or 0.0),
    }
