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
  (utils/duckdb_electricity_1-minute.py:112-143) is replaced by a
  window count partitioned by the interval key — one shuffle fewer.
- The interpreted per-row interval loops
  (utils/pandas_electricity.py:69-122) are ``explode(sequence(...))``,
  whole-stage-codegen'd.
- Windows partition by ``series_keys`` (meter id) so the plan scales
  beyond the reference's single meter (SURVEY §7.4 item 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.time_ops import (
    bucket_end_labeled,
    combine_date_time,
    explode_minute_grid,
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

    # T4: minute grid (start, end]; interval key = the reading's own ts.
    df = explode_minute_grid(
        df, "UTC_DateTime", "next_UTC_DateTime", "minute_ts", max_minutes=max_gap_minutes
    )

    # T5: classify each minute; count minutes per category per interval
    # with a window (replaces the reference's self-join J2).
    df = df.withColumn("Category", peak_category(F.col("minute_ts")))
    interval_w = Window.partitionBy(*keys, "UTC_DateTime")
    df = df.withColumn(
        "P_Mins", F.count(F.when(F.col("Category") == "P", 1)).over(interval_w)
    ).withColumn(
        "OP_Mins", F.count(F.when(F.col("Category") == "OP", 1)).over(interval_w)
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
            F.sum(F.col("P_Usage_min").cast("decimal(27,12)")).cast("double").alias("P_Usage"),
            F.sum(F.col("OP_Usage_min").cast("decimal(27,12)")).cast("double").alias("OP_Usage"),
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
