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

from pyspark.sql import DataFrame, Window
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
    (utils/For Pandas and Polars --- Electricity.csv).

    P/OP are DOUBLE: the counters are mostly integral but the reference
    data contains fractional readings (row 9 of the CSV is ``650.5``),
    which pandas' inferred float64 and DuckDB's read_csv_auto both
    accept — a bigint schema would silently null them.
    """
    schema = "Date string, Time string, P double, OP double"
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
    ordered: bool = True,
) -> DataFrame:
    """The full W3 chain on a DataFrame of cumulative (ts, P, OP) readings.

    Returns ``series_keys + [Bucket, MinDateTime, MaxDateTime, Minutes,
    P_Usage, OP_Usage]`` ordered by Bucket, matching the reference output
    shape (utils/duckdb_electricity_1-minute.py:163-172).

    Physical strategy: the logical minute grid is NEVER materialized.
    Because the peak boundaries (06:30, 23:30) fall on 15-minute
    multiples, every end-labeled bucket is category-homogeneous, so the
    explode happens at BUCKET granularity — one row per (interval,
    bucket) with a closed-form count of its grid minutes — a 15x row
    reduction versus the per-minute explode (and ~1440x versus the
    reference's per-row Python loops).  Results are bit-identical: each
    bucket contributes (count x decimal-quantized per-minute rate),
    which equals the per-minute decimal sum exactly.  For bucket widths
    that do NOT divide the peak boundaries, the code falls back to the
    per-minute explode.
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

    start = F.col("UTC_DateTime")
    end = F.col("next_UTC_DateTime")
    if max_gap_minutes is not None:
        end = F.least(end, start + F.expr(f"INTERVAL {max_gap_minutes} MINUTES"))
    one_min = F.expr("INTERVAL 1 MINUTE")
    # The logical grid is sequence(start + 1min, end, 1min).  Sub-minute
    # intervals contribute no grid rows and are filtered, matching the
    # oracle's empty generate_series.
    df = df.filter(end >= start + one_min)

    bucket_secs = bucket_minutes * 60
    fast_path = (390 * 60) % bucket_secs == 0 and (1410 * 60) % bucket_secs == 0

    if fast_path:
        # Bucket-granularity explode (see docstring).  Grid point k
        # (1-based) sits at interval-start + k minutes; its epoch-SECOND
        # is s0 + 60k (the sub-second fraction of the start can never
        # move a point across a bucket or minute boundary), while the
        # emitted timestamps keep the exact µs offset.
        u0 = F.unix_micros(start)
        s0 = F.floor(u0 / 1_000_000)
        k_total = F.floor((F.unix_micros(end) - u0) / 60_000_000).cast("long")
        first_bucket = F.timestamp_seconds(F.floor(s0 / bucket_secs) * bucket_secs)
        last_bucket = F.timestamp_seconds(
            F.floor((s0 + (k_total - 1) * 60) / bucket_secs) * bucket_secs
        )
        df = (
            df.withColumn("__u0", u0)
            .withColumn("__s0", s0)
            .withColumn("__K", k_total)
        )

        def bucket_struct(bts):
            # Grid points k in bucket B, end-labeled: B <= s0+60(k-1) < B+W.
            b = F.unix_seconds(bts)
            k_lo = F.greatest(
                F.lit(1).cast("long"),
                (F.ceil((b - F.col("__s0")) / 60) + 1).cast("long"),
            )
            k_hi = F.least(
                F.col("__K"),
                F.ceil((b + bucket_secs - F.col("__s0")) / 60).cast("long"),
            )
            min_ts = F.timestamp_micros(F.col("__u0") + k_lo * 60_000_000)
            return F.struct(
                bts.alias("bucket"),
                (k_hi - k_lo + 1).alias("n"),
                min_ts.alias("min_ts"),
                F.timestamp_micros(F.col("__u0") + k_hi * 60_000_000).alias("max_ts"),
                # Buckets are category-homogeneous (docstring): one probe
                # minute classifies the whole bucket.
                (peak_category(min_ts) == "P").alias("is_p"),
            )

        step = F.expr(f"INTERVAL {bucket_minutes} MINUTES")
        df = df.withColumn(
            "__buckets",
            F.transform(F.sequence(first_bucket, last_bucket, step), bucket_struct),
        )
        # Per-interval P/OP minute counts via array folds on the
        # PRE-explode array — no shuffle, no window (replaces the
        # reference's self-join J2, utils/duckdb_electricity_1-minute.py:112-143).
        df = df.withColumn(
            "P_Mins",
            F.aggregate(
                F.col("__buckets"),
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.when(x["is_p"], x["n"]).otherwise(F.lit(0)),
            ),
        ).withColumn("OP_Mins", F.col("__K") - F.col("P_Mins"))

        df = df.withColumn("__b", F.explode("__buckets")).drop("__buckets")
        # T6 + A1: each bucket contributes n x the decimal-quantized
        # per-minute rate — bit-identical to summing n quantized minutes.
        is_p = F.col("__b.is_p")
        # n <= bucket width in minutes: decimal(4,0) keeps the product at
        # decimal(23,12) — no precision loss (18,12 x bigint would exceed
        # precision 38 and silently drop to scale 11).
        n = F.col("__b.n").cast("decimal(4,0)")
        p_rate = (F.col("Delta_P") / F.col("P_Mins")).cast("decimal(18,12)")
        op_rate = (F.col("Delta_OP") / F.col("OP_Mins")).cast("decimal(18,12)")
        df = df.withColumn(
            "P_Usage_part", F.when(is_p & (F.col("P_Mins") > 0), p_rate * n)
        ).withColumn(
            "OP_Usage_part", F.when((~is_p) & (F.col("OP_Mins") > 0), op_rate * n)
        )
        out = df.groupBy(*keys, F.col("__b.bucket").alias("Bucket")).agg(
            F.min("__b.min_ts").alias("MinDateTime"),
            F.max("__b.max_ts").alias("MaxDateTime"),
            F.sum("__b.n").alias("Minutes"),
            F.sum("P_Usage_part").cast("double").alias("P_Usage"),
            F.sum("OP_Usage_part").cast("double").alias("OP_Usage"),
        )
    else:
        # Generic path (bucket width not dividing the peak boundaries):
        # per-minute explode, with the per-interval category counts
        # computed on the pre-explode ARRAY — no shuffle, no window sort
        # over the ~1440x-amplified rows (replaces the reference's
        # self-join J2, utils/duckdb_electricity_1-minute.py:112-143).
        df = df.withColumn("minutes_arr", F.sequence(start + one_min, end, one_min))

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
        df = df.withColumn("Bucket", bucket_end_labeled(F.col("minute_ts"), bucket_minutes))
        out = df.groupBy(*keys, "Bucket").agg(
            F.min("minute_ts").alias("MinDateTime"),
            F.max("minute_ts").alias("MaxDateTime"),
            F.count(F.lit(1)).alias("Minutes"),
            # Decimal-cast sums: exact and summation-order-independent.
            F.sum(F.col("P_Usage_min").cast("decimal(18,12)")).cast("double").alias("P_Usage"),
            F.sum(F.col("OP_Usage_min").cast("decimal(18,12)")).cast("double").alias("OP_Usage"),
        )
    # The reference CSV output is Bucket-ordered; callers doing hash
    # compares or further aggregation skip the global sort (a full
    # range-partition exchange at scale).
    return out.orderBy(*keys, "Bucket") if ordered else out


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
