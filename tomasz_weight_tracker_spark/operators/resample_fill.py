"""Gap-fill / linear interpolation onto a regular minute grid.

The reference's sensor data is nominally 1-minute sampled but has gaps
(missed exports, device outages).  This operator regularizes a series:
one output row per minute from each reading to the next, with values
linearly interpolated between the surrounding readings — the standard
preprocessing step before windowed analytics on irregular series.

Spark-first construction (no UDF, one shuffle):

1. per-series LEAD window attaches the next reading;
2. ``explode(sequence(ts, next_ts - 1min, 1min))`` emits the grid
   (readings with no successor emit themselves);
3. the interpolation weight ``(t - t0) / (t1 - t0)`` is a plain
   column expression, codegen'd.

The per-pair row amplification is bounded by ``max_gap_minutes``
(outages should read as NULL gaps downstream, not week-long linear
ramps — and a 3-week gap would otherwise be a 30k-row hot key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_minute_gaps(
    df: DataFrame,
    ts_col: str,
    value_cols: Sequence[str],
    series_keys: Sequence[str] = (),
    order_tiebreak: Sequence[str] = (),
    max_gap_minutes: int | None = None,
) -> DataFrame:
    """Returns ``series_keys + [ts_col] + value_cols`` with one row per
    grid minute; observed instants keep their value, interior minutes
    interpolate linearly."""
    keys = list(series_keys)
    # bounded-frame: keyless fallback = single-series input (documented degenerate; pass keys at scale)
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_tiebreak) if keys else Window.orderBy(
        ts_col, *order_tiebreak
    )
    out = df.select(*keys, ts_col, *value_cols, *order_tiebreak)
    for c in value_cols:
        out = out.withColumn(f"__n_{c}", F.lead(c).over(w))
    out = out.withColumn("__nts", F.lead(ts_col).over(w))

    t0 = F.col(ts_col)
    t1 = F.col("__nts")
    end = t1 - F.expr("INTERVAL 1 MINUTE")
    if max_gap_minutes is not None:
        end = F.least(end, t0 + F.expr(f"INTERVAL {max_gap_minutes} MINUTES"))
    # sequence(start, stop) throws when stop < start, which happens for
    # sub-minute gaps (end = t1 - 1min < t0) and duplicate timestamps.
    # DuckDB's generate_series returns NO rows for such intervals, so
    # emit an empty grid (slice keeps the element type without a cast)
    # — the next reading still emits itself as its own grid start.
    empty = F.slice(F.array(t0), 1, 0)
    grid = (
        F.when(t1.isNull(), F.array(t0))
        .when(end < t0, empty)
        .otherwise(F.sequence(t0, end, F.expr("INTERVAL 1 MINUTE")))
    )
    out = out.withColumn("__m", F.explode(grid))

    num = F.unix_micros(F.col("__m")) - F.unix_micros(t0)
    den = F.unix_micros(t1) - F.unix_micros(t0)
    frac = num.cast("double") / den.cast("double")
    cols = [*keys, F.col("__m").alias(ts_col)]
    for c in value_cols:
        interp = F.when(
            t1.isNull() | (F.col("__m") == t0), F.col(c)
        ).otherwise(F.col(c) + (F.col(f"__n_{c}") - F.col(c)) * frac)
        cols.append(interp.alias(c))
    return out.select(*cols)
