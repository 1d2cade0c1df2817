"""S4/S5: normalizing sensor-CSV scan and filename-keyed file grouping.

The reference's raw sensor exports (reference ``data/*.csv``) have:

- a UTF-8 BOM on the header line;
- a verbose timestamp column (``"Timestamp for sample frequency every
  1 min min"``) detected by case-insensitive substring match
  (utils/20251223-csv-to-separate-sensors.py:44-49);
- per-sensor calibration-annotated measure names, e.g.
  ``Temperature_Celsius(calibrated -0.1 deg C)`` vs plain
  ``Temperature_Celsius`` — schema drift ACROSS files of one sensor;
- leading spaces in header cells.

Spark-first treatment: one ``spark.read.csv`` per file (schema drift
makes per-file reads the unit of planning — SURVEY §3.2), header
normalization via ``toDF``, timestamp parse + null filter + keep-last
dedup (A6) + ``try_cast`` numeric coercion (G9).  File→sensor grouping
(S5) is driver-side path logic exactly like the reference's glob, but
returns keys usable with ``input_file_name()`` when reading many files
in one plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import try_double
from ..operators.dedup import dedup_keep_last

# Reference filename convention: "<sensor>_export_<yyyymmddHHMM>[ (n)].csv"
# (utils/20251223-csv-to-separate-sensors.py:23-41).
FILENAME_RE = re.compile(r"^(?P<sensor>.+?)_export_(?P<export_ts>\d{12}).*\.csv$")

TIMESTAMP_SUBSTR = "timestamp"

# Calibration annotation: "Temperature_Celsius(calibrated -0.1 deg C)"
# normalizes to "Temperature_Celsius"; the annotation is data about the
# sensor, not a distinct measure (SURVEY §1.1.3).
CALIBRATION_RE = re.compile(r"\s*\(calibrated[^)]*\)\s*$", re.IGNORECASE)


@dataclass(frozen=True)
class SensorFile:
    path: str
    sensor: str
    export_ts: str  # yyyymmddHHMM — the keep-last fold order key (O4)


def sensor_files(input_dir: str | Path) -> dict[str, list[SensorFile]]:
    """S5: glob + filename-regex grouping, sorted by (export_ts, name) so
    the fold order (and therefore keep-last semantics) is deterministic
    (utils/20251223-csv-to-separate-sensors.py:37-41, 260-272)."""
    groups: dict[str, list[SensorFile]] = {}
    for p in sorted(Path(input_dir).glob("*.csv")):
        m = FILENAME_RE.match(p.name)
        if not m:  # P9: skip non-conforming names
            continue
        sf = SensorFile(str(p), m.group("sensor").strip(), m.group("export_ts"))
        groups.setdefault(sf.sensor, []).append(sf)
    for files in groups.values():
        files.sort(key=lambda f: (f.export_ts, f.path))
    return groups


def normalize_header(name: str) -> str:
    """BOM strip + trim + verbose-timestamp rename + calibration strip."""
    n = name.lstrip("﻿").strip()
    if TIMESTAMP_SUBSTR in n.lower():
        return "Timestamp"
    return CALIBRATION_RE.sub("", n)


def normalized_sensor_scan(spark: SparkSession, path: str) -> DataFrame:
    """S4: one sensor export -> typed (Timestamp, measures...) frame.

    Steps (mirroring utils/20251223-csv-to-separate-sensors.py:52-85,
    each as a native Spark op):  header normalization (toDF), timestamp
    parse with coerce semantics, null-timestamp filter (P5), keep-last
    dedup on Timestamp in file order (A6), try_cast numeric coercion of
    every measure column (G9).
    """
    raw = spark.read.option("header", True).csv(path)
    df = raw.toDF(*[normalize_header(c) for c in raw.columns])
    if "Timestamp" not in df.columns:
        raise ValueError(f"no timestamp-like column in {path}: {raw.columns}")
    measures = [c for c in df.columns if c != "Timestamp"]
    df = (
        df.withColumn("Timestamp", F.try_to_timestamp(F.col("Timestamp")))
        .filter(F.col("Timestamp").isNotNull())
        # File order = row order within the file; keep-last uses a
        # monotonic id as the within-file tiebreak, matching pandas
        # drop_duplicates(keep='last') on a sorted frame.
        .withColumn("__file_order", F.monotonically_increasing_id())
    )
    df = dedup_keep_last(df, ["Timestamp"], [F.col("__file_order")]).drop("__file_order")
    return df.select("Timestamp", *[try_double(c).alias(c) for c in measures])


def inferred_csv_scan(spark: SparkSession, path: str) -> DataFrame:
    """S2 in its literal ``inferSchema`` form: one sampling pass picks
    column types (the reference's ``read_csv_auto``,
    utils/20251223-csv-for-duckdb.py).  The engine's DEFAULT auto-typing
    path is the header-scan + ``try_cast`` in
    :func:`normalized_sensor_scan` — per-VALUE coercion semantics
    (``errors='coerce'``: a stray string nulls one cell, not the whole
    column), which is strictly more forgiving than inference (a stray
    string demotes the inferred column to string).  This variant exists
    for parity with the reference's mode and for inputs known clean,
    where skipping the per-value try_cast keeps the scan schema-typed
    at the source (PushedFilters apply to typed columns).
    """
    raw = spark.read.option("header", True).option("inferSchema", True).csv(path)
    return raw.toDF(*[normalize_header(c) for c in raw.columns])
