"""W2 sensor-merge pipeline tests: normalizing scan quirks (BOM,
verbose timestamp header, calibration annotations), keep-last dedup,
the full-outer fold with conflict-column materialization, schema
evolution across files, and all-null pruning."""

from __future__ import annotations

import datetime as dt

import pytest

from tomasz_weight_tracker_spark.pipelines.sensors import (
    consolidate_sensors,
    drop_all_null_columns,
    merge_sensor_frames,
)
from tomasz_weight_tracker_spark.sources.csv_normalized import (
    normalize_header,
    normalized_sensor_scan,
    sensor_files,
)

BOM = "﻿"
TS_HDR = "Timestamp for sample frequency every 1 min min"


def write(p, text):
    p.write_text(text, encoding="utf-8")
    return str(p)


class TestNormalizeHeader:
    def test_quirks(self):
        assert normalize_header(BOM + TS_HDR) == "Timestamp"
        assert normalize_header(" Temperature_Celsius(calibrated -0.1 deg C)") == "Temperature_Celsius"
        assert normalize_header("Relative_Humidity(calibrated -5.3%)") == "Relative_Humidity"
        assert normalize_header("Temperature_Celsius") == "Temperature_Celsius"


class TestSensorFiles:
    def test_grouping_and_order(self, tmp_path):
        for name in [
            "Kitchen I (1)_export_202511270056.csv",
            "Kitchen I (1)_export_202511210054.csv",
            "Bedroom (2)_export_202511220059.csv",
            "not_a_sensor.csv",  # P9: skipped
        ]:
            write(tmp_path / name, "x\n1\n")
        groups = sensor_files(tmp_path)
        assert set(groups) == {"Kitchen I (1)", "Bedroom (2)"}
        # Sorted by embedded export timestamp, not filename order.
        assert [f.export_ts for f in groups["Kitchen I (1)"]] == [
            "202511210054",
            "202511270056",
        ]


class TestNormalizedScan:
    def test_reference_quirks(self, spark, tmp_path):
        p = write(
            tmp_path / "Kitchen_export_202511210054.csv",
            BOM + TS_HDR + ", Temperature_Celsius(calibrated -0.1 deg C),Relative_Humidity\n"
            "2025-11-20 14:10:00,22.1,56.8\n"
            "bad-timestamp,99.0,99.0\n"  # coerced to null -> dropped
            "2025-11-20 14:11:00,24.4,59.3\n"
            "2025-11-20 14:11:00,24.5,59.4\n",  # dup ts -> keep LAST
        )
        df = normalized_sensor_scan(spark, p)
        assert df.columns == ["Timestamp", "Temperature_Celsius", "Relative_Humidity"]
        rows = {r.Timestamp: r for r in df.collect()}
        assert len(rows) == 2
        assert rows[dt.datetime(2025, 11, 20, 14, 11)].Temperature_Celsius == 24.5


class TestMergeFold:
    def _frame(self, spark, rows, cols="Timestamp timestamp, Temperature_Celsius double"):
        return spark.createDataFrame(rows, cols)

    def test_prefer_existing_fill_from_new(self, spark):
        t1, t2, t3 = (dt.datetime(2025, 11, 20, 14, m) for m in (10, 11, 12))
        a = self._frame(spark, [(t1, 1.0), (t2, None)])
        b = self._frame(spark, [(t2, 2.0), (t3, 3.0)])
        out = merge_sensor_frames([a, b])
        got = {r.Timestamp: r.Temperature_Celsius for r in out.collect()}
        assert got == {t1: 1.0, t2: 2.0, t3: 3.0}
        assert not any(c.startswith("!") for c in out.columns)  # no conflicts

    def test_conflict_column_materialized(self, spark):
        t = dt.datetime(2025, 11, 20, 14, 10)
        a = self._frame(spark, [(t, 20.0)])
        b = self._frame(spark, [(t, 25.0)])  # genuine conflict
        out = merge_sensor_frames([a, b])
        assert "!A! Temperature_Celsius" in out.columns
        row = out.collect()[0]
        assert row.Temperature_Celsius == 20.0  # existing wins
        assert row["!A! Temperature_Celsius"] == 25.0  # incoming recorded

    def test_close_values_do_not_conflict(self, spark):
        t = dt.datetime(2025, 11, 20, 14, 10)
        a = self._frame(spark, [(t, 20.0)])
        b = self._frame(spark, [(t, 20.0 + 1e-7)])  # within np.isclose tolerance
        out = merge_sensor_frames([a, b])
        assert not any(c.startswith("!") for c in out.columns)
        assert out.collect()[0].Temperature_Celsius == 20.0

    def test_schema_evolution_new_column(self, spark):
        t1, t2 = dt.datetime(2025, 11, 20, 14, 10), dt.datetime(2025, 11, 21, 14, 10)
        a = self._frame(spark, [(t1, 20.0)])
        b = spark.createDataFrame(
            [(t2, 21.0, 55.0)],
            "Timestamp timestamp, Temperature_Celsius double, Relative_Humidity double",
        )
        out = merge_sensor_frames([a, b])
        assert out.columns == ["Timestamp", "Temperature_Celsius", "Relative_Humidity"]
        got = {r.Timestamp: (r.Temperature_Celsius, r.Relative_Humidity) for r in out.collect()}
        assert got[t1] == (20.0, None) and got[t2] == (21.0, 55.0)

    def test_multiple_conflicts_get_distinct_tags(self, spark):
        t = dt.datetime(2025, 11, 20, 14, 10)
        a = self._frame(spark, [(t, 20.0)])
        b = self._frame(spark, [(t, 25.0)])
        c = self._frame(spark, [(t, 30.0)])
        out = merge_sensor_frames([a, b, c])
        conflict_cols = sorted(col for col in out.columns if col.startswith("!"))
        assert conflict_cols == ["!A! Temperature_Celsius", "!B! Temperature_Celsius"]
        row = out.collect()[0]
        assert row.Temperature_Celsius == 20.0
        assert row["!A! Temperature_Celsius"] == 25.0
        assert row["!B! Temperature_Celsius"] == 30.0


class TestDropAllNull:
    def test_prunes_empty_only(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2025, 1, 1), None, 1.0)],
            "Timestamp timestamp, empty double, kept double",
        )
        out = drop_all_null_columns(df)
        assert out.columns == ["Timestamp", "kept"]


class TestEndToEnd:
    def test_consolidate_reference_shape(self, spark, tmp_path):
        write(
            tmp_path / "Kitchen I (1)_export_202511210054.csv",
            BOM + TS_HDR + ",Temperature_Celsius(calibrated -0.1 deg C),Relative_Humidity\n"
            "2025-11-20 14:10:00,22.1,56.8\n"
            "2025-11-20 14:11:00,24.4,59.3\n",
        )
        write(
            tmp_path / "Kitchen I (1)_export_202511220059.csv",
            BOM + TS_HDR + ",Temperature_Celsius,Relative_Humidity\n"
            "2025-11-20 14:11:00,24.9,59.3\n"  # temp conflicts (24.4 vs 24.9)
            "2025-11-21 14:10:00,20.0,50.0\n",
        )
        out = consolidate_sensors(spark, str(tmp_path))
        assert set(out) == {"Kitchen I (1)"}
        merged = out["Kitchen I (1)"]
        assert merged.columns == [
            "Timestamp",
            "Temperature_Celsius",
            "Relative_Humidity",
            "!A! Temperature_Celsius",
        ]
        rows = {r.Timestamp: r for r in merged.collect()}
        assert len(rows) == 3
        conflicted = rows[dt.datetime(2025, 11, 20, 14, 11)]
        assert conflicted.Temperature_Celsius == 24.4
        assert conflicted["!A! Temperature_Celsius"] == 24.9
