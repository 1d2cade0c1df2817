"""CLI smoke tests: each subcommand runs end-to-end on tiny inputs
(the session is reused via getOrCreate, so these stay fast)."""

from __future__ import annotations

import pytest

from tomasz_weight_tracker_spark.__main__ import main


def test_electricity_cli(spark, tmp_path):
    src = tmp_path / "meter.csv"
    src.write_text(
        "Date,Time,P,OP\n"
        "01/06/2024,10:00:00,100,200\n"
        "01/06/2024,11:00:00,160,230\n"
    )
    out = tmp_path / "usage.csv"
    assert main(["electricity", str(src), str(out), "--tz", ""]) in (0, None) or out.exists()
    assert out.exists()
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("Bucket,")
    assert len(lines) == 5  # header + 4 buckets

def test_catalog_cli_lists_unknown(spark, capsys):
    assert main(["catalog", "no_such_query"]) == 2
    assert "available:" in capsys.readouterr().out


def test_catalog_cli_runs_query(spark):
    assert main(["catalog", "global_summary", "--sf-dir", "/root/testdata/sf0.001"]) == 0
