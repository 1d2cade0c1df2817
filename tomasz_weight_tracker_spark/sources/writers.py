"""Sinks (SURVEY.md §2.1 S9/S12).

S9 parity note: the reference writes ONE csv file per output
(``result.to_csv(...)``, utils/pandas_electricity.py:173).  Spark's
native writer emits a directory of part files; ``write_single_csv``
coalesces to one partition for bit-parity mode and renames the part
file.  At scale, callers should use ``df.write.csv`` directly (many
part files) — single-file output is a small-data convenience, never
the 100 TB path.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame


def write_single_csv(df: DataFrame, out_path: str | Path, header: bool = True) -> Path:
    """S9: write a DataFrame as exactly one CSV file at ``out_path``."""
    out_path = Path(out_path)
    tmp = Path(tempfile.mkdtemp(prefix="spark_csv_")) / "out"
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(str(tmp))
    part = next(tmp.glob("part-*.csv"))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), out_path)
    shutil.rmtree(tmp.parent, ignore_errors=True)
    return out_path


def write_text_report(lines: list[str], out_path: str | Path) -> Path:
    """S12: ordered text report (utils/loose_thoughts.py:121-133).
    Driver-side by design — reports are human-scale."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return out_path
