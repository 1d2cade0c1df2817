"""Sources and sinks (SURVEY.md §2.1 S1-S12)."""

from .csv_normalized import normalized_sensor_scan, sensor_files  # noqa: F401
from .writers import write_single_csv, write_text_report  # noqa: F401
