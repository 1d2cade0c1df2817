"""ST2: progress reporting (SURVEY §2.9).

The reference shows a progress bar per 10 synced files
(utils/20251223-weight-for-streamlit.py:159-171).  The engine
equivalent is a ``StreamingQueryListener``: per-microbatch rows/sec and
cumulative counts, pushed to a callback (a UI, a log line, a metrics
sink) — driver-side observability, zero cost on the executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressStats:
    batches: int = 0
    total_rows: int = 0
    last_rows_per_sec: float = 0.0
    history: list[tuple[int, float]] = field(default_factory=list)


class ProgressReporter(StreamingQueryListener):
    """Collects per-batch throughput; optionally forwards a formatted
    line to ``on_line`` (the progress-bar analogue)."""

    def __init__(self, on_line=None):
        self.stats = ProgressStats()
        self._on_line = on_line

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        rows = p.numInputRows
        rate = p.processedRowsPerSecond or 0.0
        self.stats.batches += 1
        self.stats.total_rows += rows
        self.stats.last_rows_per_sec = rate
        self.stats.history.append((rows, rate))
        if self._on_line:
            self._on_line(
                f"batch {self.stats.batches}: {rows} rows "
                f"({rate:.0f} rows/s, {self.stats.total_rows} total)"
            )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass
