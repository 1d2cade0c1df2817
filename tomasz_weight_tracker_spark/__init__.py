"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo
``tomasz-waleciuk-data-engineering/tomasz-weight-tracker``.

Not a port: every operator from SURVEY.md §2 is re-expressed through
idiomatic Spark primitives (DataFrame/SQL on Catalyst, window functions,
``sequence``+``explode``, ``to_utc_timestamp``, pivot, Structured
Streaming) and designed partition-first for large-scale data.

Layout:
- ``session``    — SparkSession factory (UTC, AQE, Arrow).
- ``sources``    — normalized CSV scans, glob+filename keys, text blobs.
- ``operators``  — time ops, windows, merge/fold, dedup, similarity,
                   pivot, text analysis, multimodal plumbing.
- ``functions``  — scalar expression helpers (tolerant equality,
                   try-casts, unit stripping, portable hashing).
- ``plans``      — the query catalog (queries + DuckDB oracle SQL).
- ``pipelines``  — end-to-end reference workloads W1-W4.
- ``streaming``  — Structured Streaming variants (watermark + windows).
"""

__version__ = "0.1.0"
