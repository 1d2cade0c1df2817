"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(``tomasz_weight_tracker_spark.plans.REGISTRY``): each catalog entry is
one operator family from SURVEY.md §2 (or a training-data-pipeline
extension) with a matching DuckDB oracle — the reference's own
cross-engine verification pattern (SURVEY.md §5.1.1), industrialized.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tomasz_weight_tracker_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the W3 electricity chain (lead deltas -> minute
    explode -> peak/off-peak allocation -> 15-min buckets) at sf0.001."""
    return REGISTRY["electricity_15min"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query that is SQL-expressible.

    Entries with ``oracle is None`` (physical strategies like IVF
    bucketing) are omitted -> the driver records a rows-only check.
    """
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
