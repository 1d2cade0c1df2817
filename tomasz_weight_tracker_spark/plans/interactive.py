"""Interactive parameterized re-execution (SURVEY §3.2 gap item).

The reference's Streamlit app re-runs the same queries with new
literals on every widget change (utils/20251223-weight-for-streamlit.py:31-32,
274, 327-337 — date pickers / window sliders feeding pandas filters).
The engine twin is a session surface that:

- registers the catalog tables as temp views ONCE (scan relations are
  memoized by ``plans.catalog.load``, so re-submits never re-list
  files or re-read footers);
- holds named SQL templates with ``:name`` parameter markers and
  re-submits them with new bindings via Spark's parameterized SQL
  (``spark.sql(text, args=...)``) — literals are BOUND, not
  string-interpolated, so there is no injection surface and Catalyst
  sees stable plan shapes;
- exposes the same templates for DataFrame-side callers as lambdas.

Scale posture: parameter re-binding is driver-side only; every
submission is a fresh Catalyst plan over the same resolved relations,
so predicate pushdown re-applies per literal (a narrower date range
prunes MORE, automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import load

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class InteractiveSession:
    """Re-submit named query templates with new literal bindings."""

    def __init__(self, spark: SparkSession, sf_dir: str, tables: list[str] | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self._templates: dict[str, str] = {}
        for t in tables if tables is not None else TABLES:
            load(spark, sf_dir, t).createOrReplaceTempView(t)

    def register(self, name: str, sql_template: str) -> None:
        """Store a template with ``:param`` markers for re-execution."""
        self._templates[name] = sql_template

    def sql(self, sql_template: str, **params) -> DataFrame:
        """One-shot parameterized submission."""
        return self.spark.sql(sql_template, args=params or None)

    def run(self, name: str, **params) -> DataFrame:
        """Re-execute a registered template with new bindings — the
        widget-change path: same template, new literals, fresh
        pushdown."""
        return self.sql(self._templates[name], **params)

    def templates(self) -> dict[str, str]:
        return dict(self._templates)
