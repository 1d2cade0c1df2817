"""Catalog queries exercising the Python execution surfaces
(operators/vectorized.py): Arrow grouped-map, Arrow grouped-agg, and
a Python UDTF — each against an exact DuckDB oracle, because the
integer-until-the-last-op discipline holds even when the arithmetic
runs in Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import vectorized as V
from .catalog import load, register


@register(
    "user_zscore_arrow",
    V.sql_zscore(),
    survey_ids=("F1", "A1"),
    doc="Per-user z-scores via applyInPandas (Arrow grouped-map): one "
    "user_id shuffle, one columnar batch per group across the Arrow "
    "boundary, integer moment sums inside Python so the floats still "
    "hash-match SQL.  Slow-path by design; the native moment-join twin "
    "is the production shape (regression_slope_per_user pattern).",
)
def q_user_zscore_arrow(spark, sf_dir):
    return V.zscore_grouped_map(load(spark, sf_dir, "events"))


@register(
    "user_zscore_native",
    V.sql_zscore(),
    survey_ids=("A1", "W2"),
    doc="The JVM-native twin of user_zscore_arrow — SAME oracle, same "
    "values: one moment-sum aggregation (decimal(38) partials, "
    "map-side combined) broadcast back onto the stream, z computed in "
    "codegen.  Exists so the Python-boundary cost is a measured "
    "delta between two catalog entries, not a claim.",
)
def q_user_zscore_native(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", F.floor(F.col("value") * 100).cast("long").alias("q")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("q"))).alias("sq"),
        F.sum(dec(F.col("q") * F.col("q"))).alias("sqq"),
    )
    num = (F.col("n") * F.col("q") - F.col("sq")).cast("double")
    den = F.sqrt((F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")).cast("double"))
    return (
        base.join(F.broadcast(s), "user_id")
        .select("user_id", "event_id", (num / den).alias("zscore"))
    )


@register(
    "event_outlier_counts",
    V.sql_outlier_counts(),
    survey_ids=("A2",),
    doc="Arrow GROUPED_AGG pandas UDF counting |z|>2 outliers with a "
    "pure-integer decision rule ((n·q - sq)² > 4·(n·sqq - sq²)).  "
    "Python UDAFs get no map-side partials — the documented scale cost "
    "of this API versus native decomposable aggregates.",
)
def q_event_outlier_counts(spark, sf_dir):
    return V.outlier_counts_udaf(load(spark, sf_dir, "events"))


@register(
    "doc_sentences_udtf",
    V.sql_sentences(),
    survey_ids=("F1", "G2"),
    doc="Python UDTF (Spark 4 table function) splitting documents into "
    "(sent_idx, sentence) rows via LATERAL apply — the scalar->table "
    "shape of the reference's weight-txt parser as a first-class "
    "table function.  Row-at-a-time Python: exists for API "
    "completeness; split+posexplode is the codegen twin.",
)
def q_doc_sentences_udtf(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    udtf_cls = V.make_sentence_udtf()
    spark.udtf.register("sentence_split", udtf_cls)
    d.select("doc_id", "text").createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM __docs_for_udtf d, LATERAL sentence_split(d.text) s
        """
    )
