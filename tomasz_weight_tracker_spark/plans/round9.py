"""Round-9 catalog additions.

- ``dup_passage_maximal``: dup_passage_spans' per-diagonal spans can
  overlap in document-A coordinates (a passage duplicated at two
  offsets in B, internal periodicity) — this entry unions them into
  MAXIMAL token intervals per (id_a, id_b) with the interval-union
  islands trick, so excision tooling sees one span where the
  diagonal decomposition reports fragments.
- ``ivfadc_autotune``: closes the measure-don't-guess loop on IVFADC —
  sweep nprobe over the fixed recall-audit sample, pick the smallest
  nprobe meeting a target recall, and report the chosen operating
  point (the number that parameterizes embed_ivfadc_topk in
  production).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import load, register
from .round8b import _passage_spans, _pspan_ctes

# ===========================================================================
# Maximal-span merge for passage dedup (interval union per doc pair)
# ===========================================================================


def _pspan_maximal_oracle() -> str:
    return (
        _pspan_ctes()
        + """, u AS (
        SELECT id_a, id_b, a_start, a_start + span_toks AS a_end,
               CASE WHEN a_start > coalesce(max(a_start + span_toks) OVER (
                        PARTITION BY id_a, id_b
                        ORDER BY a_start, a_start + span_toks
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS brk
        FROM spans
    ), gi AS (
        SELECT id_a, id_b, a_start, a_end,
               sum(brk) OVER (PARTITION BY id_a, id_b
                              ORDER BY a_start, a_end
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM u
    )
    SELECT id_a, id_b, min(a_start)::BIGINT AS a_start,
           (max(a_end) - min(a_start))::BIGINT AS span_toks,
           count(*)::BIGINT AS n_fragments
    FROM gi GROUP BY id_a, id_b, grp
    """
    )


@register(
    "dup_passage_maximal",
    _pspan_maximal_oracle(),
    survey_ids=("A7", "W1"),
    doc="MAXIMAL duplicated-passage intervals per document pair: "
    "dup_passage_spans decomposes shared text by diagonal (pa-pb), so "
    "a passage that appears at TWO offsets in doc B, or one with "
    "internal periodicity, reports overlapping/adjacent fragments in "
    "doc-A coordinates — this entry unions those intervals "
    "([a_start, a_start+span_toks), half-open, touching merges) into "
    "maximal spans via the interval-union islands trick "
    "(interval_union_time's machinery on token offsets): order a "
    "pair's fragments by start, break where start exceeds the running "
    "max end, running-sum the breaks into island ids, min/max per "
    "island.  The window partition is ONE pair's fragment list — "
    "bounded by the pair's span count, never the corpus.  Excision "
    "tooling (dup_passage_rebuild) wants exactly this relation: one "
    "row per contiguous duplicated region, with the fragment count "
    "kept for audit.",
)
def q_dup_passage_maximal(spark, sf_dir):
    spans = _passage_spans(spark, sf_dir)
    ivl = spans.select(
        "id_a",
        "id_b",
        "a_start",
        (F.col("a_start") + F.col("span_toks")).alias("a_end"),
    )
    w = Window.partitionBy("id_a", "id_b").orderBy("a_start", "a_end")
    prev_end = F.max("a_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(
        prev_end.isNull() | (F.col("a_start") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    staged = ivl.select("*", brk.alias("__brk"))
    grp = F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        staged.withColumn("__grp", grp)
        .groupBy("id_a", "id_b", "__grp")
        .agg(
            F.min("a_start").cast("long").alias("a_start"),
            (F.max("a_end") - F.min("a_start")).cast("long").alias("span_toks"),
            F.count(F.lit(1)).cast("long").alias("n_fragments"),
        )
        .select("id_a", "id_b", "a_start", "span_toks", "n_fragments")
    )
