"""Incremental view maintenance: keep a small materialized result
(top-k, running aggregates) current under appends WITHOUT recomputing
over the full history.

Motivated by the incremental top-k literature (EDBT 2020 "Incremental
Based Framework for Efficient Top-K Similarity Search in Interactive
Data Analysis Sessions" — PAPERS.md): top-k under inserts is
MONOTONIC, so merging the previous top-k with only the new batch and
re-ranking is exact — the one property that lets a 100 TB-history
leaderboard update at new-data cost.  The reference's analogue is its
cached-master-table + new-files-only sync loop
(utils/20251223-weight-for-streamlit.py:135-189), generalized from
"append rows" to "maintain a ranked view".

Deletions/updates break monotonicity; for those, recompute or keep a
per-key aggregate table (see sources/writers.upsert_by_key) instead.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_topk(
    spark: SparkSession,
    new_batch: DataFrame,
    state_path: str | Path,
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``new_batch`` into the persisted top-k at ``state_path``
    and rewrite it.  Returns the updated top-k frame.

    Exactness: top-k(history ∪ batch) == top-k(top-k(history) ∪ batch)
    because dropping any row outside the old top-k cannot promote it
    later under insert-only growth.  Cost per refresh: |old top-k| +
    |batch| rows through one TakeOrderedAndProject — independent of
    history size.  ``tiebreak_cols`` make the ranking total so the
    stored state is deterministic (same discipline as the catalog's
    ordered queries).
    """
    state_path = Path(state_path)
    order = [F.col(order_col).desc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    if state_path.exists():
        prev = spark.read.parquet(str(state_path)).select(*new_batch.columns)
        merged = prev.unionByName(new_batch)
    else:
        merged = new_batch
    top = merged.orderBy(*order).limit(k).localCheckpoint()
    top.write.mode("overwrite").parquet(str(state_path))
    return top
