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

import os
import shutil
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

    Crash safety: the new top-k is written to a SIBLING directory and
    swapped in with directory renames (state -> .bak, .tmp -> state),
    never overwriting live state in place — a failure at any point
    leaves either the old state or the old state's ``.bak`` intact,
    and the read path falls back to ``.bak`` when a crash happened
    between the two renames.  (The previous read-checkpoint-overwrite
    cycle could truncate the only copy mid-write.)
    """
    state_path = Path(state_path)
    tmp = state_path.parent / (state_path.name + ".tmp")
    bak = state_path.parent / (state_path.name + ".bak")
    order = [F.col(order_col).desc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    live = state_path if state_path.exists() else bak
    if live.exists():
        prev = spark.read.parquet(str(live)).select(*new_batch.columns)
        merged = prev.unionByName(new_batch)
    else:
        merged = new_batch
    # The plan reads the live directory and writes a DIFFERENT one, so
    # no checkpoint is needed to break a read-then-overwrite cycle.
    merged.orderBy(*order).limit(k).write.mode("overwrite").parquet(str(tmp))
    if bak.exists():
        shutil.rmtree(bak)
    if state_path.exists():
        os.rename(state_path, bak)
    os.rename(tmp, state_path)
    shutil.rmtree(bak, ignore_errors=True)
    return spark.read.parquet(str(state_path))
