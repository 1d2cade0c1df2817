"""W2: sensor CSV consolidation (SURVEY.md §2 J3/G5-G7/G14/P4/A6, §3.2,
§7.4 item 1 — the data-dependent-schema merge).

Per sensor, successive daily exports are folded left-to-right through a
full-outer join on Timestamp:

- overlapping cells keep the EXISTING value, fill from the incoming
  file (G7 coalesce — reference
  utils/20251223-csv-to-separate-sensors.py:181-183);
- cells where both sides are non-null and genuinely disagree (G5
  np.isclose semantics — the standardized variant per SURVEY §7.4.1)
  materialize the incoming value into a dynamically named conflict
  column ``!A! <measure>``, ``!B! <measure>``, ... (G14);
- all-null columns are pruned at the end (P4);
- output column order is Timestamp, regular measures, then conflict
  columns sorted by name (P1).

Spark posture: the conflict columns make the output schema
data-dependent, which a static Spark plan cannot express — so the fold
is a DRIVER-ORCHESTRATED sequence of lazily composed plans with one
cheap probe aggregation per merge step (a single ``agg(max(cond))``
pass) deciding whether a conflict column enters the schema.  Each
step's join is a plain equi-join on Timestamp: at 100 TB scale with
many sensors the frames are pre-partitioned by (sensor, Timestamp
bucket) so the fold joins are co-located; at reference scale Catalyst
just plans broadcast/sort-merge as sizes dictate.  ``localCheckpoint``
every few steps bounds lineage depth for long folds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import conflict, conflict_tag
from ..sources.csv_normalized import SensorFile, normalized_sensor_scan, sensor_files

CHECKPOINT_EVERY = 4  # fold steps between lineage truncations


def _is_conflict_col(name: str) -> bool:
    return name.startswith("!")


def merge_step(
    combined: DataFrame,
    incoming: DataFrame,
    next_conflict_idx: int,
    rtol: float = 1e-5,
    atol: float = 1e-9,
) -> tuple[DataFrame, int]:
    """One fold step: full-outer join + coalesce + conflict detection.

    Returns the merged frame and the next conflict-column index.
    """
    regular = [c for c in combined.columns if c != "Timestamp" and not _is_conflict_col(c)]
    common = [c for c in incoming.columns if c in regular]
    new_only = [c for c in incoming.columns if c != "Timestamp" and c not in regular]

    renamed = incoming.select(
        "Timestamp", *[F.col(c).alias(f"__new_{c}") for c in common + new_only]
    )
    joined = combined.join(renamed, on="Timestamp", how="full")

    # One probe pass: which common columns have >= 1 genuine conflict?
    # (reference computes any() before materializing the column —
    # utils/20251223-csv-to-separate-sensors-polars.py:182-196).
    conflict_conds = {
        c: conflict(F.col(c), F.col(f"__new_{c}"), rtol, atol)
        & F.col(c).isNotNull()
        & F.col(f"__new_{c}").isNotNull()
        for c in common
    }
    if conflict_conds:
        probe = joined.agg(
            *[F.max(cond.cast("int")).alias(c) for c, cond in conflict_conds.items()]
        ).first()
        conflicted = [c for c in common if probe[c] == 1]
    else:
        conflicted = []

    out_cols: list[F.Column] = [F.col("Timestamp")]
    for c in combined.columns:
        if c == "Timestamp":
            continue
        if c in common:
            out_cols.append(F.coalesce(F.col(c), F.col(f"__new_{c}")).alias(c))
        else:
            out_cols.append(F.col(c))
    for c in new_only:
        out_cols.append(F.col(f"__new_{c}").alias(c))
    for c in conflicted:
        tag = conflict_tag(next_conflict_idx)
        next_conflict_idx += 1
        out_cols.append(
            F.when(conflict_conds[c], F.col(f"__new_{c}")).alias(f"{tag} {c}")
        )
    return joined.select(*out_cols), next_conflict_idx


def drop_all_null_columns(df: DataFrame, keep: Sequence[str] = ("Timestamp",)) -> DataFrame:
    """P4/A9: prune columns with zero non-null values (one agg pass)."""
    candidates = [c for c in df.columns if c not in keep]
    if not candidates:
        return df
    counts = df.agg(*[F.count(F.col(f"`{c}`")).alias(c) for c in candidates]).first()
    survivors = [c for c in candidates if counts[c] > 0]
    return df.select(*keep, *[F.col(f"`{c}`") for c in survivors])


def order_columns(df: DataFrame) -> DataFrame:
    """P1: Timestamp, regular measures (first-seen order), conflicts last
    sorted by name (utils/20251223-csv-to-separate-sensors.py:209-221)."""
    regular = [c for c in df.columns if c != "Timestamp" and not _is_conflict_col(c)]
    conflicts = sorted(c for c in df.columns if _is_conflict_col(c))
    return df.select("Timestamp", *[F.col(f"`{c}`") for c in regular + conflicts])


def merge_sensor_frames(
    frames: Sequence[DataFrame], rtol: float = 1e-5, atol: float = 1e-9
) -> DataFrame:
    """Fold normalized per-file frames (already deduped per file) in
    order; then prune, order, and sort by Timestamp (O1)."""
    combined = frames[0]
    idx = 0
    for step, nxt in enumerate(frames[1:], start=1):
        combined, idx = merge_step(combined, nxt, idx, rtol, atol)
        if step % CHECKPOINT_EVERY == 0:
            combined = combined.localCheckpoint(eager=False)
    combined = drop_all_null_columns(combined)
    return order_columns(combined).orderBy("Timestamp")


def consolidate_sensors(
    spark: SparkSession, input_dir: str
) -> dict[str, DataFrame]:
    """Full W2 entry point: group files by sensor (S5), scan+normalize
    each (S4), fold-merge per sensor.  Returns {sensor: merged frame}."""
    out: dict[str, DataFrame] = {}
    for sensor, files in sensor_files(input_dir).items():
        frames = [normalized_sensor_scan(spark, f.path) for f in files]
        out[sensor] = merge_sensor_frames(frames)
    return out
