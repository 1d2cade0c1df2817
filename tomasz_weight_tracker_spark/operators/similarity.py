"""Similarity search over an embedding column (``array<float>``).

Two paths, per the training-data-pipeline mandate:

- **Brute-force cosine top-k** — the exactness baseline.  Query set is
  broadcast (it is small by construction); candidates stream through a
  map-side zip_with/aggregate dot product with NO shuffle until the
  final per-query top-k (a TakeOrderedAndProject per group via window
  row_number).  At 100 TB the candidate scan is embarrassingly
  parallel; cost is one pass.
- **IVF-style bucketed search** — the scale path: assign every vector
  to its nearest of C coarse centroids (one broadcast-map pass), then
  search only the query's ``nprobe`` closest buckets.  The candidate
  set shrinks by ~C/nprobe; the bucket assignment is a deterministic
  argmax so results are reproducible (and testable) without trained
  centroids.

All dot products are sequential left-to-right folds (``F.aggregate``),
which matches DuckDB's ``list_dot_product`` evaluation order, so
cosine values are bit-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def sql_cosine(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}, {b})"


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "dot",
) -> DataFrame:
    """Exact top-k neighbors for every query vector.

    Returns (q_id, neighbor_id, rank, score).  Ties broken by neighbor
    id for determinism.  The query side is broadcast; the candidate
    side is scanned once with no shuffle before the per-query top-k.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    score = dot(F.col("q_vec"), F.col("c_vec")) if metric == "dot" else cosine(
        F.col("q_vec"), F.col("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .withColumn("score", score)
        .select("q_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "score")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max dot product,
    deterministic tiebreak on centroid id).  Centroids are broadcast;
    one map-side pass, no shuffle."""
    c = centroids.select(
        F.col(centroid_id), F.col(vec_col).cast("array<double>").alias("cent_vec")
    )
    scored = df.withColumn("__vec", F.col(vec_col).cast("array<double>")).join(
        F.broadcast(c)
    )
    scored = scored.withColumn("__score", dot(F.col("__vec"), F.col("cent_vec")))
    w = Window.partitionBy(id_col).orderBy(F.col("__score").desc(), F.col(centroid_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__score", "__vec", "cent_vec")
    )


def ivf_topk(
    queries: DataFrame,
    candidates_assigned: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: probe only the ``nprobe`` centroids closest to each
    query, then exact top-k within those buckets.  The candidate join is
    an equi-join on centroid_id — candidates stay partitioned by bucket,
    so only the (tiny) query×probe side moves."""
    c = centroids.select(
        F.col("centroid_id"), F.col(vec_col).cast("array<double>").alias("cent_vec")
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )
    probes = q.join(F.broadcast(c)).withColumn(
        "__score", dot(F.col("q_vec"), F.col("cent_vec"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("__score").desc(), F.col("centroid_id"))
    probes = (
        probes.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("q_id", "q_vec", "centroid_id")
    )
    cand = candidates_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
        "centroid_id",
    )
    scored = (
        cand.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("score", dot(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "score")
    )
