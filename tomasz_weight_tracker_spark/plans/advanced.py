"""Advanced relational / graph / dedup patterns a 100 TB pipeline needs.

Four additions, each chosen for a distinct scale posture the rest of
the catalog does not yet demonstrate:

- ``scd2_user_state`` — slowly-changing-dimension (type 2) history
  build: the CDC/warehouse pattern of collapsing an event stream into
  validity intervals.  Two keyed windows, no self-join.
- ``pagerank_part_supplier`` — fixed-iteration PageRank over the
  part<->supplier co-occurrence graph: the second iterative-algorithm
  surface next to connected components (operators/clusters.py), with
  exact-decimal contribution sums so the result is order-independent
  and oracle-checkable.
- ``snm_near_dup`` — sorted-neighborhood near-dup detection: the
  classic blocking alternative to LSH (sort once, compare a sliding
  window of w neighbors).  One sort-shuffle total; pair count is
  O(n*w), never quadratic.
- ``bitmap_distinct_users`` — EXACT distinct counting via 64-bit-word
  bitmap aggregation: the dense-id counterpart to the HLL sketch
  (operators/sketches.py) — same shuffle shape as HLL (tiny per-group
  state, map-side combined) but exact, because user ids are dense
  integers.  100 TB of events never ship raw ids past the first
  partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import load, register

# ===========================================================================
# SCD2 dimension build (CDC pattern; SURVEY W2/A6 lineage)
# ===========================================================================


@register(
    "scd2_user_state",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), changes AS (
        SELECT user_id, event_type AS state, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER w AS valid_to,
           row_number() OVER w::BIGINT AS version,
           (lead(valid_from) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
    survey_ids=("W1", "W2", "A6"),
    doc="Slowly-changing-dimension type-2 build: each user's event "
    "stream collapses into (state, valid_from, valid_to, version, "
    "is_current) validity intervals — change detection via lag, "
    "interval close via lead, both over the same (user_id) "
    "partitioning so the second window reuses the first's shuffle.  "
    "This is the CDC pattern for maintaining dimension tables from "
    "event logs; at 100 TB it is two keyed windows (one shuffle) and "
    "no self-join.  Ties on ts break on event_id, so the history is "
    "deterministic.",
)
def q_scd2_user_state(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_ord))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


# ===========================================================================
# Fixed-iteration PageRank (iterative algorithm #2 after connected
# components; exact-decimal sums keep it order-independent)
# ===========================================================================

_PR_ITERS = 3


def _pagerank_oracle() -> str:
    # Node ids: part p -> 2p, supplier s -> 2s+1 (disjoint domains).
    # Symmetric edges => no dangling nodes, every node keeps rank mass.
    base = """
    WITH edges AS (
        SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem
        UNION
        SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst
        FROM lineitem
    ), deg AS (
        SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src
    ), r0 AS (
        SELECT src AS id, 1.0::DOUBLE AS rank FROM deg
    )
    """
    prev = "r0"
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f""", r{i} AS (
        SELECT e.dst AS id,
               0.15::DOUBLE + 0.85::DOUBLE *
               (sum(floor((r.rank / d.outdeg) * 100000000.0)::BIGINT)::DOUBLE
                / 100000000.0) AS rank
        FROM edges e
        JOIN {prev} r ON e.src = r.id
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    )"""
        )
        prev = f"r{i}"
    return (
        base
        + "".join(steps)
        + f"""
    SELECT id,
           CASE WHEN id % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
           rank
    FROM {prev}
    """
    )


@register(
    "pagerank_part_supplier",
    _pagerank_oracle(),
    survey_ids=("J1", "A1"),
    doc="Fixed-iteration (3) PageRank over the bipartite part<->supplier "
    "graph from lineitem, damping 0.85.  Each iteration is one keyed "
    "join (edges shuffled once on src, rank/deg co-keyed) plus a "
    "group-by on dst — the standard distributed PageRank round; "
    "symmetric edges mean no dangling-mass correction is needed.  "
    "Contribution sums are cast to DECIMAL(28,10) before aggregation "
    "in BOTH engines, so the per-round totals are exact and "
    "order-independent — an iterative float algorithm that is still "
    "value-hash-checkable.  (Quantization is floor(x*1e8) in INTEGER "
    "arithmetic, not a double->decimal cast: IEEE multiply+floor are "
    "bit-identical across engines, while decimal casts of doubles "
    "round from different representations.)  Edge count is "
    "vocabulary-bounded "
    "(distinct part-supplier pairs), not row-bounded: 100 TB of "
    "lineitem first collapses through the DISTINCT.",
)
def q_pagerank_part_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = deg.select(F.col("src").alias("id"), F.lit(1.0).alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.floor((F.col("rank") / F.col("outdeg")) * F.lit(1e8)).alias("c"),
            )
        )
        ranks = contrib.groupBy("id").agg(
            (
                F.lit(0.15)
                + F.lit(0.85) * (F.sum("c").cast("double") / F.lit(1e8))
            ).alias("rank")
        )
    return ranks.select(
        "id",
        F.when(F.col("id") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        "rank",
    )


# ===========================================================================
# Sorted-neighborhood near-dup (blocking alternative to LSH)
# ===========================================================================

_SNM_KEY_LEN = 24  # normalized sort-key length
_SNM_BLK_LEN = 6  # coarse block = sort-key prefix (the partition key)
_SNM_HEAD = 40  # compare prefix (caps the O(len^2) edit distance)
_SNM_MAX_DIST = 12
_SNM_WINDOW = 2  # compare each doc to its next w neighbors


def _snm_oracle() -> str:
    leads = []
    arms = []
    for off in range(1, _SNM_WINDOW + 1):
        leads.append(
            f"lead(doc_id, {off}) OVER win AS n{off}_id, "
            f"lead(head, {off}) OVER win AS n{off}_head"
        )
        arms.append(
            f"""
        SELECT doc_id AS doc_a, n{off}_id AS doc_b,
               levenshtein(head, n{off}_head)::BIGINT AS dist
        FROM w WHERE n{off}_id IS NOT NULL"""
        )
    return f"""
    WITH k AS (
        SELECT doc_id, substr(text, 1, {_SNM_HEAD}) AS head,
               substr(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')),
                      1, {_SNM_KEY_LEN}) AS skey
        FROM documents
    ), w AS (
        SELECT doc_id, head, {", ".join(leads)}
        FROM k
        WINDOW win AS (PARTITION BY substr(skey, 1, {_SNM_BLK_LEN})
                       ORDER BY skey, doc_id)
    ), pairs AS ({" UNION ALL ".join(arms)})
    SELECT doc_a, doc_b, dist FROM pairs WHERE dist <= {_SNM_MAX_DIST}
    """


@register(
    "snm_near_dup",
    _snm_oracle(),
    survey_ids=("A7",),
    doc="Sorted-neighborhood near-dup detection: normalize text to a "
    "sort key, order within coarse key-prefix blocks, compare each "
    "doc to its next w=2 neighbors with edit distance over a capped "
    "prefix.  The classic record-linkage alternative to LSH banding: "
    "ONE sort-shuffle on the block key, pair count O(n*w) by "
    "construction (never quadratic), and edit distance is "
    "bit-portable so the oracle is exact.  Blocks are key-prefix "
    "partitions, so AQE's skew split applies if one prefix is hot; "
    "near-identical docs share normalized prefixes, which is exactly "
    "what sorting exploits.",
)
def q_snm_near_dup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    k = docs.select(
        "doc_id",
        F.substring("text", 1, _SNM_HEAD).alias("head"),
        F.substring(
            F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]", "")), 1, _SNM_KEY_LEN
        ).alias("skey"),
    )
    win = Window.partitionBy(F.substring("skey", 1, _SNM_BLK_LEN)).orderBy(
        "skey", "doc_id"
    )
    # All neighbors from ONE window pass, exploded — a UNION of
    # per-offset arms would duplicate the scan+sort subtree per arm.
    # (Leads are projected before the explode: generators cannot host
    # window expressions.)
    led = k.select(
        "doc_id",
        "head",
        F.array(
            *[
                F.struct(
                    F.lead("doc_id", off).over(win).alias("id"),
                    F.lead("head", off).over(win).alias("head"),
                )
                for off in range(1, _SNM_WINDOW + 1)
            ]
        ).alias("neighbors"),
    )
    w = led.select("doc_id", "head", F.explode("neighbors").alias("n"))
    return (
        w.filter(F.col("n.id").isNotNull())
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("n.id").alias("doc_b"),
            F.levenshtein("head", F.col("n.head")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= _SNM_MAX_DIST)
    )


# ===========================================================================
# Exact distinct via bitmap aggregation (dense-id counterpart to HLL)
# ===========================================================================


@register(
    "bitmap_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY event_type
    """,
    survey_ids=("A1", "A3"),
    doc="EXACT per-group distinct counting via 64-bit-word bitmaps: "
    "each user id maps to (word = id div 64, bit = id mod 64); the "
    "first aggregate bit_or's words per (group, word) WITH map-side "
    "partial combine, the second sums bit_count(word).  Same tiny-"
    "state shuffle shape as the HLL sketch but exact, because ids "
    "are dense integers — COUNT(DISTINCT) without ever shipping or "
    "re-shuffling raw ids, and the bitmap state is mergeable across "
    "partitions/days by the same bit_or.  The oracle is the plain "
    "COUNT(DISTINCT) it must equal.",
)
def q_bitmap_distinct_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    words = ev.groupBy(
        "event_type", F.expr("user_id div 64").alias("word")
    ).agg(
        F.expr("bit_or(shiftleft(1L, cast(pmod(user_id, 64) as int)))").alias("bits")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_users")
    )
