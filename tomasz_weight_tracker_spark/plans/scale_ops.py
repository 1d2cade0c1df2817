"""Scale-path catalog queries: sketches, deterministic sampling,
Z-order layout keys, and streaming dedup.

These operators exist FOR the 100 TB posture (constant-size sketch
state, shuffle-free sampling, file-pruning layout, bounded streaming
state) — yet every one still carries an exact DuckDB oracle because
each is defined in portable integer/double arithmetic rather than
engine-private RNG or sketch formats.
"""

from __future__ import annotations

from importlib.util import find_spec

from pyspark.sql import functions as F

from ..functions import md5_long_sql
from ..operators import sketches as SK
from ..operators.layout import sql_zorder_key, zorder_key
from .catalog import load, register

# --- HyperLogLog vs exact --------------------------------------------------


@register(
    "hll_user_counts",
    f"""
    WITH hll AS (
        {SK.sql_hll_distinct('events', 'event_type', 'user_id')}
    ), exact AS (
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
        FROM events GROUP BY event_type
    )
    SELECT exact.event_type, exact.n_exact, hll.hll_distinct,
           (hll.hll_distinct - exact.n_exact::DOUBLE) / exact.n_exact::DOUBLE
               AS rel_err
    FROM exact JOIN hll ON exact.event_type = hll.event_type
    """,
    survey_ids=("A3", "A8"),
    doc="HyperLogLog distinct users per event type, reported against "
    "the exact count.  The sketch shuffles 256 registers per group "
    "instead of every distinct value — the COUNT(DISTINCT) that still "
    "works when the value set itself is 100 TB.  Deterministic md5 "
    "hashing + integer-exact register sums make even the approximate "
    "estimate bit-reproducible in DuckDB (operators/sketches.py).",
)
def q_hll_user_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    hll = SK.hll_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(hll, "event_type").select(
        "event_type",
        "n_exact",
        "hll_distinct",
        (
            (F.col("hll_distinct") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_err"),
    )


@register(
    "cms_user_counts",
    f"""
    WITH est AS (
        {SK.sql_cms('events', 'user_id',
                    'SELECT DISTINCT user_id AS key FROM events')}
    ), exact AS (
        SELECT user_id, count(*)::BIGINT AS n_exact
        FROM events GROUP BY user_id
    )
    SELECT exact.user_id, exact.n_exact, est.cms_est,
           (est.cms_est - exact.n_exact)::BIGINT AS overcount
    FROM exact JOIN est ON exact.user_id = est.key
    """,
    survey_ids=("A1", "A8"),
    doc="Count-Min frequency sketch: 4 x 256 counter cells built with "
    "one map-side-combined aggregation (shuffle moves <= 1024 cells "
    "per partition regardless of stream length or key cardinality — "
    "the frequency companion to hll_user_counts), probed per user "
    "against the broadcast cells.  est >= exact always (collisions "
    "only add); the overcount column exposes the error in-data.",
)
def q_cms_user_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    cells = SK.cms_build(ev, "user_id")
    keys = ev.select("user_id").distinct()
    est = SK.cms_probe(cells, keys, "user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return exact.join(est, "user_id").select(
        "user_id",
        "n_exact",
        "cms_est",
        (F.col("cms_est") - F.col("n_exact")).cast("long").alias("overcount"),
    )


def _rolling_oracle() -> str:
    bucket, rho = SK.sql_register_exprs("user_id")
    raw, final = SK.sql_estimate("z_occ", "nb")
    term = SK.sql_register_term("mj7")
    return f"""
    WITH base AS (
        SELECT CAST(ts AS DATE) AS day, {bucket} AS b, {rho} AS rho FROM events
    ), regs AS (
        SELECT day, b, max(rho) AS mj FROM base GROUP BY day, b
    ), days AS (SELECT DISTINCT day FROM base),
    buckets AS (SELECT unnest(range(0, {SK.M})) AS b),
    grid AS (SELECT days.day, buckets.b FROM days, buckets),
    joined AS (
        SELECT grid.day, grid.b, regs.mj
        FROM grid LEFT JOIN regs ON grid.day = regs.day AND grid.b = regs.b
    ), rolled AS (
        SELECT day, b,
               max(mj) OVER (PARTITION BY b
                             ORDER BY datediff('day', DATE '1970-01-01', day)
                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mj7
        FROM joined
    ), folded AS (
        SELECT day, sum({term}) AS z_occ, count(mj7) AS nb
        FROM rolled GROUP BY day
    ), est AS (
        SELECT day, {final} AS hll_users_7d
        FROM (SELECT day, nb, {raw} AS raw FROM folded)
    ), pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS ed, user_id FROM events
    ), exact AS (
        SELECT days.day, count(DISTINCT user_id)::BIGINT AS n_exact
        FROM days JOIN pairs
          ON datediff('day', pairs.ed, days.day) BETWEEN 0 AND 6
        GROUP BY days.day
    )
    SELECT exact.day, exact.n_exact, est.hll_users_7d,
           (est.hll_users_7d - exact.n_exact::DOUBLE) / exact.n_exact::DOUBLE
               AS rel_err
    FROM exact JOIN est ON exact.day = est.day
    """


@register(
    "hll_rolling_users_7d",
    _rolling_oracle(),
    survey_ids=("A3", "W3"),
    doc="Rolling 7-day distinct users per day via HLL register MERGE: "
    "daily (bucket, max-rho) registers -> dense day x 256 grid -> "
    "per-bucket trailing-range window max -> per-day register fold.  "
    "Rolling COUNT(DISTINCT) is not decomposable — the exact form "
    "re-touches every event 7x — but register max() IS, so the "
    "window slides over 256-value sketch state per day regardless of "
    "data volume.  The exact count rides along for accuracy review "
    "(at 100 TB you would drop it; here it doubles as the oracle's "
    "verification column).",
)
def q_hll_rolling_users_7d(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    bucket, rho = SK.register_cols(F.col("user_id"))
    base = ev.select(F.to_date("ts").alias("day"), bucket.alias("b"), rho.alias("rho"))
    regs = base.groupBy("day", "b").agg(F.max("rho").alias("mj"))
    days = base.select("day").distinct()
    buckets = spark.range(SK.M).select(F.col("id").alias("b"))
    grid = days.crossJoin(F.broadcast(buckets))
    joined = grid.join(regs, ["day", "b"], "left")
    w = (
        Window.partitionBy("b")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    rolled = joined.withColumn("mj7", F.max("mj").over(w))
    folded = rolled.groupBy("day").agg(
        F.sum(SK.register_term(F.col("mj7"))).alias("z_occ"),
        F.count("mj7").alias("nb"),
    )
    est = folded.select(
        "day", SK.estimate_expr(F.col("z_occ"), F.col("nb")).alias("hll_users_7d")
    )
    pairs = ev.select(F.to_date("ts").alias("ed"), "user_id").distinct()
    dd = F.datediff(F.col("day"), F.col("ed"))
    exact = (
        days.join(pairs, (dd >= 0) & (dd <= 6))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    return exact.join(est, "day").select(
        "day",
        "n_exact",
        "hll_users_7d",
        (
            (F.col("hll_users_7d") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_err"),
    )


# --- deterministic stratified sampling -------------------------------------

_RATES = {"click": 0.10, "view": 0.05, "purchase": 1.0, "signup": 0.5, "error": 0.25}


@register(
    "stratified_sample_events",
    f"""
    SELECT event_id, event_type, user_id, value
    FROM events
    WHERE {SK.sql_stratified_predicate('event_type', _RATES, 'event_id')}
    """,
    survey_ids=("P5",),
    doc="Per-stratum deterministic sampling: rare strata kept whole, "
    "bulk strata thinned, membership decided by md5(event_id) — a "
    "pure scan-side predicate (no shuffle, no RNG state) that keeps "
    "the SAME rows across runs, retries, and engine versions, which "
    "per-partition RNG samplers (df.sampleBy) cannot.",
)
def q_stratified_sample_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return SK.stratified_sample(ev, "event_type", _RATES, "event_id").select(
        "event_id", "event_type", "user_id", "value"
    )


# --- join-key skew profile (the salting decision's input) -------------------

_SKEW_TOP = 20


@register(
    "join_key_skew_profile",
    f"""
    WITH c AS (
        SELECT user_id AS k, count(*)::BIGINT AS n FROM events GROUP BY user_id
    ), tot AS (
        SELECT sum(n)::BIGINT AS t, count(*)::BIGINT AS nk, max(n)::BIGINT AS mx
        FROM c
    )
    SELECT c.k, c.n,
           floor((cast(c.n as double) / cast(tot.t as double)) * 1e9)::BIGINT
               AS share_e9,
           floor((cast(c.n as double)
                  / (cast(tot.t as double) / cast(tot.nk as double))) * 1e6)::BIGINT
               AS over_avg_e6
    FROM c CROSS JOIN tot
    ORDER BY c.n DESC, c.k
    LIMIT {_SKEW_TOP}
    """,
    survey_ids=("A1", "O5"),
    doc=f"Join-key skew profile: the top-{_SKEW_TOP} hottest keys with "
    "their absolute count, corpus share (ppb) and multiple of the "
    "mean key load — the MEASUREMENT that decides between a plain "
    "keyed join, AQE skew split, and explicit salting "
    "(operators/layout.py salted_join): AQE handles a skewed "
    "PARTITION, salting handles a skewed KEY, and this query tells "
    "you which regime a dataset is in before the expensive join "
    "runs.  One keyed count with map-side partials, a 1-row stats "
    "broadcast, TakeOrderedAndProject — profiling cost is one scan "
    "regardless of table size.",
)
def q_join_key_skew_profile(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(
        F.sum("n").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.max("n").cast("long").alias("mx"),
    )
    share = F.floor(
        (F.col("n").cast("double") / F.col("t").cast("double")) * F.lit(1e9)
    ).cast("long")
    over_avg = F.floor(
        (
            F.col("n").cast("double")
            / (F.col("t").cast("double") / F.col("nk").cast("double"))
        )
        * F.lit(1e6)
    ).cast("long")
    return (
        c.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n").desc(), "k")
        .limit(_SKEW_TOP)
        .select("k", "n", share.alias("share_e9"), over_avg.alias("over_avg_e6"))
    )


# --- skewed join under an explicit salt (the mitigation, executed) ----------

_SKEWJ_SALTS = 8
_SKEWJ_HOT_MOD = 4  # user_id % 4 != 0 collapses onto hot key 0 (~75% of rows)


@register(
    "skew_join_events",
    f"""
    WITH e AS (
        SELECT CASE WHEN user_id % {_SKEWJ_HOT_MOD} <> 0 THEN 0 ELSE user_id END AS k,
               floor(value * 1e4)::BIGINT AS qv
        FROM events WHERE value IS NOT NULL
    ), d AS (
        SELECT DISTINCT user_id AS k, (user_id % 7 + 1)::BIGINT AS weight
        FROM events
    )
    SELECT e.k AS skew_key, count(*)::BIGINT AS n,
           sum(e.qv * d.weight)::BIGINT AS wsum
    FROM e JOIN d ON e.k = d.k
    GROUP BY e.k
    """,
    survey_ids=("J1", "A1"),
    doc="The skew MITIGATION executed in the gate, not just profiled "
    "(join_key_skew_profile is the measurement; this is the fix "
    "running): probe events are remapped so ~75% of rows collapse "
    "onto one hot key — the join-key distribution where a plain hash "
    "join puts most of the table on one reducer — then joined to a "
    "per-key weight dim through operators/layout.salted_join with a "
    "DETERMINISTIC probe-side salt (pmod(event_id, "
    f"{_SKEWJ_SALTS})) and a shuffle_hash build hint: the hot key's "
    f"rows spread across {_SKEWJ_SALTS} reducers, the dim replicates "
    "x salts (the explode), and the join key becomes (k, salt).  The "
    "RESULT is salt-invariant — every probe row meets its key's dim "
    "row exactly once — so the oracle is the plain equi-join + "
    "group-by the salted plan must equal, and the weighted sum "
    "proves build-side attributes actually flowed through the salted "
    "path.  Salting handles a hot KEY (AQE's skew split only divides "
    "oversized partitions of distinct keys; one key's hash always "
    "lands together), which is exactly the regime injected here.",
)
def q_skew_join_events(spark, sf_dir):
    from ..operators.layout import salted_join

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    probe = ev.select(
        F.when(F.col("user_id") % _SKEWJ_HOT_MOD != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        F.floor(F.col("value") * F.lit(1e4)).cast("long").alias("qv"),
        F.pmod(F.col("event_id"), F.lit(_SKEWJ_SALTS)).cast("int").alias("__s"),
    )
    dim = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").alias("k"))
        .distinct()
        .withColumn("weight", (F.col("k") % 7 + 1).cast("long"))
        # Build side: too big to broadcast in the 100 TB posture (key
        # cardinality scales with users) — force the shuffled-hash
        # shape the salt exists for, instead of a broadcast that would
        # make the salt a no-op at toy scale.
        .hint("shuffle_hash")
    )
    joined = salted_join(
        probe, dim, "k", salt_buckets=_SKEWJ_SALTS, salt_expr=F.col("__s")
    ).drop("__s")
    return joined.groupBy(F.col("k").alias("skew_key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qv") * F.col("weight")).cast("long").alias("wsum"),
    )


# --- referential-integrity audit (FK orphan rates) --------------------------


@register(
    "referential_integrity_audit",
    """
    WITH e1 AS (
        SELECT count(*)::BIGINT AS n_child,
               sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), e2 AS (
        SELECT count(*)::BIGINT AS n_child,
               sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ), e3 AS (
        SELECT count(*)::BIGINT AS n_child,
               sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_orphans
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT * FROM (
        SELECT 'lineitem.l_orderkey->orders' AS edge, n_child, n_orphans,
               floor((cast(n_orphans as double) / cast(n_child as double)) * 1e6)::BIGINT AS orphan_ppm
        FROM e1
        UNION ALL
        SELECT 'orders.o_custkey->customer', n_child, n_orphans,
               floor((cast(n_orphans as double) / cast(n_child as double)) * 1e6)::BIGINT
        FROM e2
        UNION ALL
        SELECT 'lineitem.l_partkey->part', n_child, n_orphans,
               floor((cast(n_orphans as double) / cast(n_child as double)) * 1e6)::BIGINT
        FROM e3
    )
    """,
    survey_ids=("J4", "A8"),
    doc="Referential-integrity audit across the schema's three FK "
    "edges: child count, orphan count (child keys with no parent), "
    "orphan ppm.  The cross-TABLE data-quality check complementing "
    "the per-table dq_audit/table_profile family — at ingest scale, "
    "orphan spikes are how partial loads and out-of-order CDC "
    "batches surface.  Each edge is one left join counted in one "
    "aggregate; the parent side's DISTINCT key set rides a "
    "broadcast where stats allow, and the three 1-row edge results "
    "union driver-free.",
)
def q_referential_integrity_audit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")

    def edge(label, child, ckey, parent, pkey):
        p = parent.select(F.col(pkey).alias("__pk")).distinct()
        j = child.join(p, F.col(ckey) == F.col("__pk"), "left")
        return j.agg(
            F.lit(label).alias("edge"),
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        ).select(
            "edge",
            "n_child",
            "n_orphans",
            F.floor(
                (F.col("n_orphans").cast("double") / F.col("n_child").cast("double"))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("orphan_ppm"),
        )

    return (
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(
            edge("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey")
        )
        .unionByName(
            edge("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey")
        )
    )


# --- range join via bucketization (interval containment at scale) ----------

_IBJ_BUCKET_US = 900 * 1_000_000  # 15-minute buckets, microseconds
_IBJ_WIN = "INTERVAL 30 MINUTES"


@register(
    "interval_bucket_join",
    """
    WITH err AS (
        SELECT event_id AS win_id, ts AS w_start,
               ts + INTERVAL 30 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    ), pur AS (
        SELECT event_id AS p_id, ts FROM events WHERE event_type = 'purchase'
    ), m AS (
        SELECT win_id, count(*)::BIGINT AS c
        FROM err JOIN pur ON pur.ts >= err.w_start AND pur.ts < err.w_end
        GROUP BY win_id
    )
    SELECT e.win_id, e.w_start, coalesce(m.c, 0)::BIGINT AS n_purchases
    FROM err e LEFT JOIN m USING (win_id)
    """,
    survey_ids=("J1", "T7", "A1"),
    doc="Keyless interval-containment COUNT (how many purchases fall "
    "inside each 30-minute incident window) computed EXACTLY with no "
    "pair stream at all: a naive range join is BroadcastNestedLoop "
    "(all-pairs), and even the bucketized equi-join rewrite (rounds "
    "1-5) emits windows-per-slice x probes-per-slice candidates — "
    "quadratic in time DENSITY (the 10x soak measured 6.6x wall; "
    "round-5 verdict's one 'weak').  Because the output only needs a "
    "COUNT per window, the right plan is an event-boundary prefix "
    "sum: every probe is a +1 event, every window contributes two "
    "zero-weight boundary probes at w_start and w_end, and after one "
    "time-ordered running sum each window's answer is cum(w_end) - "
    "cum(w_start) = |probes with ts in [w_start, w_end)| (boundaries "
    "sort BEFORE probes at equal ts via the (t, weight) sort key and "
    "Spark's default RANGE frame, giving strict '< t' semantics at "
    "both ends, which is exactly >= start AND < end on the "
    "difference).  The running sum is the same DISTRIBUTED prefix "
    "sum as sequence_packing: a 15-minute-shard-keyed window (never "
    "a single-partition global sort) plus tiny per-shard subtotals "
    "cumulated and broadcast back.  Null-ts rows cost nothing: any "
    "probe not strictly between a window's two boundaries cancels in "
    "the difference, so sentinel-sharding them is safe.  Cost is "
    "LINEAR in rows — 2 keyed shuffles (shard window, win_id agg), "
    "zero joins on the data volume (the one join is the broadcast of "
    "the O(#shards) offset table); a hot time slice is a hot shard, "
    "bounded by that shard's row count, AQE-splittable.  The oracle "
    "stays the plain range join this plan must equal — exact, no "
    "recall cap needed.",
)
def q_interval_bucket_join(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr(_IBJ_WIN)).alias("w_end"),
    )
    # Boundary events (weight 0) carry the window id; the start row also
    # carries w_start so no join back to err is needed at the end.
    starts = err.select(
        F.col("w_start").alias("t"),
        F.lit(0).cast("long").alias("weight"),
        "win_id",
        F.lit("s").alias("which"),
        "w_start",
    )
    ends = err.select(
        F.col("w_end").alias("t"),
        F.lit(0).cast("long").alias("weight"),
        "win_id",
        F.lit("e").alias("which"),
        F.lit(None).cast("timestamp").alias("w_start"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("t"),
        F.lit(1).cast("long").alias("weight"),
        F.lit(None).cast(err.schema["win_id"].dataType).alias("win_id"),
        F.lit(None).cast("string").alias("which"),
        F.lit(None).cast("timestamp").alias("w_start"),
    )
    stream = starts.unionByName(ends).unionByName(probes).withColumn(
        "shard",
        F.coalesce(F.expr(f"unix_micros(t) div {_IBJ_BUCKET_US}"), F.lit(-(2**62))),
    )
    # Within-shard running sum.  Default RANGE frame + (t, weight) order:
    # a boundary's peers are other boundaries at the same t (weight 0),
    # so its cum counts exactly the probes with ts < t in this shard.
    w_in = Window.partitionBy("shard").orderBy("t", "weight")
    within = stream.withColumn("in_cum", F.sum("weight").over(w_in))
    totals = stream.groupBy("shard").agg(F.sum("weight").alias("shard_total"))
    # bounded-frame: one row per shard
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "shard",
        F.coalesce(F.sum("shard_total").over(w_sh), F.lit(0)).alias("shard_off"),
    )
    bounds = (
        within.filter(F.col("weight") == 0)
        .join(F.broadcast(offsets), "shard")
        .withColumn("cum", F.col("shard_off") + F.col("in_cum"))
    )
    return bounds.groupBy("win_id").agg(
        F.max("w_start").alias("w_start"),
        (
            F.max(F.when(F.col("which") == "e", F.col("cum")))
            - F.max(F.when(F.col("which") == "s", F.col("cum")))
        )
        .cast("long")
        .alias("n_purchases"),
    )


# --- deterministic WEIGHTED sampling (sequential Poisson / priority) --------

_WSAMP_K = 64
# 2^53: the largest power of two whose integer range doubles represent
# exactly — u = (md5 % 2^53) / 2^53 is an exact IEEE division in both
# engines (e-notation literal: DuckDB parses plain decimals as DECIMAL).
_WSAMP_MOD = 9007199254740992


@register(
    "weighted_sample_events",
    f"""
    WITH w AS (
        SELECT event_id, user_id, value,
               cast(({md5_long_sql("'wsamp:' || event_id::VARCHAR")})
                    % {_WSAMP_MOD} as double) / 9.007199254740992e15 AS u
        FROM events WHERE value IS NOT NULL AND value > 0e0
    )
    SELECT event_id, user_id, value,
           floor((u / value) * 1e12)::BIGINT AS pri_e12
    FROM w
    ORDER BY u / value, event_id
    LIMIT {_WSAMP_K}
    """,
    survey_ids=("P5", "O5"),
    doc="Deterministic weighted sampling without replacement "
    f"(top-{_WSAMP_K}): sequential Poisson / priority sampling "
    "(Ohlsson) — each row gets priority u/w with u a uniform md5-"
    "derived rational and w its weight; the k smallest priorities are "
    "a weighted sample.  The mixture-construction primitive when "
    "examples carry importance weights (quality scores, dedup "
    "multiplicities): heavier rows draw smaller priorities "
    "proportionally more often.  No ln() (the exponential-sort "
    "formulation -ln(u)/w is NOT bit-portable; the rational "
    "priority's argsort is identical and IEEE-exact), no RNG state — "
    "re-runs, retries, and engines agree row-for-row.  Plan: scan-"
    "side projection + TakeOrderedAndProject; zero shuffles, no "
    "global sort.",
)
def q_weighted_sample_events(spark, sf_dir):
    from ..functions import md5_long

    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    u = (
        md5_long(F.concat(F.lit("wsamp:"), F.col("event_id").cast("string")))
        % F.lit(_WSAMP_MOD)
    ).cast("double") / F.lit(9.007199254740992e15)
    pri = (u / F.col("value")).alias("__pri")
    return (
        ev.select("event_id", "user_id", "value", pri)
        .orderBy("__pri", "event_id")
        .limit(_WSAMP_K)
        .select(
            "event_id",
            "user_id",
            "value",
            F.floor(F.col("__pri") * F.lit(1e12)).cast("long").alias("pri_e12"),
        )
    )


# --- Z-order layout key ----------------------------------------------------


@register(
    "zorder_events",
    f"""
    SELECT event_id,
           {sql_zorder_key('user_id', 'CAST(floor(value * 100.0) AS BIGINT)')} AS z_key
    FROM events
    """,
    survey_ids=("O4",),
    doc="Morton (Z-order) key over (user_id, quantized value): the "
    "clustering key that gives every parquet file a compact bounding "
    "box in BOTH dimensions, so min/max footer stats prune files for "
    "predicates on either column.  Flat unrolled integer expression — "
    "codegen'd, shuffle-free (operators/layout.py:zorder_key; "
    "cluster_by_zorder adds the range-partition + local sort).",
)
def q_zorder_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    q = F.floor(F.col("value") * 100.0).cast("long")
    return ev.select(
        "event_id", zorder_key(F.col("user_id"), q).alias("z_key")
    )


# --- co-occurrence / market basket --------------------------------------------


@register(
    "event_type_affinity",
    """
    WITH b AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    )
    SELECT a.event_type AS type_a, c.event_type AS type_b,
           count(*)::BIGINT AS n_baskets
    FROM b a JOIN b c
      ON a.user_id = c.user_id AND a.day = c.day
     AND a.event_type < c.event_type
    GROUP BY type_a, type_b
    """,
    survey_ids=("J1", "A1", "A3"),
    doc="Market-basket co-occurrence: (user, day) baskets -> distinct "
    "items per basket BEFORE the self-join (the anti-explosion move: "
    "the join is over item SETS, so a basket with k item types emits "
    "k·(k-1)/2 pairs, never |events|²) -> ordered-pair counts.  The "
    "self-join key is (user_id, day): both sides share one hash "
    "partitioning, and item-vocabulary skew is bounded by the small "
    "per-basket set size.",
)
def q_event_type_affinity(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.user_id") == F.col("c.user_id"))
            & (F.col("a.day") == F.col("c.day"))
            & (F.col("a.event_type") < F.col("c.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("c.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    )


# --- multi-granularity time rollup --------------------------------------------


@register(
    "time_rollup_multi",
    """
    SELECT
        grouping(h)::BIGINT * 4 + grouping(d)::BIGINT * 2
            + grouping(w)::BIGINT AS gid,
        h, d, w, count(*)::BIGINT AS n,
        sum(CAST(floor(value * 1000000) AS BIGINT)) AS v_sum_e6
    FROM (
        SELECT date_trunc('hour', ts) AS h,
               CAST(ts AS DATE) AS d,
               date_trunc('week', CAST(ts AS DATE)) AS w,
               value
        FROM events WHERE user_id < 20
    )
    GROUP BY GROUPING SETS ((h), (d), (w))
    """,
    survey_ids=("A1", "T9"),
    doc="Hourly, daily, AND weekly aggregates from ONE scan via "
    "GROUPING SETS over derived time columns — the multi-granularity "
    "dashboard feed computed without re-reading the fact table per "
    "granularity, disambiguated by grouping_id.  Scale shape (the "
    "rollup_revenue discipline): day and week are FUNCTIONS of the "
    "hour truncation and count/integer-sum re-aggregate exactly, so "
    "the fact scan aggregates ONCE at hour grain and Expand runs over "
    "the |hours|-row frame, not |events| — grouping-set "
    "multiplication paid on the calendar, not the data.",
)
def q_time_rollup_multi(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    fine = (
        ev.select(
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.floor(F.col("value") * 1000000).cast("long").alias("v_e6"),
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("v_e6").alias("__v"),
        )
    )
    base = fine.select(
        "h",
        F.to_date("h").alias("d"),
        F.date_trunc("week", F.col("h")).cast("date").alias("w"),
        "__n",
        "__v",
    )
    gid = (
        F.grouping("h").cast("long") * 4
        + F.grouping("d").cast("long") * 2
        + F.grouping("w").cast("long")
    )
    return base.groupingSets([["h"], ["d"], ["w"]], "h", "d", "w").agg(
        gid.alias("gid"),
        F.sum("__n").cast("long").alias("n"),
        F.sum("__v").alias("v_sum_e6"),
    ).select("gid", "h", "d", "w", "n", "v_sum_e6")


# --- batch tumbling windows ---------------------------------------------------


@register(
    "tumbling_6h_counts",
    """
    SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
               AS window_start,
           count(*)::BIGINT AS n,
           sum(CAST(floor(value * 1000000) AS BIGINT)) AS v_sum_e6
    FROM events GROUP BY window_start
    """,
    survey_ids=("T7", "A1"),
    doc="Batch-mode tumbling windows via the built-in window() "
    "function — the same grouping expression the streaming queries "
    "use, exercised against a plain epoch-division oracle to pin "
    "that window() boundaries are exactly floor(epoch / slide) in "
    "batch too.  Single map-side-combined aggregation.",
)
def q_tumbling_6h_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("v_sum_e6"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "v_sum_e6")
    )


# --- cumulative / ratio-to-report windows ------------------------------------


@register(
    "cumulative_daily_revenue",
    """
    WITH d AS (
        SELECT o_orderdate AS day,
               sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders WHERE o_orderdate >= DATE '1996-01-01'
                      AND o_orderdate < DATE '1996-04-01'
        GROUP BY o_orderdate
    )
    SELECT day, rev_c,
           sum(rev_c) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev_c,
           rev_c::DOUBLE / (sum(rev_c) OVER ())::DOUBLE AS share
    FROM d
    """,
    survey_ids=("A1", "W3", "A8"),
    doc="Daily revenue, running cumulative total, and share-of-period "
    "(ratio-to-report) — the reporting trio in one pass: keyed "
    "aggregation to days, then two window frames over the TINY daily "
    "frame (cumulative rows-frame + unbounded total), so the window "
    "cost is per-day, not per-order.  Cents-quantized integer sums; "
    "one double division for the share.",
)
def q_cumulative_daily_revenue(spark, sf_dir):
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    # bounded-frame: one row per calendar day (resample-period frame)
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    return d.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(wcum).alias("cum_rev_c"),
        (
            F.col("rev_c").cast("double")
            / F.sum("rev_c").over(wall).cast("double")
        ).alias("share"),
    )


# --- row provenance ----------------------------------------------------------


@register(
    "doc_provenance",
    """
    SELECT doc_id, 'documents.parquet' AS src_file FROM documents
    """,
    survey_ids=("S5", "G3", "O4"),
    doc="Row provenance / lineage: every row tagged with its source "
    "file basename via input_file_name() — the filename-keyed "
    "attribution the reference's sensor pipeline builds by hand from "
    "globs (utils/20251223-csv-to-separate-sensors.py), as a zero-"
    "cost scan-metadata column.  At 100 TB this is the debugging "
    "handle for bad-file quarantine (join provenance against a "
    "known-bad list, rewrite only those files).  The oracle states "
    "the expected basename from the known single-file layout (the "
    "oracle SQL cannot be parameterized by path), so the check "
    "verifies the extraction per row, not the listing.",
)
def q_doc_provenance(spark, sf_dir):
    # widen=False is CORRECTNESS here, not tuning: input_file_name()
    # only resolves inside the scan stage — after a repartition
    # exchange it returns '' for every row.
    d = load(spark, sf_dir, "documents", widen=False)
    return d.select(
        "doc_id",
        F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("src_file"),
    )


# --- distribution-position windows ------------------------------------------


@register(
    "value_rank_positions",
    """
    SELECT event_id, event_type,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           CAST(floor(value * 1000000) AS BIGINT) AS q
    FROM events
    WHERE user_id < 5
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY CAST(floor(value * 1000000) AS BIGINT), event_id)
    """,
    survey_ids=("W4", "A8"),
    doc="Distribution positions per event type: percent_rank "
    "((rank-1)/(n-1)) and cume_dist (rows<=current / n) — both exact "
    "integer ratios converted once to double, identical across "
    "engines.  The (quantized value, event_id) order is total, so "
    "rank assignment is deterministic.  One window shuffle.",
)
def q_value_rank_positions(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    q = F.floor(F.col("value") * 1000000).cast("long")
    w = Window.partitionBy("event_type").orderBy(q.asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        q.alias("q"),
    )


# --- forward fill (LOCF) ----------------------------------------------------


@register(
    "locf_forward_fill",
    """
    SELECT user_id, event_id, a,
           last_value(a IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN CAST(floor(value * 100.0) AS BIGINT) % 7 = 0
                    THEN NULL ELSE value END AS a
        FROM events
    )
    """,
    survey_ids=("W2", "G7", "P5"),
    doc="Forward fill (last observation carried forward): sensor "
    "readings with deterministic ~1/7 nulls filled by last_value "
    "IGNORE NULLS over the per-user row frame — the gap-repair twin "
    "of gap_fill_interpolate for state-like series where "
    "interpolation would invent values.  Values pass through "
    "unchanged (no arithmetic); one series-key shuffle.",
)
def q_locf_forward_fill(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    a = F.when(
        F.floor(F.col("value") * 100.0).cast("long") % 7 == 0, F.lit(None)
    ).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = ev.select("user_id", "event_id", "ts", a.alias("a"))
    return base.select(
        "user_id",
        "event_id",
        "a",
        F.last("a", ignorenulls=True).over(w).alias("filled"),
    )


# --- time-series aggregates -------------------------------------------------


@register(
    "twap_value_by_user",
    """
    WITH s AS (
        SELECT user_id, value, epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nt
        FROM events
    )
    SELECT user_id,
           (sum(CAST(floor(value * 1000000) AS BIGINT)::HUGEINT
                * (nt - t)::HUGEINT)
            // sum((nt - t)::HUGEINT))::BIGINT AS twap_e6
    FROM s WHERE nt IS NOT NULL
    GROUP BY user_id
    """,
    survey_ids=("T6", "W1", "A1"),
    doc="Time-weighted average value per user: each observation is "
    "weighted by its holding duration until the next event (the "
    "reading-to-reading allocation semantics of the electricity "
    "pipeline, T6, as an aggregate).  Result stays INTEGER end to "
    "end — exact 128-bit sums, then floor division to a 1e-6-"
    "quantized average — because int128->double conversion is not "
    "correctly rounded in DuckDB (measured last-ulp drift vs Spark's "
    "BigDecimal path).  One window shuffle on the series key, then "
    "the aggregation reuses the same partitioning.",
)
def q_twap_value_by_user(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    s = ev.select(
        "user_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("q"),
        t.alias("t"),
        F.lead(t).over(w).alias("nt"),
    ).filter(F.col("nt").isNotNull())
    dur = (F.col("nt") - F.col("t")).cast("decimal(38,0)")
    agg = s.groupBy("user_id").agg(
        F.sum(F.col("q").cast("decimal(38,0)") * dur).alias("__num"),
        F.sum(dur).alias("__den"),
    )
    return agg.select(
        "user_id", F.expr("__num div __den").cast("long").alias("twap_e6")
    )


@register(
    "daily_ohlc",
    """
    WITH s AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER w AS rn_a,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
        WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                     ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, day,
           min(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           min(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*)::BIGINT AS n
    FROM s GROUP BY user_id, day
    """,
    survey_ids=("A1", "W4", "T9"),
    doc="Daily OHLC bars per user: open/close via first/last row under "
    "a TOTAL (ts, event_id) order — min_by/arg_min tie-break across "
    "engines is unspecified, so both sides use the same row_number "
    "discipline — high/low as plain min/max.  One shuffle; values "
    "pass through unchanged (no float arithmetic at all).",
)
def q_daily_ohlc(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    wa = Window.partitionBy("user_id", day).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("user_id", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    s = ev.select(
        "user_id",
        day.alias("day"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return s.groupBy("user_id", "day").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --- reshaping / set-op variants --------------------------------------------


@register(
    "unpivot_lineitem_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_discount' AS measure,
               l_discount AS value FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_orderkey < 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 1000
    )
    """,
    survey_ids=("A4",),
    doc="UNPIVOT (melt) — the inverse of the A4 pivot: three measure "
    "columns become (measure, value) rows via Spark's native unpivot "
    "(one Expand node, no join/shuffle; 3x row amplification is the "
    "semantics, not a plan defect).  Oracle spelled as UNION ALL for "
    "portability.",
)
def q_unpivot_lineitem_measures(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_discount", "l_extendedprice", "l_tax"],
        "measure",
        "value",
    )


@register(
    "set_ops_all_users",
    """
    SELECT 'intersect_all' AS op, count(*)::BIGINT AS n FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'except_all', count(*)::BIGINT FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    survey_ids=("U1", "U3"),
    doc="Multiset set operations: INTERSECT ALL / EXCEPT ALL preserve "
    "duplicity (min/difference of per-key multiplicities) where the "
    "existing intersect_users/except_users are set-semantics.  Both "
    "engines implement the same bag algebra; counts compared.",
)
def q_set_ops_all_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    ia = clicks.intersectAll(buys).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.lit("intersect_all").alias("op"), "n")
    ea = clicks.exceptAll(buys).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.lit("except_all").alias("op"), "n")
    return ia.unionByName(ea)


def _trigrams_outer_oracle() -> str:
    from ..operators.pipeline_text import sql_trigrams
    from ..operators.text_analysis import sql_tokens

    tg = sql_trigrams(sql_tokens("text"))
    return f"""
    SELECT d.doc_id, u.ngram
    FROM (
        SELECT doc_id, {tg} AS tg FROM documents WHERE doc_id < 100
    ) d
    LEFT JOIN LATERAL (SELECT unnest(d.tg) AS ngram) u ON true
    """


@register(
    "doc_trigrams_outer",
    _trigrams_outer_oracle(),
    survey_ids=("T4", "P4"),
    doc="explode_outer null-preservation: documents too short for a "
    "trigram keep their row with a NULL ngram (an inner explode would "
    "silently drop them — the off-by-one that breaks per-document "
    "accounting downstream).  Oracle is a LEFT JOIN LATERAL unnest.",
)
def q_doc_trigrams_outer(spark, sf_dir):
    from ..functions import tokens
    from ..operators.pipeline_text import trigram_array

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d = d.select("doc_id", trigram_array(tokens(F.col("text"))).alias("__tg"))
    return d.select("doc_id", F.explode_outer("__tg").alias("ngram"))


# --- windowed robust statistics + cohorts -----------------------------------


@register(
    "rolling_median_7d",
    """
    SELECT user_id, event_id,
           quantile_cont(q, 0.5) OVER (PARTITION BY user_id ORDER BY di
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
    FROM (
        SELECT user_id, event_id,
               CAST(floor(value * 1000000) AS BIGINT) AS q,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di
        FROM events
    )
    """,
    survey_ids=("W3", "A8"),
    doc="Trailing 7-day rolling MEDIAN per user — the robust twin of "
    "rolling_avg_7d.  Exact percentile as a range-frame window "
    "aggregate over quantized ints (Spark percentile().over and "
    "DuckDB quantile_cont share the interpolation definition).  One "
    "shuffle on the series key; the rolling median is recomputed "
    "per frame, the documented cost of exact vs sketched quantiles.",
)
def q_rolling_median_7d(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("q"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("di"),
    )
    w = Window.partitionBy("user_id").orderBy("di").rangeBetween(-6, 0)
    return base.select(
        "user_id",
        "event_id",
        F.percentile(F.col("q"), F.lit(0.5)).over(w).alias("med7"),
    )


@register(
    "retention_cohorts",
    """
    WITH firstw AS (
        SELECT user_id, min(date_trunc('week', CAST(ts AS DATE))) AS cohort
        FROM events GROUP BY user_id
    ), act AS (
        SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS w
        FROM events
    )
    SELECT f.cohort, ((a.w - f.cohort) // 7)::BIGINT AS week_offset,
           count(DISTINCT a.user_id)::BIGINT AS n_users
    FROM act a JOIN firstw f ON a.user_id = f.user_id
    GROUP BY f.cohort, week_offset
    """,
    survey_ids=("A1", "A3", "J1"),
    doc="Weekly retention cohorts: first-activity week per user -> "
    "distinct (user, week) activity -> users per (cohort, week "
    "offset).  Both week anchors are ISO Mondays in both engines, so "
    "the day difference is an exact multiple of 7.  The cohort frame "
    "is per-user-small and broadcast back; the heavy input collapses "
    "to distinct (user, week) before any join.",
)
def q_retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    firstw = ev.select("user_id", wk.alias("w")).groupBy("user_id").agg(
        F.min("w").alias("cohort")
    )
    act = ev.select("user_id", wk.alias("w")).distinct()
    return (
        act.join(F.broadcast(firstw), "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("w"), F.col("cohort")) / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


# --- robust statistics ------------------------------------------------------


@register(
    "mad_value_by_type",
    """
    WITH q AS (
        SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS q
        FROM events
    ), med AS (
        SELECT event_type, quantile_cont(q, 0.5) AS med FROM q
        GROUP BY event_type
    )
    SELECT q.event_type,
           quantile_cont(abs(q.q::DOUBLE - med.med), 0.5) AS mad
    FROM q JOIN med ON q.event_type = med.event_type
    GROUP BY q.event_type
    """,
    survey_ids=("A8",),
    doc="Median absolute deviation per event type — the robust spread "
    "statistic.  Nested median: per-group median (exact percentile "
    "over quantized ints), broadcast back, second exact percentile of "
    "absolute deviations.  The deviations are exact doubles (integer "
    "minus half-integer median), so both engines interpolate "
    "identically.  Two keyed aggregations, one broadcast join.",
)
def q_mad_value_by_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    q = ev.select("event_type", F.floor(F.col("value") * 1000000).cast("long").alias("q"))
    med = q.groupBy("event_type").agg(F.percentile(F.col("q"), F.lit(0.5)).alias("med"))
    return (
        q.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("q").cast("double") - F.col("med")).alias("d"))
        .groupBy("event_type")
        .agg(F.percentile(F.col("d"), F.lit(0.5)).alias("mad"))
    )


@register(
    "mode_value_by_type",
    """
    SELECT event_type, q AS mode_q, n FROM (
        SELECT event_type, q, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, q ASC) AS rn
        FROM (
            SELECT event_type, CAST(floor(value * 10.0) AS BIGINT) AS q,
                   count(*)::BIGINT AS n
            FROM events GROUP BY event_type, q
        )
    ) WHERE rn = 1
    """,
    survey_ids=("A1", "W4"),
    doc="Exact mode (most frequent decile-quantized value) per event "
    "type: count aggregation with map-side partials, then a top-1 "
    "window over the small (group, bucket) count frame with a total "
    "tie-break order.  The heavy shuffle carries (group, bucket) "
    "counts, never rows.",
)
def q_mode_value_by_type(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    counts = (
        ev.select("event_type", F.floor(F.col("value") * 10.0).cast("long").alias("q"))
        .groupBy("event_type", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("q").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("q").alias("mode_q"), "n")
    )


# --- data-quality audit -----------------------------------------------------


@register(
    "dq_audit_orders",
    """
    SELECT
        (SELECT count(*) FROM orders)::BIGINT AS n_rows,
        (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))::BIGINT
            AS n_orphan_custkey,
        (SELECT count(*) FROM orders WHERE o_totalprice <= 0
            OR o_totalprice IS NULL)::BIGINT AS n_bad_price,
        (SELECT count(*) FROM
            (SELECT o_orderkey FROM orders
             GROUP BY o_orderkey HAVING count(*) > 1))::BIGINT AS n_dup_keys,
        (SELECT count(*) FROM orders
          WHERE o_orderdate < DATE '1992-01-01'
             OR o_orderdate > DATE '2000-12-31')::BIGINT AS n_date_out_of_range
    """,
    survey_ids=("A8", "J4", "A9"),
    doc="Data-quality audit over orders: referential integrity to "
    "customer (left-anti probe against the broadcast dim), positive-"
    "price and date-range expectations (scan-side predicates), and "
    "key-uniqueness (one keyed aggregation).  Each check is a shape "
    "that scales — no check materializes violating ROWS, only counts; "
    "a production run would add a capped violation sample per check.",
)
def q_dq_audit_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n_rows = o.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphan_custkey"))
    )
    bad_price = o.agg(
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_bad_price")
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_keys"))
    )
    dates = o.agg(
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("2000-12-31").cast("date")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_date_out_of_range")
    )
    return (
        n_rows.crossJoin(orphans)
        .crossJoin(bad_price)
        .crossJoin(dups)
        .crossJoin(dates)
    )


# --- null-semantics audit ---------------------------------------------------


@register(
    "null_semantics_audit",
    """
    WITH d AS (
        SELECT nullif(CAST(floor(value * 100.0) AS BIGINT) % 5, 4) AS g,
               nullif(CAST(floor(value * 100.0) AS BIGINT) % 97, 0) AS a,
               nullif(CAST(floor(value * 100.0) AS BIGINT) % 89, 0) AS b
        FROM events
    )
    SELECT g,
           count(*)::BIGINT AS n_rows,
           count(a)::BIGINT AS n_a,
           count(DISTINCT a)::BIGINT AS nd_a,
           coalesce(sum(a), 0)::BIGINT AS sum_a,
           sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END)::BIGINT
               AS n_nullsafe_eq,
           sum(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT AS n_plain_eq,
           sum(CASE WHEN a IS NULL AND b IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_both_null
    FROM d GROUP BY g
    """,
    survey_ids=("G8", "A2", "A9"),
    doc="NULL-semantics conformance audit: NULL as a grouping key (its "
    "own group), null-skipping count/sum/count-distinct, null-safe "
    "vs plain equality (<=> / IS NOT DISTINCT FROM), and both-null "
    "detection — the semantics every merge/dedup operator in the "
    "engine leans on (G5 tolerant equality, J3 coalesce folds), "
    "pinned against the oracle in one query.",
)
def q_null_semantics_audit(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100.0).cast("long")
    d = ev.select(
        F.nullif(v % 5, F.lit(4)).alias("g"),
        F.nullif(v % 97, F.lit(0)).alias("a"),
        F.nullif(v % 89, F.lit(0)).alias("b"),
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return d.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("a").cast("long").alias("n_a"),
        F.count_distinct(F.col("a")).cast("long").alias("nd_a"),
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("sum_a"),
        one_if(F.col("a").eqNullSafe(F.col("b"))).alias("n_nullsafe_eq"),
        one_if(F.col("a") == F.col("b")).alias("n_plain_eq"),
        one_if(F.col("a").isNull() & F.col("b").isNull()).alias("n_both_null"),
    )


# --- exact-arithmetic Pearson correlation ----------------------------------


@register(
    "corr_value_hour",
    """
    SELECT event_type, n_rows,
           (n*sxy - sx*sy)::DOUBLE
             / (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE))
               AS corr_xy
    FROM (
        SELECT event_type,
               count(*)::BIGINT AS n_rows,
               count(*)::HUGEINT AS n,
               sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
               sum(x*x)::HUGEINT AS sxx, sum(y*y)::HUGEINT AS syy,
               sum(x*y)::HUGEINT AS sxy
        FROM (
            SELECT event_type, hour(ts)::BIGINT AS x,
                   CAST(floor(value * 100.0) AS BIGINT) AS y
            FROM events
        ) GROUP BY event_type
    )
    """,
    survey_ids=("A1", "A8"),
    doc="Pearson correlation (value vs hour-of-day) per event type from "
    "EXACT integer moment sums: quantized inputs, decimal(38) partials "
    "(order-independent, overflow-safe), then one double conversion + "
    "IEEE-correctly-rounded sqrt — so even a float statistic is "
    "bit-identical across engines.  Single map-side-combined "
    "aggregation: the moment sums are the whole shuffle.",
)
def q_corr_value_hour(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 100.0).cast("long").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "event_type",
        "n_rows",
        (num / (F.sqrt(denx) * F.sqrt(deny))).alias("corr_xy"),
    )


# --- conversion funnel ------------------------------------------------------


@register(
    "conversion_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
           (SELECT count(*) FROM c)::BIGINT AS n_view_click,
           (SELECT count(*) FROM p)::BIGINT AS n_view_click_purchase
    """,
    survey_ids=("J1", "A1", "A8"),
    doc="Ordered conversion funnel (view -> later click -> later "
    "purchase), the sequential-dependency aggregation dashboards run: "
    "each stage is a keyed min-aggregate joined to the previous "
    "stage's anchor time, so every shuffle is on user_id and AQE can "
    "co-locate the three stages; no window over the full event "
    "stream, no per-user sort.",
)
def q_conversion_funnel(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("long").alias("n_view_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("long").alias("n_view_click_purchase"))
        )
    )


# --- custom stateful streaming op in the gate -------------------------------


@register(
    "streaming_stateful_counts",
    "SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id",
    survey_ids=("ST1", "A1"),
    doc="applyInPandasWithState in the gate: a per-user running counter "
    "maintained in the state store across micro-batches (the "
    "arbitrary-state API built-in aggs can't express), replayed over "
    "the events file and checked against the batch GROUP BY.  Output "
    "is integer-only so the Python state path stays hash-exact; "
    "state is O(keys), independent of stream length.",
)
def q_streaming_stateful_counts(spark, sf_dir):
    from ..streaming.pipelines import drain_to_memory, stream_events

    df = stream_events(spark, sf_dir)

    def update(key, pdfs, state):
        import pandas as pd

        (n,) = state.get if state.exists else (0,)  # .get is a property
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n}])

    counted = (
        df.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    table = drain_to_memory(spark, counted, "sstate", "update")
    # Update-mode emits one row per key PER MICRO-BATCH that touched
    # the key.  The running counter is monotone, so keep-last-per-key
    # is exactly max(n_events): correct for the single-file replay
    # (no-op) AND for any multi-batch replay (keeps each key's final
    # count), instead of relying on the one-file/one-batch layout.
    return table.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


# --- transformWithState in the gate (conditional on protobuf) ---------------

# Spark 4's transformWithStateInPandas needs the public `protobuf`
# package for its Python state server (declared in pyproject.toml's
# [streaming-tws] extra).  Registration requires an EXPLICIT opt-in
# (SPARK_GRAFT_ENABLE_TWS=1) on top of the importable runtime: keying
# the catalog on import availability alone made the gate size itself
# environment-dependent — installing the extra silently changed parity
# and bench from 170 to 171 queries with no signal (round-5 advice).
# With the flag unset the catalog is 170 everywhere; setting it on a
# protobuf-equipped install adds the typed-state replay as a
# first-class oracle row.  The construction-level API surface is
# tested unconditionally (tests/test_streaming.py); see docs/SCALE.md
# for the closure note on why the wheel cannot be vendored here.
import os as _os

if (
    _os.environ.get("SPARK_GRAFT_ENABLE_TWS") == "1"
    and find_spec("google") is not None
    and find_spec("google.protobuf") is not None
):

    @register(
        "streaming_tws_counts",
        """
        SELECT user_id, count(*)::BIGINT AS n_events,
               floor(max(value * 1000000.0))::BIGINT AS max_qv
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id
        """,
        survey_ids=("ST1", "A1"),
        doc="transformWithStateInPandas in the gate: per-user (count, "
        "running max) maintained in typed ValueState handles on the "
        "RocksDB store, replayed over the events file and compared "
        "keep-last-per-key (both state fields are monotone, so the "
        "update-mode drain folds with max) against the batch GROUP "
        "BY.  Output is integer-quantized so the Python state path "
        "stays hash-exact.  Registered only where the protobuf "
        "runtime exists — see the module comment.",
    )
    def q_streaming_tws_counts(spark, sf_dir):
        from ..streaming.pipelines import (
            drain_to_memory,
            stream_events,
            tws_user_stats,
        )

        key = "spark.sql.streaming.stateStore.providerClass"
        prior = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            df = stream_events(spark, sf_dir)
            q = (
                df.filter(F.col("value").isNotNull())
                .select("user_id", "ts", F.floor(F.col("value") * 1e6).alias("qv"))
                .withWatermark("ts", "1 hour")
            )
            table = drain_to_memory(spark, tws_user_stats(q), "stws", "update")
            return table.groupBy("user_id").agg(
                F.max("n_events").alias("n_events"),
                F.max("max_qv").alias("max_qv"),
            )
        finally:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)


# --- streaming sessionization ----------------------------------------------


@register(
    "streaming_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    survey_ids=("ST1", "W1"),
    doc="session_window sessionization in the gate: file-source replay "
    "-> watermark -> per-user session windows (30-minute gap), one "
    "output row per session.  The batch oracle replays the EXACT "
    "session_window merge rule (new session iff gap >= 30 min — "
    "strict window-overlap semantics, not the lag-gap > convention "
    "the batch sessionize query uses).  Session state is bounded by "
    "the watermark horizon at scale.",
)
def q_streaming_sessionize(spark, sf_dir):
    from ..streaming.pipelines import (
        drain_to_memory,
        stream_events,
        stream_sessionize,
    )

    df = stream_events(spark, sf_dir)
    sess = stream_sessionize(df).select("user_id", "session_start", "n_events")
    return drain_to_memory(spark, sess, "ssess", "complete")


# --- streaming dedup -------------------------------------------------------


@register(
    "streaming_dedup_events",
    "SELECT DISTINCT user_id, event_type FROM events",
    survey_ids=("ST1", "A6"),
    doc="Stateful streaming deduplication: file-source replay of the "
    "events table -> watermark -> dropDuplicates on the key, keys-only "
    "output so the batch oracle is SELECT DISTINCT.  The watermark "
    "bounds the dedup state for unbounded streams — without it the "
    "key set grows forever; with it, state older than the horizon is "
    "evicted (the bounded-state posture streaming_bucket_15min uses "
    "for windows, applied to dedup).",
)
def q_streaming_dedup_events(spark, sf_dir):
    from ..streaming.pipelines import drain_to_memory, stream_events

    df = stream_events(spark, sf_dir)
    deduped = (
        df.withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return drain_to_memory(spark, deduped, "sdedup", "append")


# --- heavy hitters (sample -> CMS -> exact verify) --------------------------


@register(
    "heavy_hitters",
    """
    WITH cand AS (
        SELECT user_id, count(*)::BIGINT AS sampled_n
        FROM events
        WHERE {sample} % 16 = 0
        GROUP BY user_id
        HAVING count(*) >= 4
    ), est AS (
        {cms}
    ), exact AS (
        SELECT e.user_id, count(*)::BIGINT AS n_exact
        FROM events e JOIN cand ON e.user_id = cand.user_id
        GROUP BY e.user_id
    )
    SELECT cand.user_id, cand.sampled_n, est.cms_est, exact.n_exact,
           (exact.n_exact >= 64) AS is_heavy
    FROM cand
    JOIN est ON cand.user_id = est.key
    JOIN exact ON cand.user_id = exact.user_id
    """.format(
        sample=md5_long_sql("'hh:' || CAST(event_id AS VARCHAR)"),
        # Outer CTEs are visible inside sql_cms's nested WITH, so the
        # candidate definition lives in ONE place.
        cms=SK.sql_cms("events", "user_id", "SELECT user_id AS key FROM cand"),
    ),
    survey_ids=("A1", "A8"),
    doc="Bounded-memory heavy hitters, the pattern that replaces a "
    "full GROUP BY when the key domain itself is too large to hold: "
    "(1) a deterministic 1/16 row sample (md5 on event_id — "
    "retry-stable, no RNG) nominates candidate keys, (2) the "
    "constant-state Count-Min sketch estimates their frequency, "
    "(3) an exact count restricted to the candidate set (joined "
    "against the bounded candidate frame) verifies.  Only step 3 "
    "touches per-candidate state; steps 1-2 are map-side "
    "sample-filter + 1024 sketch cells regardless of cardinality.",
)
def q_heavy_hitters(spark, sf_dir):
    from ..functions import md5_long

    ev = load(spark, sf_dir, "events")
    sampled = ev.filter(
        md5_long(F.concat(F.lit("hh:"), F.col("event_id").cast("string"))) % 16 == 0
    )
    cand = (
        sampled.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("sampled_n"))
        .filter(F.col("sampled_n") >= 4)
    )
    cells = SK.cms_build(ev, "user_id")
    est = SK.cms_probe(cells, cand.select("user_id"), "user_id")
    exact = (
        ev.join(F.broadcast(cand.select("user_id")), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    return (
        cand.join(est, "user_id")
        .join(exact, "user_id")
        .select(
            "user_id",
            "sampled_n",
            "cms_est",
            "n_exact",
            (F.col("n_exact") >= 64).alias("is_heavy"),
        )
    )
