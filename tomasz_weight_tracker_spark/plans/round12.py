"""Round-12 catalog queries — closing the bitext miner's trained-
quantizer gap the round-11 verdict named:

- ``bitext_mine_margin_ivf_trained`` — the IVF margin miner
  (plans/round11.py) consuming ``ivf_train``'s Lloyd-trained coarse
  centroids instead of the degenerate first-8 rule.  This is the shape
  the miner's own docstring promises at 100 TB: trained centroids keep
  bucket occupancy balanced when the corpus is skewed, so the candidate
  equi-join's per-key frames stay bounded.  The oracle replays the
  ENTIRE training (two k-means rounds as a CTE chain, the
  ``embed_ivf_trained`` pattern) so even the learned quantizer is
  cross-engine bit-identical.
- ``bitext_recall_audit`` — measure, don't guess, applied to the IVF
  candidate cut itself (the ``lsh_recall_audit`` discipline): on a
  deterministic md5-sampled vector universe (fixed COST at any corpus
  scale), mine pairs three ways — brute mutual-kNN margin (exact ground
  truth), IVF with first-8 centroids, IVF with trained centroids — and
  report pair-set recall of each IVF variant against brute as ppm
  integers.  The quantizers are GLOBAL (trained/selected on the full
  corpus, as production would), only the mined universe is sampled.

Reference parity anchors: none (training-data-pipeline extensions);
margin arithmetic cites Artetxe & Schwenk 2019 via round10b.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import md5_long
from ..operators import similarity as S
from ..operators.similarity import dot
from .catalog import load, register, trained_ivf_centroids
from .pathbound import _weight_oracle, weight_parse_frame
from .round11 import _BITEXT_K, _IVF_NCENT, _IVF_NPROBE, margin_mine, mine_bitext_ivf

# ===========================================================================
# Shared DuckDB fragments: the IVF candidate cut and the margin tail,
# parameterized by CTE prefix so one audit query can replay three miners
# without name collisions (and the trained variant can reuse the cut).
# ===========================================================================


def _sql_ivf_pairs(prefix: str, cent: str, src: str, tgt: str, nprobe: int) -> str:
    """CTEs ``{prefix}a`` (tgt assignment), ``{prefix}pr`` (src probes),
    ``{prefix}p`` (candidate pairs with 1e-9-quantized dots).  ``cent``
    must expose (centroid_id, cv), ``src`` (src_id, sv), ``tgt``
    (tgt_id, tv)."""
    return f"""
    {prefix}a AS (
      SELECT tgt_id, tv, centroid_id FROM (
        SELECT t.tgt_id, t.tv, c.centroid_id,
               row_number() OVER (PARTITION BY t.tgt_id
                                  ORDER BY list_dot_product(t.tv, c.cv) DESC,
                                           c.centroid_id) AS rn
        FROM {tgt} t CROSS JOIN {cent} c) WHERE rn = 1
    ),
    {prefix}pr AS (
      SELECT src_id, sv, centroid_id FROM (
        SELECT s.src_id, s.sv, c.centroid_id,
               row_number() OVER (PARTITION BY s.src_id
                                  ORDER BY list_dot_product(s.sv, c.cv) DESC,
                                           c.centroid_id) AS rn
        FROM {src} s CROSS JOIN {cent} c) WHERE rn <= {nprobe}
    ),
    {prefix}p AS (
      SELECT pr.src_id, a.tgt_id,
             floor(list_dot_product(pr.sv, a.tv) * 1000000000)::BIGINT AS qdot
      FROM {prefix}pr pr JOIN {prefix}a a ON pr.centroid_id = a.centroid_id
    )"""


def _sql_margin_tail(prefix: str, k: int) -> str:
    """CTE ``{prefix}m``: mined (src_id, tgt_id, qdot, margin) from the
    candidate relation ``{prefix}p`` — same mutual-kNN depth, integer
    top-k sums, and correctly-rounded margin division as margin_mine."""
    return f"""
    {prefix}r AS (
      SELECT *,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY qdot DESC, tgt_id) AS rs,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY qdot DESC, src_id) AS rt
      FROM {prefix}p
    ),
    {prefix}kx AS (SELECT src_id, sum(qdot)::BIGINT AS sx FROM {prefix}r
                   WHERE rs <= {k} GROUP BY src_id),
    {prefix}ky AS (SELECT tgt_id, sum(qdot)::BIGINT AS sy FROM {prefix}r
                   WHERE rt <= {k} GROUP BY tgt_id),
    {prefix}m AS (
      SELECT r.src_id, r.tgt_id, r.qdot,
             (r.qdot * {2 * k}) / (kx.sx + ky.sy) AS margin
      FROM {prefix}r r
      JOIN {prefix}kx kx ON r.src_id = kx.src_id
      JOIN {prefix}ky ky ON r.tgt_id = ky.tgt_id
      WHERE r.rs <= {k} AND r.rt <= {k}
        AND (r.qdot * {2 * k}) / (kx.sx + ky.sy) > 1.0
    )"""


# ===========================================================================
# Trained-quantizer bitext mining (verdict r11 item 2)
# ===========================================================================

_BITEXT_TRAINED_ORACLE = (
    f"""
    WITH {S.sql_ivf_train(n_centroids=_IVF_NCENT, iterations=2, dim=64)},
    s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 2 = 0),
    t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE vec_id % 2 = 1),
    """
    + _sql_ivf_pairs("b", "cent", "s", "t", _IVF_NPROBE)
    + ","
    + _sql_margin_tail("b", _BITEXT_K)
    + """
    SELECT src_id, tgt_id, qdot, margin FROM bm
"""
)


@register(
    "bitext_mine_margin_ivf_trained",
    _BITEXT_TRAINED_ORACLE,
    survey_ids=(),
    doc="The IVF margin miner on TRAINED coarse centroids — the shape "
    "bitext_mine_margin_ivf's docstring promises at 100 TB: two Lloyd "
    "k-means rounds (ivf_train — broadcast-assign map-side argmax, "
    "posexplode/groupBy re-centroid with 1e-9-quantized exact means, "
    "deterministic md5 init) produce the quantizer, and mining is the "
    "same ONE equi-join on centroid_id + bucket-bounded rank frames "
    "as the untrained twin (shared margin_mine tail, shared "
    "ivf_candidate_pairs cut).  Trained centroids are what keep "
    "bucket occupancy balanced on skewed corpora — the first-8 rule "
    "degenerates when early ids cluster, ballooning one bucket's "
    "frames; Lloyd rounds split dense regions by construction "
    "(measured: tools/soak_bitext.py occupancy columns).  The oracle "
    "replays the whole training as a CTE chain (embed_ivf_trained's "
    "pattern), so even the learned quantizer is bit-identical "
    "cross-engine and the margin check stays hash-exact.",
)
def q_bitext_mine_margin_ivf_trained(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    # One Lloyd training per session feeds this, the recall audit, and
    # the embed_ivf/ivfadc/semantic families (catalog.py memo).
    cents = trained_ivf_centroids(spark, sf_dir, _IVF_NCENT, 2)
    return mine_bitext_ivf(
        e, n_cent=_IVF_NCENT, nprobe=_IVF_NPROBE, k=_BITEXT_K, centroids=cents
    )


# ===========================================================================
# IVF-vs-brute pair recall audit (verdict r11 item 5)
# ===========================================================================

_BAUD_N = 192  # sampled vector universe (constant at any corpus scale)

_BITEXT_AUDIT_ORACLE = (
    f"""
    WITH {S.sql_ivf_train(n_centroids=_IVF_NCENT, iterations=2, dim=64)},
    cent_u AS (SELECT vec_id AS centroid_id, v AS cv FROM e
               WHERE vec_id < {_IVF_NCENT}),
    samp AS (
      SELECT vec_id, v FROM (
        SELECT vec_id, v,
               row_number() OVER (ORDER BY
                 ('0x' || substr(md5('baud:' || vec_id::VARCHAR), 1, 15))::BIGINT,
                 vec_id) AS rn
        FROM e) WHERE rn <= {_BAUD_N}
    ),
    s AS (SELECT vec_id AS src_id, v AS sv FROM samp WHERE vec_id % 2 = 0),
    t AS (SELECT vec_id AS tgt_id, v AS tv FROM samp WHERE vec_id % 2 = 1),
    gp AS (
      SELECT src_id, tgt_id,
             floor(list_dot_product(sv, tv) * 1000000000)::BIGINT AS qdot
      FROM s, t
    ),
    """
    + _sql_margin_tail("g", _BITEXT_K)
    + ","
    + _sql_ivf_pairs("u", "cent_u", "s", "t", _IVF_NPROBE)
    + ","
    + _sql_margin_tail("u", _BITEXT_K)
    + ","
    + _sql_ivf_pairs("w", "cent", "s", "t", _IVF_NPROBE)
    + ","
    + _sql_margin_tail("w", _BITEXT_K)
    + f"""
    SELECT
      (SELECT count(*) FROM samp)::BIGINT AS n_vecs,
      (SELECT count(*) FROM gm)::BIGINT AS n_brute,
      (SELECT count(*) FROM um)::BIGINT AS n_ivf,
      (SELECT count(*) FROM um JOIN gm USING (src_id, tgt_id))::BIGINT AS n_hit_ivf,
      CASE WHEN (SELECT count(*) FROM gm) > 0
           THEN (SELECT count(*) FROM um JOIN gm USING (src_id, tgt_id))
                * 1000000 // (SELECT count(*) FROM gm)
           ELSE 1000000 END::BIGINT AS recall_ivf_ppm,
      (SELECT count(*) FROM wm)::BIGINT AS n_ivf_trained,
      (SELECT count(*) FROM wm JOIN gm USING (src_id, tgt_id))::BIGINT
        AS n_hit_trained,
      CASE WHEN (SELECT count(*) FROM gm) > 0
           THEN (SELECT count(*) FROM wm JOIN gm USING (src_id, tgt_id))
                * 1000000 // (SELECT count(*) FROM gm)
           ELSE 1000000 END::BIGINT AS recall_trained_ppm
"""
)


# ===========================================================================
# weight_txt_parse's sf10 bounded-slice twin (verdict r11 item 3)
# ===========================================================================

_WEIGHT_SLICE_MOD = 32
_WEIGHT_SLICE_REM = 3


@register(
    "weight_txt_parse_fileslice",
    _weight_oracle(
        source=(
            "(SELECT * FROM events "
            f"WHERE event_id % {_WEIGHT_SLICE_MOD} = {_WEIGHT_SLICE_REM})"
        )
    ),
    survey_ids=(),
    doc="weight_txt_parse's sf10 value-check twin: the identical blob "
    "synthesis + native array-expression parse over the deterministic "
    f"1/{_WEIGHT_SLICE_MOD} FILE slice (event_id % {_WEIGHT_SLICE_MOD} "
    f"= {_WEIGHT_SLICE_REM}).  event_id IS the file key — each event "
    "becomes exactly one scale-app export and the parser is strictly "
    "per-file (header split, EAV explode, rejection rules all within "
    "one blob) — so a whole-file slice is exact, not approximate: "
    "each kept file's EAV rows are bit-identical to its rows in the "
    "full run (the electricity_15min_userslice argument on the F1 "
    "key).  The full-scale run's check moves to tools/engine_only.py "
    "(stable xor-hash), same as electricity/snm; the slice keeps the "
    "family value-checked at sf10 without the 16g-driver, 22-minute "
    "full compare.  Shares weight_parse_frame with the parent, so "
    "synthesis and parser cannot drift.",
)
def q_weight_txt_parse_fileslice(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "ts")
        .filter(F.col("event_id") % _WEIGHT_SLICE_MOD == _WEIGHT_SLICE_REM)
    )
    return weight_parse_frame(spark, ev)


@register(
    "bitext_recall_audit",
    _BITEXT_AUDIT_ORACLE,
    survey_ids=("A1",),
    doc="Measure, don't guess — applied to the IVF candidate cut the "
    "bitext miners rely on (the lsh_recall_audit discipline): on a "
    f"deterministic {_BAUD_N}-vector md5-sampled universe (TakeOrdered "
    "over an md5 priority — fixed cost at ANY corpus scale; the brute "
    "truth is O(sample^2) and must never see the full corpus), mine "
    "pairs with (a) brute mutual-kNN margin (exact ground truth), "
    "(b) IVF on first-8 centroids, (c) IVF on Lloyd-TRAINED centroids, "
    "and report each variant's mined-pair recall against brute as ppm "
    "integers.  Quantizers are global — trained/selected on the FULL "
    "corpus exactly as the production miners use them; only the mined "
    "universe is sampled, so the number answers 'what does the "
    "candidate cut cost me in recall, and what does training buy "
    "back'.  All three miners share margin_mine / _sql_margin_tail, "
    "so the audit measures the CANDIDATE policies, not arithmetic "
    "drift.",
)
def q_bitext_recall_audit(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    samp = (
        e.withColumn(
            "__pri",
            md5_long(F.concat(F.lit("baud:"), F.col("vec_id").cast("string"))),
        )
        .orderBy("__pri", "vec_id")
        .limit(_BAUD_N)
        .drop("__pri")
        .localCheckpoint(eager=True)
    )
    src = samp.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").cast("array<double>").alias("sv"),
    )
    tgt = samp.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").cast("array<double>").alias("tv"),
    )
    # Brute ground truth: sample-bounded (<= _BAUD_N^2/4 pairs), so the
    # broadcast is safe by construction — this is the audit instrument,
    # not a production path.
    brute_pairs = src.join(F.broadcast(tgt)).select(
        "src_id",
        "tgt_id",
        F.floor(dot(F.col("sv"), F.col("tv")) * F.lit(1000000000.0))
        .cast("long")
        .alias("qdot"),
    )
    brute = margin_mine(brute_pairs, _BITEXT_K).select("src_id", "tgt_id")
    cent_u = e.filter(F.col("vec_id") < _IVF_NCENT).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    cent_t = trained_ivf_centroids(spark, sf_dir, _IVF_NCENT, 2)
    ivf_u = mine_bitext_ivf(
        samp, n_cent=_IVF_NCENT, nprobe=_IVF_NPROBE, k=_BITEXT_K, centroids=cent_u
    ).select("src_id", "tgt_id")
    ivf_t = mine_bitext_ivf(
        samp, n_cent=_IVF_NCENT, nprobe=_IVF_NPROBE, k=_BITEXT_K, centroids=cent_t
    ).select("src_id", "tgt_id")

    # Round-12 restructure: the count/overlap tail was five aggregate
    # subtrees over three eager checkpoints; a tagged union keyed on
    # the pair folds it into one pair-keyed max + one scalar aggregate
    # (n_hit_ivf == |ivf_u INTERSECT brute| == sum(u*b), etc.).  Each
    # miner is referenced exactly ONCE, so nothing needs materializing
    # (the lsh_recall_audit TreeNode blowup came from re-inlining per
    # reference) and the whole audit evaluates in one job.
    def _tag(df, b, u, t):
        return df.select(
            "src_id",
            "tgt_id",
            F.lit(b).alias("b"),
            F.lit(u).alias("u"),
            F.lit(t).alias("t"),
        )

    per_pair = (
        _tag(brute, 1, 0, 0)
        .unionByName(_tag(ivf_u, 0, 1, 0))
        .unionByName(_tag(ivf_t, 0, 0, 1))
        .groupBy("src_id", "tgt_id")
        .agg(
            F.max("b").alias("b"),
            F.max("u").alias("u"),
            F.max("t").alias("t"),
        )
    )
    zero = F.lit(0)  # empty pair relation: sum() is NULL, count() was 0
    scalars = per_pair.agg(
        F.coalesce(F.sum("b"), zero).cast("long").alias("n_brute"),
        F.coalesce(F.sum("u"), zero).cast("long").alias("n_ivf"),
        F.coalesce(F.sum(F.col("u") * F.col("b")), zero)
        .cast("long")
        .alias("n_hit_ivf"),
        F.coalesce(F.sum("t"), zero).cast("long").alias("n_ivf_trained"),
        F.coalesce(F.sum(F.col("t") * F.col("b")), zero)
        .cast("long")
        .alias("n_hit_trained"),
    )
    nv = samp.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    out = nv.crossJoin(F.broadcast(scalars))
    ppm_u = (
        F.when(F.col("n_brute") > 0, F.expr("(n_hit_ivf * 1000000) div n_brute"))
        .otherwise(F.lit(1000000))
        .cast("long")
    )
    ppm_t = (
        F.when(F.col("n_brute") > 0, F.expr("(n_hit_trained * 1000000) div n_brute"))
        .otherwise(F.lit(1000000))
        .cast("long")
    )
    return out.select(
        "n_vecs",
        "n_brute",
        "n_ivf",
        "n_hit_ivf",
        ppm_u.alias("recall_ivf_ppm"),
        "n_ivf_trained",
        "n_hit_trained",
        ppm_t.alias("recall_trained_ppm"),
    )
