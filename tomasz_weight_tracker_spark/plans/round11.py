"""Round-11 catalog queries — the scale-path twins the round-10 verdict
asked for:

- ``bitext_mine_margin_ivf`` — margin-based bitext mining (Artetxe &
  Schwenk 2019) with candidates drawn from the IVF coarse-quantizer
  routing instead of the brute-force src x tgt cartesian.  This is the
  production shape ``bitext_mine_margin`` (plans/round10b.py) promises
  in its docstring: the pair relation is an EQUI-join on centroid_id
  (probe buckets), never a corpus x corpus product, and every rank
  window's frame is bounded by bucket occupancy, not corpus size.
- ``dup_cluster_keep_best_lsh`` — cluster-representative selection
  (the ``dup_cluster_keep_best`` policy) consuming the PRODUCTION
  candidate generator: MinHash-LSH banded candidates at full corpus
  width (``lsh_dup_star_edges``' machinery) instead of the
  oracle-bounded windowed Jaccard self-join.

Reference parity anchors: none (training-data-pipeline extensions);
the margin arithmetic and closure operators cite their anchors in
round10b.py / operators/clusters.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators.similarity import dot
from .catalog import load, register
from .llm_ops import LSH_BANDS, LSH_CAP, LSH_K, LSH_THRESH
from .round8 import _SIG_CTES

# ===========================================================================
# Margin bitext mining over IVF candidates (the 100 TB shape)
# ===========================================================================

_BITEXT_K = 4  # mutual-kNN depth (matches bitext_mine_margin)
_IVF_NCENT = 8  # coarse centroids (matches embed_ivf_topk)
_IVF_NPROBE = 2  # probed buckets per source vector

_BITEXT_IVF_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id < {_IVF_NCENT}),
    s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 2 = 0),
    t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE vec_id % 2 = 1),
    atgt AS (
      SELECT tgt_id, tv, centroid_id FROM (
        SELECT t.tgt_id, t.tv, c.centroid_id,
               row_number() OVER (PARTITION BY t.tgt_id
                                  ORDER BY list_dot_product(t.tv, c.cv) DESC,
                                           c.centroid_id) AS rn
        FROM t CROSS JOIN cent c) WHERE rn = 1
    ),
    probes AS (
      SELECT src_id, sv, centroid_id FROM (
        SELECT s.src_id, s.sv, c.centroid_id,
               row_number() OVER (PARTITION BY s.src_id
                                  ORDER BY list_dot_product(s.sv, c.cv) DESC,
                                           c.centroid_id) AS rn
        FROM s CROSS JOIN cent c) WHERE rn <= {_IVF_NPROBE}
    ),
    p AS (
      SELECT pr.src_id, a.tgt_id,
             floor(list_dot_product(pr.sv, a.tv) * 1000000000)::BIGINT AS qdot
      FROM probes pr JOIN atgt a ON pr.centroid_id = a.centroid_id
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY qdot DESC, tgt_id) AS rs,
             row_number() OVER (PARTITION BY tgt_id
                                ORDER BY qdot DESC, src_id) AS rt
      FROM p
    ),
    kx AS (SELECT src_id, sum(qdot)::BIGINT AS sx FROM r
           WHERE rs <= {_BITEXT_K} GROUP BY src_id),
    ky AS (SELECT tgt_id, sum(qdot)::BIGINT AS sy FROM r
           WHERE rt <= {_BITEXT_K} GROUP BY tgt_id)
    SELECT r.src_id, r.tgt_id, r.qdot,
           (r.qdot * {2 * _BITEXT_K}) / (kx.sx + ky.sy) AS margin
    FROM r
    JOIN kx ON r.src_id = kx.src_id
    JOIN ky ON r.tgt_id = ky.tgt_id
    WHERE r.rs <= {_BITEXT_K} AND r.rt <= {_BITEXT_K}
      AND (r.qdot * {2 * _BITEXT_K}) / (kx.sx + ky.sy) > 1.0
"""


@register(
    "bitext_mine_margin_ivf",
    _BITEXT_IVF_ORACLE,
    survey_ids=(),
    doc="Margin-based bitext mining with IVF candidate generation — "
    "the scale-path twin of bitext_mine_margin (same margin "
    "arithmetic, same mutual-kNN policy, same k=4 threshold >1), "
    "candidates from the coarse quantizer instead of all pairs: "
    "targets are argmax-assigned to their nearest of 8 centroids "
    "(operators/similarity.ivf_assign — broadcast centroids, "
    "map-side), sources probe their 2 nearest buckets (ivf_probe), "
    "and the pair relation is ONE equi-join on centroid_id.  No "
    "corpus x corpus product exists anywhere in the plan "
    "(plan-shape-tested): pair volume is sum over probed buckets of "
    "bucket occupancy — nprobe/C of brute force at C centroids, and "
    "with the standard C ~ sqrt(N) sizing the relation is "
    "O(nprobe * N^1.5) instead of O(N^2).  Rank-window frames are "
    "bucket-bounded (never corpus-sized) and the top-k sums kx/ky "
    "are computed over the SAME candidate relation, so the oracle "
    "replays the routing exactly (embed_ivf_topk's oracle pattern) "
    "and the check stays hash-exact: dots are sequential folds "
    "quantized to 1e-9 integers, the margin one correctly-rounded "
    "integer division.  The centroid equi-join has C distinct keys — "
    "at this catalog's C=8 AQE coalesces the 8 populated partitions; "
    "at 100 TB C grows ~ sqrt(N) (thousands), giving real key "
    "fan-out, and the trained-centroid variant (ivf_train / "
    "embed_ivf_trained) keeps buckets balanced.",
)
def q_bitext_mine_margin_ivf(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return mine_bitext_ivf(e, n_cent=_IVF_NCENT, nprobe=_IVF_NPROBE, k=_BITEXT_K)


def ivf_candidate_pairs(e, n_cent: int, nprobe: int, centroids=None):
    """The IVF candidate stage alone: (src_id, tgt_id, qdot) from
    probe-bucket equi-joins — exposed so the soak can measure the pair
    relation's volume/wall separately from the margin tail.  Pass
    ``centroids`` (centroid_id, embedding) to mine against an external
    quantizer (e.g. ivf_train's — the balanced-bucket 100 TB shape);
    the default keeps the oracle-replayable first-``n_cent`` rule."""
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < n_cent).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
    src = e.filter(F.col("vec_id") % 2 == 0)
    tgt = e.filter(F.col("vec_id") % 2 == 1)
    atgt = S.ivf_assign(tgt, centroids).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").cast("array<double>").alias("tv"),
        "centroid_id",
    )
    probes = S.ivf_probe(src, centroids, nprobe=nprobe)
    # The candidate cut: equi-join on centroid_id.  Neither side is
    # broadcast — both are corpus-sized halves; the join shuffles on
    # the bucket key only.
    return probes.join(atgt, "centroid_id").select(
        F.col("q_id").alias("src_id"),
        "tgt_id",
        F.floor(dot(F.col("q_vec"), F.col("tv")) * F.lit(1000000000.0))
        .cast("long")
        .alias("qdot"),
    )


def margin_mine(pairs, k: int):
    """Mutual-kNN + ratio-margin tail over a (src_id, tgt_id, qdot)
    candidate relation — shared by the IVF miner, the trained-quantizer
    variant, and the recall audit's brute twin so the margin arithmetic
    cannot drift between them."""
    from ..caching import track_cache

    ws = Window.partitionBy("src_id").orderBy(F.col("qdot").desc(), "tgt_id")
    wt = Window.partitionBy("tgt_id").orderBy(F.col("qdot").desc(), "src_id")
    # Ranked candidates feed THREE consumers (kx, ky, mutual); Catalyst
    # does not CSE shared subtrees, so cache once (runners release it).
    r = track_cache(
        pairs.withColumn("rs", F.row_number().over(ws)).withColumn(
            "rt", F.row_number().over(wt)
        )
    )
    kx = (
        r.filter(F.col("rs") <= k)
        .groupBy("src_id")
        .agg(F.sum("qdot").cast("long").alias("sx"))
    )
    ky = (
        r.filter(F.col("rt") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("qdot").cast("long").alias("sy"))
    )
    mutual = r.filter((F.col("rs") <= k) & (F.col("rt") <= k))
    margin = (F.col("qdot") * F.lit(2 * k)) / (F.col("sx") + F.col("sy"))
    # kx/ky are one row per src_id/tgt_id — O(corpus)-sized, so no
    # broadcast hint (ADVICE r11: a forced broadcast here would exhaust
    # the driver at 100 TB).  Both join inputs are already bounded to
    # <= k rows per key; the equi-joins shuffle on the id keys and AQE
    # is free to pick broadcast when the ACTUAL size is small.
    return (
        mutual.join(kx, "src_id")
        .join(ky, "tgt_id")
        .withColumn("margin", margin)
        .filter(F.col("margin") > 1.0)
        .select("src_id", "tgt_id", "qdot", "margin")
    )


def mine_bitext_ivf(e, n_cent: int, nprobe: int, k: int, centroids=None):
    """IVF-candidate margin miner over an embeddings frame (vec_id,
    embedding).  Parameterized so the soak can hold bucket occupancy
    constant (C grown with the corpus) while the catalog entry pins
    C=8/nprobe=2 for the oracle replay; ``centroids`` routes mining
    through an external (e.g. trained) quantizer."""
    pairs = ivf_candidate_pairs(e, n_cent=n_cent, nprobe=nprobe, centroids=centroids)
    return margin_mine(pairs, k)


# ===========================================================================
# Keep-best over LSH candidates (the production keep-best)
# ===========================================================================

# Same distinct-vocab quality score as dup_cluster_keep_best
# (round10b._SQL_TOKS has list_distinct inside).
_Q_TOKS = (
    "CASE WHEN trim(lower(coalesce(text, ''))) = '' THEN []::VARCHAR[] "
    "ELSE list_distinct(string_split_regex(trim(lower(coalesce(text, ''))), "
    "'\\s+')) END"
)

# The closure runs on the REP graph only (near edges).  Star members
# inherit their rep's component through one join: rep = cluster MIN by
# construction (operators/dedup.py:lsh_dedup_edges), so min-doc-id
# reachable == min REP id in the rep-component — the same label the
# full-graph closure yields.  This is what keeps the oracle feasible
# on verbatim-duplicated corpora: a naive (id, reach) transitive-
# closure walk is sum-of-cluster^2 rows and OOM'd DuckDB at sf1
# (duplication multiplies cluster sizes), while the rep graph does
# not grow with duplication at all.
_KEEP_BEST_LSH_ORACLE = (
    _SIG_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + D.sql_lsh_star_edges(LSH_K, LSH_BANDS, LSH_CAP, LSH_THRESH)
    + f""",
    sym AS (SELECT src_id AS u, dst_id AS v FROM edges WHERE kind = 'near'
            UNION
            SELECT dst_id, src_id FROM edges WHERE kind = 'near'),
    nodes AS (SELECT DISTINCT u AS id FROM sym),
    walk AS (
      SELECT id, id AS reach FROM nodes
      UNION
      SELECT w.id, s.v AS reach FROM walk w JOIN sym s ON s.u = w.reach
    ),
    comp_rep AS (SELECT id, min(reach) AS component FROM walk GROUP BY id),
    rep_of AS (SELECT dst_id AS doc_id, src_id AS rep
               FROM edges WHERE kind = 'exact'),
    q AS (SELECT doc_id, len({_Q_TOKS})::BIGINT AS quality FROM documents),
    memb AS (
      SELECT q.doc_id, q.quality,
             coalesce(cr.component, r.rep, cr2.component, q.doc_id) AS component
      FROM q
      LEFT JOIN rep_of r ON r.doc_id = q.doc_id
      LEFT JOIN comp_rep cr ON cr.id = r.rep
      LEFT JOIN comp_rep cr2 ON cr2.id = q.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
          PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
      FROM memb
    )
    SELECT component,
           count(*)::BIGINT AS n_members,
           max(CASE WHEN rn = 1 THEN doc_id END)::BIGINT AS kept_doc_id,
           max(CASE WHEN rn = 1 THEN quality END)::BIGINT AS kept_quality
    FROM ranked
    GROUP BY component
"""
)


@register(
    "dup_cluster_keep_best_lsh",
    _KEEP_BEST_LSH_ORACLE,
    survey_ids=(),
    doc="Cluster-representative selection over the PRODUCTION candidate "
    "generator — the round-10 verdict's item 4: dup_cluster_keep_best "
    "builds clusters from a windowed Jaccard self-join bounded to "
    "doc_id<200 (the oracle's recursive-CTE budget); this twin "
    "consumes lsh_dup_star_edges' banded MinHash candidates at FULL "
    "corpus width (identical-signature clusters collapse to rep->" 
    "member star edges, near edges only between verified rep pairs), "
    "runs the same min-label closure (operators/clusters.py — "
    "per-round keyed shuffles on the edge vocabulary only), and keeps "
    "the highest-quality member per component with ONE map-side-"
    "combinable argmax: max(struct(quality, -doc_id)).  Scale shape: "
    "no pair relation ever exceeds the banded candidate set (collapse-"
    "first, bucket-capped — the lsh_near_dup discipline), the closure "
    "shuffles ids only, and the keep decision adds a single keyed agg "
    "over (doc_id, quality) — at 100 TB the corpus text is touched "
    "once for signatures + once for the quality score, never joined "
    "on volume.  Oracle replays the same star edges then closes over "
    "them with a recursive CTE.",
)
def q_dup_cluster_keep_best_lsh(spark, sf_dir):
    from ..operators.clusters import connected_components

    d = load(spark, sf_dir, "documents")
    sig = D.minhash_signature(d.select("doc_id", "text"), "text", k=LSH_K).drop(
        "text"
    )
    edges = D.lsh_dedup_edges(
        sig,
        "doc_id",
        k=LSH_K,
        bands=LSH_BANDS,
        max_bucket=LSH_CAP,
        verify_min=LSH_THRESH,
    ).localCheckpoint(eager=True)  # near + exact both consumed below
    # Close over the REP graph only: star members inherit their rep's
    # component (rep == cluster MIN, so the label is identical to the
    # full-graph closure) — the propagation loop never touches the
    # duplicated mass, only distinct-signature reps.
    near = edges.filter(F.col("kind") == "near")
    comps = connected_components(near, src="src_id", dst="dst_id")
    rep_of = edges.filter(F.col("kind") == "exact").select(
        F.col("dst_id").alias("m_doc"), F.col("src_id").alias("rep")
    )
    quality = d.select(
        "doc_id",
        F.size(
            F.array_distinct(tokens(F.lower(F.coalesce(F.col("text"), F.lit("")))))
        )
        .cast("long")
        .alias("quality"),
    )
    cr = comps.select(F.col("id").alias("cr_id"), F.col("component").alias("cr_c"))
    cr2 = comps.select(F.col("id").alias("cr2_id"), F.col("component").alias("cr2_c"))
    memb = (
        quality.join(rep_of, quality.doc_id == rep_of.m_doc, "left")
        .join(cr, F.col("rep") == F.col("cr_id"), "left")
        .join(cr2, quality.doc_id == F.col("cr2_id"), "left")
        .select(
            "doc_id",
            "quality",
            F.coalesce("cr_c", "rep", "cr2_c", "doc_id").alias("component"),
        )
    )
    best = F.max(
        F.struct(F.col("quality"), (-F.col("doc_id")).alias("neg_id"))
    ).alias("best")
    return (
        memb.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"), best)
        .select(
            "component",
            "n_members",
            (-F.col("best.neg_id")).cast("long").alias("kept_doc_id"),
            F.col("best.quality").cast("long").alias("kept_quality"),
        )
    )


# ===========================================================================
# sf10 bounded-slice twins (round-10 verdict item 2)
# ===========================================================================

# The two families whose FULL oracles are resource-infeasible at sf10
# (PARITY_r10_sf10: electricity_15min's per-minute explode CTE spills
# ~70 GB; snm_near_dup's pair CTEs exhaust the 24 GB cap on the
# 100x-verbatim corpus) get value-checked slice twins: the SAME engine
# plan over a deterministic, semantics-preserving subset, with the
# oracle bounding itself BEFORE its expensive materialization.  These
# run at every scale (they are ordinary catalog entries), so the sf10
# record can show the family value-checked instead of engine-only.

_ELEC_SLICE_MOD = 50
_ELEC_SLICE_REM = 7

from .catalog import _electricity_oracle, electricity_15min_frame  # noqa: E402


@register(
    "electricity_15min_userslice",
    _electricity_oracle(
        source=(
            "(SELECT * FROM events "
            f"WHERE user_id % {_ELEC_SLICE_MOD} = {_ELEC_SLICE_REM})"
        )
    ),
    survey_ids=(),
    doc="electricity_15min's sf10 value-check twin: the identical "
    "15-min usage chain over the deterministic 1/50 METER slice "
    "(user_id % 50 = 7).  Meters are the series key — every window, "
    "gap cap and bucket in the chain partitions by user_id — so a "
    "whole-meter slice is exact, not approximate: each kept meter's "
    "output rows are bit-identical to its rows in the full run.  The "
    "oracle applies the same predicate INSIDE its source, before the "
    "per-minute explode, so its temp stays ~1/50 of the full run's "
    "(the full explode spilled ~70 GB at sf10 and died on disk).  "
    "The slice predicate reaches the parquet scan as a pushed filter "
    "on both engines.",
)
def q_electricity_15min_userslice(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id") % _ELEC_SLICE_MOD == _ELEC_SLICE_REM
    )
    return electricity_15min_frame(ev)


_SNM_SLICE_MOD = 8

from .advanced import _snm_oracle, snm_near_dup_frame  # noqa: E402


@register(
    "snm_near_dup_blockslice",
    _snm_oracle(slice_mod=_SNM_SLICE_MOD),
    survey_ids=(),
    doc="snm_near_dup's sf10 value-check twin: the identical sorted-"
    "neighborhood chain over the ~1/8 of coarse BLOCKS whose "
    "md5(block-key) % 8 == 0.  Blocks (6-char sort-key prefixes) are "
    "the partition key of every window in the chain — run cap, "
    "neighbor leads — so whole-block slicing is exact: every kept "
    "block's pairs are bit-identical to the full run's.  The oracle "
    "filters blocks BEFORE its pair CTEs, cutting the intermediate "
    "the 100x-verbatim sf10 corpus used to OOM (24 GB cap) by the "
    "slice factor.  The block hash is the portable md5_long pair, so "
    "both engines select the same blocks.",
)
def q_snm_near_dup_blockslice(spark, sf_dir):
    return snm_near_dup_frame(
        load(spark, sf_dir, "documents"), slice_mod=_SNM_SLICE_MOD
    )


# ===========================================================================
# JPEG decode under the value gate (round-10 verdict item 5)
# ===========================================================================

_JPEG_DV = (
    "least(greatest(2 * (CASE WHEN a >= 0 THEN (a + 1) // 2 "
    "ELSE -((-a + 1) // 2) END) + 128, 0), 255)"
)

_MEDIA_JPEG_ORACLE = f"""
    WITH g AS (
      SELECT doc_id,
             16 + 8 * (doc_id % 3) AS w,
             8 + 8 * (doc_id % 2) AS h
      FROM documents
    ),
    bx AS (SELECT doc_id, w, h,
                  unnest(generate_series(0, w // 8 - 1)) AS bx FROM g),
    bxy AS (SELECT doc_id, w, h, bx,
                   unnest(generate_series(0, h // 8 - 1)) AS by FROM bx),
    d AS (
      SELECT doc_id, w, h, {_JPEG_DV} AS dv
      FROM (SELECT doc_id, w, h,
                   ((doc_id * 31 + bx * 7 + by * 13) % 256) - 128 AS a
            FROM bxy)
    )
    SELECT doc_id AS media_id,
           'jpeg' AS decoder,
           w::INT AS width,
           h::INT AS height,
           floor((sum(dv) * 64)::DOUBLE / (w * h) / 255.0 * 1000000)
               / 1000000 AS mean_r
    FROM d GROUP BY doc_id, w, h
"""


@register(
    "media_decode_jpeg",
    _MEDIA_JPEG_ORACLE,
    survey_ids=(),
    doc="Real baseline-JPEG decode at the engine surface — the last "
    "codec stub closed: one grayscale JPEG per document (stdlib "
    "encoder, Annex K tables, deterministic from doc_id), decoded by "
    "operators/codecs.parse_jpeg — a real marker walk, canonical "
    "Huffman decode with byte-unstuffing, dequantize + dezigzag, "
    "float IDCT, clamp — through the Arrow-batched decode_media "
    "chain.  The oracle replays the decode CLOSED-FORM: blobs are "
    "constant per 8x8 block, so the only nonzero coefficient is the "
    "DC, whose quantize (PORTABLE away-from-zero _div_round, step 16) "
    "-> dequantize -> DC-only IDCT collapses to integer arithmetic "
    "v' = clamp(2 * div_round(v-128, 2) + 128) — exact in both "
    "engines, while the engine side still runs the full entropy/IDCT "
    "machinery (the AC path, non-8-multiple dims, color transform, "
    "DRI/RST restart intervals, 4:2:0 chroma subsampling, and "
    "truncation handling are pinned by tests/test_round11.py + "
    "test_round12.py golden/round-trip constants — AC output is "
    "cosine-basis floats no SQL engine replays bit-exactly, honestly "
    "out of the gate's scope; progressive SOF2 remains header-only, "
    "the one remaining codec asterisk).  "
    "Scale shape: per-row mapInPandas, partition-preserving, no "
    "shuffle before the final projection.",
)
def q_media_decode_jpeg(spark, sf_dir):
    from ..operators import codecs
    from ..operators.multimodal import decode_media

    d = load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for i in batch["doc_id"]:
                i = int(i)
                w, h = 16 + 8 * (i % 3), 8 + 8 * (i % 2)
                raw = codecs.make_jpeg(
                    w,
                    h,
                    lambda x, y, i=i: (i * 31 + (x // 8) * 7 + (y // 8) * 13) % 256,
                )
                rows.append({"media_id": i, "content": raw})
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = d.mapInPandas(gen, "media_id long, content binary")
    out = decode_media(media)
    return out.select(
        "media_id",
        "decoder",
        "width",
        "height",
        (
            F.floor(F.element_at("features", 1) * F.lit(1000000.0)) / F.lit(1000000.0)
        ).alias("mean_r"),
    )
