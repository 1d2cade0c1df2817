"""Training-data-pipeline queries: dedup, similarity search, text
analysis over the ``documents`` and ``embeddings`` tables.

Registered into the same REGISTRY as the relational catalog.  Hashing
is md5-based (bit-identical across engines); dot products are
sequential folds in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import md5_long, tokens
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text_analysis as TA
from .catalog import load, register

TOKS = TA.sql_tokens("lower(text)")


@register(
    "doc_token_stats",
    f"""
    SELECT doc_id, {TA.sql_token_count('text')} AS n_tokens,
           {TA.sql_mean_token_len('text')} AS mean_token_len,
           length(text)::BIGINT AS n_chars_actual
    FROM documents
    """,
    survey_ids=("G2", "G3"),
    doc="Token counting (whitespace tokenizer) + mean token length.",
)
def q_doc_token_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TA.token_count(t).alias("n_tokens"),
        TA.mean_token_len(t).alias("mean_token_len"),
        F.length(t).cast("long").alias("n_chars_actual"),
    )


@register(
    "doc_quality",
    f"""
    SELECT doc_id, {TA.sql_stopword_ratio('text')} AS stopword_ratio,
           {TA.sql_punct_ratio('text')} AS punct_ratio,
           {TA.sql_quality_score('text')} AS quality_score
    FROM documents
    """,
    survey_ids=(),
    doc="Quality scoring: length/punct/stopword ratios -> composite score.",
)
def q_doc_quality(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TA.stopword_ratio(t).alias("stopword_ratio"),
        TA.punct_ratio(t).alias("punct_ratio"),
        TA.quality_score(t).alias("quality_score"),
    )


@register(
    "doc_lang_id",
    f"""
    SELECT doc_id, {TA.sql_predict_lang('text')} AS predicted_lang, lang AS labeled_lang,
           {TA.sql_marker_hits('text', TA.LANG_MARKERS['en'])} AS en_hits
    FROM documents
    """,
    survey_ids=(),
    doc="Language ID via marker-stopword heuristic (deterministic argmax).",
)
def q_doc_lang_id(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TA.predict_lang(t).alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
        TA.marker_hits(t, TA.LANG_MARKERS["en"]).alias("en_hits"),
    )


@register(
    "doc_fingerprint",
    f"SELECT doc_id, {TA.sql_fingerprint('text')} AS fp FROM documents",
    survey_ids=("A7",),
    doc="Document fingerprint: md5 of whitespace-normalized lowercase text.",
)
def q_doc_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TA.fingerprint(F.col("text")).alias("fp"))


@register(
    "exact_dedup",
    f"""
    SELECT {TA.sql_fingerprint('text')} AS fp, count(*) AS n_docs,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY fp
    """,
    survey_ids=("A6", "A7"),
    doc="Exact dedup: hash-groupBy on fingerprint, keep min doc_id.",
)
def q_exact_dedup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", TA.fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


@register(
    "minhash_signature",
    "SELECT doc_id, "
    + ", ".join(f"{D.sql_minhash(TOKS, i)} AS mh{i}" for i in range(4))
    + " FROM documents",
    survey_ids=(),
    doc="MinHash signatures (4 salted md5-min hashes over the token set).",
)
def q_minhash_signature(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    return d.select(
        "doc_id", *[D.minhash_expr(toks, i).alias(f"mh{i}") for i in range(4)]
    )


@register(
    "simhash",
    f"SELECT doc_id, {D.sql_simhash(TOKS, 16)} AS simhash FROM documents",
    survey_ids=(),
    doc="SimHash (16-bit, frequency-weighted bitwise majority).",
)
def q_simhash(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    return d.select("doc_id", D.simhash_exprs(toks, 16).alias("simhash"))


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH t AS (SELECT doc_id, source, {TOKS} AS toks FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           {D.sql_jaccard('a.toks', 'b.toks')} AS jaccard
    FROM t a JOIN t b
      ON a.source = b.source AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 40
    """,
    survey_ids=("J1",),
    doc="Token-set Jaccard over bounded candidate pairs (near-dup verify).",
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", tokens(F.lower(F.col("text"))).alias("toks"))
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= 40),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            D.jaccard_exprs(F.col("a.toks"), F.col("b.toks")).alias("jaccard"),
        )
    )


_SIG_MATCHES = " + ".join(
    f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(8)
)


@register(
    "lsh_near_dup",
    "WITH sig AS (SELECT doc_id, "
    + ", ".join(f"{D.sql_minhash(TOKS, i)} AS mh{i}" for i in range(8))
    + """ FROM documents),
    banded AS (
      SELECT doc_id, 0 AS band_id,
             mh0::VARCHAR || '_' || mh1::VARCHAR || '_' || mh2::VARCHAR || '_' || mh3::VARCHAR AS band_key
      FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band_id,
             mh4::VARCHAR || '_' || mh5::VARCHAR || '_' || mh6::VARCHAR || '_' || mh7::VARCHAR AS band_key
      FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, ("""
    + _SIG_MATCHES
    + """)::BIGINT AS sig_matches
    FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id
    WHERE """
    + _SIG_MATCHES
    + " >= 6",
    survey_ids=(),
    doc="MinHash-LSH near-dup: 8 hashes, 2 bands of 4 generate candidates "
    "(shingle->minhash->band->bucket-join); the full signature then "
    "estimates Jaccard and pairs with <6/8 agreement are dropped.",
)
def q_lsh_near_dup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # The signature frame feeds THREE plan branches (banding + both
    # sides of the verify join); cache it so the md5 minhash work runs
    # once, not three times (~1.6x end-to-end).  At 100 TB signatures
    # would be persisted as a table between the stages.
    sig = D.minhash_signature(d.select("doc_id", "text"), "text", k=8).drop("text").cache()
    pairs = D.lsh_candidate_pairs(sig, "doc_id", k=8, bands=2)
    sa = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)]
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(8)
    )
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn("sig_matches", matches.cast("long"))
        .filter(F.col("sig_matches") >= 6)
        .select("id_a", "id_b", "sig_matches")
    )


# ===========================================================================
# Embedding similarity
# ===========================================================================


@register(
    "embed_knn",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings)
    SELECT q_id, neighbor_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY list_dot_product(q_vec, c_vec) DESC, neighbor_id)::BIGINT AS rank,
           list_dot_product(q_vec, c_vec) AS score
    FROM q JOIN c ON q_id <> neighbor_id
    QUALIFY rank <= 5
    """,
    survey_ids=(),
    doc="Brute-force cosine top-k ANN baseline (unit-norm vectors: "
    "cosine == dot).  Broadcast queries, map-side fold dot product.",
)
def q_embed_knn(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    out = S.brute_force_topk(
        e.filter(F.col("vec_id") < 5), e, id_col="vec_id", vec_col="embedding", k=5
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "embed_centroid",
    """
    SELECT label, i::BIGINT AS pos,
           sum(floor(embedding[i]::DOUBLE * 1000000000)::BIGINT)::DOUBLE
             / count(*) / 1000000000 AS mean_component
    FROM embeddings, generate_series(1, 64) t(i)
    GROUP BY label, pos
    """,
    survey_ids=("A1",),
    doc="Per-label centroid.  Components are quantized to 1e-9 via floor "
    "(bit-deterministic on identical doubles, unlike decimal-cast "
    "rounding) so the mean is an exact integer sum in both engines.",
)
def q_embed_centroid(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = F.floor(F.col("col") * F.lit(1000000000.0)).cast("long")
    return (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(q).cast("double") / F.count(F.lit(1)) / F.lit(1000000000.0)
            ).alias("mean_component")
        )
    )


@register(
    "embed_ivf_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
    assigned AS (
      SELECT e.vec_id, e.v, c.centroid_id,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY list_dot_product(e.v, c.cv) DESC, c.centroid_id) AS rn
      FROM e CROSS JOIN cent c
    ), amap AS (SELECT vec_id, v, centroid_id FROM assigned WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
    probes AS (
      SELECT q.q_id, q.qv, c.centroid_id,
             row_number() OVER (PARTITION BY q.q_id
                                ORDER BY list_dot_product(q.qv, c.cv) DESC, c.centroid_id) AS rn
      FROM q CROSS JOIN cent c
    ), probed AS (SELECT q_id, qv, centroid_id FROM probes WHERE rn <= 2),
    cand AS (
      SELECT p.q_id, a.vec_id AS neighbor_id, list_dot_product(p.qv, a.v) AS score
      FROM probed p JOIN amap a ON p.centroid_id = a.centroid_id
      WHERE a.vec_id <> p.q_id
    )
    SELECT q_id, neighbor_id,
           row_number() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id)::BIGINT AS rank,
           score
    FROM cand QUALIFY rank <= 5
    """,
    survey_ids=(),
    doc="IVF-bucketed ANN (scale path): deterministic argmax assignment "
    "to the nearest of 8 coarse centroids, probe the 2 closest buckets "
    "per query, exact top-k within.  The oracle replays the same "
    "deterministic pruning, so the check is exact despite IVF being a "
    "physical strategy.",
)
def q_embed_ivf_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    centroids = (
        e.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    assigned = S.ivf_assign(e, centroids)
    queries = e.filter(F.col("vec_id") < 5)
    out = S.ivf_topk(queries, assigned, centroids, k=5, nprobe=2)
    return out.withColumn("rank", F.col("rank").cast("long"))
