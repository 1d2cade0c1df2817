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
from .catalog import load, register, trained_ivf_centroids

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
    # Materialize the token array ONCE; n_tokens and mean_token_len then
    # read the array column instead of each re-splitting the text
    # (CollapseProject keeps the split un-inlined because the alias is
    # referenced more than once and is non-cheap).
    d = d.select("doc_id", t, tokens(t).alias("__tk"))
    n = F.size("__tk")
    total = F.aggregate(
        F.transform(F.col("__tk"), F.length), F.lit(0), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(n > 0, total.cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("mean_token_len"),
        F.length(F.col("text")).cast("long").alias("n_chars_actual"),
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
    # Round-1 bench hot spot (4.4x DuckDB): stopword_ratio/token_count/
    # quality_score each re-split the text, ~5 splits + filters per row.
    # Fuse: materialize the raw-token and lowered-token arrays once,
    # compute the three base metrics in a middle projection, and build
    # the composite score from the NAMED columns so every value is
    # bit-identical to the unfused expressions (same double arithmetic,
    # same order) while each split/filter runs exactly once.
    d = d.select(
        "doc_id", t, tokens(t).alias("__tk"), tokens(F.lower(t)).alias("__tkl")
    )
    n = F.size("__tk").cast("long")
    stop_arr = F.array(*[F.lit(m) for m in TA.STOPWORDS])
    hits = F.size(
        F.filter(F.col("__tkl"), lambda x: F.array_contains(stop_arr, x))
    ).cast("long")
    d = d.select(
        "doc_id",
        F.when(n > 0, hits.cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
        TA.punct_ratio(F.col("text")).alias("punct_ratio"),
        n.alias("__n_tokens"),
    )
    return d.select(
        "doc_id",
        "stopword_ratio",
        "punct_ratio",
        (
            F.lit(0.5) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
            + F.lit(0.3)
            * F.least(F.col("__n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
            + F.lit(0.2) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 10, F.lit(1.0)))
        ).alias("quality_score"),
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
    # Fused variant of predict_lang: the unfused expression re-splits
    # lower(text) ~9 times (4 marker lists x 2 references + en_hits).
    # Materialize the lowered token array once, score each language as
    # a named column, then argmax over the columns — identical values,
    # one split + 4 filters per row.
    d = d.select("doc_id", t, "lang", tokens(F.lower(t)).alias("__tkl"))
    def _hits(markers):
        # arity matters: F.filter treats a 2-arg lambda as (element,
        # index), so the marker array must be closure-captured.
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(F.col("__tkl"), lambda x: F.array_contains(arr, x)))

    score_cols = {
        lang_key: _hits(markers).cast("long")
        for lang_key, markers in TA.LANG_MARKERS.items()
    }
    d = d.select(
        "doc_id",
        F.col("text"),
        "lang",
        *[c.alias(f"__s_{k}") for k, c in score_cols.items()],
    )
    s = {k: F.col(f"__s_{k}") for k in TA.LANG_MARKERS}
    best = F.greatest(*s.values())
    expr = F.when(F.col("text").rlike(TA.CJK_PATTERN), F.lit("zh")).when(
        best == 0, F.lit("und")
    )
    for lang_key in ("en", "de", "es", "fr"):
        expr = expr.when(s[lang_key] == best, F.lit(lang_key))
    return d.select(
        "doc_id",
        expr.alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
        s["en"].alias("en_hits"),
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
    # widen=False: one cheap fingerprint per row then a keyed agg — the
    # exchange doubles the wall (measured x0.51 at sf0.1, 0.22 -> 0.43 s).
    d = load(spark, sf_dir, "documents", widen=False)
    return (
        d.withColumn("fp", TA.fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


@register(
    "minhash_signature",
    f"WITH h AS (SELECT doc_id, {D.sql_minhash_pairs(TOKS)} AS hs FROM documents)\n"
    "SELECT doc_id, "
    + ", ".join(f"{D.sql_minhash_from_pairs('hs', i)} AS mh{i}" for i in range(4))
    + " FROM h",
    survey_ids=(),
    doc="MinHash signatures: ONE md5 per distinct token yields (h1,h2); "
    "salt i's hash is the integer mix h1 + i*h2 (double-hashing "
    "family), so signature width is nearly free.  Round 1 paid one "
    "md5-of-concat per token PER SALT (5.1x DuckDB).",
)
def q_minhash_signature(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return D.minhash_signature(d.select("doc_id", "text"), "text", k=4).drop("text")


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


# LSH tuning (round-2 re-tune after the 4.6M-pairs-from-5k-docs blowup):
# 16 hashes in 4 bands of 4 (vs 8/2) halves per-band collision odds and
# quadruples the OR-recall paths; the hot-bucket cap kills the
# quadratic buckets outright.  Verify threshold stays at 0.75
# estimated Jaccard (12/16, was 6/8).
LSH_K, LSH_BANDS, LSH_ROWS, LSH_CAP, LSH_THRESH = 16, 4, 4, 64, 12

_SIG_MATCHES = " + ".join(
    f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(LSH_K)
)

_BANDED_SQL = D.sql_lsh_banded(LSH_K, LSH_BANDS)


@register(
    "lsh_near_dup",
    f"WITH h AS (SELECT doc_id, {D.sql_minhash_pairs(TOKS)} AS hs FROM documents),\n"
    "    sig AS (SELECT doc_id, "
    + ", ".join(f"{D.sql_minhash_from_pairs('hs', i)} AS mh{i}" for i in range(LSH_K))
    + " FROM h),"
    + D.sql_lsh_candidates(LSH_K, LSH_BANDS, LSH_CAP, LSH_THRESH)
    + f"""
    SELECT id_a, id_b, ({_SIG_MATCHES})::BIGINT AS sig_matches
    FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id
    WHERE {_SIG_MATCHES} >= {LSH_THRESH}""",
    survey_ids=(),
    doc=f"MinHash-LSH near-dup: {LSH_K} hashes, {LSH_BANDS} bands of {LSH_ROWS} "
    "generate candidates (shingle->minhash->band->bucket-join), "
    "COLLAPSE-FIRST (round-8 fix for the recall collapse the round-7 "
    "drop-the-bucket cap measured: 0.45% vs 90.8% uncapped on "
    "lsh_recall_audit): identical signatures collapse to one "
    "representative before banding, a band bucket of distinct "
    f"signatures over {LSH_CAP} members recursively splits on further "
    "signature positions, verified rep-pairs expand back to member "
    "pairs, and identical-signature clusters emit their (true, "
    "output-bound) all-pairs once.  The full signature estimates "
    f"Jaccard; pairs under {LSH_THRESH}/{LSH_K} agreement are dropped "
    "BEFORE expansion (verify_min), so a false rep-pair between two "
    "big clusters never fans out.",
)
def q_lsh_near_dup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # Single-pass plan: sig_matches is computed from the band-shuffled
    # signature array itself (emit_sig_matches) — no second join back
    # to the signature table and no 2k-wide carry.  The earlier design
    # broadcast both sides of a verify join; a signature table is
    # corpus-cardinality (one row per document), so at 100 TB that
    # broadcast OOMs every executor.
    sig = D.minhash_signature(d.select("doc_id", "text"), "text", k=LSH_K).drop("text")
    pairs = D.lsh_candidate_pairs(
        sig,
        "doc_id",
        k=LSH_K,
        bands=LSH_BANDS,
        max_bucket=LSH_CAP,
        emit_sig_matches=True,
        verify_min=LSH_THRESH,
    )
    return pairs.filter(F.col("sig_matches") >= LSH_THRESH).select(
        "id_a", "id_b", "sig_matches"
    )


# ===========================================================================
# Multimodal (binary media columns)
# ===========================================================================


@register(
    "media_meta_stats",
    """
    SELECT source, count(*)::BIGINT AS n_media,
           sum(octet_length(encode(text)))::BIGINT AS total_bytes,
           max(octet_length(encode(text)))::BIGINT AS max_bytes,
           min(md5(text)) AS min_md5
    FROM documents GROUP BY source
    """,
    survey_ids=(),
    doc="Native (JVM-side) metadata over opaque binary media columns: "
    "byte length + content md5 via binary_meta, aggregated per source. "
    "Blobs are the utf-8 bytes of document text (the testdata has no "
    "binary table); DuckDB's md5(VARCHAR) hashes the same utf-8 bytes "
    "Spark's md5(BINARY) sees, so the check is exact.",
)
def q_media_meta_stats(spark, sf_dir):
    from ..operators import multimodal as MM

    d = load(spark, sf_dir, "documents")
    m = d.select(
        "source",
        MM.binary_meta(F.encode(F.col("text"), "UTF-8")).alias("bm"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("bm.n_bytes")).alias("total_bytes"),
        F.max(F.col("bm.n_bytes")).alias("max_bytes"),
        F.min(F.col("bm.content_md5")).alias("min_md5"),
    )


@register(
    "media_decode",
    # The oracle recomputes the decode CLOSED-FORM: blob content is
    # deterministic arithmetic in doc_id, so DuckDB can derive the
    # expected dims / byte size / channel mean without parsing BMP or
    # PNG — an independent check that serialize -> header parse ->
    # inflate/unfilter -> pixel walk -> feature extract round-trips
    # exactly.  Even doc_ids serialize as BMP, odd as PNG (stored-block
    # zlib, so the PNG byte size is closed-form too: 68 + h*(1+3w), see
    # codecs.make_png).  mean_r: Python's sum_r/(w*h) and the oracle's
    # rowsum/w divide different integer pairs with the same rational
    # value, so IEEE correctly-rounded division yields the identical
    # double; floor-quantization then keeps the comparison bit-exact.
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS decoder,
           (1 + doc_id % 8)::INT AS width, (1 + doc_id % 4)::INT AS height,
           CASE WHEN doc_id % 2 = 0
                THEN 54 + ((1 + doc_id % 8) * 3 + 3) // 4 * 4 * (1 + doc_id % 4)
                ELSE 68 + (1 + doc_id % 4) * (1 + 3 * (1 + doc_id % 8))
           END::BIGINT AS n_bytes,
           floor(list_sum(list_transform(range(0, (1 + doc_id % 8)::INT),
                                         x -> (x * 37 + doc_id) % 256))::DOUBLE
                 / (1 + doc_id % 8) / 255.0 * 1000000) / 1000000 AS mean_r
    FROM documents
    """,
    survey_ids=(),
    doc="Real media decode at the engine surface: synthesize one image "
    "blob per document (stdlib serializers, deterministic from doc_id; "
    "even ids BMP, odd ids PNG with a Paeth-filtered zlib stream), "
    "then decode_media parses headers + pixels — for PNG that is a "
    "real inflate + scanline unfilter — and extracts channel features "
    "via the Arrow-batched codec chain.  The stub path is never taken.",
)
def q_media_decode(spark, sf_dir):
    from ..operators import codecs
    from ..operators.multimodal import decode_media

    d = load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for i in batch["doc_id"]:
                i = int(i)
                w, h = 1 + i % 8, 1 + i % 4
                if i % 2 == 0:
                    # pixel_fn returns (b, g, r): the x-varying ramp goes
                    # in RED (last) — the oracle recomputes mean_r from it.
                    raw = codecs.make_bmp(
                        w,
                        h,
                        lambda x, y: (i % 256, (y * 53 + i) % 256, (x * 37 + i) % 256),
                    )
                else:
                    # make_png's pixel_fn is (r, g, b); same red ramp.
                    # Paeth filter so the gate exercises a non-trivial
                    # unfilter path, not just filter 0.
                    raw = codecs.make_png(
                        w,
                        h,
                        lambda x, y: ((x * 37 + i) % 256, (y * 53 + i) % 256, i % 256),
                        filter_type=4,
                    )
                rows.append({"media_id": i, "content": raw})
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = d.mapInPandas(gen, "media_id long, content binary")
    out = decode_media(media)
    return out.select(
        "media_id", "decoder", "width", "height", "n_bytes",
        (
            F.floor(F.element_at("features", 1) * F.lit(1000000.0)) / F.lit(1000000.0)
        ).alias("mean_r"),
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


@register(
    "embed_ivf_trained",
    f"""
    WITH {S.sql_ivf_train(n_centroids=8, iterations=2, dim=64)},
    amap AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.v, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_dot_product(e.v, c.cv) DESC, c.centroid_id) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
    probed AS (
      SELECT q_id, qv, centroid_id FROM (
        SELECT q.q_id, q.qv, c.centroid_id,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY list_dot_product(q.qv, c.cv) DESC, c.centroid_id) AS rn
        FROM q CROSS JOIN cent c) WHERE rn <= 2
    ),
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
    doc="IVF with TRAINED centroids: two Lloyd k-means rounds in pure "
    "DataFrame ops (broadcast-assign + posexplode/groupBy re-centroid, "
    "1e-9-quantized exact means), deterministic md5 init.  The oracle "
    "replays the whole training as a CTE chain, so even the learned "
    "centroids are cross-engine bit-identical.",
)
def q_embed_ivf_trained(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    cents = trained_ivf_centroids(spark, sf_dir, 8, 2)
    assigned = S.ivf_assign(e, cents)
    queries = e.filter(F.col("vec_id") < 5)
    out = S.ivf_topk(queries, assigned, cents, k=5, nprobe=2)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ===========================================================================
# Round-2 additions: regex (BPE-ish) tokenization, char-shingle
# fingerprints, embedding quantization.
# ===========================================================================


@register(
    "doc_regex_tokens",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\w+|[^\w\s]'))::BIGINT AS n_tokens,
           len(regexp_extract_all(text, '\w+'))::BIGINT AS n_words,
           len(list_distinct(regexp_extract_all(lower(text), '\w+')))::BIGINT AS n_distinct_words
    FROM documents
    """,
    survey_ids=("G2",),
    doc="BPE-style pre-tokenization: the GPT-2-ish regex '\\w+|[^\\w\\s]' "
    "splits words from punctuation runs (the step before BPE merges). "
    "Java and RE2 agree on this ASCII pattern class, so counts are "
    "exact across engines.  Per-row, zero shuffle.",
)
def q_doc_regex_tokens(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    full = F.regexp_extract_all(t, F.lit(r"\w+|[^\w\s]"), 0)
    words = F.regexp_extract_all(t, F.lit(r"\w+"), 0)
    lwords = F.regexp_extract_all(F.lower(t), F.lit(r"\w+"), 0)
    return d.select(
        "doc_id",
        F.size(full).cast("long").alias("n_tokens"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(lwords)).cast("long").alias("n_distinct_words"),
    )


@register(
    "doc_shingle_fp",
    r"""
    WITH n AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN length(t) >= 5
                  THEN list_transform(range(1, length(t) - 3), i -> substr(t, i::INT, 5))
                  ELSE [t] END AS sh
      FROM n
    )
    SELECT doc_id,
           len(list_distinct(sh))::BIGINT AS n_shingles,
           list_min(list_transform(list_distinct(sh),
                                   g -> ('0x' || substr(md5(g),1,15))::BIGINT)) AS shingle_fp
    FROM s
    """,
    survey_ids=("A7",),
    doc="Rolling-hash document fingerprint: character 5-gram shingles "
    "over whitespace-normalized text, min md5-derived hash over the "
    "distinct shingle set (robust to word-boundary edits that break "
    "token-level fingerprints).  Shingle explosion stays inside a "
    "per-row array — no row amplification, no shuffle.",
)
def q_doc_shingle_fp(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    d = d.select(
        "doc_id",
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias("__t"),
    )
    t = F.col("__t")
    sh = F.when(
        F.length(t) >= 5,
        F.transform(F.sequence(F.lit(1), F.length(t) - 4), lambda i: t.substr(i, F.lit(5))),
    ).otherwise(F.array(t))
    d = d.select("doc_id", F.array_distinct(sh).alias("__sh"))
    return d.select(
        "doc_id",
        F.size("__sh").cast("long").alias("n_shingles"),
        F.array_min(F.transform(F.col("__sh"), lambda g: md5_long(g))).alias("shingle_fp"),
    )


@register(
    "embed_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
    q AS (SELECT vec_id, maxabs,
                 list_transform(v, x -> floor(x * 127.0 / maxabs)::BIGINT) AS qv
          FROM m)
    SELECT vec_id,
           floor(maxabs * 1000000000)::BIGINT AS maxabs_e9,
           list_sum(qv)::BIGINT AS q_sum,
           list_min(qv)::BIGINT AS q_min,
           list_max(qv)::BIGINT AS q_max
    FROM q
    """,
    survey_ids=(),
    doc="Symmetric int8 embedding quantization (the 4x storage cut a "
    "100 TB vector corpus takes before indexing): per-vector absmax "
    "scale, floor(x*127/absmax) codes in [-128, 127].  Per-row "
    "arithmetic on the array — zero shuffle; floor makes the codes "
    "bit-deterministic (round-half ties differ across engines). "
    "Precondition: vectors are non-zero (unit-norm upstream).",
)
def q_embed_quantize(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    d = e.select("vec_id", v.alias("__v"))
    d = d.withColumn(
        "__maxabs", F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    )
    qv = F.transform(
        F.col("__v"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("__maxabs")).cast("long"),
    )
    d = d.select("vec_id", "__maxabs", qv.alias("__qv"))
    return d.select(
        "vec_id",
        F.floor(F.col("__maxabs") * F.lit(1000000000.0)).cast("long").alias("maxabs_e9"),
        F.aggregate(F.col("__qv"), F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(F.col("__qv")).alias("q_min"),
        F.array_max(F.col("__qv")).alias("q_max"),
    )


# ===========================================================================
# Fuzzy string matching (edit-distance join with candidate blocking)
# ===========================================================================

# Block-size cap for the fuzzy join (same role as lsh_candidate_pairs'
# max_bucket): a (first_token, length-bucket) block with more members
# than this is key degeneracy — near-constant strings — and is dropped
# before the self-join, bounding pair emission per block at cap^2/2
# instead of (|names|/|blocks|)^2 growing with the corpus.
_FUZZY_MAX_BLOCK = 512
_FUZZY_MAX_DIST = 2
# Length-bucket width 2 with a probe into the bucket BELOW: any pair
# within edit distance 2 differs in length by <= 2, so their width-2
# buckets differ by <= 1 and the (home, home-1) double emission
# guarantees a shared key — no recall loss from the secondary blocking.
_FUZZY_LEN_W = 2


def fuzzy_candidate_pairs(
    names: DataFrame, max_block: int | None = _FUZZY_MAX_BLOCK
) -> DataFrame:
    """Capped blocking for an edit-distance (<= 2) self-join over a
    ``name`` column: candidates must share (first token, width-2
    length bucket), with each name probing its lower neighbor bucket
    so cross-boundary pairs are kept.  Blocks larger than
    ``max_block`` are dropped entirely (count-over-window on the block
    key — shares the hash partitioning with the join that follows, so
    the cap adds no extra shuffle), exactly the
    ``lsh_candidate_pairs(max_bucket=...)`` discipline: a block that
    hot is first-token degeneracy, not typo signal, and AQE cannot
    help because it splits a partition's rows, not the quadratic pair
    emission.  Returns distinct (name_a < name_b) candidate pairs.
    """
    lb = F.expr(f"length(name) div {_FUZZY_LEN_W}")
    banded = names.select(
        "name",
        F.substring_index("name", " ", 1).alias("blk"),
        F.explode(F.array(lb, lb - 1)).alias("key"),
    )
    if max_block is not None:
        w = Window.partitionBy("blk", "key")
        banded = (
            banded.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") <= max_block)
            .drop("__n")
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )


@register(
    "fuzzy_name_match",
    f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part
               WHERE regexp_matches(p_name, '^[ -~]*$')),
    vars AS (
        SELECT DISTINCT name FROM (
            SELECT name FROM names
            UNION ALL
            SELECT substring(name, 1, length(name) - 1) FROM names
        )
    ),
    v AS (SELECT name, split_part(name, ' ', 1) AS blk,
                 length(name) // {_FUZZY_LEN_W} AS lb
          FROM vars),
    banded AS (
        SELECT name, blk, lb AS key FROM v
        UNION ALL
        SELECT name, blk, lb - 1 AS key FROM v
    ),
    capped AS (
        SELECT name, blk, key FROM (
            SELECT name, blk, key,
                   count(*) OVER (PARTITION BY blk, key) AS n
            FROM banded
        ) WHERE n <= {_FUZZY_MAX_BLOCK}
    ),
    pairs AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM capped a JOIN capped b
          ON a.blk = b.blk AND a.key = b.key AND a.name < b.name
    )
    SELECT name_a, name_b, levenshtein(name_a, name_b)::BIGINT AS dist
    FROM pairs WHERE levenshtein(name_a, name_b) <= {_FUZZY_MAX_DIST}
    """,
    survey_ids=("A7", "G5"),
    doc="Edit-distance similarity join with CAPPED candidate blocking: "
    "distinct part names plus a deterministic typo variant (last char "
    "dropped), blocked on (first token, width-2 length bucket) with a "
    "lower-neighbor probe, block size capped at "
    f"{_FUZZY_MAX_BLOCK} members, verified with levenshtein <= "
    f"{_FUZZY_MAX_DIST}.  Round-4 verdict fix: first-token-only "
    "blocking had NO cap, so each block was |names|/~90 and pair "
    "emission grew quadratically in vocabulary — the same defect the "
    "text LSH fixed in round 1.  The secondary length bucket cuts "
    "block size ~10x with ZERO recall loss (dist <= 2 bounds the "
    "length gap at 2, within one width-2 bucket step, covered by the "
    "home+probe double emission — the oracle mirrors both), and the "
    "window-count cap bounds any residual hot block.  Scale "
    "discipline: the pairwise stage runs on the distinct-NAME domain "
    "(vocabulary-bounded), never the row domain.  levenshtein is "
    "engine-identical ONLY on single-byte text (DuckDB counts bytes, "
    "Spark codepoints), so the domain is explicitly restricted to "
    "printable ASCII in both engines and the oracle stays exact.",
)
def q_fuzzy_name_match(spark, sf_dir):
    # Domain restricted to printable-ASCII names: DuckDB's levenshtein
    # counts BYTES, Spark's counts codepoints — identical only on
    # single-byte text (a no-op on TPC-H names, a contract elsewhere).
    names = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike("^[ -~]*$"))
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    variants = names.union(
        names.select(F.expr("substring(name, 1, length(name) - 1)").alias("name"))
    ).distinct()
    return (
        fuzzy_candidate_pairs(variants)
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist")
    )


# ===========================================================================
# Embedding near-dup via random-hyperplane LSH (vector SimHash)
# ===========================================================================

# 24 deterministic integer hyperplanes over the first 32 dims, banded
# 2 x 12 bits.  Sign bits are computed in EXACT integer arithmetic
# (embedding components floor-quantized to 2^20, plane components in
# [-8, 8] from md5), so the signature — unlike a float dot-product
# sign — cannot flip between engines on a last-ulp difference.
_EMB_BITS, _EMB_BANDS, _EMB_DIMS, _EMB_Q = 24, 2, 32, 1048576.0
_EMB_ROWS = _EMB_BITS // _EMB_BANDS


def _emb_plane(j: int) -> list[int]:
    import hashlib

    return [
        (int(hashlib.md5(f"plane_{j}_{i}".encode()).hexdigest()[:15], 16) % 17) - 8
        for i in range(_EMB_DIMS)
    ]


_EMB_PLANES = [_emb_plane(j) for j in range(_EMB_BITS)]


def _emb_band_sql(b: int) -> str:
    terms = []
    for t in range(_EMB_ROWS):
        p = "[" + ",".join(map(str, _EMB_PLANES[_EMB_ROWS * b + t])) + "]"
        terms.append(
            f"CASE WHEN list_sum(list_transform(qv, (x,i) -> x * {p}[i])) > 0 "
            f"THEN {1 << t} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


@register(
    "embed_lsh_near_dup",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
               WHERE len(list_filter(embedding, x -> x <> 0)) > 0),
    q AS (SELECT vec_id, emb,
                 list_transform((emb)[1:{_EMB_DIMS}],
                                x -> floor(x * {_EMB_Q})::BIGINT) AS qv
          FROM e),
    sig AS (SELECT vec_id, emb, {_emb_band_sql(0)} AS b0, {_emb_band_sql(1)} AS b1
            FROM q),
    banded AS (
        SELECT vec_id, emb, 0 AS band_id, b0 AS band_key FROM sig
        UNION ALL
        SELECT vec_id, emb, 1 AS band_id, b1 AS band_key FROM sig)
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           floor({S.sql_cosine('a.emb', 'b.emb')} * 1000000.0)::BIGINT AS cos_e6,
           (floor({S.sql_cosine('a.emb', 'b.emb')} * 1000000.0) >= 250000) AS is_near
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.vec_id < b.vec_id
    """,
    survey_ids=(),
    doc="Vector near-dup via random-hyperplane LSH (the dedup-oriented "
    "ANN path, complementing brute-force kNN and IVF): 24 sign bits "
    "from integer-exact quantized dot products against md5-derived "
    "hyperplanes, banded 2x12 so only bucket-mates pair (candidate "
    "rate ~2/4096 of all pairs); full-precision cosine then scores "
    "each candidate.  Same single-join shape as lsh_near_dup: the "
    "embedding rides THROUGH the band join, no second join and no "
    "corpus-side broadcast.  Integer sign bits make the bucketing "
    "bit-portable; the cosine fold matches DuckDB evaluation order.  "
    "Zero-norm vectors are excluded up front (NaN cosine casts "
    "differently per engine and means nothing).",
)
def q_embed_lsh_near_dup(spark, sf_dir):
    # Zero vectors are excluded in BOTH engines: their cosine is 0/0,
    # where Spark's floor(NaN)::long yields 0 but DuckDB's cast raises
    # — and a NaN "similarity" is meaningless anyway.  The exists()
    # predicate is exact (no float accumulation).
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.exists("embedding", lambda x: x != 0.0))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    q = e.withColumn(
        "__qv",
        F.transform(
            F.slice("emb", 1, _EMB_DIMS),
            lambda x: F.floor(x * F.lit(_EMB_Q)).cast("long"),
        ),
    )

    def _mul(plane):
        # Closure factory: a default-arg lambda would change the
        # introspected arity (F.transform treats 2 params as
        # (element, index)); the plane must be captured by closure.
        return lambda x, i: x * F.element_at(plane, i + 1)

    def _band(b: int):
        val = F.lit(0)
        for t in range(_EMB_ROWS):
            plane = F.array(*[F.lit(p) for p in _EMB_PLANES[_EMB_ROWS * b + t]])
            s = F.aggregate(
                F.transform(F.col("__qv"), _mul(plane)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            val = val + F.when(s > 0, F.lit(1 << t)).otherwise(F.lit(0))
        return val

    banded = q.select(
        "vec_id",
        "emb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"), _band(b).alias("band_key")
                    )
                    for b in range(_EMB_BANDS)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "emb", "band.band_id", "band.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    cos_e6 = F.floor(
        S.cosine(F.col("a.emb"), F.col("b.emb")) * F.lit(1000000.0)
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos_e6.alias("cos_e6"),
            (cos_e6 >= F.lit(250000)).alias("is_near"),
        )
        .distinct()
    )


# ===========================================================================
# BM25 lexical retrieval (search-side twin of the embedding ANN path)
# ===========================================================================

# Query terms are a fixed constant set (in production they arrive as a
# parameter; the plan is identical — per-term tf columns are generated
# from the parsed query).  k1/b are the standard BM25 defaults.  The
# idf is Robertson's RATIONAL form (N - df + 0.5)/(df + 0.5) WITHOUT
# the log: ln() is not bit-portable across engines (last-ulp differs),
# while +,-,*,/ on doubles are IEEE-exact everywhere, so the rational
# variant keeps the oracle hash-exact.  Monotonicity in df is the same
# (log is monotone), so per-term ranking behavior is preserved; the
# cross-term mixing differs from textbook BM25 and is documented as
# this engine's scoring variant.
_BM25_TERMS = ("hash", "join", "spark")
_BM25_TOP = 20


def _bm25_term_sql(t: str) -> str:
    """DuckDB: per-term score given tf_<t>, dl, and the stats columns.

    Every float literal is e-notation: DuckDB parses plain decimals as
    DECIMAL, which double-rounds differently from a DOUBLE literal.
    (1-b) is pre-folded to 2.5e-1 so both engines add the same
    constants in the same order."""
    tf = f"cast(tf_{t} as double)"
    idf = f"((cast(n_docs as double) - cast(df_{t} as double)) + 5e-1) / (cast(df_{t} as double) + 5e-1)"
    denom = f"({tf} + 1.2e0 * (2.5e-1 + 7.5e-1 * (cast(dl as double) / avgdl)))"
    return f"({idf}) * (({tf} * 2.2e0) / {denom})"


def _bm25_oracle() -> str:
    from ..operators.text_analysis import sql_tokens

    tok = sql_tokens("lower(text)")
    tf_cols = ", ".join(
        f"len(list_filter({tok}, x -> x = '{t}'))::BIGINT AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(_bm25_term_sql(t) for t in _BM25_TERMS)
    any_tf = " + ".join(f"tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH d AS (
        SELECT doc_id, len({tok})::BIGINT AS dl, {tf_cols}
        FROM documents
    ), stats AS (
        SELECT count(*)::BIGINT AS n_docs,
               cast(sum(dl) as double) / cast(count(*) as double) AS avgdl,
               {df_cols}
        FROM d
    )
    SELECT doc_id, floor(({score}) * 1e6)::BIGINT AS score_e6
    FROM d CROSS JOIN stats
    WHERE {any_tf} > 0
    ORDER BY ({score}) DESC, doc_id
    LIMIT {_BM25_TOP}
    """


@register(
    "bm25_search",
    _bm25_oracle(),
    survey_ids=("G2", "A1", "O5"),
    doc="BM25 lexical top-k retrieval over the documents table — the "
    "sparse/lexical counterpart to embed_knn/embed_ivf_topk in a "
    "training-data search stack (dedup forensics, benchmark leakage "
    "lookups, corpus QA all need 'find documents matching these "
    "terms' without embeddings).  Plan shape: per-row tf/dl columns "
    "(array_filter counts, zero shuffle), ONE tiny corpus-stats "
    "aggregate (N, avgdl, per-term df) broadcast back via crossJoin, "
    "scoring fully codegen'd per row, TakeOrderedAndProject for the "
    "top-k — the corpus is scanned twice and shuffled never.  The "
    "idf is Robertson's rational (N-df+.5)/(df+.5) without ln(): "
    "log is not bit-portable across engines, rational arithmetic is "
    "(documented scoring variant; ranking per term is order-"
    "equivalent).  At 100 TB the stats aggregate is map-side partial "
    "+ 1-row result, and the top-k never materializes a global sort.",
)
def q_bm25_search(spark, sf_dir):
    from ..functions import tokens

    docs = load(spark, sf_dir, "documents")
    tok = tokens(F.lower(F.col("text")))

    def _tf(term):
        # Closure factory: `lambda x, t=term` would bind the ELEMENT
        # INDEX to t (2-arg higher-order lambdas are (element, index)).
        return F.size(F.filter(tok, lambda x: x == F.lit(term))).cast("long")

    d = docs.select(
        "doc_id",
        F.size(tok).cast("long").alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        term = F.expr(_bm25_term_sql(t))
        score = term if score is None else (score + term)
    any_tf = None
    for t in _BM25_TERMS:
        c = F.col(f"tf_{t}")
        any_tf = c if any_tf is None else (any_tf + c)
    return (
        scored.filter(any_tf > 0)
        .withColumn("__score", score)
        .orderBy(F.col("__score").desc(), "doc_id")
        .limit(_BM25_TOP)
        .select(
            "doc_id",
            F.floor(F.col("__score") * F.lit(1e6)).cast("long").alias("score_e6"),
        )
    )


# ===========================================================================
# Lexical cosine near-dup (rare-feature sparse-vector similarity join)
# ===========================================================================

# Feature space = 5-char shingles with document frequency in
# [2, _LEXCOS_DF_MAX].  df=1 features cannot produce a pair; features
# above the cap are corpus-common boilerplate, excluded both to bound
# pair emission (<= cap^2/2 pairs per feature — the same absolute-cap
# discipline as LSH banding and the fuzzy join) and because shared
# COMMON substrings are not near-dup evidence.  Vectors are binary
# (shingle sets), so every accumulation is an exact integer COUNT and
# the only float ops are one sqrt and one division — bit-portable.
_LEXCOS_DF_MAX = 16
_LEXCOS_MIN_E6 = 500000


@register(
    "lexical_cosine_pairs",
    f"""
    WITH n AS (
        SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
        FROM documents
    ), s AS (
        SELECT doc_id,
               CASE WHEN length(t) >= 5
                    THEN list_distinct(list_transform(range(1, length(t) - 3),
                                                      i -> substr(t, i::INT, 5)))
                    ELSE [t] END AS sh
        FROM n
    ), p AS (SELECT doc_id, unnest(sh) AS g FROM s),
    d AS (SELECT g, count(*)::BIGINT AS df FROM p GROUP BY g),
    rare AS (
        SELECT p.doc_id, p.g FROM p JOIN d ON p.g = d.g
        WHERE d.df >= 2 AND d.df <= {_LEXCOS_DF_MAX}
    ),
    norms AS (SELECT doc_id, count(*)::BIGINT AS nn FROM rare GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS dot
        FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, dot,
           floor((cast(dot as double)
                  / sqrt(cast(na.nn * nb.nn as double))) * 1e6)::BIGINT AS cos_e6
    FROM dots JOIN norms na ON dots.id_a = na.doc_id
              JOIN norms nb ON dots.id_b = nb.doc_id
    WHERE floor((cast(dot as double)
                 / sqrt(cast(na.nn * nb.nn as double))) * 1e6) >= {_LEXCOS_MIN_E6}
    """,
    survey_ids=("A7", "G5"),
    doc="Lexical cosine near-dup via RARE-feature sparse vectors: "
    "binary 5-char-shingle vectors restricted to features with "
    f"corpus df in [2, {_LEXCOS_DF_MAX}], pairs expanded IN-ROW from "
    "each rare feature's sorted posting list (<= df_max^2/2 pairs "
    "per feature — no pair-relation self-join, one corpus explode "
    "total), cosine = shared / sqrt(|A| * |B|) over that subspace.  "
    "Completes the dedup "
    "matrix's lexical-cosine cell (exact hash, MinHash-LSH, SimHash, "
    "n-gram Jaccard, SNM, embedding-LSH already present): unlike "
    "Jaccard it is robust to size asymmetry (a doc embedded inside a "
    "10x larger one still scores), and the rare-feature restriction "
    "is what makes the pairwise stage scale-safe — a feature emits "
    f"at most {_LEXCOS_DF_MAX}*{_LEXCOS_DF_MAX - 1}/2 pairs, "
    "corpus-common features are excluded by construction, and the "
    "shingle vocabulary saturates (measured: ~2k shingles at both "
    "sf0.01 and sf0.1).  All accumulations are integer counts; the "
    "single sqrt and divide are IEEE-correctly-rounded, so the "
    "oracle is hash-exact.  Degenerate-corpus behavior (measured in "
    "the 10x verbatim-duplication soak): mass duplication pushes "
    "every feature's df over the cap and the op returns ZERO pairs — "
    "correct posture, not a bug: on such a corpus exact dedup / "
    "dup_clusters is the right first pass (the curation pipeline "
    "order), and rare-feature cosine is for what remains after it.",
)
def q_lexical_cosine_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias("__t"),
    )
    t = F.col("__t")
    sh = F.when(
        F.length(t) >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - 4),
                lambda i: t.substr(i, F.lit(5)),
            )
        ),
    ).otherwise(F.array(t))
    p = d.select("doc_id", F.explode(sh).alias("g"))
    # ONE corpus pass: per-gram sorted posting lists with the df cap
    # applied as a size filter.  The first cut of this query kept the
    # (doc, gram) pair relation and self-joined it — the pair relation
    # fed four branches, Catalyst does not CSE shared subtrees, and
    # the corpus-wide shingle explode ran EIGHT times (6.3 s at
    # sf0.1).  Collapsing to posting lists makes the explode+exchange
    # a single subtree (AQE exchange reuse dedups its two tiny
    # consumers), pairs come from an in-row combination expansion
    # bounded by df_max^2/2 per gram, and norms re-explode the <=
    # df_max-element lists — 6.3 s -> ~2.5 s with no cache and no
    # eager materialization to hide cost from the bench timer.
    posts = (
        p.groupBy("g")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= _LEXCOS_DF_MAX))
    )
    norms = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nn"))
    )
    # (x, i) lambda = (element, index) — the index is wanted here:
    # pairs (ds[i], ds[j]) for i < j over the SORTED list, so id_a <
    # id_b by construction.
    pair_structs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    dots = (
        posts.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.id_a").alias("id_a"), F.col("pr.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nn").alias("nb"))
    cos_e6 = F.floor(
        (F.col("dot").cast("double") / F.sqrt((F.col("na") * F.col("nb")).cast("double")))
        * F.lit(1e6)
    ).cast("long")
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", "dot", cos_e6.alias("cos_e6"))
        .filter(F.col("cos_e6") >= _LEXCOS_MIN_E6)
    )


# ===========================================================================
# Embedding duplicate clusters (vector LSH pairs -> transitive closure)
# ===========================================================================


@register(
    "embed_dup_clusters",
    f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
               WHERE len(list_filter(embedding, x -> x <> 0)) > 0),
    q AS (SELECT vec_id, emb,
                 list_transform((emb)[1:{_EMB_DIMS}],
                                x -> floor(x * {_EMB_Q})::BIGINT) AS qv
          FROM e),
    sig AS (SELECT vec_id, emb, {_emb_band_sql(0)} AS b0, {_emb_band_sql(1)} AS b1
            FROM q),
    banded AS (
        SELECT vec_id, emb, 0 AS band_id, b0 AS band_key FROM sig
        UNION ALL
        SELECT vec_id, emb, 1 AS band_id, b1 AS band_key FROM sig),
    cand AS (
        SELECT DISTINCT a.vec_id AS u, b.vec_id AS v
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.vec_id < b.vec_id
        WHERE floor({S.sql_cosine('a.emb', 'b.emb')} * 1000000.0) >= 250000
    ),
    edges AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    walk AS (
        SELECT id, id AS reach FROM nodes
        UNION
        SELECT w.id, e2.v AS reach FROM walk w JOIN edges e2 ON e2.u = w.reach
    ),
    comp AS (SELECT id, min(reach) AS component FROM walk GROUP BY id)
    SELECT component, count(*)::BIGINT AS n_members, min(id) AS canonical_id
    FROM comp GROUP BY component
    """,
    survey_ids=("A7",),
    doc="Vector duplicate-CLUSTER resolution: the embedding-LSH "
    "near-dup pairs (random-hyperplane bands, full-precision cosine "
    ">= 0.25 verify) feed the same min-label-propagation transitive "
    "closure the text pipeline uses — if A~B and B~C the three share "
    "one cluster even though (A, C) was never a candidate.  "
    "Completes the matrix symmetrically: every dedup signal family "
    "(exact hash, MinHash-LSH, lexical cosine, embedding LSH) now "
    "has both a PAIR view and a canonical-member CLUSTER view.  "
    "Scale posture inherits from its parts: banded candidate "
    "generation (no all-pairs), iterative closure with lineage "
    "truncation and a one-time localCheckpoint of the edge list.",
)
def q_embed_dup_clusters(spark, sf_dir):
    from ..operators.clusters import canonicalize, connected_components

    pairs = (
        q_embed_lsh_near_dup(spark, sf_dir)
        .filter(F.col("is_near"))
        .select("id_a", "id_b")
    )
    return canonicalize(connected_components(pairs))
