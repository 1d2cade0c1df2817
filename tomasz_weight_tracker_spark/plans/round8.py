"""Round-8 catalog additions.

- ``lsh_dup_star_edges``: the cluster-level consumer shape of the
  collapse-first LSH machinery (operators/dedup.py:lsh_dedup_edges) —
  identical-signature clusters emit LINEAR rep->member star edges
  instead of the quadratic within-cluster all-pairs a pair enumerator
  must produce, alongside the verified rep-pair ``near`` edges.  At
  100 TB a dedup pass acts on "drop every dst_id" — it never needs
  the all-pairs expansion, so its output is O(corpus + candidates),
  not O(sum cluster^2).
- ``perceptron_sparse_train``: the quality classifier re-trained over
  LONG-FORM sparse features at B=4096 hashed buckets — the round-7
  verdict's scale ceiling fix: the dense design materialized one
  column per bucket (fine at B=257, impossible at fastText-scale
  B>=1e4); the sparse design keeps (doc_id, feature, count) rows and
  computes each round's dot products and updates with joins +
  aggregations, so feature-space width never appears in the plan.
- ``media_phash_near_dup``: perceptual-hash near-dup over DECODED
  image pixels — the one modality the dedup stack did not cover:
  deterministic BMP (even ids) / GIF (odd ids) blobs are decoded by
  the real codecs (operators/codecs.py), nearest-neighbor resized to
  a 9x8 grid, dHashed to 64 bits, Hamming-banded (4x16-bit bands,
  the simhash_exprs convention) and verified at Hamming distance <=
  MEDIA_PHASH_MAX_HAMMING; the oracle recomputes the expected hash
  CLOSED-FORM from doc_id (pixel function + integer resize mapping
  replayed in SQL) and replays the banding.
- ``incremental_lsh_dedup``: the crawl-refresh production shape —
  documents arrive in 3 batches; each batch is MinHash-signed and
  LSH-probed against the ACCUMULATED signature store (old batches'
  signatures persisted, the new batch unioned in), emitting only
  pairs whose LATER member is in the new batch.  The union of the
  three batch outputs equals the one-shot run on the full corpus
  (the incremental_topk batching-invariance pattern), which is
  exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from .catalog import load, register
from .llm_ops import LSH_BANDS, LSH_CAP, LSH_K, LSH_THRESH, TOKS

_SIG_CTES = (
    f"WITH h AS (SELECT doc_id, {D.sql_minhash_pairs(TOKS)} AS hs FROM documents),\n"
    "    sig AS (SELECT doc_id, "
    + ", ".join(
        f"{D.sql_minhash_from_pairs('hs', i)} AS mh{i}" for i in range(LSH_K)
    )
    + " FROM h),"
)


@register(
    "lsh_dup_star_edges",
    _SIG_CTES
    + D.sql_lsh_star_edges(LSH_K, LSH_BANDS, LSH_CAP, LSH_THRESH)
    + """
    SELECT src_id, dst_id, sig_matches, kind FROM edges""",
    survey_ids=(),
    doc="Cluster-level near-dup edges (operators/dedup.py:"
    "lsh_dedup_edges): identical-signature clusters collapse to "
    "rep->member STAR edges (kind 'exact', |cluster|-1 rows — linear "
    "where lsh_near_dup's pair enumeration is quadratic) plus the "
    f"verified (>= {LSH_THRESH}/{LSH_K} agreement) rep-pair 'near' "
    "edges between distinct signatures.  This is the shape a 100 TB "
    "dedup pass consumes — drop every dst_id, keep the reps — so "
    "emission is O(corpus + bounded candidates), not "
    "O(sum cluster^2); same collapse-first banding, split rule and "
    "verify gate as lsh_near_dup, same oracle fragments.",
)
def q_lsh_dup_star_edges(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sig = D.minhash_signature(d.select("doc_id", "text"), "text", k=LSH_K).drop(
        "text"
    )
    return D.lsh_dedup_edges(
        sig,
        "doc_id",
        k=LSH_K,
        bands=LSH_BANDS,
        max_bucket=LSH_CAP,
        verify_min=LSH_THRESH,
    )


# ===========================================================================
# Sparse quality-classifier training (long-form features, B = 4096)
# ===========================================================================

_SPARSE_ROUNDS = 6


def _sparse_chain_oracle() -> str:
    from ..operators.lm import SPARSE_BUCKETS, sql_perceptron_chain

    return sql_perceptron_chain(_SPARSE_ROUNDS, n_buckets=SPARSE_BUCKETS)


@register(
    "perceptron_sparse_train",
    _sparse_chain_oracle(),
    survey_ids=("A1", "A2"),
    doc="The quality classifier trained over LONG-FORM sparse features "
    "at B=4096 hashed buckets (operators/lm.py:perceptron_train_sparse "
    "— the round-7 verdict's scale-ceiling fix): features live as "
    "(doc_id, feature, count) rows, the model reaches the data as a "
    "broadcast of the non-zero weight rows, each round is one "
    "doc-partitioned scan (dot + misclassified set reuse the single "
    "checkpoint exchange) plus one feature-keyed exchange of the "
    "misclassified subset, and the bias row doubles as the error "
    "counter — so feature-space width appears NOWHERE in the plan "
    "and B=1e5 is the same program.  Same integer trajectory "
    "semantics as perceptron_quality_train (label, md5 bucketing, "
    "geometric step decay, portable floor division), verified by the "
    "SAME unrolled-CTE oracle with n_buckets swapped to 4096 — the "
    "oracle was long-form from day one.",
)
def q_perceptron_sparse_train(spark, sf_dir):
    from ..operators.lm import SPARSE_BUCKETS, perceptron_train_sparse

    return perceptron_train_sparse(
        spark,
        load(spark, sf_dir, "documents"),
        _SPARSE_ROUNDS,
        n_buckets=SPARSE_BUCKETS,
    )


# ===========================================================================
# Image perceptual-hash near-dup (decoded pixels -> dHash -> Hamming bands)
# ===========================================================================

# Deterministic synthetic images (the media_decode convention: blob
# content is pure arithmetic in doc_id, so the oracle recomputes the
# hash closed-form without parsing): grayscale value at source pixel
# (x, y) of image i is
#     v0 = (x*31 + y*17 + (i % PHGROUP)*29) % 256
# and images with i % 4 != 0 carry a LOCAL perturbation (top-left
# 2x2 source block shifted by +128 mod 256) — so each PHGROUP class
# is a family of near-identical images: the i%4==0 members are
# pixel-identical, the rest differ only in dHash bits 0/1/8/9 (the
# perturbation lands entirely in Hamming band 0, which is exactly the
# spatial-locality property the banding exploits).  Even ids
# serialize as BMP, odd as GIF (256-entry grayscale palette, real LZW
# both directions), so BOTH decode paths feed the same hash.
_PHGROUP = 50


def _ph_oracle() -> str:
    from ..operators.phash import (
        PHASH_BAND_CAP,
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_GRID_H,
        PHASH_GRID_W,
        PHASH_MAX_HAMMING,
    )

    gw, gh = PHASH_GRID_W, PHASH_GRID_H
    ncell = gw * gh
    v0 = (
        f"(((p % {gw}) * w // {gw}) * 31 + ((p // {gw}) * h // {gh}) * 17"
        f" + (i % {_PHGROUP}) * 29) % 256"
    )
    pert = (
        f"i % 4 <> 0 AND ((p % {gw}) * w // {gw}) < 2"
        f" AND ((p // {gw}) * h // {gh}) < 2"
    )
    bands = ", ".join(str(j) for j in range(PHASH_BANDS))
    band_key = (
        f"CASE WHEN j < {PHASH_BANDS - 1} THEN (phash >> (16 * j)::INT) & 65535"
        f" ELSE phash >> {16 * (PHASH_BANDS - 1)} END"
    )
    return f"""
    WITH px AS (SELECT doc_id AS i, (12 + doc_id % 5)::BIGINT AS w,
                       (10 + doc_id % 3)::BIGINT AS h
                FROM documents),
    grid AS (SELECT i, list_transform(range(0, {ncell}), p ->
                 CASE WHEN {pert} THEN (({v0}) + 128) % 256
                      ELSE {v0} END) AS g
             FROM px),
    hash AS (SELECT i AS media_id,
                    coalesce(list_sum(list_transform(range(0, {PHASH_BITS}), b ->
                        CASE WHEN g[(b // 8) * {gw} + (b % 8) + 2]
                                  > g[(b // 8) * {gw} + (b % 8) + 1]
                             THEN 1::BIGINT << b::INT ELSE 0::BIGINT END)),
                        0)::BIGINT AS phash
             FROM grid),
    banded AS (SELECT media_id, phash, j AS band_id, {band_key} AS band_key
               FROM hash, unnest([{bands}]) AS t(j)
               QUALIFY count(*) OVER (PARTITION BY j, {band_key})
                       <= {PHASH_BAND_CAP})
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}"""


@register(
    "media_phash_near_dup",
    _ph_oracle(),
    survey_ids=(),
    doc="Image near-duplicate detection over DECODED pixels — the "
    "modality the text dedup stack (MinHash/SimHash) did not cover: "
    "per-document deterministic image blobs (even ids BMP, odd ids "
    "GIF with real LZW — both real decode paths) are parsed by "
    "operators/codecs, nearest-neighbor resampled to 9x8 "
    "(integer-exact mapping), 62-bit dHashed (operators/phash.py — "
    "the repo's 62-bit word convention), then Hamming-banded "
    "(4x16/14-bit bands, capped buckets) and verified at "
    "bit_count(xor) <= 8, all JVM-native after the one Arrow-batched "
    "decode pass.  The oracle recomputes every hash CLOSED-FORM from "
    "doc_id (pixel function + resize arithmetic replayed in SQL) and "
    "replays the banding — an independent end-to-end check that "
    "serialize -> LZW/BMP decode -> resample -> hash -> band -> "
    "verify round-trips exactly.",
)
def q_media_phash_near_dup(spark, sf_dir):
    from ..operators import codecs
    from ..operators.phash import phash_media, phash_near_dup_pairs

    d = load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for i in batch["doc_id"]:
                i = int(i)
                w, h = 12 + i % 5, 10 + i % 3
                base = i % _PHGROUP

                def v(x, y):
                    v0 = (x * 31 + y * 17 + base * 29) % 256
                    if i % 4 != 0 and x < 2 and y < 2:
                        return (v0 + 128) % 256
                    return v0

                if i % 2 == 0:
                    raw = codecs.make_bmp(w, h, lambda x, y: (v(x, y),) * 3)
                else:
                    raw = codecs.make_gif(
                        w, h, v, [(j, j, j) for j in range(256)]
                    )
                rows.append({"media_id": i, "content": raw})
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = d.mapInPandas(gen, "media_id long, content binary")
    return phash_near_dup_pairs(phash_media(media))


# ===========================================================================
# Incremental dedup against a persisted signature index (crawl refresh)
# ===========================================================================

_INC_BATCHES = 3


def _inc_lsh_oracle() -> str:
    # One-shot UNCAPPED near-dup on the full corpus: the equality the
    # batching-invariance theorem guarantees (see
    # operators/dedup.py:lsh_probe_pairs).  Banding via the same
    # sql_lsh_banded split-order frame; a band match is agreement on
    # the first rows-per-band positions.
    from .llm_ops import _BANDED_SQL, _SIG_MATCHES

    rpb = LSH_K // LSH_BANDS
    return (
        _SIG_CTES
        + f"""
    banded0 AS (
{D.sql_lsh_banded(LSH_K, LSH_BANDS)}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded0 a JOIN banded0 b
        ON a.band_id = b.band_id
       AND list_slice(a.skey, 1, {rpb}) = list_slice(b.skey, 1, {rpb})
       AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, ({_SIG_MATCHES})::BIGINT AS sig_matches
    FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
              JOIN sig sb ON cand.id_b = sb.doc_id
    WHERE {_SIG_MATCHES} >= {LSH_THRESH}"""
    )


@register(
    "incremental_lsh_dedup",
    _inc_lsh_oracle(),
    survey_ids=("S11", "ST1"),
    doc="The crawl-refresh production shape of near-dup detection: "
    f"documents arrive in {_INC_BATCHES} batches (doc_id residue "
    "classes); each batch is MinHash-signed, PROBED against the "
    "persisted signature store (parquet state, the incremental_topk "
    "state mechanism) emitting only pairs with a new endpoint, then "
    "appended to the store — history is never re-paired against "
    "itself, so refresh cost is |batch| x store-bucket-width however "
    "long the crawl has run.  The probe's share-a-band candidate "
    "rule is a pure pairwise predicate, hence BATCHING-INVARIANT "
    "(operators/dedup.py:lsh_probe_pairs): the union of the batch "
    "emissions equals the one-shot uncapped run on the union corpus "
    "— which is exactly what the oracle computes.  Each batch output "
    "is materialized before its signatures join the store (the state "
    "append must not feed back into the in-flight probe plan).",
)
def q_incremental_lsh_dedup(spark, sf_dir):
    from ..session import scratch_dir

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    state = f"{scratch_dir('inc_lsh')}/sig_state"
    outs = []
    for r in range(_INC_BATCHES):
        batch = docs.filter(F.col("doc_id") % _INC_BATCHES == r)
        new_sigs = (
            D.minhash_signature(batch, "text", k=LSH_K)
            .drop("text")
            .withColumn("is_new", F.lit(True))
            .localCheckpoint(eager=True)  # sign once: probe + append reuse
        )
        try:
            store = spark.read.parquet(state).withColumn("is_new", F.lit(False))
            all_sigs = store.unionByName(new_sigs)
        except Exception:  # first batch: empty store
            all_sigs = new_sigs
        pairs = D.lsh_probe_pairs(
            all_sigs, "is_new", "doc_id",
            k=LSH_K, bands=LSH_BANDS, verify_min=LSH_THRESH,
        )
        # Materialize BEFORE the store append: the pair plan reads the
        # store lazily, and parquet files appended below must not leak
        # into this batch's probe.
        outs.append(pairs.localCheckpoint(eager=True))
        new_sigs.drop("is_new").write.mode("append").parquet(state)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
