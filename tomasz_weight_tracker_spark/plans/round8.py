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
- ``embed_pq_train``: product-quantization codebook training (Jegou
  et al. 2011) in the e6-quantized integer domain — 4 subspaces x 16
  centroids x 2 Lloyd rounds, bit-identical across engines; per round
  one broadcast codebook + one map-side argmin pass + one keyed
  aggregation, the corpus never shuffles on volume.
- ``embed_pq_topk``: asymmetric-distance (ADC) top-k over the trained
  codebook — the query-to-subcentroid distance table is broadcast and
  candidates are ranked through their packed 2-byte codes, so the
  candidate scan touches 8 bytes per vector however wide the raw
  embedding.
- ``curation_end_to_end``: the full curation pipeline composed from
  catalog-verified stages — collapse-first LSH dedup -> bigram-LM
  quality filter -> token-budget mixture, realized through the
  deterministic md5 acceptance sampler and reported as a per-source
  raw -> deduped -> scored -> kept -> selected audit; both engines
  share each stage's SQL generator so pipeline and stage semantics
  cannot drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from .catalog import load, register, trained_ivf_centroids
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
    members AS (SELECT media_id, phash,
                       min(media_id) OVER (PARTITION BY phash) AS rep,
                       count(*) OVER (PARTITION BY phash) AS cnt
                FROM hash),
    banded AS (SELECT media_id AS rid, phash, j AS band_id,
                      {band_key} AS band_key
               FROM members, unnest([{bands}]) AS t(j)
               WHERE media_id = rep
               QUALIFY count(*) OVER (PARTITION BY j, {band_key})
                       <= {PHASH_BAND_CAP}),
    rp AS (SELECT DISTINCT a.rid AS ra, b.rid AS rb,
                  bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.rid < b.rid
           WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}),
    multi AS (SELECT rep, media_id FROM members WHERE cnt > 1)
    SELECT least(coalesce(ma.media_id, ra), coalesce(mb.media_id, rb)) AS id_a,
           greatest(coalesce(ma.media_id, ra), coalesce(mb.media_id, rb)) AS id_b,
           hamming
    FROM rp LEFT JOIN multi ma ON ma.rep = rp.ra
            LEFT JOIN multi mb ON mb.rep = rp.rb
    UNION ALL
    SELECT a.media_id, b.media_id, 0::BIGINT
    FROM multi a JOIN multi b
      ON a.rep = b.rep AND a.media_id < b.media_id"""


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
    "persisted signature store — parquet state PARTITIONED by "
    "band-key-hash bucket (operators/dedup.py:lsh_store_append), so "
    "each refresh partition-prunes the store scan to the batch's "
    "touched buckets and broadcast-semi-joins on the exact band hash "
    "BEFORE any shuffle (lsh_store_probe_read) — emitting only pairs "
    "with a new endpoint, then appended to the store.  History is "
    "never re-paired against itself AND never re-scanned: per-refresh "
    "cost (scan, shuffle, and output) is O(|batch| x touched buckets) "
    "however long the crawl has run.  The probe's share-a-band candidate "
    "rule is a pure pairwise predicate, hence BATCHING-INVARIANT "
    "(operators/dedup.py:lsh_probe_pairs): the union of the batch "
    "emissions equals the one-shot uncapped run on the union corpus "
    "— which is exactly what the oracle computes.  Each batch's probe "
    "plan reads a file listing of the store PINNED as-of-its-turn "
    "(lsh_store_probe_read pin_files), so later appends never feed "
    "back into an earlier batch's probe and all batch outputs can "
    "evaluate together in one final job (_inc_lsh_replay).",
)
def q_incremental_lsh_dedup(spark, sf_dir):
    out, _sigs = _inc_lsh_replay(spark, sf_dir, "inc_lsh", D.lsh_probe_pairs)
    return out


def _inc_lsh_replay(spark, sf_dir, tag, probe_fn):
    """The shared crawl-refresh driver loop (dedup pairs + assign
    variants differ only in the probe primitive).  Round-12 replay
    floor (verdict r11 item 6 — batch the per-micro-batch actions):

    - signatures AND band hashes are computed once on the union corpus
      and checkpointed (minhash is a pure per-doc function; the
      replay's subject is STORE interaction, not re-signing);
    - every batch's touched store buckets are collected in ONE job up
      front (they are pure functions of the checkpointed hashes, at
      most batches x n_buckets ints);
    - each refresh's probe reads a PINNED file listing of the store
      as-of-its-turn (lsh_store_probe_read pin_files), so the batch
      outputs stay correct when deferred — the union of all refresh
      emissions evaluates in ONE final job instead of one eager
      checkpoint per refresh.  The store appends themselves remain
      sequential real writes: they ARE the state machinery under test.
    """
    from ..session import scratch_dir

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    state = f"{scratch_dir(tag)}/sig_state"
    sigs_all = (
        D.minhash_signature(docs, "text", k=LSH_K)
        .drop("text")
        .withColumn("__bha", D._band_hash_array(LSH_K, LSH_BANDS))
        .localCheckpoint(eager=True)
    )
    touched: dict[int, set[int]] = {r: set() for r in range(_INC_BATCHES)}
    for row in (
        sigs_all.select(
            (F.col("doc_id") % _INC_BATCHES).alias("r"),
            F.explode("__bha").alias("__bh"),
        )
        .select(
            "r",
            F.pmod(F.col("__bh"), F.lit(D.LSH_STORE_BUCKETS)).cast("int").alias("pb"),
        )
        .distinct()
        .collect()
    ):
        touched[int(row.r)].add(int(row.pb))
    outs = []
    for r in range(_INC_BATCHES):
        new_sigs = sigs_all.filter(
            F.col("doc_id") % _INC_BATCHES == r
        ).withColumn("is_new", F.lit(True))
        # Band-partitioned store probe (round-10): partition filter on
        # the batch's band-hash buckets + broadcast semi-join, so the
        # refresh never scans or shuffles untouched store history.
        store = D.lsh_store_probe_read(
            spark, state, new_sigs, k=LSH_K, bands=LSH_BANDS,
            touched=sorted(touched[r]), pin_files=True,
        )
        if store is None:  # genuinely-empty first refresh
            all_sigs = new_sigs.drop("__bha")
        else:
            all_sigs = store.withColumn("is_new", F.lit(False)).unionByName(
                new_sigs.drop("__bha")
            )
        outs.append(
            probe_fn(
                all_sigs, "is_new", "doc_id",
                k=LSH_K, bands=LSH_BANDS, verify_min=LSH_THRESH,
            )
        )
        D.lsh_store_append(
            new_sigs.drop("is_new"), state, k=LSH_K, bands=LSH_BANDS
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out, sigs_all


def _inc_assign_oracle() -> str:
    # The one-shot semantics of the min-fold: for every doc, the
    # smallest verified neighbor — GROUP BY over the uncapped pair
    # relation the incremental_lsh_dedup oracle already defines.
    return (
        "WITH verified AS (\n"
        + _inc_lsh_oracle()
        + "\n    )\n"
        "    SELECT id_b AS doc_id, MIN(id_a) AS dup_of\n"
        "    FROM verified GROUP BY id_b"
    )


@register(
    "incremental_lsh_assign",
    _inc_assign_oracle(),
    survey_ids=("S11", "ST1"),
    doc="The BOUNDED-OUTPUT crawl-refresh dedup shape — what the "
    "round-8 soak showed incremental_lsh_dedup's pair relation is "
    "not (10x verbatim duplication -> ~100x pairs, 768M rows): each "
    f"refresh ({_INC_BATCHES} doc_id-residue batches) probes the "
    "persisted signature store and emits per-document ASSIGNMENT "
    "updates (doc_id, dup_of = smallest verified neighbor visible "
    "this refresh) instead of pairs "
    "(operators/dedup.py:lsh_probe_assign), so refresh output is "
    "O(touched members) however duplicated the corpus — and refresh "
    "COMPUTE matches: the store is parquet PARTITIONED by "
    "band-key-hash bucket, partition-pruned to the batch's buckets "
    "and band-hash-semi-joined before any shuffle "
    "(lsh_store_probe_read), so untouched history is never scanned.  "
    "Updates fold "
    "through the state table with a keyed MIN-merge (the S11 upsert "
    "mechanism; here an append log + final min-aggregate — "
    "associative + commutative, so batch order is irrelevant), and "
    "the folded table equals GROUP BY doc MIN(neighbor) over the "
    "one-shot uncapped pair run — which is what the oracle computes. "
    "A dedup consumer drops every doc_id present in the table and "
    "keeps the rest: the keep-one-representative decision at 100 TB "
    "in one linear relation.",
)
def q_incremental_lsh_assign(spark, sf_dir):
    from ..session import scratch_dir

    # Shared replay driver (see _inc_lsh_replay): pinned-store probes,
    # deferred batch outputs — the per-refresh update relations land
    # in the append log in ONE write instead of one eager job per
    # refresh, then fold through the keyed MIN-merge exactly as
    # before (associative + commutative, so batching is irrelevant).
    updates, _sigs = _inc_lsh_replay(
        spark, sf_dir, "inc_assign", D.lsh_probe_assign
    )
    upd_state = f"{scratch_dir('inc_assign_log')}/assign_updates"
    updates.write.mode("append").parquet(upd_state)
    return (
        spark.read.parquet(upd_state)
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
    )


# ===========================================================================
# Product quantization: codebook training + ADC search (ANN memory path)
# ===========================================================================


def _pq_train_oracle() -> str:
    from ..operators.similarity import sql_pq_chain

    return (
        "WITH " + sql_pq_chain() + "\n    SELECT m, centroid_id, qc FROM cent"
    )


@register(
    "embed_pq_train",
    _pq_train_oracle(),
    survey_ids=("A1",),
    doc="Product-quantization codebook training (Jegou et al. 2011, "
    "public paper) — the ANN memory-compression path: the 64-dim "
    "embedding splits into 4 subspaces, each k-means'd to 16 "
    "centroids (2 Lloyd rounds), so a vector stores as 4x4-bit codes "
    "(2 bytes vs 256 raw — what keeps a 100 TB candidate scan "
    "memory-resident).  Training runs ENTIRELY in the e6-quantized "
    "integer domain (operators/similarity.py:pq_train): integer-L2 "
    "argmin assignment, portable floor-div means, shared md5-min "
    "init sample — so the codebook is bit-identical across engines, "
    "runs, and partitionings, and the oracle replays the identical "
    "rounds as a CTE chain.  Per round: broadcast codebook (M*K "
    "rows), one map-side argmin pass, one (m, centroid)-keyed "
    "aggregation with map-side combine — the corpus never shuffles "
    "on volume (docs/SCALE.md §9).",
)
def q_embed_pq_train(spark, sf_dir):
    from ..operators.similarity import pq_train

    return pq_train(load(spark, sf_dir, "embeddings"))


def _pq_topk_oracle() -> str:
    from ..operators.similarity import PQ_K, sql_pq_chain

    subdim = 16
    isq = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (sv[i] - qc[i]) * (sv[i] - qc[i])))"
    )
    return (
        "WITH "
        + sql_pq_chain()
        + f""",
    codes AS (SELECT vec_id, m, centroid_id FROM (
        SELECT subs.vec_id, subs.m, c.centroid_id,
               row_number() OVER (PARTITION BY subs.vec_id, subs.m
                   ORDER BY {isq.replace('qc', 'c.qc')}, c.centroid_id) AS rn
        FROM subs JOIN cent c USING (m)) WHERE rn = 1),
    dtab AS (SELECT subs.vec_id AS q_id, c.m, c.centroid_id,
                    {isq.replace('qc', 'c.qc')}::BIGINT AS d
             FROM subs JOIN cent c USING (m) WHERE subs.vec_id < 5),
    adc AS (SELECT dtab.q_id, codes.vec_id AS neighbor_id,
                   sum(dtab.d)::BIGINT AS adc_dist
            FROM codes JOIN dtab USING (m, centroid_id)
            WHERE codes.vec_id <> dtab.q_id
            GROUP BY 1, 2)
    SELECT q_id, neighbor_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_dist, neighbor_id)::BIGINT AS rank,
           adc_dist
    FROM adc
    QUALIFY rank <= 5"""
    )


@register(
    "embed_pq_topk",
    _pq_topk_oracle(),
    survey_ids=("O5",),
    doc="PQ asymmetric-distance (ADC) top-k search over the trained "
    "codebook: each query builds an exact M x K integer table of "
    "query-to-subcentroid distances (320 rows for 5 queries — always "
    "broadcast), every candidate's approximate distance is the sum "
    "of 4 table lookups through its packed 2-byte code, then a "
    "per-query ascending top-5.  The candidate side touches ONLY "
    "codes after encoding — 8 bytes of shuffle payload per vector "
    "however wide the embedding — which is the entire point of PQ "
    "at 100 TB.  All-integer distances keep the ranking bit-exact; "
    "unit-norm embeddings make integer-L2 order equal cosine order, "
    "so the ADC ranking is comparable to embed_knn's exact ranking "
    "(the recall trade is PQ's documented quantization loss, not an "
    "engine artifact).",
)
def q_embed_pq_topk(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.similarity import (
        PQ_K,
        PQ_M,
        _isqdist,
        _qvec,
        _sub,
        pq_codes,
        pq_train,
    )

    e = load(spark, sf_dir, "embeddings")
    cents = pq_train(e)
    codes = pq_codes(e, cents)

    subdim = 64 // PQ_M
    bits = max((PQ_K - 1).bit_length(), 1)
    qsubs = (
        e.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("q_id"), _qvec(F.col("embedding")).alias("qv"))
        .select(
            "q_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("m"), _sub(F.col("qv"), j, subdim).alias("sv")
                        )
                        for j in range(PQ_M)
                    ]
                )
            ).alias("s"),
        )
        .select("q_id", "s.m", "s.sv")
    )
    dtab = qsubs.join(F.broadcast(cents), "m").select(
        "q_id", "m", "centroid_id", _isqdist(F.col("sv"), F.col("qc")).alias("d")
    )
    cand = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("m"),
                        F.shiftright(F.col("pq_code"), j * bits)
                        .bitwiseAND(F.lit(PQ_K - 1))
                        .cast("int")
                        .alias("centroid_id"),
                    )
                    for j in range(PQ_M)
                ]
            )
        ).alias("c"),
    ).select("neighbor_id", "c.m", "c.centroid_id")
    adc = (
        cand.join(F.broadcast(dtab), ["m", "centroid_id"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .groupBy("q_id", "neighbor_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "neighbor_id", "rank", "adc_dist")
    )


# ===========================================================================
# End-to-end curation: dedup -> LM filter -> token-budget mix, one plan
# ===========================================================================


def _curation_oracle() -> str:
    from ..operators.lm import LM_KEEP_E9, sql_lm_chain
    from .round7 import sql_mix_chain, sql_mix_select

    return (
        _SIG_CTES
        + D.sql_lsh_star_edges(LSH_K, LSH_BANDS, LSH_CAP, LSH_THRESH)
        + f""",
    survivors AS (SELECT d.doc_id, d.source, d.text FROM documents d
                  WHERE d.doc_id NOT IN (SELECT dst_id FROM edges)),
    {sql_lm_chain(source="survivors", bare=True).strip()},
    ksc AS (SELECT agg.doc_id, (s // n_bigrams) >= {LM_KEEP_E9} AS kept FROM agg),
    kept_docs AS (SELECT sv.doc_id, sv.source, sv.text
                  FROM survivors sv JOIN ksc USING (doc_id) WHERE ksc.kept),
    {sql_mix_chain("kept_docs", "m").strip()},
    mix AS ({sql_mix_select("m")}),
    sel AS (SELECT t.source, t.nt FROM mtok t JOIN mix USING (source)
            WHERE ('0x' || substr(md5('mix:' || CAST(t.doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 < mix.accept_ppm),
    araw AS (SELECT source, count(*)::BIGINT AS n_raw FROM documents GROUP BY source),
    adedup AS (SELECT source, count(*)::BIGINT AS n_dedup FROM survivors GROUP BY source),
    ascored AS (SELECT sv.source, count(*)::BIGINT AS n_scored,
                       sum(CASE WHEN ksc.kept THEN 1 ELSE 0 END)::BIGINT AS n_kept
                FROM ksc JOIN survivors sv USING (doc_id) GROUP BY sv.source),
    asel AS (SELECT source, count(*)::BIGINT AS n_selected,
                    sum(nt)::BIGINT AS tokens_selected
             FROM sel GROUP BY source)
    SELECT araw.source, n_raw,
           coalesce(n_dedup, 0)::BIGINT AS n_dedup,
           coalesce(n_scored, 0)::BIGINT AS n_scored,
           coalesce(n_kept, 0)::BIGINT AS n_kept,
           coalesce(n_selected, 0)::BIGINT AS n_selected,
           coalesce(tokens_selected, 0)::BIGINT AS tokens_selected
    FROM araw LEFT JOIN adedup USING (source)
              LEFT JOIN ascored USING (source)
              LEFT JOIN asel USING (source)"""
    )


@register(
    "curation_end_to_end",
    _curation_oracle(),
    survey_ids=("A1", "J4"),
    doc="The full curation pipeline COMPOSED: collapse-first LSH "
    "dedup (lsh_dedup_edges — drop every star/near dst_id, keep "
    "reps) -> bigram-LM quality filter on the survivors (train split "
    "doc_id%5==0 is the reference data and is excluded from yield; "
    "held docs keep at the e9 threshold) -> token-budget water-fill "
    "mixture over the kept docs, REALIZED through the deterministic "
    "md5 acceptance sampler — reported as a per-source audit table "
    "(raw -> deduped -> scored -> kept -> selected, with realized "
    "token yield).  Each stage is an operator the catalog verifies "
    "in isolation (lsh_dup_star_edges, ngram_lm_score, "
    "token_budget_mix_apply); the composition shares their exact "
    "generators on BOTH sides (sql_lsh_star_edges / sql_lm_chain "
    "with source=survivors / sql_mix_chain with a CTE prefix), so "
    "pipeline semantics and stage semantics cannot drift apart.  "
    "The survivor set is materialized once (localCheckpoint — at "
    "production scale, a parquet handoff) because three stages read "
    "it; everything else stays one lazy Catalyst plan per stage "
    "with S-row broadcast joins between stages.",
)
def q_curation_end_to_end(spark, sf_dir):
    from ..functions import md5_long, tokens
    from ..operators.lm import lm_score
    from .round7 import mix_design

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    sig = D.minhash_signature(docs.select("doc_id", "text"), "text", k=LSH_K).drop(
        "text"
    )
    edges = D.lsh_dedup_edges(
        sig, "doc_id", k=LSH_K, bands=LSH_BANDS,
        max_bucket=LSH_CAP, verify_min=LSH_THRESH,
    )
    dst = edges.select(F.col("dst_id").alias("doc_id")).distinct()
    # Materialize survivors once: the LM trainer, the scorer, the kept
    # join and two audits all read it, and re-deriving the minhash md5
    # trees per reference both recomputes the dedup and blows up plan
    # construction (the lsh_recall_audit TreeNode lesson).
    survivors = docs.join(dst, "doc_id", "left_anti").localCheckpoint(eager=True)

    from ..caching import track_cache

    # The two other shared stages are cached, not re-derived: `scored`
    # feeds the kept join AND the per-source audit, `kept_docs` feeds
    # the mix design AND the selection — without the cache Catalyst
    # duplicates each subtree per reference (no CSE), which measured
    # 69 exchanges / 100 broadcasts of pure textual blowup in the
    # static plan.  cache() (not localCheckpoint) keeps lineage while
    # collapsing every reference to one InMemoryTableScan.
    scored = track_cache(lm_score(survivors))
    kept_docs = track_cache(
        survivors.join(scored.filter(F.col("kept")).select("doc_id"), "doc_id")
    )
    mix = mix_design(kept_docs).select("source", "accept_ppm")
    ntok = F.size(tokens(F.lower(F.coalesce(F.col("text"), F.lit(""))))).cast("long")
    sel = (
        kept_docs.withColumn("nt", ntok)
        .join(F.broadcast(mix), "source")
        .filter(
            md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            % 1000000
            < F.col("accept_ppm")
        )
    )

    araw = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    adedup = survivors.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_dedup")
    )
    ascored = (
        scored.join(survivors.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        )
    )
    asel = sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("nt").cast("long").alias("tokens_selected"),
    )
    out = (
        araw.join(adedup, "source", "left")
        .join(ascored, "source", "left")
        .join(asel, "source", "left")
    )
    return out.select(
        "source",
        "n_raw",
        F.coalesce("n_dedup", F.lit(0)).cast("long").alias("n_dedup"),
        F.coalesce("n_scored", F.lit(0)).cast("long").alias("n_scored"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("n_selected", F.lit(0)).cast("long").alias("n_selected"),
        F.coalesce("tokens_selected", F.lit(0)).cast("long").alias("tokens_selected"),
    )


# ===========================================================================
# Semantic dedup: k-means partition, then prune within clusters
# ===========================================================================

# SemDeDup-style semantic deduplication (Abbas et al. 2023,
# arXiv:2303.09540): instead of comparing every pair of embeddings
# (O(N^2), impossible at corpus scale), partition the space with
# k-means and compare ONLY within clusters — cost drops to
# sum |cluster|^2 ~= N^2/k, and k grows with the corpus (the paper
# uses ~sqrt(N) clusters) so cluster size, and therefore per-cluster
# work, stays bounded.  Among semantic duplicates (pair cosine >= eps)
# the member with the LOWEST similarity to its cluster centroid is
# kept (the paper's keep-outliers rule), deterministic tiebreak on id.
SEM_K = 8
SEM_ITERS = 2
# floor(1e9 * cosine) threshold: 0.30 is ~p99 of the all-pairs cosine
# distribution of this embedding table — "semantic duplicate" is the
# top percentile of similarity, not the bulk.
SEM_EPS_Q = 300_000_000

_SEM_COS = (
    "floor(1e9 * list_dot_product({a}.v, {b}.v)"
    " / (sqrt(list_dot_product({a}.v, {a}.v))"
    " * sqrt(list_dot_product({b}.v, {b}.v))))::BIGINT"
)


def _sem_oracle() -> str:
    from ..operators import similarity as S

    cent_cos = (
        "floor(1e9 * list_dot_product(a.v, c.cv)"
        " / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(c.cv, c.cv))))::BIGINT"
    )
    return f"""
    WITH {S.sql_ivf_train(n_centroids=SEM_K, iterations=SEM_ITERS, dim=64)},
    amap AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.v, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_dot_product(e.v, c.cv) DESC, c.centroid_id) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1
    ),
    mem AS (
      SELECT a.centroid_id, a.vec_id, a.v, {cent_cos} AS simcent_q
      FROM amap a JOIN cent c USING (centroid_id)
    ),
    dropped AS (
      SELECT DISTINCT x.vec_id
      FROM mem x JOIN mem y
        ON x.centroid_id = y.centroid_id AND x.vec_id <> y.vec_id
       AND (y.simcent_q < x.simcent_q
            OR (y.simcent_q = x.simcent_q AND y.vec_id < x.vec_id))
      WHERE {_SEM_COS.format(a="x", b="y")} >= {SEM_EPS_Q}
    )
    SELECT m.vec_id, m.centroid_id, m.simcent_q,
           (d.vec_id IS NOT NULL) AS is_dropped
    FROM mem m LEFT JOIN dropped d ON m.vec_id = d.vec_id
    """


@register(
    "semantic_dedup",
    _sem_oracle(),
    survey_ids=(),
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023): Lloyd "
    f"k-means over the embedding table ({SEM_K} centroids x "
    f"{SEM_ITERS} rounds, the catalog-verified ivf_train — even the "
    "learned centroids are cross-engine bit-identical), broadcast "
    "map-side assignment, then cosine pairs are enumerated ONLY "
    "within clusters: cost is sum |cluster|^2 ~= N^2/k instead of "
    "N^2, and k scales with the corpus (~sqrt(N)) so per-cluster "
    "work stays bounded at 100 TB; a hot cluster re-clusters "
    "recursively exactly like the LSH hot-bucket split.  Among "
    "duplicates (pair cosine >= 0.30 ~= p99, compared in the "
    "floor-1e9-quantized integer domain) the member with the LOWEST "
    "centroid similarity is kept (the paper's keep-outliers rule, "
    "id tiebreak), so the decision is deterministic and "
    "order-independent.  Returns every member with its cluster, "
    "quantized centroid similarity, and the drop verdict.",
)
def q_semantic_dedup(spark, sf_dir):
    from ..operators import similarity as S

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = trained_ivf_centroids(spark, sf_dir, SEM_K, SEM_ITERS)
    assigned = S.ivf_assign(e, cents).select(
        "vec_id", "centroid_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cv = cents.select("centroid_id", F.col("embedding").alias("__cv"))
    # Materialize members once (eager): three consumers below (both
    # sides of the pair join + the final probe) — without this the
    # 2-round training lineage is replayed per consumer.
    mem = (
        assigned.join(F.broadcast(cv), "centroid_id")
        .select(
            "centroid_id",
            "vec_id",
            "v",
            F.floor(S.cosine(F.col("v"), F.col("__cv")) * F.lit(1e9))
            .cast("long")
            .alias("simcent_q"),
        )
        .localCheckpoint(eager=True)
    )
    x, y = mem.alias("x"), mem.alias("y")
    pair_cos_q = F.floor(
        S.cosine(F.col("x.v"), F.col("y.v")) * F.lit(1e9)
    ).cast("long")
    # y is "kept-preferred" over x: strictly lower centroid
    # similarity, or equal with the smaller id.  x is dropped when a
    # kept-preferred in-cluster neighbor is within eps.
    dropped = (
        x.join(
            y,
            (F.col("x.centroid_id") == F.col("y.centroid_id"))
            & (F.col("x.vec_id") != F.col("y.vec_id"))
            & (
                (F.col("y.simcent_q") < F.col("x.simcent_q"))
                | (
                    (F.col("y.simcent_q") == F.col("x.simcent_q"))
                    & (F.col("y.vec_id") < F.col("x.vec_id"))
                )
            ),
        )
        .filter(pair_cos_q >= SEM_EPS_Q)
        .select(F.col("x.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__d", F.lit(True))
    )
    return mem.join(dropped, "vec_id", "left").select(
        "vec_id",
        "centroid_id",
        "simcent_q",
        F.coalesce(F.col("__d"), F.lit(False)).alias("is_dropped"),
    )


# ===========================================================================
# Seeded corpus shuffle + token-balanced training-shard manifest
# ===========================================================================

# The pretraining writer path the packing/mixing stages feed: the
# corpus is re-ordered by a SEEDED deterministic hash (a reproducible
# global shuffle — same seed, same order, any cluster size), laid
# end-to-end in that order, and cut into fixed token-budget shards.
# The manifest (one row per shard) is what a training job consumes to
# schedule readers.  Changing SHUF_SEED re-shuffles; everything stays
# bit-reproducible.
SHUF_SEED = "shuf1"
SHARD_TOKENS = 2048
# h is 60-bit; div 2^53 coarsens it into 128 contiguous h-ranges that
# act as the distributed-prefix-sum partitions.
_HSHARD_DIV = 1 << 53


def _shuffle_shard_oracle() -> str:
    from ..functions import md5_long_sql

    h = md5_long_sql(f"'{SHUF_SEED}:' || doc_id::VARCHAR")
    return f"""
    WITH toks AS (
        SELECT doc_id,
               (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
                   AS n_tokens,
               {h} AS h
        FROM documents
    ), cum AS (
        SELECT doc_id, n_tokens, h,
               sum(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
                 - n_tokens AS gs
        FROM toks
    )
    SELECT (gs // {SHARD_TOKENS})::BIGINT AS shard_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS shard_tokens,
           min_by(doc_id, gs) AS first_doc,
           min(h) AS h_lo, max(h) AS h_hi
    FROM cum GROUP BY 1
    """


@register(
    "corpus_shuffle_shards",
    _shuffle_shard_oracle(),
    survey_ids=("A1", "W1"),
    doc="Seeded deterministic corpus shuffle + token-balanced shard "
    f"manifest: docs are re-ordered by md5('{SHUF_SEED}:'||doc_id) — "
    "a reproducible global shuffle, the step between mixing and the "
    "training writer — laid end-to-end and cut into "
    f"{SHARD_TOKENS}-token shards; one manifest row per shard "
    "(doc count, token count, first doc, hash range) is what "
    "schedules training readers.  The running offset is the same "
    "DISTRIBUTED PREFIX SUM as sequence_packing — per-h-range "
    "subtotals (128 contiguous 2^53-wide h buckets) cumulate on a "
    "128-row frame and broadcast back, so there is no global sort "
    "and no single-partition window over the corpus; the oracle's "
    "ORDER-BY-everything window is exactly the plan that does not "
    "scale.  At 100 TB the h-bucket count rises with the corpus "
    "(h div 2^k) keeping per-bucket windows bounded.",
)
def q_corpus_shuffle_shards(spark, sf_dir):
    return _shard_manifest(_shuffled_docs(spark, sf_dir))


def _shuffled_docs(spark, sf_dir):
    """Per-document shard assignment (doc_id, text, n_tokens, h, gs,
    shard_id) — the distributed-prefix-sum shuffle order, shared by
    the manifest query and the shard WRITER so the written layout and
    the manifest cannot drift."""
    from pyspark.sql import Window

    from ..functions import md5_long

    docs = load(spark, sf_dir, "documents")
    # toks feeds the within-bucket window AND the bucket totals.
    # Un-cached (round-13 A/B: cached 1.50 s vs 1.40 s without at
    # sf0.1, checksum-identical): same trade as sequence_packing —
    # two cheap md5/length projections recompute from the pruned scan,
    # where the cache materialized a corpus-rows relation first
    # (guide §5).
    toks = docs.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_tokens"),
        md5_long(
            F.concat(F.lit(f"{SHUF_SEED}:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    ).withColumn("hshard", F.expr(f"h div {_HSHARD_DIV}"))
    w_in = (
        Window.partitionBy("hshard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = toks.withColumn("in_cum", F.sum("n_tokens").over(w_in))
    totals = toks.groupBy("hshard").agg(F.sum("n_tokens").alias("st"))
    # bounded-frame: one row per h-shard (128), never the corpus
    w_sh = Window.orderBy("hshard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "hshard", F.coalesce(F.sum("st").over(w_sh), F.lit(0)).alias("off")
    )
    return (
        within.join(F.broadcast(offsets), "hshard")
        .withColumn("gs", F.col("off") + F.col("in_cum") - F.col("n_tokens"))
        .withColumn("shard_id", F.expr(f"gs div {SHARD_TOKENS}"))
        .select("doc_id", "n_tokens", "h", "gs", "shard_id")
    )


def _shard_manifest(assigned):
    """Collapse a per-doc shard assignment into the one-row-per-shard
    reader manifest."""
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        F.min_by("doc_id", "gs").alias("first_doc"),
        F.min("h").alias("h_lo"),
        F.max("h").alias("h_hi"),
    )
