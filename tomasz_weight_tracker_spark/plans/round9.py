"""Round-9 catalog additions.

- ``dup_passage_maximal``: dup_passage_spans' per-diagonal spans can
  overlap in document-A coordinates (a passage duplicated at two
  offsets in B, internal periodicity) — this entry unions them into
  MAXIMAL token intervals per (id_a, id_b) with the interval-union
  islands trick, so excision tooling sees one span where the
  diagonal decomposition reports fragments.
- ``ivfadc_autotune``: closes the measure-don't-guess loop on IVFADC —
  sweep every probe depth from one index build over the fixed
  recall-audit sample, pick the smallest nprobe capturing >= 95% of
  the full-probe recall (relative to the quantization ceiling), and
  report the whole auditable sweep with the chosen operating point
  (the number that parameterizes embed_ivfadc_topk in production).
- ``streaming_lsh_assign``: incremental_lsh_assign's crawl-refresh
  fold bridged to Structured Streaming — micro-batch MinHash-sign +
  LSH probe-assign against checkpointed parquet signature state
  inside foreachBatch, drained state hash-equal to the one-shot
  oracle by the probe's batching-invariance theorem.
- ``lsh_band_autotune``: the tuner trilogy's dedup leg — sweep band
  counts over the divisors of k from one signature computation,
  measure candidate volume and verified recall on lsh_recall_audit's
  sample/truth, choose the fewest bands capturing >= 95% of the
  loosest banding's recall.
- ``gopher_rule_attribution``: per-rule kill attribution for the
  Gopher filter stack — n_fail and n_unique_fail (the rule's marginal
  contribution) per rule, sharing the metric pass and rule predicates
  with gopher_quality_rules.
- ``source_temperature_mix``: T=2 temperature-flattened source mixing
  (the multilingual-LM sampling rule) with exact integer square-root
  weights, single-shot proportional allocation capped at supply, and
  the md5-realized per-source yield.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from .catalog import load, register
from .llm_ops import LSH_BANDS, LSH_K, LSH_THRESH
from .round8b import _passage_spans, _pspan_ctes

# ===========================================================================
# Maximal-span merge for passage dedup (interval union per doc pair)
# ===========================================================================


def _pspan_maximal_oracle() -> str:
    return (
        _pspan_ctes()
        + """, u AS (
        -- b_start tiebreak makes the order TOTAL: brk and the running
        -- sum live in SEPARATE window layers, and with duplicate
        -- (a_start, a_end) rows (the same passage matched via several
        -- partners/offsets) the two sorts need not agree on tie order
        -- otherwise — rows sorted before the flagged row pick up
        -- grp=0 and one island splits in two (round-10 sf1 finding).
        SELECT id_a, id_b, a_start, a_start + span_toks AS a_end, b_start,
               CASE WHEN a_start > coalesce(max(a_start + span_toks) OVER (
                        PARTITION BY id_a, id_b
                        ORDER BY a_start, a_start + span_toks, b_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS brk
        FROM spans
    ), gi AS (
        SELECT id_a, id_b, a_start, a_end,
               sum(brk) OVER (PARTITION BY id_a, id_b
                              ORDER BY a_start, a_end, b_start
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM u
    )
    SELECT id_a, id_b, min(a_start)::BIGINT AS a_start,
           (max(a_end) - min(a_start))::BIGINT AS span_toks,
           count(*)::BIGINT AS n_fragments
    FROM gi GROUP BY id_a, id_b, grp
    """
    )


@register(
    "dup_passage_maximal",
    _pspan_maximal_oracle(),
    survey_ids=("A7", "W1"),
    doc="MAXIMAL duplicated-passage intervals per document pair: "
    "dup_passage_spans decomposes shared text by diagonal (pa-pb), so "
    "a passage that appears at TWO offsets in doc B, or one with "
    "internal periodicity, reports overlapping/adjacent fragments in "
    "doc-A coordinates — this entry unions those intervals "
    "([a_start, a_start+span_toks), half-open, touching merges) into "
    "maximal spans via the interval-union islands trick "
    "(interval_union_time's machinery on token offsets): order a "
    "pair's fragments by start, break where start exceeds the running "
    "max end, running-sum the breaks into island ids, min/max per "
    "island.  The window partition is ONE pair's fragment list — "
    "bounded by the pair's span count, never the corpus.  Excision "
    "tooling (dup_passage_rebuild) wants exactly this relation: one "
    "row per contiguous duplicated region, with the fragment count "
    "kept for audit.",
)
def q_dup_passage_maximal(spark, sf_dir):
    spans = _passage_spans(spark, sf_dir)
    ivl = spans.select(
        "id_a",
        "id_b",
        "a_start",
        (F.col("a_start") + F.col("span_toks")).alias("a_end"),
        "b_start",
    )
    # b_start tiebreak: total order so the brk window and the running
    # sum can never disagree on duplicate-(a_start, a_end) rows (the
    # oracle's two window layers re-sort independently; Spark shares
    # one WindowExec sort, but determinism should not hinge on that).
    w = Window.partitionBy("id_a", "id_b").orderBy("a_start", "a_end", "b_start")
    prev_end = F.max("a_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(
        prev_end.isNull() | (F.col("a_start") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    staged = ivl.select("*", brk.alias("__brk"))
    grp = F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        staged.withColumn("__grp", grp)
        .groupBy("id_a", "id_b", "__grp")
        .agg(
            F.min("a_start").cast("long").alias("a_start"),
            (F.max("a_end") - F.min("a_start")).cast("long").alias("span_toks"),
            F.count(F.lit(1)).cast("long").alias("n_fragments"),
        )
        .select("id_a", "id_b", "a_start", "span_toks", "n_fragments")
    )


# ===========================================================================
# IVFADC nprobe autotune (close the measure-don't-guess loop)
# ===========================================================================

IVFADC_TUNE_PCT = 95  # capture >= this % of the full-probe recall


def _ivfadc_autotune_oracle() -> str:
    from .round8b import (
        IVFADC_COARSE,
        PQA_TOPK,
        _ivfadc_chain,
        _pqa_exact_ctes,
        _pqa_qsel_sql,
    )

    c, pct, k = IVFADC_COARSE, IVFADC_TUNE_PCT, PQA_TOPK
    return (
        "WITH "
        + _ivfadc_chain(_pqa_qsel_sql(), k, nprobe=c, probe_rank=True)
        + _pqa_exact_ctes()
        + f""",
    nps AS (SELECT u.np::BIGINT AS nprobe FROM unnest(range(1, {c + 1})) u(np)),
    swept AS (
        SELECT np.nprobe, a.q_id, a.neighbor_id,
               row_number() OVER (PARTITION BY np.nprobe, a.q_id
                                  ORDER BY a.adc_dist, a.neighbor_id) AS rank
        FROM adc a JOIN nps np ON a.probe_rank <= np.nprobe
    ), hits AS (
        SELECT s.nprobe, count(*)::BIGINT AS n_hit
        FROM swept s JOIN exact USING (q_id, neighbor_id)
        WHERE s.rank <= {k}
        GROUP BY s.nprobe
    ), tr AS (SELECT count(*)::BIGINT AS n_true FROM exact),
    rec AS (
        SELECT np.nprobe,
               (coalesce(h.n_hit, 0) * 1000000 // tr.n_true)::BIGINT AS recall_ppm
        FROM nps np LEFT JOIN hits h USING (nprobe) CROSS JOIN tr
    ), fullr AS (SELECT recall_ppm AS full_ppm FROM rec WHERE nprobe = {c}),
    ch AS (
        SELECT min(nprobe) AS chosen_np
        FROM rec CROSS JOIN fullr
        WHERE recall_ppm * 100 >= {pct} * full_ppm
    )
    SELECT rec.nprobe, rec.recall_ppm,
           ({pct} * fullr.full_ppm // 100)::BIGINT AS target_ppm,
           (rec.nprobe = ch.chosen_np) AS chosen
    FROM rec CROSS JOIN fullr CROSS JOIN ch
    """
    )


@register(
    "ivfadc_autotune",
    _ivfadc_autotune_oracle(),
    survey_ids=("A1", "O5"),
    doc="nprobe AUTOTUNING from the recall audit — the loop "
    "ivfadc_recall_audit left open: sweep EVERY probe depth 1..C "
    "from ONE index build (candidates carry the rank of their coarse "
    "cell in the query's preference order, so 'probed at depth np' "
    "is just probe_rank <= np — the index trains once, no per-depth "
    "re-run), measure recall@k against the same exact integer-L2 "
    f"ground truth on the same md5 sample, and choose the SMALLEST "
    f"nprobe capturing >= {IVFADC_TUNE_PCT}% of the full-probe "
    "recall.  The target is RELATIVE to the achievable ceiling "
    "because nprobe only trades routing loss — quantization loss "
    "(pq_recall_audit's number) caps what any probe depth can reach, "
    "so an absolute target would degenerate to 'probe everything'.  "
    "Returns the whole sweep (nprobe, recall_ppm, target_ppm, "
    "chosen) so the operating point is auditable, integer arithmetic "
    "end-to-end.  Shares the replay chain, sample, and ground truth "
    "with the audit queries (builder and oracle both) — the tuner "
    "and the instrument cannot drift.",
)
def q_ivfadc_autotune(spark, sf_dir):
    from .round8b import (
        IVFADC_COARSE,
        PQA_TOPK,
        _ivfadc_rank,
        _pqa_sample_exact,
    )

    c, pct, k = IVFADC_COARSE, IVFADC_TUNE_PCT, PQA_TOPK
    samp, exact = _pqa_sample_exact(spark, sf_dir)
    adc = _ivfadc_rank(
        spark, sf_dir, samp.select("q_id", "qv_raw"), k,
        nprobe=c, probe_rank=True,
    ).localCheckpoint(eager=True)
    nps = spark.range(1, c + 1).select(F.col("id").cast("long").alias("nprobe"))
    w = Window.partitionBy("nprobe", "q_id").orderBy("adc_dist", "neighbor_id")
    swept = (
        adc.join(F.broadcast(nps), F.col("probe_rank") <= F.col("nprobe"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    # exact is the PQA_N*k ground-truth frame (<= 320 rows) but is
    # localCheckpointed (no stats), so without the hint the static
    # plan sorts-and-merges; broadcast it explicitly.
    hits = (
        swept.join(F.broadcast(exact), ["q_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    tr = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    rec = (
        nps.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(tr))
        .select(
            "nprobe",
            F.expr("(coalesce(n_hit, 0) * 1000000) div n_true")
            .cast("long")
            .alias("recall_ppm"),
        )
    )
    fullr = rec.filter(F.col("nprobe") == c).select(
        F.col("recall_ppm").alias("full_ppm")
    )
    ch = (
        rec.crossJoin(F.broadcast(fullr))
        .filter(F.col("recall_ppm") * 100 >= pct * F.col("full_ppm"))
        .agg(F.min("nprobe").alias("chosen_np"))
    )
    return (
        rec.crossJoin(F.broadcast(fullr))
        .crossJoin(F.broadcast(ch))
        .select(
            "nprobe",
            "recall_ppm",
            F.expr(f"({pct} * full_ppm) div 100").cast("long").alias("target_ppm"),
            (F.col("nprobe") == F.col("chosen_np")).alias("chosen"),
        )
    )


# ===========================================================================
# Streaming near-dup ingestion (LSH probe-assign as a live stream)
# ===========================================================================

STREAM_LSH_BATCHES = 3


def _streaming_lsh_oracle() -> str:
    from .round8 import _inc_assign_oracle

    return _inc_assign_oracle()


def make_lsh_assign_batch(sig_state, upd_state):
    """The streaming_lsh_assign foreachBatch sink, as a module-level
    factory so the chaos-replay test (tests/test_streaming_replay.py)
    drives the EXACT production sink twice with the same batch id.
    Replay safety here is by ABSORPTION, not overwrite: a replayed
    batch re-appends updates (every one a true verified smaller-id
    neighbor — the min-fold erases duplicates) and re-appends its
    signatures (the probe reconstructs per-doc with dropDuplicates,
    and duplicate store rows only produce duplicate candidates the
    same min erases)."""

    def apply_batch(batch_df, _batch_id):
        sess = batch_df.sparkSession
        new_sigs = (
            D.minhash_signature(
                batch_df.select("doc_id", "text"), "text", k=LSH_K
            )
            .drop("text")
            .withColumn("is_new", F.lit(True))
            .localCheckpoint(eager=True)  # sign once: probe + append reuse
        )
        # Band-partitioned store probe: partition-prune + broadcast
        # band-hash semi-join, so the refresh reads/shuffles O(batch x
        # touched buckets), never the whole store (round-10 fix of the
        # round-9 store-rescan weak).  None == genuinely-empty store
        # (no parquet files yet); real read errors propagate.
        store = D.lsh_store_probe_read(
            sess, sig_state, new_sigs, k=LSH_K, bands=LSH_BANDS
        )
        if store is None:
            all_sigs = new_sigs
        else:
            all_sigs = store.withColumn("is_new", F.lit(False)).unionByName(
                new_sigs
            )
        updates = D.lsh_probe_assign(
            all_sigs, "is_new", "doc_id",
            k=LSH_K, bands=LSH_BANDS, verify_min=LSH_THRESH,
        )
        # Update log BEFORE the store append (the update plan reads the
        # store lazily; this batch's signatures must not probe
        # themselves as history).  An empty batch still appends a
        # schema-bearing empty file, so the final read never 404s.
        updates.write.mode("append").parquet(upd_state)
        D.lsh_store_append(
            new_sigs.drop("is_new"), sig_state, k=LSH_K, bands=LSH_BANDS
        )

    return apply_batch


def lsh_assign_fold(spark, upd_state):
    """Drain fold for the assignment log (keyed MIN-merge) — shared by
    the catalog query and the replay test."""
    return (
        spark.read.parquet(upd_state)
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
    )


@register(
    "streaming_lsh_assign",
    _streaming_lsh_oracle(),
    survey_ids=("ST1", "S11", "A7"),
    doc="Streaming near-dup INGESTION — incremental_lsh_assign's "
    "crawl-refresh fold bridged to Structured Streaming: documents "
    f"arrive as a file-source stream in {STREAM_LSH_BATCHES} "
    "micro-batches (maxFilesPerTrigger=1 over a file-per-refresh "
    "layout, availableNow); each micro-batch MinHash-signs its docs "
    "inside foreachBatch, PROBES them against the checkpointed "
    "parquet signature store — PARTITIONED by band-key-hash bucket "
    "(operators/dedup.py:lsh_store_append), each micro-batch "
    "partition-pruning the store scan to its touched buckets and "
    "broadcast-semi-joining on the exact band hash before any "
    "shuffle (lsh_store_probe_read), then lsh_probe_assign — "
    "the bounded-output assign probe, O(touched members) per batch "
    "in OUTPUT and COMPUTE alike, "
    "never the pair relation), appends its (doc_id, dup_of) updates "
    "to the assignment log, then appends its signatures to the "
    "store.  The drained state min-folds the log — associative, "
    "commutative, and duplicate-absorbing, so the result is "
    "invariant to micro-batch boundaries AND to checkpoint-replayed "
    "batches (a replay only appends duplicate rows the MIN erases) — "
    "and must hash-equal the ONE-SHOT oracle: GROUP BY doc "
    "MIN(neighbor) over the uncapped pair run on the union corpus "
    "(lsh_probe_assign's batching-invariance theorem, now carried by "
    "the streaming engine's own trigger/checkpoint machinery instead "
    "of a driver loop).",
)
def q_streaming_lsh_assign(spark, sf_dir):
    from ..session import scratch_dir

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = scratch_dir("stream_lsh")
    src = f"{root}/src"
    sig_state = f"{root}/sig_state"
    upd_state = f"{root}/assign_updates"
    # Lay the corpus out one file per refresh (doc_id residues), so the
    # file source replays it as STREAM_LSH_BATCHES micro-batches.  The
    # fold is batch-order-invariant, so source file ordering is free.
    for r in range(STREAM_LSH_BATCHES):
        docs.filter(F.col("doc_id") % STREAM_LSH_BATCHES == r).coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    apply_batch = make_lsh_assign_batch(sig_state, upd_state)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_lsh_assign drain timed out")
    return lsh_assign_fold(spark, upd_state)


# ===========================================================================
# LSH band autotune (the tuner trilogy's dedup leg)
# ===========================================================================

LSH_TUNE_PCT = 95  # capture >= this % of the loosest banding's recall
_LSH_BAND_SWEEP = (1, 2, 4, 8, 16)  # divisors of LSH_K


def _lsh_band_autotune_oracle() -> str:
    from .llm_ops import _SIG_MATCHES
    from .round7 import _lsh_audit_base_ctes

    k, pct = LSH_K, LSH_TUNE_PCT
    arms = []
    for nb in _LSH_BAND_SWEEP:
        rpb = k // nb
        for band in range(nb):
            key = ", ".join(f"mh{band * rpb + j}" for j in range(rpb))
            arms.append(
                f"SELECT doc_id, {nb}::BIGINT AS nb, "
                f"{band}::BIGINT AS band_id, [{key}] AS key FROM sig"
            )
    loosest = _LSH_BAND_SWEEP[-1]
    return (
        _lsh_audit_base_ctes()
        + f""",
    sweep AS ({" UNION ALL ".join(arms)}),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.nb, a.doc_id AS id_a, b.doc_id AS id_b
        FROM sweep a JOIN sweep b
          ON a.nb = b.nb AND a.band_id = b.band_id AND a.key = b.key
         AND a.doc_id < b.doc_id),
    ver AS MATERIALIZED (
        SELECT cand.nb, cand.id_a, cand.id_b
        FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
                  JOIN sig sb ON cand.id_b = sb.doc_id
        WHERE {_SIG_MATCHES} >= {LSH_THRESH}),
    nbs AS (SELECT unnest([{", ".join(str(b) for b in _LSH_BAND_SWEEP)}])::BIGINT
                AS nb),
    cc AS (SELECT nb, count(*)::BIGINT AS n_cand FROM cand GROUP BY nb),
    vc AS (SELECT nb, count(*)::BIGINT AS n_verified FROM ver GROUP BY nb),
    hc AS (SELECT ver.nb, count(*)::BIGINT AS n_hit
           FROM ver JOIN truth USING (id_a, id_b) GROUP BY ver.nb),
    tr AS (SELECT count(*)::BIGINT AS n_true FROM truth),
    rec AS (
        SELECT nbs.nb, coalesce(cc.n_cand, 0) AS n_cand,
               coalesce(vc.n_verified, 0) AS n_verified,
               coalesce(hc.n_hit, 0) AS n_hit,
               (coalesce(hc.n_hit, 0) * 1000000 // tr.n_true)::BIGINT
                   AS recall_ppm
        FROM nbs LEFT JOIN cc USING (nb) LEFT JOIN vc USING (nb)
                 LEFT JOIN hc USING (nb) CROSS JOIN tr),
    fullr AS (SELECT recall_ppm AS full_ppm FROM rec WHERE nb = {loosest}),
    ch AS (SELECT min(nb) AS chosen_nb FROM rec CROSS JOIN fullr
           WHERE recall_ppm * 100 >= {pct} * full_ppm)
    SELECT rec.nb AS bands, rec.n_cand, rec.n_verified, rec.n_hit,
           rec.recall_ppm,
           ({pct} * fullr.full_ppm // 100)::BIGINT AS target_ppm,
           (rec.nb = ch.chosen_nb) AS chosen
    FROM rec CROSS JOIN fullr CROSS JOIN ch
    """
    )


@register(
    "lsh_band_autotune",
    _lsh_band_autotune_oracle(),
    survey_ids=("A1", "A3"),
    doc="Band-count AUTOTUNING for the MinHash-LSH dedup path — the "
    "tuner trilogy's dedup leg (ivfadc_autotune tunes the ANN leg "
    "from its audit; this tunes banding from lsh_recall_audit's "
    f"sample and ground truth): sweep bands over the divisors of "
    f"k={LSH_K} — one signature computation, every banding is just a "
    "different grouping of the SAME 16 hashes — measure candidate "
    "volume (the verification workload banding exists to bound: "
    "more/narrower bands => exponentially more candidates) and "
    "verified recall against exact integer-Jaccard truth, and choose "
    f"the FEWEST bands capturing >= {LSH_TUNE_PCT}% of the loosest "
    "banding's recall.  Fewest bands = cheapest: candidate volume is "
    "monotone in band count, so the choice rule reads 'stop widening "
    "the net once the extra candidates stop catching true dups'.  "
    "The ceiling is relative (the 12-of-16 verify gate caps what any "
    "banding can pass), the sample is the audit's constant-cost md5 "
    "sample, and the whole sweep is the result relation — integer "
    "arithmetic end-to-end, hash-checked against the oracle replay.",
)
def q_lsh_band_autotune(spark, sf_dir):
    from .round7 import _lsh_audit_sample_truth

    k, pct = LSH_K, LSH_TUNE_PCT
    loosest = _LSH_BAND_SWEEP[-1]
    samp, truth = _lsh_audit_sample_truth(spark, sf_dir)
    sig = (
        D.minhash_signature(samp, "text", k=k)
        .drop("text")
        .localCheckpoint(eager=True)  # sign once: 31 band arms reuse it
    )
    structs = []
    for nb in _LSH_BAND_SWEEP:
        rpb = k // nb
        for band in range(nb):
            structs.append(
                F.struct(
                    F.lit(nb).cast("long").alias("nb"),
                    F.lit(band).cast("long").alias("band_id"),
                    F.array(
                        *[F.col(f"mh{band * rpb + j}") for j in range(rpb)]
                    ).alias("key"),
                )
            )
    sweep = sig.select(
        "doc_id", F.explode(F.array(*structs)).alias("b")
    ).select("doc_id", "b.nb", "b.band_id", "b.key")
    a, b = sweep.alias("a"), sweep.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.nb") == F.col("b.nb"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.nb").alias("nb"),
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)],
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(k)
    )
    nbs = spark.createDataFrame(
        [(int(nb),) for nb in _LSH_BAND_SWEEP], "nb long"
    )
    # Round-12 restructure: n_cand / n_verified / n_hit were three
    # aggregate subtrees over two eager checkpoints (cand, ver); fold
    # them into ONE grouped pass over the flagged candidate relation
    # (verified as an int flag instead of a filter; truth membership
    # via a broadcast left join — truth is sample-bounded but
    # localCheckpointed/stat-less, hence the explicit hint).  The
    # per-arm stat frame is |_LSH_BAND_SWEEP| rows, so checkpoint THAT
    # (the tail references it three times) instead of the pair frames.
    arm_stats = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("v", (matches >= LSH_THRESH).cast("int"))
        .join(
            F.broadcast(truth.withColumn("in_t", F.lit(1))),
            ["id_a", "id_b"],
            "left",
        )
        .groupBy("nb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cand"),
            F.sum("v").cast("long").alias("n_verified"),
            F.coalesce(
                F.sum(F.col("v") * F.coalesce(F.col("in_t"), F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_hit"),
        )
    )
    tr = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    rec = (
        nbs.join(arm_stats, "nb", "left")
        .crossJoin(F.broadcast(tr))
        .select(
            "nb",
            F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce("n_verified", F.lit(0)).cast("long").alias("n_verified"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.expr("(coalesce(n_hit, 0) * 1000000) div n_true")
            .cast("long")
            .alias("recall_ppm"),
        )
        .localCheckpoint(eager=True)  # |sweep| rows; tail reads it 3x
    )
    fullr = rec.filter(F.col("nb") == loosest).select(
        F.col("recall_ppm").alias("full_ppm")
    )
    ch = (
        rec.crossJoin(F.broadcast(fullr))
        .filter(F.col("recall_ppm") * 100 >= pct * F.col("full_ppm"))
        .agg(F.min("nb").alias("chosen_nb"))
    )
    return (
        rec.crossJoin(F.broadcast(fullr))
        .crossJoin(F.broadcast(ch))
        .select(
            F.col("nb").alias("bands"),
            "n_cand",
            "n_verified",
            "n_hit",
            "recall_ppm",
            F.expr(f"({pct} * full_ppm) div 100").cast("long").alias("target_ppm"),
            (F.col("nb") == F.col("chosen_nb")).alias("chosen"),
        )
    )


# ===========================================================================
# Gopher rule attribution (which filter kills what, uniquely)
# ===========================================================================


def _gopher_attr_oracle() -> str:
    from .round8c import GOPHER_METRIC_CTES, GOPHER_RULES_SQL

    rules = list(GOPHER_RULES_SQL)
    flags = ", ".join(f"{GOPHER_RULES_SQL[r]} AS r_{r}" for r in rules)
    arms = []
    for r in rules:
        others = " AND ".join(f"r_{o}" for o in rules if o != r)
        arms.append(
            f"""
        SELECT '{r}' AS rule,
               sum(CASE WHEN NOT r_{r} THEN 1 ELSE 0 END)::BIGINT AS n_fail,
               sum(CASE WHEN NOT r_{r} AND {others} THEN 1 ELSE 0 END)::BIGINT
                   AS n_unique_fail
        FROM f"""
        )
    keep_all = " AND ".join(f"r_{r}" for r in rules)
    return (
        GOPHER_METRIC_CTES
        + f""", f AS (
        SELECT doc_id, {flags} FROM m
    ), tot AS (
        SELECT count(*)::BIGINT AS n_docs,
               sum(CASE WHEN {keep_all} THEN 1 ELSE 0 END)::BIGINT AS n_keep
        FROM f
    ), per AS ({" UNION ALL ".join(arms)})
    SELECT per.rule, per.n_fail, per.n_unique_fail, tot.n_docs, tot.n_keep
    FROM per CROSS JOIN tot
    """
    )


@register(
    "gopher_rule_attribution",
    _gopher_attr_oracle(),
    survey_ids=("A2", "A1"),
    doc="Filter-rule KILL ATTRIBUTION for the Gopher stack — the table "
    "a pipeline owner reads before loosening a threshold: per rule, "
    "how many documents fail it at all (n_fail) and how many it "
    "UNIQUELY removes (n_unique_fail: fails this rule, passes every "
    "other) — the rule's marginal contribution, since a doc failing "
    "two rules returns with neither threshold change alone.  Shares "
    "the metric pass and the rule predicates with "
    "gopher_quality_rules (round8c.GOPHER_RULES_SQL / gopher_rules — "
    "the attribution and the boolean view cannot drift).  Plan "
    "shape: ONE fused-token projection pass computes all four flags, "
    "then a single global aggregate per rule arm over the cached "
    "flag frame — no shuffle carries anything wider than the "
    "counters; at 100 TB this is a scan plus map-side partial "
    "aggregation, the cheapest audit in the stack.",
)
def q_gopher_rule_attribution(spark, sf_dir):
    from ..caching import track_cache
    from .round8c import GOPHER_RULES_SQL, gopher_metrics, gopher_rules

    rules = list(GOPHER_RULES_SQL)
    m = gopher_metrics(spark, sf_dir)
    r = gopher_rules(m)
    # One projection computes every flag; cached because each rule arm
    # and the totals re-read it (Catalyst does no CSE across branches).
    # Re-measured round 13 (A/B at sf0.1): 1.15 s cached vs 1.13 s
    # without — a wash HERE, kept because the cached frame is 9 narrow
    # columns per doc while recompute is ~9 full text-metric passes
    # (gopher_metrics tokenizes) with no shared exchange to reuse —
    # the un-cached wash at sf0.1 is the scan being cheap, not the
    # recompute being free.
    f = track_cache(
        m.select("doc_id", *[r[name].alias(f"r_{name}") for name in rules])
    )
    keep_all = None
    for name in rules:
        c = F.col(f"r_{name}")
        keep_all = c if keep_all is None else (keep_all & c)
    tot = f.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(keep_all.cast("int")).cast("long").alias("n_keep"),
    )
    arms = []
    for name in rules:
        others = None
        for o in rules:
            if o == name:
                continue
            c = F.col(f"r_{o}")
            others = c if others is None else (others & c)
        arms.append(
            f.agg(
                F.sum((~F.col(f"r_{name}")).cast("int"))
                .cast("long")
                .alias("n_fail"),
                F.sum(((~F.col(f"r_{name}")) & others).cast("int"))
                .cast("long")
                .alias("n_unique_fail"),
            ).select(F.lit(name).alias("rule"), "n_fail", "n_unique_fail")
        )
    per = arms[0]
    for a in arms[1:]:
        per = per.unionByName(a)
    return per.crossJoin(F.broadcast(tot)).select(
        "rule", "n_fail", "n_unique_fail", "n_docs", "n_keep"
    )


# ===========================================================================
# Temperature-flattened source mixing (T = 2, exact integer sqrt)
# ===========================================================================

TMIX_BUDGET_PCT = 50  # global token budget as % of corpus tokens

# Exact integer sqrt: float seed + integer correction (the float sqrt
# of a BIGINT can be off by one ulp at perfect-square boundaries —
# the correction makes the result bit-portable across engines).
_ISQRT_SQL = """(CASE WHEN (f0 + 1) * (f0 + 1) <= avail THEN f0 + 1
                      WHEN f0 * f0 > avail THEN f0 - 1
                      ELSE f0 END)"""


def _tmix_oracle() -> str:
    pct = TMIX_BUDGET_PCT
    samp = "('0x' || substr(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
    WITH toks AS (
        -- coalesce mirrors the Spark side's coalesce(text, ''): a NULL
        -- text row must count 0 tokens, not poison sum(nt) with NULL.
        SELECT doc_id, source,
               CASE WHEN trim(lower(coalesce(text, ''))) = '' THEN 0
                    ELSE len(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'))
               END::BIGINT AS nt
        FROM documents
    ), src AS (
        SELECT source, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS avail
        FROM toks GROUP BY source
    ), sq AS (
        SELECT source, n_docs, avail,
               floor(sqrt(avail))::BIGINT AS f0
        FROM src
    ), wts AS (
        SELECT source, n_docs, avail, {_ISQRT_SQL}::BIGINT AS w FROM sq
    ), tot AS (
        SELECT sum(w)::BIGINT AS sum_w,
               (sum(avail) * {pct}) // 100 AS budget
        FROM wts
    ), alloc AS (
        SELECT w.source, w.n_docs, w.avail, w.w,
               least((t.budget * w.w) // t.sum_w, w.avail) AS tokens_alloc
        FROM wts w CROSS JOIN tot t
    ), des AS (
        SELECT source, n_docs, avail AS tokens_avail, w,
               CASE WHEN avail = 0 THEN 0
                    ELSE least(1000000, (tokens_alloc * 1000000) // avail)
               END::BIGINT AS accept_ppm
        FROM alloc
    ), kept AS (
        SELECT t.source, count(*)::BIGINT AS docs_kept,
               sum(t.nt)::BIGINT AS tokens_kept
        FROM toks t JOIN des USING (source)
        WHERE {samp} % 1000000 < des.accept_ppm
        GROUP BY t.source
    )
    SELECT des.source, des.n_docs, des.tokens_avail, des.w, des.accept_ppm,
           coalesce(kept.docs_kept, 0)::BIGINT AS docs_kept,
           coalesce(kept.tokens_kept, 0)::BIGINT AS tokens_kept
    FROM des LEFT JOIN kept USING (source)
    """


@register(
    "source_temperature_mix",
    _tmix_oracle(),
    survey_ids=("A1", "A2"),
    doc="Temperature-flattened source mixing, T=2 — the multilingual-"
    "LM sampling rule (sample source s with probability proportional "
    "to n_s^(1/T), flattening the head so low-resource sources are "
    "not drowned; T=2 => weights are integer square roots of token "
    "mass, computed EXACTLY via float seed + integer correction so "
    f"both engines agree at perfect-square boundaries).  A "
    f"{TMIX_BUDGET_PCT}% global token budget is split proportionally "
    "to the flattened weights (single-shot proportional rule, capped "
    "at each source's own supply — deliberately NOT water-fill: "
    "token_budget_mix redistributes cap overflow, this rule shows "
    "the flattening itself; run both and diff to see what "
    "redistribution buys), realized through the deterministic md5 "
    "acceptance sampler and reported as per-source design + realized "
    "yield.  Plan: one tokenize pass -> per-source aggregate (tiny) "
    "-> broadcast design joined back for the acceptance filter — "
    "corpus touched twice, shuffled never (acceptance is a scan-side "
    "predicate on broadcast ppm thresholds).",
)
def q_source_temperature_mix(spark, sf_dir):
    from ..functions import md5_long, tokens

    pct = TMIX_BUDGET_PCT
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.lower(F.coalesce(F.col("text"), F.lit(""))))).cast(
            "long"
        ).alias("nt"),
    )
    src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("avail"),
    )
    wts = src.withColumn(
        "f0", F.floor(F.sqrt(F.col("avail"))).cast("long")
    ).withColumn("w", F.expr(_ISQRT_SQL).cast("long"))
    tot = wts.agg(
        F.sum("w").cast("long").alias("sum_w"),
        F.expr(f"(sum(avail) * {pct}) div 100").cast("long").alias("budget"),
    )
    des = (
        wts.crossJoin(F.broadcast(tot))
        .withColumn(
            "tokens_alloc",
            F.least(F.expr("(budget * w) div sum_w"), F.col("avail")).cast(
                "long"
            ),
        )
        .select(
            "source",
            "n_docs",
            F.col("avail").alias("tokens_avail"),
            "w",
            F.when(F.col("avail") == 0, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(1000000),
                    F.expr("(tokens_alloc * 1000000) div avail"),
                )
            )
            .cast("long")
            .alias("accept_ppm"),
        )
    )
    kept = (
        toks.join(F.broadcast(des.select("source", "accept_ppm")), "source")
        .filter(
            md5_long(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string")))
            % 1000000
            < F.col("accept_ppm")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_kept"),
            F.sum("nt").cast("long").alias("tokens_kept"),
        )
    )
    return des.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "tokens_avail",
        "w",
        "accept_ppm",
        F.coalesce("docs_kept", F.lit(0)).cast("long").alias("docs_kept"),
        F.coalesce("tokens_kept", F.lit(0)).cast("long").alias("tokens_kept"),
    )
