"""Round-8b catalog additions.

- ``dup_passage_spans``: UNALIGNED cross-document duplicated-passage
  extraction (the exact-substring dedup of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better",
  re-expressed relationally): rolling k-gram fingerprints per token
  position, postings self-matched under a document-frequency cap,
  then consecutive matches merged into MAXIMAL shared spans with a
  gaps-and-islands pass per (pair, diagonal).  Complements the
  round-6 ``span_dedup_rebuild`` (ALIGNED chunks — misses passages
  that straddle a chunk boundary or sit at different offsets in the
  two documents) and the MinHash family (whole-document similarity —
  blind to a long verbatim quote inside otherwise-different docs).
- ``pq_recall_audit``: measure-don't-guess applied to the PQ/ADC
  search path, the lsh_recall_audit counterpart: exact integer-L2
  top-k on a fixed md5-chosen query sample vs the production ADC
  top-k through the trained codebook, reported as recall@k ppm.
- ``bpe_corpus_tokens``: the learned BPE tokenizer applied
  CORPUS-WIDE for per-source token accounting — the number a token
  budget is actually denominated in.  Segmentation cost is bounded
  by the DISTINCT vocabulary (segment each word once, broadcast the
  per-word token count back onto word instances), so corpus volume
  never enters the BPE state machine.
- ``dup_passage_rebuild``: the span detector APPLIED — duplicated
  passages are excised from the LATER document (keep-first) and the
  text rebuilt, output bounded by affected docs.
- ``eval_decontam_spans``: the same machinery with the pairing rule
  swapped to eval-x-train — passage-level benchmark decontamination
  with exact position evidence on both sides.
- ``term_proximity_search``: positional-index proximity search (two
  corpus-derived probe terms within a 10-token window) — the IR
  operator BM25 lacks; only the probed terms' postings reach the
  shuffle.
- ``embed_ivfadc_topk``: IVFADC — coarse IVF routing + PQ retrained
  on residuals, all-integer asymmetric-distance ranking; candidates
  touched only in probed cells, 2-byte codes after encoding.
- ``training_shard_write``: the seeded-shuffle shard layout WRITTEN
  as range-packed parquet files and value-checked through a
  manifest round trip (the layout-lever discipline).
- ``incremental_shard_manifest``: the same store grown APPEND-ONLY
  across corpus refreshes (running offset folded forward per
  refresh, carry shards across boundaries, one-shot equivalence as
  the oracle).
- ``decile_cut_values``: exact per-group decile cut values at
  distinct-values cost — the documented escape hatch for
  value_deciles' ntile ceiling.
- ``ivfadc_recall_audit``: the measure-don't-guess trilogy closed —
  IVFADC recall@k vs exact ground truth on pq_recall_audit's exact
  sample, decomposing quantization loss from cell-pruning loss.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql
from .catalog import load, register, trained_ivf_centroids

# ===========================================================================
# Unaligned duplicated-passage extraction (exact-substring dedup)
# ===========================================================================

# k-gram width: long enough that chance 8-token collisions are
# negligible, short enough that a 16-token passage yields >= 9
# consecutive matches to merge.
PSPAN_K = 8
# Minimum reported span, in tokens.
PSPAN_MIN = 16
# Document-frequency cap per k-gram hash: a gram occurring at more
# than this many positions corpus-wide is boilerplate / an exact-dup
# clique — territory owned by span_dedup_rebuild and exact_dedup —
# and enumerating its postings pairwise would be quadratic in the
# clique size.  Measured at sf0.01: the cap is not binding (24 spans
# at caps 16/32/64 alike); it exists to bound the worst case.
# An over-cap gram INSIDE an otherwise-unique shared passage does NOT
# split the reported span: islands bridge same-diagonal gaps <= k
# (see _pspan_ctes), which losslessly covers any capped run of up to
# k-1 consecutive grams.  Only a capped run LONGER than k-1 grams
# (a >= 2k-1-token boilerplate block mid-passage) still splits, and a
# capped run at the very start/end of a passage shortens it (no
# flanking match to anchor the bridge) — both are exact-dup-clique
# territory by construction.
PSPAN_DF_MAX = 16


def _pspan_base_ctes() -> str:
    """Tokenize -> rolling-gram -> df-cap fragment (CTEs t, g, df) —
    shared by every passage-span consumer."""
    k, cap = PSPAN_K, PSPAN_DF_MAX
    h = md5_long_sql(f"array_to_string(toks[p : p + {k - 1}], ' ')")
    return f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, u.p::BIGINT AS p, {h} AS h
        FROM t, unnest(range(1, len(toks) - {k} + 2)) AS u(p)
        WHERE len(toks) >= {k}
    ), df AS (
        SELECT h FROM g GROUP BY h HAVING count(*) BETWEEN 2 AND {cap}
    )"""


def _pspan_ctes() -> str:
    """Open CTE chain ending in ``spans`` (id_a, id_b, a_start,
    b_start, span_toks) — shared by the measuring query and the
    rebuild so the two cannot drift (the sql_lm_chain lesson).

    Islands bridge same-diagonal gaps of up to k matched positions:
    a gap can only come from grams the df cap dropped (an intermediate
    gram of a matched pair is shared by both docs, so df >= 2), and
    for gap <= k the flanking gram windows [p, p+k) and [p', p'+k)
    still COVER every token in between (p' <= p+k), so the span stays
    verbatim-verified.  A genuine token mismatch breaks the k grams
    overlapping it, forcing a gap of >= k+1 — so bridging never merges
    across real differences.  span_toks is max(pa)-min(pa)+k (equal to
    count+k-1 when no gram was capped)."""
    k, mn = PSPAN_K, PSPAN_MIN
    return _pspan_base_ctes() + f""", m AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb
        FROM g a JOIN g b USING (h) JOIN df USING (h)
        WHERE a.doc_id < b.doc_id
    ), ib AS (
        SELECT id_a, id_b, pa, pb, pa - pb AS diag,
               CASE WHEN pa - lag(pa) OVER (PARTITION BY id_a, id_b, pa - pb
                                            ORDER BY pa) <= {k}
                    THEN 0 ELSE 1 END AS brk
        FROM m
    ), i AS (
        SELECT id_a, id_b, pa, pb, diag,
               sum(brk) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                              ROWS UNBOUNDED PRECEDING) AS isl
        FROM ib
    ), spans AS (
        SELECT id_a, id_b, min(pa)::BIGINT AS a_start, min(pb)::BIGINT AS b_start,
               (max(pa) - min(pa) + {k})::BIGINT AS span_toks
        FROM i GROUP BY id_a, id_b, diag, isl
        HAVING max(pa) - min(pa) + {k} >= {mn}
    )"""


def _pspan_oracle() -> str:
    return (
        _pspan_ctes()
        + """
    SELECT id_a, id_b, a_start, b_start, span_toks FROM spans
    """
    )


@register(
    "dup_passage_spans",
    _pspan_oracle(),
    survey_ids=("A7", "G2", "W1"),
    doc="Unaligned cross-document duplicated-passage extraction (the "
    "exact-substring dedup of Lee et al. 2022, relationally): every "
    f"token position emits a rolling {PSPAN_K}-gram fingerprint; "
    "per-gram postings are collapsed to ONE sorted list (the "
    "lexical_cosine posting pattern — a single corpus explode + one "
    f"keyed aggregation), df-capped at {PSPAN_DF_MAX} (an over-cap "
    "gram is boilerplate/exact-dup-clique territory owned by "
    "span_dedup_rebuild and exact_dedup, and pairwise enumeration of "
    "its postings would be quadratic in the clique); cross-document "
    "match pairs come from an in-row combination expansion bounded "
    "by cap^2/2 per gram; and consecutive matches merge into MAXIMAL "
    "shared spans via gaps-and-islands per (pair, diagonal = pa-pb) "
    "— a window whose partition is one pair's one diagonal, bounded "
    "by the shorter document, never the corpus.  Reports (id_a, "
    f"id_b, a_start, b_start, span_toks >= {PSPAN_MIN}) — exact "
    "positions, so a rebuild pass can excise the duplicated passage "
    "from one side.  Catches what the aligned chunker structurally "
    "misses: offset-shifted quotes (a diagonal with pa != pb) and "
    "boundary-straddling passages.",
)
def q_dup_passage_spans(spark, sf_dir):
    return _passage_spans(spark, sf_dir)


def _passage_spans(spark, sf_dir):
    k = PSPAN_K
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= k)
    g = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - k + 1),
                lambda p: F.struct(
                    p.cast("long").alias("p"),
                    md5_long(F.array_join(F.slice("toks", p, k), " ")).alias("h"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.p", "s.h")
    posts = (
        g.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "p"))).alias("ps"))
        .filter((F.size("ps") >= 2) & (F.size("ps") <= PSPAN_DF_MAX))
    )
    # (x, i) -> pairs (ps[i], ps[j]) for i < j over the (doc_id, p)-
    # sorted list: id_a <= id_b by construction, same-doc repeats
    # filtered below (a within-doc repeat is doc_repetition's signal,
    # not a cross-doc passage).
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    x["p"].alias("pa"),
                    y["doc_id"].alias("id_b"),
                    y["p"].alias("pb"),
                ),
            ),
        )
    )
    m = (
        posts.select(F.explode(pair_structs).alias("pr"))
        .select("pr.id_a", "pr.pa", "pr.id_b", "pr.pb")
        .filter(F.col("id_a") != F.col("id_b"))
    )
    # Cap-tolerant islands: bridge same-diagonal gaps <= k (only the
    # df cap can create them, and the flanking gram windows still
    # cover every bridged token — see _pspan_ctes' docstring); a real
    # token mismatch forces a gap >= k+1 and still splits.
    w = Window.partitionBy("id_a", "id_b", F.col("pa") - F.col("pb")).orderBy("pa")
    brk = F.when(F.col("pa") - F.lag("pa").over(w) <= k, F.lit(0)).otherwise(
        F.lit(1)
    )
    staged = m.select(
        "id_a",
        "id_b",
        "pa",
        "pb",
        (F.col("pa") - F.col("pb")).alias("diag"),
        brk.alias("__brk"),
    )
    w2 = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa").rowsBetween(
        Window.unboundedPreceding, 0
    )
    isl = staged.withColumn("isl", F.sum("__brk").over(w2))
    return (
        isl.groupBy("id_a", "id_b", "diag", "isl")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + F.lit(k)).cast("long").alias("span_toks"),
        )
        .filter(F.col("span_toks") >= PSPAN_MIN)
        .select("id_a", "id_b", "a_start", "b_start", "span_toks")
    )


def _pspan_rebuild_oracle() -> str:
    return (
        _pspan_ctes()
        + """, dropped AS (
        SELECT DISTINCT spans.id_b AS doc_id, u.pos::BIGINT AS pos
        FROM spans, unnest(range(b_start, b_start + span_toks)) AS u(pos)
    ), affected AS (
        SELECT DISTINCT doc_id FROM dropped
    ), tok AS (
        SELECT t.doc_id, len(t.toks)::BIGINT AS n_toks,
               u.pos::BIGINT AS pos, t.toks[u.pos] AS tk
        FROM t JOIN affected USING (doc_id),
             unnest(range(1, len(t.toks) + 1)) AS u(pos)
    )
    SELECT tok.doc_id, max(tok.n_toks) AS n_toks,
           sum(CASE WHEN d.pos IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_dropped,
           coalesce(string_agg(tok.tk, ' ' ORDER BY tok.pos)
                        FILTER (WHERE d.pos IS NULL), '') AS kept_text
    FROM tok LEFT JOIN dropped d ON tok.doc_id = d.doc_id AND tok.pos = d.pos
    GROUP BY tok.doc_id
    """
    )


@register(
    "dup_passage_rebuild",
    _pspan_rebuild_oracle(),
    survey_ids=("A7", "G2"),
    doc="Passage-level dedup APPLIED, not just measured (the "
    "span_dedup_rebuild discipline, on the unaligned detector): for "
    "every duplicated passage dup_passage_spans reports, the LATER "
    "document (id_b — keep-first-occurrence, deterministic since "
    "id_a < id_b) has the covered token positions excised and its "
    "text rebuilt from the survivors in order.  Output is bounded by "
    "AFFECTED documents (docs that lose at least one token), not the "
    "corpus: (doc_id, n_toks, n_dropped, kept_text).  Overlapping "
    "spans union through a DISTINCT position set, so double-counting "
    "is impossible.  Plan shape: the span relation is the verified "
    "dup_passage_spans plan (shared builder, shared oracle CTE chain "
    "— measure and rebuild cannot drift); position excision is one "
    "explode of the affected docs (semi-join pruned before the "
    "explode, so the corpus is never re-tokenized), a left anti "
    "lookup on (doc, pos), and one per-doc sorted-collect rebuild "
    "bounded by the doc's own token count.  Soak cost model: wall "
    "tracks AFFECTED-doc volume, not corpus volume — on 10x verbatim "
    "replicas (SOAK_r8) output grows 173x (every replica is "
    "affected) and wall 3.8x; a corpus with constant dup density "
    "scales linearly.",
)
def q_dup_passage_rebuild(spark, sf_dir):
    spans = _passage_spans(spark, sf_dir)
    dropped = (
        spans.select(
            F.col("id_b").alias("doc_id"),
            F.explode(
                F.sequence(
                    F.col("b_start"), F.col("b_start") + F.col("span_toks") - 1
                )
            ).alias("pos"),
        )
        .distinct()
        # Tiny (affected positions only) and read three times below;
        # materializing also stops the full span plan re-running per
        # consumer.
        .localCheckpoint(eager=True)
    )
    affected = dropped.select("doc_id").distinct()
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tok = (
        docs.join(affected, "doc_id", "left_semi")
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            F.posexplode("toks").alias("pos0", "tk"),
        )
        .withColumn("pos", (F.col("pos0") + 1).cast("long"))
    )
    flagged = tok.join(
        dropped.withColumn("__d", F.lit(True)), ["doc_id", "pos"], "left"
    )
    kept_struct = F.when(
        F.col("__d").isNull(), F.struct("pos", "tk")
    )
    return flagged.groupBy("doc_id").agg(
        F.max("n_toks").alias("n_toks"),
        F.sum(F.when(F.col("__d").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        # collect_list skips the NULL structs the when() emits for
        # dropped positions; all-dropped docs land as '' via the empty
        # array, matching the oracle's coalesce.
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["tk"],
            ),
            " ",
        ).alias("kept_text"),
    )


# ===========================================================================
# PQ/ADC recall audit (the lsh_recall_audit counterpart for ANN search)
# ===========================================================================

PQA_N = 32  # fixed query-sample size: audit cost is Q*N however big N
PQA_TOPK = 10


def _pq_audit_oracle() -> str:
    from ..operators.similarity import sql_pq_chain

    subdim = 16
    isq_sub = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (sv[i] - qc[i]) * (sv[i] - qc[i])))"
    )
    isq_full = (
        "list_sum(list_transform(range(1, 65), "
        "i -> (s.qv[i] - c2.qv[i]) * (s.qv[i] - c2.qv[i])))"
    )
    pri = md5_long_sql("'pqa:' || CAST(vec_id AS VARCHAR)")
    return (
        "WITH "
        + sql_pq_chain()
        + f""",
    samp AS (SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY {pri}, vec_id) AS rn
        FROM e) WHERE rn <= {PQA_N}),
    exact AS (SELECT q_id, neighbor_id, rnk FROM (
        SELECT s.vec_id AS q_id, c2.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY s.vec_id
                   ORDER BY {isq_full}, c2.vec_id) AS rnk
        FROM e s JOIN samp USING (vec_id), e c2
        WHERE c2.vec_id <> s.vec_id) WHERE rnk <= {PQA_TOPK}),
    codes AS (SELECT vec_id, m, centroid_id FROM (
        SELECT subs.vec_id, subs.m, c.centroid_id,
               row_number() OVER (PARTITION BY subs.vec_id, subs.m
                   ORDER BY {isq_sub.replace('qc', 'c.qc')}, c.centroid_id) AS rn
        FROM subs JOIN cent c USING (m)) WHERE rn = 1),
    dtab AS (SELECT subs.vec_id AS q_id, c.m, c.centroid_id,
                    {isq_sub.replace('qc', 'c.qc')}::BIGINT AS d
             FROM subs JOIN samp USING (vec_id) JOIN cent c USING (m)),
    adc AS (SELECT q_id, neighbor_id, rnk FROM (
        SELECT dtab.q_id, codes.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY dtab.q_id
                   ORDER BY sum(dtab.d), codes.vec_id) AS rnk
        FROM codes JOIN dtab USING (m, centroid_id)
        WHERE codes.vec_id <> dtab.q_id
        GROUP BY dtab.q_id, codes.vec_id) WHERE rnk <= {PQA_TOPK}),
    hit AS (SELECT count(*)::BIGINT AS n_hit
            FROM exact JOIN adc USING (q_id, neighbor_id)),
    hit1 AS (SELECT count(*)::BIGINT AS n_top1_hit
             FROM exact JOIN adc USING (q_id, neighbor_id)
             WHERE exact.rnk = 1),
    tr AS (SELECT count(*)::BIGINT AS n_true FROM exact),
    nq AS (SELECT count(*)::BIGINT AS n_queries FROM samp)
    SELECT n_queries, {PQA_TOPK}::BIGINT AS k, n_true, n_hit,
           (n_hit * 1000000 // n_true)::BIGINT AS recall_ppm,
           n_top1_hit
    FROM nq CROSS JOIN tr CROSS JOIN hit CROSS JOIN hit1"""
    )


@register(
    "pq_recall_audit",
    _pq_audit_oracle(),
    survey_ids=("A1", "O5"),
    doc="Measure-don't-guess for the ANN memory path, the "
    "lsh_recall_audit counterpart: EXACT recall@k of the production "
    "PQ/ADC search (same codebook training, same packed-code ADC "
    "ranking as embed_pq_topk) against exact integer-L2 top-k ground "
    f"truth, on a deterministic {PQA_N}-query md5 sample.  Audit "
    "cost is Q*N (one embarrassingly-parallel distance scan per "
    "fixed-size query set) — the shape that stays affordable at "
    "100 TB, where the quantization loss this audit measures is "
    "exactly the number that decides nprobe/re-rank settings.  Both "
    "sides rank all-integer with id tiebreaks, so the overlap count "
    "is bit-portable; recall lands as a ppm integer, with the "
    "exact-top-1-retrieved count as the sharper headline.",
)
def q_pq_recall_audit(spark, sf_dir):
    from ..operators.similarity import (
        PQ_K,
        PQ_M,
        _isqdist,
        _qvec,
        _sub,
        pq_codes,
        pq_train,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _qvec(F.col("embedding")).alias("qv")
    )
    samp = (
        e.withColumn(
            "__pri",
            md5_long(F.concat(F.lit("pqa:"), F.col("vec_id").cast("string"))),
        )
        .orderBy("__pri", "vec_id")
        .limit(PQA_N)
        .select(F.col("vec_id").alias("q_id"), F.col("qv").alias("qa"))
        .localCheckpoint(eager=True)
    )

    # Exact side: one broadcast-sample distance scan over the corpus,
    # per-query top-k via a sample-bounded window.
    exact = (
        e.select(F.col("vec_id").alias("neighbor_id"), "qv")
        .join(F.broadcast(samp), F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            _isqdist(F.col("qv"), F.col("qa")).alias("d"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy("d", "neighbor_id")
            ),
        )
        .filter(F.col("rnk") <= PQA_TOPK)
    )

    # ADC side: the production path — trained codebook, packed codes,
    # broadcast query-to-subcentroid distance table.
    cents = pq_train(e.select("vec_id", "embedding"))
    codes = pq_codes(e.select("vec_id", "embedding"), cents)
    subdim = 64 // PQ_M
    bits = max((PQ_K - 1).bit_length(), 1)
    qsubs = samp.select(
        "q_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("m"),
                        _sub(F.col("qa"), j, subdim).alias("sv"),
                    )
                    for j in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("q_id", "s.m", "s.sv")
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
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy("adc_dist", "neighbor_id")
            ),
        )
        .filter(F.col("rnk") <= PQA_TOPK)
    )

    # Round-12 restructure: n_true / n_hit / n_top1_hit were three
    # aggregate subtrees over two eager checkpoints (exact, adc); a
    # single left join from the exact top-k to the ADC top-k (both
    # unique on (q_id, neighbor_id) by their rnk filters) folds them
    # into ONE aggregate, and each side is now referenced exactly
    # once, so neither needs materializing.
    per = exact.join(
        adc.select(
            "q_id", "neighbor_id", F.lit(1).alias("in_adc")
        ),
        ["q_id", "neighbor_id"],
        "left",
    )
    scalars = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.coalesce(F.sum("in_adc"), F.lit(0)).cast("long").alias("n_hit"),
        F.coalesce(
            F.sum(F.when(F.col("rnk") == 1, F.col("in_adc"))), F.lit(0)
        )
        .cast("long")
        .alias("n_top1_hit"),
    )
    nq = samp.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        nq.crossJoin(F.broadcast(scalars))
        .select(
            "n_queries",
            F.lit(PQA_TOPK).cast("long").alias("k"),
            "n_true",
            "n_hit",
            F.expr("(n_hit * 1000000) div n_true").cast("long").alias("recall_ppm"),
            "n_top1_hit",
        )
    )


# ===========================================================================
# Exact decile cuts at scale (the documented ntile ceiling, fixed)
# ===========================================================================


@register(
    "decile_cut_values",
    """
    WITH vc AS (
        SELECT event_type, value, count(*)::BIGINT AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, value
    ), cum AS (
        SELECT event_type, value, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cc
        FROM vc
    ), n AS (
        SELECT event_type, sum(c)::BIGINT AS n FROM vc GROUP BY event_type
    ), tgt AS (
        SELECT n.event_type, u.d::BIGINT AS decile,
               ((u.d * n.n + 9) // 10)::BIGINT AS k
        FROM n, unnest(range(1, 10)) AS u(d)
    )
    SELECT t.event_type, t.decile, min(c2.value) AS cut_value
    FROM tgt t JOIN cum c2
      ON c2.event_type = t.event_type AND c2.cc >= t.k
    GROUP BY t.event_type, t.decile
    """,
    survey_ids=("A1", "W3"),
    doc="EXACT decile cut values without a per-group global sort — "
    "the scale fix for value_deciles' documented ntile ceiling (one "
    "task per group, window depth = group rows): collapse to "
    "per-(group, value) COUNTS first (map-side combinable — the "
    "shuffle carries distinct values, not rows), cumulate counts "
    "over the distinct-value frame, and read the 9 order statistics "
    "k = ceil(d*n/10) off the cumulative relation (cut = min value "
    "with cum count >= k, the lower-median discipline of "
    "lm_score_calibrated — rank arithmetic stays in BIGINT, no "
    "float percentile).  The window partition is bounded by a "
    "group's DISTINCT value count, so a 10^9-row group with 10^5 "
    "distinct measurement values costs what the distinct values "
    "cost; the 9-row-per-group target join is a broadcast.  Same "
    "cuts ntile would imply, at distinct-values cost instead of "
    "rows-log-rows.",
)
def q_decile_cut_values(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vc = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vc.withColumn("cc", F.sum("c").over(wc))
    n = vc.groupBy("event_type").agg(F.sum("c").cast("long").alias("n"))
    tgt = n.select(
        F.col("event_type").alias("__et"),
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile"),
        "n",
    ).select(
        "__et",
        F.col("decile").cast("long").alias("decile"),
        F.expr("(decile * n + 9) div 10").cast("long").alias("k"),
    )
    return (
        cum.join(
            F.broadcast(tgt),
            (F.col("event_type") == F.col("__et")) & (F.col("cc") >= F.col("k")),
        )
        .groupBy("event_type", "decile")
        .agg(F.min("value").alias("cut_value"))
    )


# ===========================================================================
# Passage-level eval-set decontamination (span evidence, both directions)
# ===========================================================================

DECON_EVAL_MOD = 7  # doc_id % MOD == 0 plays the held-out eval set
# (mod 7 keeps the gate non-trivial at every test SF: 7-8 leakage
# spans at sf0.001/sf0.01 where mod 97's sparser eval set finds 0
# at sf0.01 — an empty result would hash-match vacuously)


def _decontam_oracle() -> str:
    k, mn, mod = PSPAN_K, PSPAN_MIN, DECON_EVAL_MOD
    return (
        _pspan_base_ctes()
        + f""", m AS (
        SELECT e.doc_id AS eval_id, t2.doc_id AS train_id,
               e.p AS pe, t2.p AS pt
        FROM g e JOIN g t2 USING (h) JOIN df USING (h)
        WHERE e.doc_id % {mod} = 0 AND t2.doc_id % {mod} <> 0
    ), ib AS (
        SELECT eval_id, train_id, pe, pt, pe - pt AS diag,
               CASE WHEN pe - lag(pe) OVER (PARTITION BY eval_id, train_id,
                                                         pe - pt
                                            ORDER BY pe) <= {k}
                    THEN 0 ELSE 1 END AS brk
        FROM m
    ), i AS (
        SELECT eval_id, train_id, pe, pt, diag,
               sum(brk) OVER (PARTITION BY eval_id, train_id, diag
                              ORDER BY pe ROWS UNBOUNDED PRECEDING) AS isl
        FROM ib
    )
    SELECT eval_id, train_id,
           min(pe)::BIGINT AS eval_start, min(pt)::BIGINT AS train_start,
           (max(pe) - min(pe) + {k})::BIGINT AS span_toks
    FROM i GROUP BY eval_id, train_id, diag, isl
    HAVING max(pe) - min(pe) + {k} >= {mn}
    """
    )


@register(
    "eval_decontam_spans",
    _decontam_oracle(),
    survey_ids=("A7", "J4"),
    doc="Passage-level eval-set decontamination with SPAN EVIDENCE — "
    "the leakage check run before any benchmark claim: documents "
    f"with doc_id % {DECON_EVAL_MOD} == 0 play the held-out eval "
    "set, and every train document sharing a verbatim passage of >= "
    f"{PSPAN_MIN} tokens with an eval document is reported with the "
    "exact positions on BOTH sides (eval_start for audit, "
    "train_start for excision via the dup_passage_rebuild "
    "machinery).  Strictly stronger evidence than "
    "contamination_overlap's shingle fraction: a 0.1% overlap "
    "fraction can still be one fatal verbatim answer string, which "
    "this query pins to a position.  Same rolling-gram + df-cap + "
    "gaps-and-islands machinery as dup_passage_spans (shared "
    "_pspan_base CTEs and builder fragments), with the pairing rule "
    "swapped from id-ordered to eval-x-train — both directions of "
    "leakage in one pass.  At 100 TB the eval side is tiny and its "
    "gram postings broadcast; the train side is touched once.",
)
def q_eval_decontam_spans(spark, sf_dir):
    k, mod = PSPAN_K, DECON_EVAL_MOD
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= k)
    g = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - k + 1),
                lambda p: F.struct(
                    p.cast("long").alias("p"),
                    md5_long(F.array_join(F.slice("toks", p, k), " ")).alias("h"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.p", "s.h")
    is_eval = F.col("doc_id") % mod == 0
    posts = (
        g.groupBy("h")
        .agg(
            F.sort_array(
                F.collect_list(F.when(is_eval, F.struct("doc_id", "p")))
            ).alias("es"),
            F.sort_array(
                F.collect_list(F.when(~is_eval, F.struct("doc_id", "p")))
            ).alias("ts"),
        )
        .filter(
            (F.size("es") + F.size("ts") >= 2)
            & (F.size("es") + F.size("ts") <= PSPAN_DF_MAX)
            & (F.size("es") >= 1)
            & (F.size("ts") >= 1)
        )
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("es"),
            lambda x: F.transform(
                F.col("ts"),
                lambda y: F.struct(
                    x["doc_id"].alias("eval_id"),
                    x["p"].alias("pe"),
                    y["doc_id"].alias("train_id"),
                    y["p"].alias("pt"),
                ),
            ),
        )
    )
    m = posts.select(F.explode(pair_structs).alias("pr")).select(
        "pr.eval_id", "pr.pe", "pr.train_id", "pr.pt"
    )
    # Cap-tolerant islands (same bridge rule as _passage_spans).
    w = Window.partitionBy(
        "eval_id", "train_id", F.col("pe") - F.col("pt")
    ).orderBy("pe")
    brk = F.when(F.col("pe") - F.lag("pe").over(w) <= k, F.lit(0)).otherwise(
        F.lit(1)
    )
    staged = m.select(
        "eval_id",
        "train_id",
        "pe",
        "pt",
        (F.col("pe") - F.col("pt")).alias("diag"),
        brk.alias("__brk"),
    )
    w2 = Window.partitionBy("eval_id", "train_id", "diag").orderBy(
        "pe"
    ).rowsBetween(Window.unboundedPreceding, 0)
    isl = staged.withColumn("isl", F.sum("__brk").over(w2))
    return (
        isl.groupBy("eval_id", "train_id", "diag", "isl")
        .agg(
            F.min("pe").alias("eval_start"),
            F.min("pt").alias("train_start"),
            (F.max("pe") - F.min("pe") + F.lit(k)).cast("long").alias("span_toks"),
        )
        .filter(F.col("span_toks") >= PSPAN_MIN)
        .select("eval_id", "train_id", "eval_start", "train_start", "span_toks")
    )


# ===========================================================================
# Positional-index proximity search (terms within a window)
# ===========================================================================

PROX_WINDOW = 10


def _proximity_oracle() -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, u.p::BIGINT AS pos, toks[u.p] AS w
        FROM (
            SELECT doc_id,
                   CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                        ELSE string_split_regex(trim(lower(text)), '\\s+') END
                       AS toks
            FROM documents
        ), unnest(range(1, len(toks) + 1)) AS u(p)
    ), top2 AS (
        SELECT w, rnk FROM (
            SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rnk
            FROM tok GROUP BY w) WHERE rnk <= 2
    ), p1 AS (
        SELECT tok.doc_id, tok.pos, tok.w FROM tok
        JOIN top2 ON tok.w = top2.w AND top2.rnk = 1
    ), p2 AS (
        SELECT tok.doc_id, tok.pos, tok.w FROM tok
        JOIN top2 ON tok.w = top2.w AND top2.rnk = 2
    )
    SELECT p1.doc_id,
           any_value(p1.w) AS term_a, any_value(p2.w) AS term_b,
           count(*)::BIGINT AS n_pairs,
           min(abs(p1.pos - p2.pos))::BIGINT AS min_gap
    FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
    WHERE abs(p1.pos - p2.pos) <= {PROX_WINDOW}
    GROUP BY p1.doc_id
    """


@register(
    "term_proximity_search",
    _proximity_oracle(),
    survey_ids=("W1", "J1"),
    doc="Positional-index proximity search — the IR operator BM25 "
    "lacks: find documents where two terms co-occur within "
    f"{PROX_WINDOW} token positions, with pair count and closest "
    "gap per document.  The probe terms are data-derived "
    "deterministically (the corpus' two most frequent tokens, "
    "count-desc/lexicographic tiebreak) so the query is "
    "self-contained and oracle-replayable.  Plan shape: ONE corpus "
    "tokenize/explode builds the positional postings; the 2-row term "
    "table broadcasts onto it, so only the two probed terms' "
    "postings survive to the shuffle (the filter lands before the "
    "exchange — at 100 TB the join input is the postings of two "
    "terms, not the corpus); the proximity pair join is keyed on "
    "doc_id, so per-doc work is bounded by the doc's own term "
    "counts.  A hyper-frequent term pair inside one enormous doc "
    "would escalate to the interval_bucket_join band pattern "
    "(bucket positions by the window, join adjacent buckets) — same "
    "relational shape, noted here for the record.",
)
def q_term_proximity_search(spark, sf_dir):
    from ..functions import tokens

    docs = load(spark, sf_dir, "documents")
    # tokens() guards the empty/whitespace-only document (-> empty
    # array, matching the oracle's CASE ... THEN [] branch); a bare
    # split would emit a [''] token and inflate '' term frequencies.
    toks = tokens(F.lower(F.col("text")))
    tok = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.posexplode("toks").alias("pos0", "w"))
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "w")
    )
    # TakeOrderedAndProject picks the top-2 terms (per-partition top-n
    # + merge — no global sort, no vocabulary-wide single-partition
    # window); the rank window then runs on the 2-row frame only (the
    # dsir_importance_weights posture).
    # bounded-frame: 2-row frame (TakeOrdered top-2 terms)
    wr = Window.orderBy(F.col("cnt").desc(), "w")
    top2 = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(2)
        .withColumn("rnk", F.row_number().over(wr))
        .select("w", "rnk")
        # 2 rows; materialize so the corpus-wide count runs once, not
        # once per postings branch.
        .localCheckpoint(eager=True)
    )
    p1 = tok.join(
        F.broadcast(top2.filter(F.col("rnk") == 1).select("w")), "w"
    ).select("doc_id", F.col("pos").alias("pos_a"), F.col("w").alias("term_a"))
    p2 = tok.join(
        F.broadcast(top2.filter(F.col("rnk") == 2).select("w")), "w"
    ).select("doc_id", F.col("pos").alias("pos_b"), F.col("w").alias("term_b"))
    return (
        p1.join(p2, "doc_id")
        .filter(F.abs(F.col("pos_a") - F.col("pos_b")) <= PROX_WINDOW)
        .groupBy("doc_id")
        .agg(
            F.any_value("term_a").alias("term_a"),
            F.any_value("term_b").alias("term_b"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min(F.abs(F.col("pos_a") - F.col("pos_b")))
            .cast("long")
            .alias("min_gap"),
        )
    )


# ===========================================================================
# IVFADC: coarse quantizer + residual PQ — the production ANN layout
# ===========================================================================

IVFADC_COARSE = 8
IVFADC_NPROBE = 2
IVFADC_TOPK = 5
IVFADC_NQ = 5


def _ivfadc_chain(
    q_pred: str,
    topk: int,
    final: str = "ranked",
    nprobe: int | None = None,
    probe_rank: bool = False,
) -> str:
    """IVFADC replay chain, parameterized on the query-set predicate
    (over ``e``), k, and probe depth — shared by the search query,
    the recall audit, and the nprobe autotune so layout and
    instrument cannot drift.  Ends in ``{final}`` = (q_id,
    neighbor_id, rank, adc_dist), rank <= topk; with
    ``probe_rank=True`` it ends at ``adc`` = (q_id, neighbor_id,
    adc_dist, probe_rank) UNRANKED, so a caller can sweep every
    probe depth from one index build."""
    from ..operators.similarity import PQ_Q, sql_ivf_train, sql_pq_chain

    if nprobe is None:
        nprobe = IVFADC_NPROBE
    subdim = 16
    isq = (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        "i -> (s.sv[i] - c.qc[i]) * (s.sv[i] - c.qc[i])))"
    )
    isq_q = isq.replace("s.sv", "qsub.sv").replace("c.qc", "pc.qc")
    pr_sel = ", rn AS probe_rank" if probe_rank else ""
    pr_qq = ", p.probe_rank" if probe_rank else ""
    pr_qsub = ", probe_rank" if probe_rank else ""
    pr_dtab = ", qsub.probe_rank" if probe_rank else ""
    pr_adc = ", min(d.probe_rank)::BIGINT AS probe_rank" if probe_rank else ""
    chain = (
        sql_ivf_train(n_centroids=IVFADC_COARSE)
        + f""",
    af AS (SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.v, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, c.cv) DESC, c.centroid_id) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1),
    resid AS (SELECT af.vec_id,
                     list_transform(range(1, 65), i -> af.v[i] - c.cv[i]) AS v
              FROM af JOIN cent c USING (centroid_id)),
    {sql_pq_chain(source="SELECT vec_id, v FROM resid", prefix="pq_")},
    codes AS (SELECT vec_id, m, centroid_id FROM (
        SELECT s.vec_id, s.m, c.centroid_id,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                   ORDER BY {isq}, c.centroid_id) AS rn
        FROM pq_subs s JOIN pq_cent c USING (m)) WHERE rn = 1),
    probes AS (SELECT q_id, centroid_id{pr_sel} FROM (
        SELECT e.vec_id AS q_id, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.v, c.cv) DESC, c.centroid_id) AS rn
        FROM e CROSS JOIN cent c WHERE {q_pred})
        WHERE rn <= {nprobe}),
    qq AS (SELECT p.q_id, p.centroid_id{pr_qq},
                  list_transform(range(1, 65),
                                 i -> floor((e.v[i] - c.cv[i]) * {PQ_Q})::BIGINT)
                      AS qv
           FROM probes p JOIN e ON e.vec_id = p.q_id
                JOIN cent c USING (centroid_id)),
    qsub AS (SELECT q_id, centroid_id AS coarse_id{pr_qsub}, t.m,
                    list_slice(qv, t.m * {subdim} + 1, (t.m + 1) * {subdim}) AS sv
             FROM qq, unnest([0, 1, 2, 3]) t(m)),
    dtab AS (SELECT qsub.q_id, qsub.coarse_id{pr_dtab}, pc.m,
                    pc.centroid_id AS pq_id, {isq_q}::BIGINT AS d
             FROM qsub JOIN pq_cent pc USING (m)),
    cand AS (SELECT af.vec_id AS neighbor_id, af.centroid_id AS coarse_id,
                    codes.m, codes.centroid_id AS pq_id
             FROM af JOIN codes USING (vec_id)),
    adc AS (SELECT d.q_id, cand.neighbor_id, sum(d.d)::BIGINT AS adc_dist{pr_adc}
            FROM cand JOIN dtab d
              ON d.coarse_id = cand.coarse_id AND d.m = cand.m
             AND d.pq_id = cand.pq_id
            WHERE cand.neighbor_id <> d.q_id
            GROUP BY 1, 2)"""
    )
    if probe_rank:
        return chain
    return (
        chain
        + f""",
    {final} AS (SELECT q_id, neighbor_id, rank, adc_dist FROM (
        SELECT q_id, neighbor_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adc_dist, neighbor_id)::BIGINT AS rank,
               adc_dist
        FROM adc) WHERE rank <= {topk})"""
    )


def _ivfadc_oracle() -> str:
    return (
        "WITH "
        + _ivfadc_chain(f"e.vec_id < {IVFADC_NQ}", IVFADC_TOPK)
        + """
    SELECT q_id, neighbor_id, rank, adc_dist FROM ranked"""
    )


@register(
    "embed_ivfadc_topk",
    _ivfadc_oracle(),
    survey_ids=("O5", "A1"),
    doc="IVFADC — the production trillion-scale ANN layout (Jegou et "
    "al. 2011 §IV): a coarse IVF quantizer routes each query to its "
    f"{IVFADC_NPROBE} nearest of {IVFADC_COARSE} cells, and within "
    "the probed cells candidates are ranked by asymmetric distance "
    "through a PQ codebook trained on RESIDUALS (vector minus its "
    "coarse centroid — residual energy is what PQ quantizes well, "
    "the paper's key refinement over flat PQ).  Composes the two "
    "catalog-verified trainers: ivf_train's coarse centroids and "
    "pq_train on the residual table; the oracle stacks both replay "
    "chains (sql_ivf_train + sql_pq_chain(prefix='pq_')) plus the "
    "probe/ADC ranking.  Scale shape: candidates are touched ONLY in "
    "probed cells (the IVF equi-join prunes ~(1 - nprobe/C) of the "
    "corpus), each through its packed 2-byte code (8 bytes of "
    "payload per vector), with the per-(query, cell) distance table "
    "broadcast — no shuffle of the corpus side at any point after "
    "encoding.  All-integer ADC distances with id tiebreaks keep the "
    "ranking bit-portable.",
)
def q_embed_ivfadc_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.filter(F.col("vec_id") < IVFADC_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv_raw")
    )
    return _ivfadc_rank(spark, sf_dir, q, IVFADC_TOPK)


def _ivfadc_rank(spark, sf_dir, q, topk, nprobe=None, probe_rank=False):
    """Train the IVFADC index and rank ``q`` = (q_id, qv_raw) against
    it — shared by the search query, the recall audit, and the nprobe
    autotune.  With ``probe_rank=True`` returns the UNRANKED (q_id,
    neighbor_id, adc_dist, probe_rank) candidate relation so the
    caller can sweep every probe depth from one index build."""
    if nprobe is None:
        nprobe = IVFADC_NPROBE
    from ..operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_Q,
        _isqdist,
        _sub,
        dot,
        ivf_assign,
        ivf_train,
        pq_codes,
        pq_train,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # ivf_train's output is already an eager localCheckpoint; the memo
    # shares one training across the IVFADC trio and the other
    # trained-quantizer queries (catalog.py:trained_ivf_centroids).
    coarse = trained_ivf_centroids(spark, sf_dir, IVFADC_COARSE)
    cv = coarse.select("centroid_id", F.col("embedding").alias("__cv"))
    af = ivf_assign(e, coarse)
    # Materialize the residual table once (eager): it feeds PQ
    # training (itself iterative), encoding, and the candidate cell
    # map — without this the coarse-assignment window re-runs per
    # consumer.  At production scale this is the persisted encoded
    # table a real IVFADC index stores anyway.
    resid = (
        af.join(F.broadcast(cv), "centroid_id")
        .select(
            "vec_id",
            "centroid_id",
            F.zip_with("embedding", "__cv", lambda a, b: a - b).alias("rv"),
        )
        .localCheckpoint(eager=True)
    )
    rvecs = resid.select("vec_id", F.col("rv").alias("embedding"))
    pqc = pq_train(rvecs).localCheckpoint(eager=True)
    # The IVF cell rides THROUGH the encoder (carry) — the stored
    # index row is (vec_id, cell, 2-byte code) and no consumer ever
    # joins back to the residual table for it.
    codes = pq_codes(
        resid.select("vec_id", F.col("rv").alias("embedding"), "centroid_id"),
        pqc,
        carry=("centroid_id",),
    )

    subdim = 64 // PQ_M
    bits = max((PQ_K - 1).bit_length(), 1)
    wq = Window.partitionBy("q_id").orderBy(
        F.col("__score").desc(), F.col("centroid_id")
    )
    pr_cols = [F.col("__rn").cast("long").alias("probe_rank")] if probe_rank else []
    pr_names = ["probe_rank"] if probe_rank else []
    probes = (
        q.join(F.broadcast(cv), how="cross")
        .withColumn("__score", dot(F.col("qv_raw"), F.col("__cv")))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "q_id",
            F.col("centroid_id").alias("coarse_id"),
            *pr_cols,
            F.zip_with(
                "qv_raw",
                "__cv",
                lambda a, b: F.floor((a - b) * F.lit(PQ_Q)).cast("long"),
            ).alias("qres"),
        )
    )
    qsub = probes.select(
        "q_id",
        "coarse_id",
        *pr_names,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("m"),
                        _sub(F.col("qres"), j, subdim).alias("sv"),
                    )
                    for j in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("q_id", "coarse_id", *pr_names, "s.m", "s.sv")
    dtab = qsub.join(F.broadcast(pqc), "m").select(
        "q_id",
        "coarse_id",
        *pr_names,
        "m",
        F.col("centroid_id").alias("pq_id"),
        _isqdist(F.col("sv"), F.col("qc")).alias("d"),
    )
    cand = (
        codes.withColumnRenamed("centroid_id", "coarse_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "coarse_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("m"),
                            F.shiftright(F.col("pq_code"), j * bits)
                            .bitwiseAND(F.lit(PQ_K - 1))
                            .cast("int")
                            .alias("pq_id"),
                        )
                        for j in range(PQ_M)
                    ]
                )
            ).alias("c"),
        )
        .select("neighbor_id", "coarse_id", "c.m", "c.pq_id")
    )
    adc = (
        cand.join(F.broadcast(dtab), ["coarse_id", "m", "pq_id"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .groupBy("q_id", "neighbor_id")
        .agg(
            F.sum("d").cast("long").alias("adc_dist"),
            *(
                [F.min("probe_rank").cast("long").alias("probe_rank")]
                if probe_rank
                else []
            ),
        )
    )
    if probe_rank:
        return adc.select("q_id", "neighbor_id", "adc_dist", "probe_rank")
    w = Window.partitionBy("q_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("q_id", "neighbor_id", "rank", "adc_dist")
    )


def _pqa_qsel_sql() -> str:
    """Query-set predicate (over ``e``) selecting the PQA_N md5 sample."""
    pri = md5_long_sql("'pqa:' || CAST(vec_id AS VARCHAR)")
    return (
        f"e.vec_id IN (SELECT vec_id FROM (SELECT vec_id, "
        f"row_number() OVER (ORDER BY {pri}, vec_id) AS rn FROM e) "
        f"WHERE rn <= {PQA_N})"
    )


def _pqa_exact_ctes() -> str:
    """CTE fragment (exq, samp, exact) — the exact integer-L2 ground
    truth on the PQA_N sample; shared by the recall audit and the
    nprobe autotune oracles."""
    pri = md5_long_sql("'pqa:' || CAST(vec_id AS VARCHAR)")
    isq_full = (
        "list_sum(list_transform(range(1, 65), "
        "i -> (s.qv[i] - c2.qv[i]) * (s.qv[i] - c2.qv[i])))"
    )
    return f""",
    exq AS (SELECT vec_id,
                   list_transform(v, x -> floor(x * 1000000)::BIGINT) AS qv
            FROM e),
    samp AS (SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY {pri}, vec_id) AS rn
        FROM e) WHERE rn <= {PQA_N}),
    exact AS (SELECT q_id, neighbor_id, rnk FROM (
        SELECT s.vec_id AS q_id, c2.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY s.vec_id
                   ORDER BY {isq_full}, c2.vec_id) AS rnk
        FROM exq s JOIN samp USING (vec_id), exq c2
        WHERE c2.vec_id <> s.vec_id) WHERE rnk <= {PQA_TOPK})"""


def _ivfadc_audit_oracle() -> str:
    return (
        "WITH "
        + _ivfadc_chain(_pqa_qsel_sql(), PQA_TOPK)
        + _pqa_exact_ctes()
        + f""",
    hit AS (SELECT count(*)::BIGINT AS n_hit
            FROM exact JOIN ranked USING (q_id, neighbor_id)),
    hit1 AS (SELECT count(*)::BIGINT AS n_top1_hit
             FROM exact JOIN ranked USING (q_id, neighbor_id)
             WHERE exact.rnk = 1),
    tr AS (SELECT count(*)::BIGINT AS n_true FROM exact),
    nq AS (SELECT count(*)::BIGINT AS n_queries FROM samp)
    SELECT n_queries, {PQA_TOPK}::BIGINT AS k, n_true, n_hit,
           (n_hit * 1000000 // n_true)::BIGINT AS recall_ppm,
           n_top1_hit
    FROM nq CROSS JOIN tr CROSS JOIN hit CROSS JOIN hit1"""
    )


def _pqa_sample_exact(spark, sf_dir):
    """The PQA_N md5-sampled query set and its exact integer-L2
    ground truth (q_id, neighbor_id, rnk <= PQA_TOPK) — shared by the
    recall audit and the nprobe autotune so the instrument cannot
    drift between them."""
    from ..operators.similarity import _qvec, _isqdist

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        _qvec(F.col("embedding")).alias("qv"),
    )
    samp = (
        e.withColumn(
            "__pri",
            md5_long(F.concat(F.lit("pqa:"), F.col("vec_id").cast("string"))),
        )
        .orderBy("__pri", "vec_id")
        .limit(PQA_N)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv_raw"),
            F.col("qv").alias("qa"),
        )
        .localCheckpoint(eager=True)
    )
    exact = (
        e.select(F.col("vec_id").alias("neighbor_id"), "qv")
        .join(F.broadcast(samp), F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id", "neighbor_id", _isqdist(F.col("qv"), F.col("qa")).alias("d")
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy("d", "neighbor_id")
            ),
        )
        .filter(F.col("rnk") <= PQA_TOPK)
        .localCheckpoint(eager=True)
    )
    return samp, exact


@register(
    "ivfadc_recall_audit",
    _ivfadc_audit_oracle(),
    survey_ids=("A1", "O5"),
    doc="The measure-don't-guess trilogy completed (LSH -> flat PQ -> "
    "IVFADC): exact recall@k of the full IVFADC layout — coarse "
    f"routing loss ({IVFADC_NPROBE}-of-{IVFADC_COARSE} cells probed) "
    "COMPOUNDED with residual-PQ quantization loss — against the "
    "same exact integer-L2 ground truth, on the SAME md5 query "
    "sample as pq_recall_audit, so the two rows decompose the "
    "recall budget: flat-PQ recall isolates quantization, this row "
    "adds cell pruning, and the gap prices nprobe.  Shares the "
    "IVFADC replay chain with embed_ivfadc_topk (builder and oracle "
    "both — instrument and layout cannot drift).  Audit cost is "
    "Q*N for the truth plus the production search path itself.",
)
def q_ivfadc_recall_audit(spark, sf_dir):
    samp, exact = _pqa_sample_exact(spark, sf_dir)
    ranked = _ivfadc_rank(
        spark, sf_dir, samp.select("q_id", "qv_raw"), PQA_TOPK
    ).localCheckpoint(eager=True)
    hit = exact.join(ranked, ["q_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    hit1 = (
        exact.filter(F.col("rnk") == 1)
        .join(ranked, ["q_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_top1_hit"))
    )
    tr = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    nq = samp.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        nq.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(hit))
        .crossJoin(F.broadcast(hit1))
        .select(
            "n_queries",
            F.lit(PQA_TOPK).cast("long").alias("k"),
            "n_true",
            "n_hit",
            F.expr("(n_hit * 1000000) div n_true").cast("long").alias("recall_ppm"),
            "n_top1_hit",
        )
    )


# ===========================================================================
# Training-shard writer: the shuffle+manifest executed as a LAYOUT op
# ===========================================================================

SHARD_FILES = 32  # range-partitioned output files (sized, contiguous)


def _shard_write_oracle() -> str:
    from .round8 import _shuffle_shard_oracle

    # The written layout must reproduce the manifest EXACTLY — same
    # oracle as corpus_shuffle_shards, now checked through a parquet
    # round trip of the physical shard files.
    return _shuffle_shard_oracle()


@register(
    "training_shard_write",
    _shard_write_oracle(),
    survey_ids=("S10", "S9"),
    doc="The training-shard WRITER executed in the gate (the "
    "bucketed_join_orders/partition_pruned_scan layout discipline): "
    "the seeded-shuffle shard assignment (shared builder with "
    "corpus_shuffle_shards — layout and manifest cannot drift) is "
    f"written as {SHARD_FILES} range-partitioned parquet files, each "
    "a CONTIGUOUS run of shards in training order "
    "(repartitionByRange on (shard_id, gs) + sortWithinPartitions — "
    "exactly how a production writer packs small logical shards into "
    "sized physical files; at 100 TB SHARD_TOKENS is ~1e8 so the "
    "shard:file ratio tightens, same plan).  The gate then re-reads "
    "the FILES and rebuilds the manifest from them, value-checking "
    "that the physical layout carries doc membership, token counts, "
    "training order (first_doc via min_by on the persisted gs) and "
    "hash ranges through the round trip.  Write seconds land in "
    "LAYOUT_WRITE_S so bench reports the investment apart from the "
    "query (round-6 item-3 discipline).  Payload includes the text "
    "column — these files are what a training reader consumes.",
)
def q_training_shard_write(spark, sf_dir):
    import time as _time

    from ..session import fixed_scratch_dir
    from .round8 import _shard_manifest, _shuffled_docs
    from .round6 import LAYOUT_WRITE_S

    d = fixed_scratch_dir("shards")
    assigned = _shuffled_docs(spark, sf_dir)
    # widen=False: the text payload goes straight into the shard join
    # and then the range exchange — a round-robin widen exchange would
    # shuffle the heavy text bytes an EXTRA time to parallelize a scan
    # that does no per-row compute (guide §2.3: move payload bytes
    # once).  Measured a wash at sf0.1 (write_s ~1.5 s both ways);
    # kept OFF because at scale the extra payload pass only costs.
    docs = load(spark, sf_dir, "documents", widen=False).select("doc_id", "text")
    payload = assigned.join(docs, "doc_id").select(
        "shard_id", "gs", "doc_id", "n_tokens", "h", "text"
    )
    t0 = _time.time()
    (
        payload.repartitionByRange(SHARD_FILES, "shard_id", "gs")
        .sortWithinPartitions("shard_id", "gs")
        .write.mode("overwrite")
        .parquet(f"{d}/shards")
    )
    LAYOUT_WRITE_S["training_shard_write"] = round(_time.time() - t0, 3)
    back = spark.read.parquet(f"{d}/shards")
    return _shard_manifest(back)


# ===========================================================================
# Incremental shard manifest: append-only growth across refreshes
# ===========================================================================

INC_SHARD_BATCHES = 3


def _inc_shard_oracle() -> str:
    from ..functions import md5_long_sql
    from .round8 import SHARD_TOKENS, SHUF_SEED

    h = md5_long_sql(f"'{SHUF_SEED}:' || doc_id::VARCHAR")
    return f"""
    WITH toks AS (
        SELECT doc_id,
               (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT
                   AS n_tokens,
               {h} AS h,
               (doc_id % {INC_SHARD_BATCHES})::BIGINT AS batch_id
        FROM documents
    ), cum AS (
        SELECT doc_id, n_tokens, h, batch_id,
               sum(n_tokens) OVER (ORDER BY batch_id, h, doc_id
                                   ROWS UNBOUNDED PRECEDING)
                 - n_tokens AS gs
        FROM toks
    )
    SELECT (gs // {SHARD_TOKENS})::BIGINT AS shard_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS shard_tokens,
           min_by(doc_id, gs) AS first_doc,
           min(batch_id)::BIGINT AS first_batch,
           max(batch_id)::BIGINT AS last_batch
    FROM cum GROUP BY 1
    """


@register(
    "incremental_shard_manifest",
    _inc_shard_oracle(),
    survey_ids=("S11", "ST1", "A1"),
    doc="Append-only shard-manifest growth — the crawl-refresh writer "
    f"shape: documents arrive in {INC_SHARD_BATCHES} refreshes "
    "(doc_id residue batches); each refresh shuffles ITS OWN docs by "
    "the seeded hash, lays them end-to-end starting at the running "
    "global token offset (folded forward from each refresh's own "
    "total — a driver-side integer; the accumulated state is never "
    "re-scanned per refresh), and APPENDS its "
    "assignment rows; earlier shards are never rewritten, exactly "
    "like a production corpus store where refresh N must not "
    "invalidate the shards training already consumed.  The folded "
    "state equals a one-shot manifest over the (batch, h, doc_id) "
    "global order — which is what the oracle computes — so append "
    "semantics are value-checked, not asserted.  A shard written "
    "across a refresh boundary (the carry shard) reports "
    "first_batch < last_batch; per refresh the work is one "
    "within-batch prefix sum (the distributed-prefix-sum machinery "
    "at refresh scale) plus one refresh-sized total aggregate — "
    "never a scan of the accumulated state.",
)
def q_incremental_shard_manifest(spark, sf_dir):
    from ..functions import md5_long
    from ..session import scratch_dir
    from .round8 import SHARD_TOKENS, SHUF_SEED

    docs = load(spark, sf_dir, "documents").select(
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
    )
    root = scratch_dir("inc_shards")
    state = f"{root}/assign"
    offset = 0
    for b in range(INC_SHARD_BATCHES):
        batch = docs.filter(F.col("doc_id") % INC_SHARD_BATCHES == b)
        # bounded-frame: one refresh's docs (within-batch prefix sum)
        w = Window.orderBy("h", "doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        # Refresh-scale prefix sum: the window frame is ONE refresh's
        # docs (at production scale, the h-bucketed prefix-sum split
        # of corpus_shuffle_shards applies within the refresh too).
        assigned = batch.select(
            "doc_id",
            "n_tokens",
            "h",
            F.lit(b).cast("long").alias("batch_id"),
            (F.sum("n_tokens").over(w) - F.col("n_tokens") + F.lit(offset)).alias(
                "gs"
            ),
        )
        assigned.write.mode("append").parquet(state)
        # Running offset folds forward from THIS refresh's own total
        # (one refresh-sized aggregate, a driver-side integer) — the
        # accumulated state parquet is never re-read per refresh, so
        # per-refresh cost stays O(refresh), not O(total state).
        offset += (
            batch.agg(F.sum("n_tokens").cast("long").alias("t")).first()["t"] or 0
        )
    back = spark.read.parquet(state).withColumn(
        "shard_id", F.expr(f"gs div {SHARD_TOKENS}")
    )
    return back.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
        F.min_by("doc_id", "gs").alias("first_doc"),
        F.min("batch_id").cast("long").alias("first_batch"),
        F.max("batch_id").cast("long").alias("last_batch"),
    )


# ===========================================================================
# Corpus-wide BPE token accounting (per-source, vocabulary-bounded)
# ===========================================================================


def _bpe_tokens_oracle() -> str:
    from ..operators.bpe import sql_bpe_segments_cte
    from .round7 import _BPE_ROUNDS, _BPE_WORDS_CTE

    return (
        sql_bpe_segments_cte(_BPE_WORDS_CTE, _BPE_ROUNDS, name="seg")
        + """, inst AS (
        SELECT d.source, lower(u.w) AS word
        FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS u(w)
        WHERE regexp_full_match(u.w, '[A-Za-z]+') AND len(u.w) BETWEEN 2 AND 20
    ), nd AS (
        SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
    )
    SELECT nd.source, nd.n_docs,
           count(*)::BIGINT AS n_words,
           sum(len(inst.word))::BIGINT AS n_chars,
           sum(seg.n_tokens)::BIGINT AS bpe_tokens,
           (sum(len(inst.word)) * 1000000 // sum(seg.n_tokens))::BIGINT
               AS chars_per_token_ppm
    FROM inst JOIN seg USING (word) JOIN nd USING (source)
    GROUP BY nd.source, nd.n_docs"""
    )


@register(
    "bpe_corpus_tokens",
    _bpe_tokens_oracle(),
    survey_ids=("A1", "G2"),
    doc="The learned BPE tokenizer applied CORPUS-WIDE: after the same "
    "training as bpe_vocab_train, per-source documents are accounted "
    "in LEARNED tokens — the denominator a token budget "
    "(token_budget_mix) actually runs in, where whitespace counts "
    "are only a proxy.  Scale shape: the corpus explodes to word "
    "instances ONCE, but the BPE state machine only ever sees the "
    "DISTINCT vocabulary (segment each word once — "
    "operators/bpe.py:segment_words, vocabulary-bounded) and the "
    "per-word token count broadcasts back onto instances, so corpus "
    "volume never enters the iterative merge rounds.  Reports docs, "
    "qualifying word instances, characters, BPE tokens, and the "
    "compression ratio as a ppm integer per source.  Word qualifier "
    "([A-Za-z]{2,20}) matches the training filter, so accounting "
    "and vocabulary cannot drift.",
)
def q_bpe_corpus_tokens(spark, sf_dir):
    from ..operators.bpe import bpe_train_full, segment_words
    from .round7 import _BPE_ROUNDS

    docs = load(spark, sf_dir, "documents")
    inst = docs.select(
        "source", F.explode(F.split("text", r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[A-Za-z]+$") & F.length("w").between(2, 20))
    words = inst.groupBy(F.lower("w").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    _, state = bpe_train_full(spark, words, _BPE_ROUNDS)
    seg = segment_words(state).select("word", "n_tokens")
    nd = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        inst.select("source", F.lower("w").alias("word"))
        .join(F.broadcast(seg), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_tokens").cast("long").alias("bpe_tokens"),
        )
        .join(F.broadcast(nd), "source")
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_chars",
            "bpe_tokens",
            F.expr("(n_chars * 1000000) div bpe_tokens")
            .cast("long")
            .alias("chars_per_token_ppm"),
        )
    )
