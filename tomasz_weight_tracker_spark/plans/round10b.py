"""Round-10b catalog queries — dedup consumers and corpus plumbing the
catalog still lacked, each a standard stage in a large-scale
pretraining-data pipeline:

- ``dup_cluster_keep_best`` — cluster-representative selection: after
  near-dup clustering, keep the HIGHEST-QUALITY member of each cluster
  (not the arbitrary min-id), the policy used by SlimPajama/FineWeb-
  style curation.  Consumes the same candidate/closure machinery as
  ``dup_clusters`` and adds the argmax-quality decision as one
  map-side-combinable aggregate.
- ``line_dedup_scrub`` — CCNet/C4-style GLOBAL line dedup: hash every
  line of every document, keep only the corpus-wide FIRST occurrence
  of each distinct line, and rebuild the scrubbed documents.  This is
  a different semantics from the pairwise passage-span family
  (dup_passage_*): no pair relation ever exists — the dedup key is the
  line hash itself, so cost is one shuffle on the hash regardless of
  how duplicated the corpus is (the pair relation on a 10x-verbatim
  corpus is 100x; this stays 1x).
- ``bitext_mine_margin`` — margin-based parallel-corpus mining
  (Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining with
  Multilingual Sentence Embeddings"): mutual-kNN candidates between
  two corpora scored by ratio margin, the standard stage for mining
  translation pairs / cross-lingual alignment data.
- ``jsonl_roundtrip`` — the JSONL source/sink (sources/jsonl.py) under
  the value gate: JSONL is THE interchange format for LLM corpora;
  the round trip proves nested-struct and array fields survive the
  writer -> declared-schema reader path type-exactly.
- ``streaming_line_dedup`` — the streaming-ingestion twin of the line
  scrub (shared chunker, decomposable min/count fold), completing the
  symmetry that every dedup stage has a crawl-front-door shape.

The synthetic documents table has no newline structure, so
``line_dedup_scrub`` derives lines deterministically as consecutive
8-token chunks (documented in the query doc; the operator itself is
delimiter-agnostic — swap the chunker for split('\\n') on real text).

Reference parity anchors: none (all four are training-data-pipeline
extensions; the dedup closure reuses operators/clusters.py which cites
its anchors).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql, tokens
from .catalog import load, register

# ===========================================================================
# Cluster-representative selection (keep best per near-dup cluster)
# ===========================================================================

# Same candidate generation + closure as dup_clusters (extended.py) so
# the two queries agree on what a cluster IS; this query adds the
# keep-policy.  Quality = distinct-vocabulary size (a stand-in for any
# per-doc quality score — the plan shape is identical for a model
# score column).
_SQL_TOKS = (
    "CASE WHEN trim(lower(coalesce(text, ''))) = '' THEN []::VARCHAR[] "
    "ELSE list_distinct(string_split_regex(trim(lower(coalesce(text, ''))), "
    "'\\s+')) END"
)

_KEEP_BEST_ORACLE = f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, source, {_SQL_TOKS} AS toks
        FROM documents WHERE doc_id < 200
    ),
    q AS (SELECT doc_id, len(toks)::BIGINT AS quality FROM t),
    edges0 AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM t a JOIN t b
        ON a.source = b.source AND a.doc_id < b.doc_id
       AND b.doc_id - a.doc_id <= 40
      WHERE len(a.toks) + len(b.toks) > 0
        AND len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE
            / (len(a.toks) + len(b.toks)
               - len(list_filter(a.toks, x -> list_contains(b.toks, x))))::DOUBLE
            > 0.5
    ),
    edges AS (SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    walk AS (
      SELECT id, id AS reach FROM nodes
      UNION
      SELECT w.id, e.v AS reach FROM walk w JOIN edges e ON e.u = w.reach
    ),
    comp AS (SELECT id, min(reach) AS component FROM walk GROUP BY id),
    memb AS (
      SELECT q.doc_id, q.quality,
             coalesce(c.component, q.doc_id) AS component
      FROM q LEFT JOIN comp c ON c.id = q.doc_id
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


@register(
    "dup_cluster_keep_best",
    _KEEP_BEST_ORACLE,
    survey_ids=("A7",),
    doc="Cluster-representative selection — the dedup CONSUMER policy: "
    "within each near-dup cluster keep the highest-quality member "
    "(quality here = distinct-vocab size; any per-doc score column "
    "slots into the same plan), tiebreak min doc_id; singletons keep "
    "themselves.  Uses the SAME Jaccard>0.5 candidates + min-label "
    "closure as dup_clusters, then ONE map-side-combinable aggregate: "
    "max(struct(quality, -doc_id)) per component — no window, no "
    "second shuffle for the argmax.  Scale shape: candidates come "
    "from banded LSH in production (lsh_dup_star_edges), the closure "
    "is per-round keyed shuffles on the EDGE vocabulary only, and the "
    "keep decision is one combinable agg over members — at 100 TB "
    "the corpus never shuffles on volume, only ids+scores do.  "
    "doc_id<200 bounds the oracle's recursive CTE, not the engine.",
)
def q_dup_cluster_keep_best(spark, sf_dir):
    from ..operators import dedup as D
    from ..operators.clusters import connected_components

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = d.select(
        "doc_id",
        "source",
        F.array_distinct(
            tokens(F.lower(F.coalesce(F.col("text"), F.lit(""))))
        ).alias("toks"),
    )
    t = t.withColumn("quality", F.size("toks").cast("long"))
    a, b = t.alias("a"), t.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= 40),
        )
        .withColumn("j", D.jaccard_exprs(F.col("a.toks"), F.col("b.toks")))
        .filter(F.col("j") > 0.5)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    comps = connected_components(pairs)
    memb = (
        t.select("doc_id", "quality")
        .join(comps, t.doc_id == comps.id, "left")
        .select(
            "doc_id",
            "quality",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    # argmax(quality, then MIN doc_id) as one combinable max over a
    # lexicographic struct: (quality, -doc_id) ascending-max ==
    # quality DESC then doc_id ASC.
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
# Global line dedup (CCNet/C4 keep-first-occurrence) + rebuild
# ===========================================================================

_LINE_W = 8  # tokens per derived line (synthetic text has no newlines)

_SQL_RAW_TOKS = (
    "CASE WHEN trim(lower(coalesce(text, ''))) = '' THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') END"
)

def _doc_line_chunks(docs):
    """(doc_id, idx, line) — the corpus as derived lines (consecutive
    8-token chunks).  Shared by the batch scrub and the streaming twin
    so their line semantics cannot drift.  Empty docs are filtered out
    here (Spark's sequence(0, -1) is a DESCENDING pair, not empty) and
    re-attached by the batch scrub's final left join."""
    base = docs.select(
        "doc_id",
        tokens(F.lower(F.coalesce(F.col("text"), F.lit("")))).alias("toks"),
    )
    w = F.lit(_LINE_W)
    n_lines = F.ceil(F.size("toks") / F.lit(float(_LINE_W))).cast("long")
    return (
        base.filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), (n_lines - 1).cast("int")),
                    lambda c: F.concat_ws(" ", F.slice("toks", c * w + 1, _LINE_W)),
                )
            ).alias("idx", "line"),
        )
        .select("doc_id", F.col("idx").cast("long").alias("idx"), "line")
    )


# DuckDB rendering of the same chunking (used by both oracles).
_SQL_CHUNKS = f"""
    t AS (
        SELECT doc_id, {_SQL_RAW_TOKS} AS toks FROM documents
    ),
    idxs AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                   0, CAST(ceil(len(toks) / {_LINE_W}.0) AS BIGINT) - 1)) AS c
        FROM t WHERE len(toks) > 0
    ),
    chunks AS (
        SELECT doc_id, c::BIGINT AS idx,
               array_to_string(
                   toks[c * {_LINE_W} + 1 : c * {_LINE_W} + {_LINE_W}],
                   ' ') AS line
        FROM idxs
    )
"""

_LINE_SCRUB_ORACLE = f"""
    WITH {_SQL_CHUNKS},
    hashed AS (SELECT *, {md5_long_sql('line')} AS h FROM chunks),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY h ORDER BY doc_id, idx) AS rn
            FROM hashed
        ) WHERE rn = 1
    ),
    reb AS (
        SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(line, ' ' ORDER BY idx) AS rebuilt
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(ceil(len(t.toks) / {_LINE_W}.0) AS BIGINT) AS n_lines,
           coalesce(reb.n_kept, 0)::BIGINT AS n_kept,
           {md5_long_sql("coalesce(reb.rebuilt, '')")} AS rebuilt_fp,
           length(coalesce(reb.rebuilt, ''))::BIGINT AS n_chars_kept
    FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id
"""


@register(
    "line_dedup_scrub",
    _LINE_SCRUB_ORACLE,
    survey_ids=("A7",),
    doc="CCNet/C4-style GLOBAL line dedup with rebuild: every line "
    "(derived here as consecutive 8-token chunks — the synthetic "
    "corpus has no newlines; the chunker is the only text-specific "
    "piece) is hashed, only the corpus-wide first occurrence by "
    "(doc_id, line_idx) survives, and documents are rebuilt from "
    "their kept lines (fingerprint emitted, not the text — output "
    "stays one row per doc at any duplication factor).  Scale shape: "
    "NO pair relation ever exists — unlike the passage-span family, "
    "a 10x-verbatim corpus costs 1x here, not 100x: one shuffle on "
    "the line hash (keep-first window), one keyed agg on doc_id for "
    "the rebuild.  Hash skew (a boilerplate line in every doc) is "
    "bounded by the window's per-key ORDER BY — at 100 TB a "
    "pathological key would use the two-phase min-struct agg "
    "(groupBy h -> min(doc_id, idx)) which combines map-side; the "
    "window form is kept here because the keep-first row itself is "
    "what the rebuild joins on.",
)
def q_line_dedup_scrub(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_lines = F.ceil(
        F.size(tokens(F.lower(F.coalesce(F.col("text"), F.lit("")))))
        / F.lit(float(_LINE_W))
    ).cast("long")
    base = docs.select("doc_id", n_lines.alias("n_lines"))
    chunks = _doc_line_chunks(docs)
    hashed = chunks.withColumn("h", md5_long("line"))
    first = Window.partitionBy("h").orderBy("doc_id", "idx")
    kept = (
        hashed.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn", "h")
    )
    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("rebuilt"),
    )
    return (
        base.join(reb, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            md5_long(F.coalesce(F.col("rebuilt"), F.lit(""))).alias("rebuilt_fp"),
            F.length(F.coalesce(F.col("rebuilt"), F.lit("")))
            .cast("long")
            .alias("n_chars_kept"),
        )
    )


# ===========================================================================
# Margin-based bitext mining (mutual-kNN + ratio margin)
# ===========================================================================

_BITEXT_K = 4

_BITEXT_ORACLE = f"""
    WITH s AS (SELECT vec_id AS src_id, embedding::DOUBLE[] AS sv
               FROM embeddings WHERE vec_id % 2 = 0),
    t AS (SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS tv
          FROM embeddings WHERE vec_id % 2 = 1),
    p AS (
      SELECT src_id, tgt_id,
             floor(list_dot_product(sv, tv) * 1000000000)::BIGINT AS qdot
      FROM s, t
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
    "bitext_mine_margin",
    _BITEXT_ORACLE,
    survey_ids=(),
    doc="Margin-based bitext mining (Artetxe & Schwenk 2019): the two "
    "pseudo-corpora are the embedding table split by id parity; "
    "candidates are MUTUAL top-k (k=4) by dot product, scored by the "
    "ratio margin cos(x,y) / mean(topk(x) u topk(y)) and thresholded "
    "at >1.  Exactness: dots are sequential folds quantized to 1e-9 "
    "integers (the embed_centroid discipline), so the top-k sums are "
    "order-free integer sums and the margin is ONE correctly-rounded "
    "integer division — bit-identical cross-engine.  Scale shape: "
    "the scored pair relation here is the brute-force exactness "
    "baseline (target side broadcast, map-side dot, no shuffle "
    "before the rank windows); at 100 TB the candidate generator is "
    "the IVF path (embed_ivf_topk) producing the SAME mutual-kNN "
    "relation from bucketed search, and the margin arithmetic is "
    "unchanged.  The two rank windows partition by src/tgt id — "
    "per-key frames are corpus-sized here but k-bounded after the "
    "IVF candidate cut.",
)
def q_bitext_mine_margin(spark, sf_dir):
    from ..operators.similarity import dot

    e = load(spark, sf_dir, "embeddings")
    src = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").cast("array<double>").alias("sv"),
    )
    tgt = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").cast("array<double>").alias("tv"),
    )
    pairs = src.join(F.broadcast(tgt)).select(
        "src_id",
        "tgt_id",
        F.floor(dot(F.col("sv"), F.col("tv")) * F.lit(1000000000.0))
        .cast("long")
        .alias("qdot"),
    )
    ws = Window.partitionBy("src_id").orderBy(F.col("qdot").desc(), "tgt_id")
    wt = Window.partitionBy("tgt_id").orderBy(F.col("qdot").desc(), "src_id")
    # The ranked pair relation feeds THREE consumers (kx, ky, mutual);
    # Catalyst does not CSE shared subtrees, so without a cache the
    # 64-dim fold dot over every pair is computed three times (73 s ->
    # ~30 s at sf0.1).  track_cache so catalog runners can release it.
    from ..caching import track_cache

    r = track_cache(
        pairs.withColumn("rs", F.row_number().over(ws)).withColumn(
            "rt", F.row_number().over(wt)
        )
    )
    kx = (
        r.filter(F.col("rs") <= _BITEXT_K)
        .groupBy("src_id")
        .agg(F.sum("qdot").cast("long").alias("sx"))
    )
    ky = (
        r.filter(F.col("rt") <= _BITEXT_K)
        .groupBy("tgt_id")
        .agg(F.sum("qdot").cast("long").alias("sy"))
    )
    mutual = r.filter((F.col("rs") <= _BITEXT_K) & (F.col("rt") <= _BITEXT_K))
    margin = (F.col("qdot") * F.lit(2 * _BITEXT_K)) / (F.col("sx") + F.col("sy"))
    return (
        mutual.join(F.broadcast(kx), "src_id")
        .join(F.broadcast(ky), "tgt_id")
        .withColumn("margin", margin)
        .filter(F.col("margin") > 1.0)
        .select("src_id", "tgt_id", "qdot", "margin")
    )


# ===========================================================================
# JSONL source/sink round trip
# ===========================================================================

_JSONL_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, source, lang, n_chars,
               ({_SQL_RAW_TOKS})[1:3] AS head
        FROM documents
    )
    SELECT lang,
           count(*)::BIGINT AS n,
           sum(n_chars)::BIGINT AS sum_chars,
           count(DISTINCT source)::BIGINT AS n_sources,
           sum(len(head))::BIGINT AS sum_head_toks,
           sum({md5_long_sql("array_to_string(head, ' ')")} % 1000003)::BIGINT
               AS toks_checksum
    FROM t
    GROUP BY lang
"""


@register(
    "jsonl_roundtrip",
    _JSONL_ORACLE,
    survey_ids=(),
    doc="The JSONL source/sink (sources/jsonl.py) under the value "
    "gate: documents are projected to (id, source, nested meta "
    "struct, head-token array), written as sharded JSONL, read back "
    "through the DECLARED-SCHEMA scan (single-pass, no inference "
    "sweep — the 100 TB posture), and aggregated per lang.  Every "
    "agg arm proves a parsed type: sum_chars needs the NESTED bigint "
    "(meta.n_chars), sum_head_toks/toks_checksum need the string "
    "array parsed element-exactly (checksum = sum of per-row md5 "
    "residues mod 1000003 — order-free, overflow-free), n_sources a "
    "string field.  The oracle recomputes from the ORIGINAL parquet, "
    "so any serialization loss in the round trip hash-mismatches.",
)
def q_jsonl_roundtrip(spark, sf_dir):
    from ..session import fixed_scratch_dir
    from ..sources.jsonl import jsonl_scan, write_jsonl

    docs = load(spark, sf_dir, "documents")
    head = F.slice(
        tokens(F.lower(F.coalesce(F.col("text"), F.lit("")))), 1, 3
    )
    j = docs.select(
        "doc_id",
        "source",
        F.struct(F.col("lang"), F.col("n_chars")).alias("meta"),
        head.alias("head_toks"),
    )
    path = f"{fixed_scratch_dir('jsonl')}/documents_jsonl"
    write_jsonl(j, path)
    r = jsonl_scan(
        spark,
        path,
        "doc_id bigint, source string, "
        "meta struct<lang:string,n_chars:bigint>, head_toks array<string>",
    )
    return r.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("meta.n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum(F.size("head_toks")).cast("long").alias("sum_head_toks"),
        F.sum(md5_long(F.concat_ws(" ", "head_toks")) % F.lit(1000003))
        .cast("long")
        .alias("toks_checksum"),
    )


# ===========================================================================
# Streaming line dedup (the crawl front door for CONTENT lines)
# ===========================================================================

_STREAM_LINE_BATCHES = 3

_STREAM_LINE_ORACLE = f"""
    WITH {_SQL_CHUNKS},
    hashed AS (SELECT *, {md5_long_sql('line')} AS h FROM chunks),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY h ORDER BY doc_id, idx) AS rn
            FROM hashed
        ) WHERE rn = 1
    ),
    occ AS (SELECT h, count(*)::BIGINT AS cnt FROM hashed GROUP BY h)
    SELECT kept.doc_id,
           count(*)::BIGINT AS n_kept,
           sum(occ.cnt)::BIGINT AS n_occurrences
    FROM kept JOIN occ ON kept.h = occ.h
    GROUP BY kept.doc_id
"""


def make_line_dedup_batch(log):
    """The streaming_line_dedup foreachBatch sink, as a module-level
    factory so the chaos-replay test (tests/test_streaming_replay.py)
    drives the EXACT production sink twice with the same batch id."""

    def apply_batch(batch_df, _batch_id):
        chunks = _doc_line_chunks(batch_df)
        partial = (
            chunks.withColumn("h", md5_long("line"))
            .groupBy("h")
            .agg(
                F.min(F.struct("doc_id", "idx")).alias("first_occ"),
                F.count(F.lit(1)).cast("long").alias("cnt"),
            )
            .select(
                "h",
                F.col("first_occ.doc_id").alias("min_doc"),
                F.col("first_occ.idx").alias("min_idx"),
                "cnt",
            )
        )
        # Deterministic per-batch path + overwrite = IDEMPOTENT sink
        # (foreachBatch is at-least-once; a replayed batch would
        # double cnt under a flat append log — round-10 ADVICE).
        partial.write.mode("overwrite").parquet(f"{log}/batch={_batch_id}")

    return apply_batch


def line_dedup_fold(spark, log):
    """Drain fold for the line-dedup state log — shared by the catalog
    query and the replay test."""
    folded = (
        spark.read.parquet(log)
        .groupBy("h")
        .agg(
            F.min(F.struct("min_doc", "min_idx")).alias("first_occ"),
            F.sum("cnt").cast("long").alias("cnt"),
        )
    )
    return folded.groupBy(F.col("first_occ.min_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("cnt").cast("long").alias("n_occurrences"),
    )


@register(
    "streaming_line_dedup",
    _STREAM_LINE_ORACLE,
    survey_ids=("ST1", "A7"),
    doc="Global line dedup as STREAMING INGESTION — the streaming twin "
    "of line_dedup_scrub, completing the symmetry that every dedup "
    "stage has a crawl-front-door shape (exact: streaming_dedup_events; "
    "URL: streaming_url_dedup; LSH: streaming_lsh_assign; lines: "
    "this).  Documents arrive as a file-source stream in 3 "
    "micro-batches (availableNow, maxFilesPerTrigger=1); each batch "
    "chunks its docs through the SHARED _doc_line_chunks (semantics "
    "cannot drift from the batch scrub), and appends per-batch PARTIAL "
    "aggregates per line hash — min(struct(doc_id, idx)) and count — "
    "to a DETERMINISTIC per-batch path with overwrite (foreachBatch "
    "sinks are at-least-once: an append-only log would double the "
    "count partials if a batch replayed after a successful write but "
    "before its checkpoint commit — overwrite makes replay a no-op).  "
    "The drained fold takes min/sum per hash: min over a partition of "
    "the occurrence set IS the global first occurrence (associative, "
    "commutative), so the "
    "folded state must hash-equal the one-shot keep-first oracle on "
    "the union corpus, for ANY batching.  Output is per KEEPING doc: "
    "lines it owns globally and the total occurrences those lines "
    "absorb corpus-wide.  Per-batch state traffic is O(distinct line "
    "hashes in the batch), never the corpus; at production refresh "
    "cadence the log is bucketed by hash (the band-partitioned LSH "
    "store pattern, operators/layout.py:write_bucketed) so the fold "
    "prunes to touched buckets.",
)
def q_streaming_line_dedup(spark, sf_dir):
    from ..session import scratch_dir

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = scratch_dir("stream_line")
    src = f"{root}/src"
    log = f"{root}/state_log"
    for r in range(_STREAM_LINE_BATCHES):
        docs.filter(F.col("doc_id") % _STREAM_LINE_BATCHES == r).coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    apply_batch = make_line_dedup_batch(log)

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
        raise RuntimeError("streaming_line_dedup drain timed out")
    return line_dedup_fold(spark, log)
