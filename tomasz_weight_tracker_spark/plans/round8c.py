"""Round-8c catalog additions — consumers of the round-8b machinery.

- ``source_leakage_matrix``: the dup_passage_spans relation rolled up
  to SOURCE granularity — which corpus slices share verbatim passages
  with which, and how many duplicated tokens flow between them.  The
  table a curation owner actually reads before deciding what to crawl
  less of.
- ``tokenizer_fertility_by_lang``: BPE fertility (learned tokens per
  word, ppm) per document language — the standard tokenizer-equity
  diagnostic (a vocabulary trained on one language's distribution
  over-segments the others); same vocabulary-bounded segmentation as
  bpe_corpus_tokens, grouped by the lang column instead of source.
- ``gopher_quality_rules``: the named Gopher document-quality rules
  (Rae et al. 2021 §A1.1, public) as per-document booleans plus the
  conjunctive keep flag — word-count bounds, mean-word-length bounds,
  stopword evidence, alphabetic-word ratio.  The line-based rules
  (ellipsis/bullet starts) are inapplicable to this corpus (the
  synthetic documents are single-line, measured: 0 newlines at every
  SF) and are documented out rather than silently skipped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import tokens
from ..operators.text_analysis import STOPWORDS
from .catalog import load, register
from .round8b import _pspan_ctes, _passage_spans

# ===========================================================================
# Source-level leakage matrix (passage spans rolled up to sources)
# ===========================================================================


@register(
    "source_leakage_matrix",
    _pspan_ctes()
    + """
    SELECT da.source AS source_a, db.source AS source_b,
           count(*)::BIGINT AS n_spans,
           count(DISTINCT (s.id_a, s.id_b))::BIGINT AS n_doc_pairs,
           sum(s.span_toks)::BIGINT AS dup_tokens,
           max(s.span_toks)::BIGINT AS max_span_toks
    FROM spans s
    JOIN documents da ON da.doc_id = s.id_a
    JOIN documents db ON db.doc_id = s.id_b
    GROUP BY da.source, db.source
    """,
    survey_ids=("A1", "J1"),
    doc="The duplicated-passage relation rolled up to SOURCE "
    "granularity: per (source_a, source_b) pair, how many verbatim "
    "spans, distinct doc pairs, and duplicated tokens flow between "
    "the slices — the cross-source leakage table a curation owner "
    "reads before re-weighting or re-crawling (within-source rows "
    "diagnose internal boilerplate; cross-source rows diagnose "
    "mirror/syndication overlap).  Shares the span builder and "
    "oracle CTE chain with dup_passage_spans; the rollup adds two "
    "id-keyed joins to the (bounded) span relation — the corpus is "
    "touched only by the shared gram pass — and one S^2-bounded "
    "aggregation.  Soak note: under the harness's 10x VERBATIM "
    "replication the matrix concentrates onto the same-source "
    "diagonal (178 -> 20 rows at SOAK_r8 while dup_tokens grows) — "
    "replica pairs share their base doc's source and cross-base "
    "gram postings exceed the df cap; a row-count drop here is the "
    "rollup key-space shrinking, not data loss.",
)
def q_source_leakage_matrix(spark, sf_dir):
    spans = _passage_spans(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("source_a"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("source_b"))
    return (
        spans.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.countDistinct("id_a", "id_b").cast("long").alias("n_doc_pairs"),
            F.sum("span_toks").cast("long").alias("dup_tokens"),
            F.max("span_toks").cast("long").alias("max_span_toks"),
        )
    )


# ===========================================================================
# Tokenizer fertility by language (BPE equity diagnostic)
# ===========================================================================


def _fertility_oracle() -> str:
    from ..operators.bpe import sql_bpe_segments_cte
    from .round7 import _BPE_ROUNDS, _BPE_WORDS_CTE

    return (
        sql_bpe_segments_cte(_BPE_WORDS_CTE, _BPE_ROUNDS, name="seg")
        + """, inst AS (
        SELECT d.lang, lower(u.w) AS word
        FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS u(w)
        WHERE regexp_full_match(u.w, '[A-Za-z]+') AND len(u.w) BETWEEN 2 AND 20
    )
    SELECT inst.lang,
           count(*)::BIGINT AS n_words,
           count(DISTINCT inst.word)::BIGINT AS n_distinct_words,
           sum(seg.n_tokens)::BIGINT AS bpe_tokens,
           (sum(seg.n_tokens) * 1000000 // count(*))::BIGINT
               AS fertility_ppm
    FROM inst JOIN seg USING (word)
    GROUP BY inst.lang"""
    )


@register(
    "tokenizer_fertility_by_lang",
    _fertility_oracle(),
    survey_ids=("A1", "G2"),
    doc="Tokenizer FERTILITY (learned BPE tokens per word, ppm) per "
    "document language — the standard tokenizer-equity diagnostic: a "
    "vocabulary trained on the pooled corpus over-segments whichever "
    "language it under-represents, and fertility is the number that "
    "exposes it (the multilingual-tokenizer literature's standard "
    "metric).  Same single corpus-explode + vocabulary-bounded "
    "segmentation + broadcast-back as bpe_corpus_tokens (shared "
    "training words CTE and segment chain on both engines), grouped "
    "by the lang column.",
)
def q_tokenizer_fertility_by_lang(spark, sf_dir):
    from ..operators.bpe import bpe_train_full, segment_words
    from .round7 import _BPE_ROUNDS

    docs = load(spark, sf_dir, "documents")
    inst = docs.select(
        "lang", F.explode(F.split("text", r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[A-Za-z]+$") & F.length("w").between(2, 20))
    words = inst.groupBy(F.lower("w").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    _, state = bpe_train_full(spark, words, _BPE_ROUNDS)
    seg = segment_words(state).select("word", "n_tokens")
    return (
        inst.select("lang", F.lower("w").alias("word"))
        .join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.countDistinct("word").cast("long").alias("n_distinct_words"),
            F.sum("n_tokens").cast("long").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_distinct_words",
            "bpe_tokens",
            F.expr("(bpe_tokens * 1000000) div n_words")
            .cast("long")
            .alias("fertility_ppm"),
        )
    )


# ===========================================================================
# Gopher quality rules (Rae et al. 2021, word-level subset)
# ===========================================================================

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3  # mean word length bounds, compared as integers:
GOPHER_MAX_MWL = 10  # MIN*n <= sum_chars <= MAX*n (no float division)
GOPHER_MIN_STOPWORDS = 2  # distinct stopword types required
GOPHER_ALPHA_PCT = 80  # % of words that must contain a letter

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


# The metrics CTE chain (t, m) and the Spark metrics frame are shared
# with round9's gopher_rule_attribution so rule definitions cannot
# drift between the boolean view and the attribution view.
GOPHER_METRIC_CTES = f"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+') END AS tk
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(tk)::BIGINT AS n_words,
               list_sum(list_transform(tk, x -> len(x)))::BIGINT AS n_chars,
               len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
                   AS n_alpha,
               len(list_distinct(list_transform(list_filter(tk,
                   x -> list_contains([{_SW}], lower(x))),
                   x -> lower(x))))::BIGINT AS n_stop
        FROM t
    )"""

# SQL rule predicates over the m frame, by rule name (order = report order).
GOPHER_RULES_SQL = {
    "word_count": f"(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})",
    "mean_word_len": (
        f"(n_chars >= {GOPHER_MIN_MWL} * n_words"
        f" AND n_chars <= {GOPHER_MAX_MWL} * n_words)"
    ),
    "stopwords": f"(n_stop >= {GOPHER_MIN_STOPWORDS})",
    "alpha_words": f"(n_alpha * 100 >= {GOPHER_ALPHA_PCT} * n_words)",
}


def gopher_metrics(spark, sf_dir):
    """(doc_id, n_words, n_chars, n_alpha, n_stop) — the fused-token
    metric pass both gopher consumers build their rules on."""
    d = load(spark, sf_dir, "documents")
    tk = tokens(F.trim(F.col("text")))
    d = d.select("doc_id", tk.alias("tk"))
    n = F.size("tk").cast("long")
    chars = F.aggregate(
        F.transform("tk", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    alpha = F.size(F.filter("tk", lambda x: x.rlike("[A-Za-z]"))).cast("long")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    # Distinct stopword TYPES are counted case-folded ('The' and 'the'
    # are one type) — lowercase BEFORE array_distinct on both engines.
    stop = F.size(
        F.array_distinct(
            F.transform(
                F.filter("tk", lambda x: F.array_contains(sw, F.lower(x))),
                F.lower,
            )
        )
    ).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_words"),
        chars.alias("n_chars"),
        alpha.alias("n_alpha"),
        stop.alias("n_stop"),
    )


def gopher_rules(metrics):
    """Rule-name -> boolean Column over the metrics frame (mirrors
    GOPHER_RULES_SQL term for term)."""
    return {
        "word_count": F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
        "mean_word_len": (
            F.col("n_chars") >= GOPHER_MIN_MWL * F.col("n_words")
        ) & (F.col("n_chars") <= GOPHER_MAX_MWL * F.col("n_words")),
        "stopwords": F.col("n_stop") >= GOPHER_MIN_STOPWORDS,
        "alpha_words": F.col("n_alpha") * 100 >= GOPHER_ALPHA_PCT * F.col("n_words"),
    }


@register(
    "gopher_quality_rules",
    GOPHER_METRIC_CTES
    + f"""
    SELECT doc_id, n_words,
           {GOPHER_RULES_SQL["word_count"]} AS r_word_count,
           {GOPHER_RULES_SQL["mean_word_len"]} AS r_mean_word_len,
           {GOPHER_RULES_SQL["stopwords"]} AS r_stopwords,
           {GOPHER_RULES_SQL["alpha_words"]} AS r_alpha_words,
           ({" AND ".join(GOPHER_RULES_SQL.values())}) AS keep
    FROM m
    """,
    survey_ids=("G5", "A2"),
    doc="The NAMED Gopher document-quality rules (Rae et al. 2021 "
    "§A1.1, public), word-level subset, as per-document booleans "
    "plus the conjunctive keep flag: word count in "
    f"[{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}], mean word length in "
    f"[{GOPHER_MIN_MWL}, {GOPHER_MAX_MWL}] (compared as integers — "
    "MIN*n <= chars <= MAX*n, no float division to round), >= "
    f"{GOPHER_MIN_STOPWORDS} distinct stopword types, >= "
    f"{GOPHER_ALPHA_PCT}% words containing a letter.  The paper's "
    "line-based rules (ellipsis starts, bullet ratios) are "
    "INAPPLICABLE here — the synthetic documents are single-line "
    "(measured: zero newlines at every SF) — and documented out "
    "rather than silently skipped.  Complements doc_quality (score) "
    "and the LM/perceptron filters (learned): these are the "
    "hand-set, named thresholds a real pipeline runs FIRST.  One "
    "projection pass, no shuffle at all — every rule is an "
    "expression over the fused token array.",
)
def q_gopher_quality_rules(spark, sf_dir):
    m = gopher_metrics(spark, sf_dir)
    r = gopher_rules(m)
    keep = r["word_count"] & r["mean_word_len"] & r["stopwords"] & r["alpha_words"]
    return m.select(
        "doc_id",
        "n_words",
        r["word_count"].alias("r_word_count"),
        r["mean_word_len"].alias("r_mean_word_len"),
        r["stopwords"].alias("r_stopwords"),
        r["alpha_words"].alias("r_alpha_words"),
        keep.alias("keep"),
    )
