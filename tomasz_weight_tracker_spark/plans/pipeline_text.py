"""Corpus-curation catalog queries (repetition, boilerplate,
contamination, PII, salient terms) over the ``documents`` table.

Extension surface beyond the reference (SURVEY §8.2): the signals a
pretraining-data pipeline computes before training.  The closest
reference analogue is its normalize→dedup pass over scraped postings
(utils/loose_thoughts.py:227-238).  Every oracle is exact (value-hash):
integer counts + one IEEE double division, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import pipeline_text as PT
from ..operators.text_analysis import sql_tokens
from .catalog import load, register

_TOK = sql_tokens("text")


@register(
    "doc_repetition",
    f"""
    WITH tk AS (
        SELECT doc_id, {_TOK} AS tok FROM documents
    ), bg AS (
        SELECT doc_id, tok, {PT.sql_bigrams('tok')} AS bgs FROM tk
    )
    SELECT doc_id,
           len(tok)::BIGINT AS n_tokens,
           CASE WHEN len(tok) > 0
                THEN {PT.sql_top_token_count('tok')}::DOUBLE / len(tok)::DOUBLE
                ELSE 0.0 END AS top_token_frac,
           CASE WHEN len(bgs) > 0
                THEN 1.0 - len(list_distinct(bgs))::DOUBLE / len(bgs)::DOUBLE
                ELSE 0.0 END AS dup_bigram_frac
    FROM bg
    """,
    survey_ids=(),
    doc="Gopher-style repetition signals: top-token fraction and "
    "duplicate-bigram fraction, per-row (no shuffle).",
)
def q_doc_repetition(spark, sf_dir):
    return PT.repetition_metrics(load(spark, sf_dir, "documents"))


@register(
    "boilerplate_ngrams",
    f"""
    WITH tg AS (
        SELECT doc_id, unnest(list_distinct({PT.sql_trigrams(_TOK)})) AS ngram
        FROM documents
    )
    SELECT ngram, count(*)::BIGINT AS n_docs
    FROM tg GROUP BY ngram
    ORDER BY n_docs DESC, ngram LIMIT 20
    """,
    survey_ids=(),
    doc="Corpus-wide boilerplate trigrams ranked by distinct-document "
    "frequency; explode -> partial agg -> TakeOrderedAndProject.",
)
def q_boilerplate_ngrams(spark, sf_dir):
    return PT.boilerplate_ngrams(load(spark, sf_dir, "documents"))


@register(
    "contamination_overlap",
    f"""
    WITH base AS (
        SELECT doc_id, list_distinct({PT.sql_trigrams(_TOK)}) AS tg
        FROM documents
    ), bench AS (
        SELECT DISTINCT unnest(tg) AS ngram FROM base WHERE doc_id % 53 = 0
    ), corpus AS (
        SELECT doc_id, tg FROM base WHERE doc_id % 53 <> 0
    ), hits AS (
        SELECT c.doc_id, count(*)::BIGINT AS n_contaminated
        FROM (SELECT doc_id, unnest(tg) AS ngram FROM corpus) c
        JOIN bench b USING (ngram)
        GROUP BY c.doc_id
    )
    SELECT corpus.doc_id,
           len(corpus.tg)::BIGINT AS n_ngrams,
           coalesce(hits.n_contaminated, 0)::BIGINT AS n_contaminated,
           CASE WHEN len(corpus.tg) > 0
                THEN coalesce(hits.n_contaminated, 0)::DOUBLE
                     / len(corpus.tg)::DOUBLE
                ELSE 0.0 END AS contaminated_frac
    FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
    """,
    survey_ids=(),
    doc="Benchmark-contamination screen: corpus trigrams vs broadcast "
    "benchmark trigram set; corpus side never shuffles on volume.",
)
def q_contamination_overlap(spark, sf_dir):
    return PT.contamination_overlap(load(spark, sf_dir, "documents"))


def _pii_oracle() -> str:
    s = PT.sql_redact_pii("text")
    return f"""
    SELECT doc_id,
           {s['email']} AS n_email,
           {s['phone']} AS n_phone,
           {s['ipv4']} AS n_ipv4,
           {s['clean']} AS clean_text
    FROM documents
    """


@register(
    "pii_redact",
    _pii_oracle(),
    survey_ids=(),
    doc="PII redaction: count + replace emails/phones/IPv4 with typed "
    "placeholders; per-row regexes restricted to Java/RE2-identical "
    "syntax (no lookaround/backrefs).",
)
def q_pii_redact(spark, sf_dir):
    out = PT.redact_pii(load(spark, sf_dir, "documents"))
    return out.select("doc_id", "n_email", "n_phone", "n_ipv4", "clean_text")


@register(
    "corpus_curation",
    PT.sql_curate_corpus(),
    survey_ids=("A6", "A7", "P5", "G1"),
    doc="The end-to-end pretraining-data curation pass: quality gate "
    "-> exact dedup (normalized md5, keep-min) -> reorder-robust "
    "dedup (sorted-token-bag md5) -> repetition gate -> PII "
    "redaction.  Composed from the module's operators with a "
    "stage-by-stage SQL twin; two keyed min-aggregations are the "
    "whole shuffle budget (operators/pipeline_text.py:curate_corpus).",
)
def q_corpus_curation(spark, sf_dir):
    return PT.curate_corpus(load(spark, sf_dir, "documents"))


@register(
    "salient_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM toks GROUP BY doc_id, term
    ), docfreq AS (
        SELECT term, count(*)::BIGINT AS df
        FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
    )
    SELECT doc_id, term, tf, df, rank FROM (
        SELECT tf.doc_id, tf.term, tf.tf, docfreq.df,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, docfreq.df ASC,
                                           tf.term ASC) AS rank
        FROM tf JOIN docfreq USING (term)
    ) WHERE rank <= 3
    """,
    survey_ids=(),
    doc="Per-document top-3 salient terms: integer-only TF-IDF "
    "surrogate (tf desc, rarity asc, term asc) — hash-stable, no "
    "float log in the ranking.",
)
def q_salient_terms(spark, sf_dir):
    # widen=False: the plan's cost sits in the post-explode tf/idf
    # joins, not the scan stage — measured x0.53 WITH the widen
    # exchange at sf0.1 (0.71 -> 1.35 s), so keep the serial scan.
    return PT.salient_terms(load(spark, sf_dir, "documents", widen=False))
