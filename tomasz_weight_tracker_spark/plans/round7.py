"""Round-7 catalog additions.

- ``paged_source_scan``: the S6 paged DataSource under the exact
  value-hash gate (it was the last source with a pytest-only surface).
  Following the ``plans/pathbound.py`` pattern, a deterministic file
  store is derived from the gate's ``documents`` table (executor-side
  writes — no driver collect), then read back through the REAL
  ``paged_store`` DataSource (driver-side paged listing, one Spark
  partition per page, executor-side content download), proving the
  pages→partitions reassembly is value-exact against a closed-form
  DuckDB oracle on the original table.
- ``bpe_vocab_train``: distributed tokenizer-vocabulary training —
  fixed-round BPE merge learning as DataFrame jobs (the canonical
  100 TB LLM-pipeline primitive the catalog lacked; the pagerank /
  ivf_train fixed-iteration pattern), with a DuckDB oracle that
  replays the same merges as a CTE chain.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.bpe import bpe_train, sql_bpe_chain
from .catalog import load, register


@register(
    "paged_source_scan",
    """
    SELECT 'doc_' || doc_id || '.txt' AS name,
           'd' || (doc_id % 7) AS folder_tag,
           octet_length(encode(coalesce(text, '')))::BIGINT AS size,
           md5(coalesce(text, '')) AS content_md5
    FROM documents WHERE doc_id % 2 = 0
    """,
    survey_ids=("S6",),
    doc="The S6 remote-paged source (sources/paged_store.py — the "
    "reference's Google Drive pageToken walk as a Spark 4 Python "
    "DataSource; utils/20251223-csv-from-googledrive.py:45-107) under "
    "the exact value-hash gate.  build() derives a deterministic "
    "store from the documents table — each doc becomes a file "
    "doc_<id>.txt|.dat under subfolder d<id%7> (nested tree: the "
    "recursive walk is exercised), written from EXECUTORS via "
    "foreachPartition (no driver collect; local-mode scaffolding for "
    "the store's existence, not engine work) — then reads it back "
    "with format('paged_store'), suffix filter '.txt' (the mimeType "
    "filter: .dat files must be excluded) and page_size 16, so the "
    "listing splits into many pages => many Spark partitions.  The "
    "output (name, folder, size, content md5) is recomputed "
    "closed-form by the oracle from the original table, proving the "
    "walk + pagination + partition reassembly + content download "
    "round-trip is value-exact, not just row-counted.",
)
def q_paged_source_scan(spark, sf_dir):
    from ..session import fixed_scratch_dir
    from ..sources.paged_store import PagedStoreDataSource

    root = fixed_scratch_dir(f"paged_{os.path.basename(sf_dir.rstrip('/'))}")
    store = f"{root}/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def write_part(rows):
        for r in rows:
            sub = os.path.join(store, f"d{r.doc_id % 7}")
            os.makedirs(sub, exist_ok=True)
            ext = "txt" if r.doc_id % 2 == 0 else "dat"
            with open(os.path.join(sub, f"doc_{r.doc_id}.{ext}"), "wb") as fh:
                fh.write((r.text or "").encode("utf-8"))

    # Idempotent: content is a pure function of the row, and the fixed
    # scratch root is process-fresh — repeated builds rewrite in place.
    docs.foreachPartition(write_part)
    try:
        spark.dataSource.register(PagedStoreDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("paged_store")
        .option("path", store)
        .option("suffix", ".txt")
        .option("page_size", "16")
        .load()
    )
    return df.select(
        "name",
        F.element_at(F.split("folder", "/"), -1).alias("folder_tag"),
        F.col("size"),
        F.md5("content").alias("content_md5"),
    )


# ===========================================================================
# Distributed BPE tokenizer-vocabulary training (fixed 8 merge rounds)
# ===========================================================================

_BPE_ROUNDS = 8

_BPE_WORDS_CTE = """
    SELECT lower(w) AS word, count(*)::BIGINT AS freq
    FROM documents, unnest(string_split_regex(text, '\\s+')) AS u(w)
    WHERE regexp_full_match(w, '[A-Za-z]+') AND len(w) BETWEEN 2 AND 20
    GROUP BY 1
"""


@register(
    "bpe_vocab_train",
    sql_bpe_chain(_BPE_WORDS_CTE, _BPE_ROUNDS),
    survey_ids=("A1", "G2"),
    doc=f"Distributed tokenizer-vocabulary training: {_BPE_ROUNDS} rounds "
    "of byte-pair-encoding merge learning over the documents corpus "
    "(operators/bpe.py — the vocab-LEARNING step that the catalog's "
    "pre-tokenization / chunking / packing operators feed).  The "
    "corpus is touched once (whitespace tokenize, alpha-word filter, "
    "one word-frequency aggregation); after that every round runs on "
    "the VOCABULARY-bounded symbol state (|vocab| x word_len rows "
    "however large the corpus), with a per-round shuffle budget of "
    "one pair-count aggregation + one word-key exchange reused by all "
    "of the round's windows, and a single 1-row driver action for the "
    "deterministic arg-max (integer counts, (left,right) tie-break — "
    "the pagerank/ivf_train fixed-iteration pattern, RNG-free).  "
    "Greedy left-to-right merge application is a parallel "
    "run-alternation window, not a Python loop.  The oracle replays "
    "the identical training as an unrolled DuckDB CTE chain "
    "(operators/bpe.py:sql_bpe_chain), so the learned merge table is "
    "value-hash exact.",
)
def q_bpe_vocab_train(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w").rlike("^[A-Za-z]+$") & F.length("w").between(2, 20))
        .groupBy(F.lower("w").alias("word"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return bpe_train(spark, words, _BPE_ROUNDS)
