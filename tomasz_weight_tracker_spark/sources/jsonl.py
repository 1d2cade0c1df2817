"""JSONL (newline-delimited JSON) source and sink.

JSONL is the de-facto interchange format for LLM training corpora
(one JSON document per line; nested metadata objects and token
arrays are first-class).  This module is a training-data-pipeline
extension, not a reference port — the reference has no JSON surface.

Scale notes:

- ``jsonl_scan`` takes an EXPLICIT schema.  Schema inference over
  JSON requires a full extra pass over the data (Spark samples or
  scans everything to union per-record schemas); at 100 TB that pass
  costs as much as the query itself, and a late-arriving record with
  a new field silently widens the schema.  A declared schema makes
  the scan single-pass, lets Spark prune unreferenced fields during
  parsing (JacksonParser skips tokens for dropped columns), and
  turns drift into visible nulls in ``_corrupt_record``-free mode.
- The writer emits one file per partition (the normal distributed
  layout).  Single-file convenience is deliberately NOT offered here:
  JSONL corpora are sharded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write ``df`` as a directory of JSONL part files (overwrite)."""
    df.write.mode("overwrite").json(path)


def jsonl_scan(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a JSONL directory with a declared schema (DDL string).

    ``mode=FAILFAST`` so a malformed line fails the scan loudly
    instead of yielding a silent all-null row (the corruption would
    otherwise be invisible until a downstream aggregate drifts).
    """
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
