"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect to the
driver), mirroring how the DuckDB baseline is measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tomasz_weight_tracker_spark.plans import REGISTRY
from tomasz_weight_tracker_spark.session import get_spark

# Headline set: the flagship pipeline + one representative per operator
# family, weighted toward the shuffle/explode-heavy queries that
# dominate at scale.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "electricity_15min",
    "bucket_15min",
    "rolling_avg_7d",
    "dedup_keep_last",
    "sessionize",
    "pivot_event_counts",
    "minute_grid",
    "exact_dedup",
    "minhash_signature",
    "lsh_near_dup",
    "doc_quality",
    "embed_knn",
    "embed_centroid",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the operators, not session startup.
    REGISTRY["global_summary"].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        t0 = time.time()
        df = q.build(spark, sf_dir)
        n = df.count() if name == "lsh_near_dup" else len(df.collect())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
