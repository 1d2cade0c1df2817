"""DuckDB side of the bench comparison: the headline queries' oracle
SQL, timed with the SAME discipline as bench.py (one untimed warm
pass, then best-of-2 timed ``fetchall``), so the Spark/DuckDB ratio in
BASELINE.md compares like with like.

Usage: python tools/duck_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line {"value": total_sec, "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402
from tomasz_weight_tracker_spark.plans import REGISTRY  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = REGISTRY[name].oracle
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (buffer pool, plan)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
