"""Round-10 store-growth soak: grow the LSH signature STORE 10x while
holding the probe BATCH fixed, and show per-refresh cost flat.

The round-9 soak grew store and batch together, which cannot separate
O(batch) from O(store) refresh cost.  This one pins the batch:

  - store of S docs, then 10S docs (deterministic synthetic texts —
    ~1/50 of which are verbatim twins of batch docs, so the probe
    always has real work);
  - fixed 16-doc batch probed against each store;
  - reported per store size: wall of the probe (partition-pruned read
    + band-hash semi-join + assign windows + collect), the number of
    store rows SURVIVING the prune (the window's actual input — the
    in-data evidence), and the touched-bucket count.

Flat per-refresh wall + ~flat pruned-row count at 10x store is the
"done" criterion the round-9 verdict set.  For contrast the flat-store
(round-9) shape — full scan + full window — is timed on the same
stores; its window input IS the store.

Usage: python tools/soak_store.py [S] (default 10_000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from tomasz_weight_tracker_spark.operators import dedup as D  # noqa: E402
from tomasz_weight_tracker_spark.session import get_spark, scratch_dir  # noqa: E402

K, BANDS, NB = 16, 4, 256
BATCH = 16
THRESH = 12


def synth_sigs(spark, n, start=0):
    # ~1/50 docs are verbatim copies of the batch's text family, so the
    # probe always finds touched members; the rest are unique.
    # Twins are pinned to a FIXED id range (< 2000) so the touched-member
    # population does not itself grow with the store — the whole point
    # is separating O(batch x touched) from O(store).
    df = spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 50 == 0) & (F.col("id") < 2000),
            F.concat(F.lit("shared probe family text number "), F.col("id") % 4),
        )
        .otherwise(
            F.concat(
                F.lit("unique store doc "),
                F.col("id"),
                F.lit(" tokens "),
                (F.col("id") * 7) % 9973,
                F.lit(" "),
                (F.col("id") * 13) % 9967,
            )
        )
        .alias("text"),
    )
    return D.minhash_signature(df, "text", k=K).drop("text")


def batch_sigs(spark):
    rows = [
        (10_000_000 + i, f"shared probe family text number {i % 4}")
        for i in range(BATCH // 2)
    ] + [
        (10_000_000 + BATCH + i, f"fresh unseen batch doc {i} nothing matches")
        for i in range(BATCH // 2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return D.minhash_signature(df, "text", k=K).drop("text")


def probe_bucketed(spark, store_path, batch):
    t0 = time.time()
    hist = D.lsh_store_probe_read(
        spark, store_path, batch, k=K, bands=BANDS, n_buckets=NB
    )
    pruned_rows = 0 if hist is None else hist.count()
    all_sigs = (
        batch.withColumn("is_new", F.lit(True))
        if hist is None
        else hist.withColumn("is_new", F.lit(False)).unionByName(
            batch.withColumn("is_new", F.lit(True))
        )
    )
    n_upd = D.lsh_probe_assign(
        all_sigs, "is_new", "doc_id", k=K, bands=BANDS, verify_min=THRESH
    ).count()
    return time.time() - t0, pruned_rows, n_upd


def probe_flat(spark, flat_path, batch):
    """The round-9 shape: full store scan + full __fsig window."""
    t0 = time.time()
    store = spark.read.parquet(flat_path).withColumn("is_new", F.lit(False))
    all_sigs = store.unionByName(batch.withColumn("is_new", F.lit(True)))
    n_upd = D.lsh_probe_assign(
        all_sigs, "is_new", "doc_id", k=K, bands=BANDS, verify_min=THRESH
    ).count()
    return time.time() - t0, n_upd


def main():
    s_base = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("soak-store")
    batch = batch_sigs(spark).localCheckpoint(eager=True)
    touched = len(
        {
            r.pb
            for r in batch.select(
                F.explode(
                    F.array(*[D.lsh_band_hash(b, K, BANDS) for b in range(BANDS)])
                ).alias("bh")
            )
            .select(F.pmod("bh", F.lit(NB)).cast("int").alias("pb"))
            .distinct()
            .collect()
        }
    )
    out = []
    for mult in (1, 10):
        n = s_base * mult
        sigs = synth_sigs(spark, n).localCheckpoint(eager=True)
        root = scratch_dir("soakstore")
        store = f"{root}/s{mult}"
        flat = f"{root}/flat{mult}"  # the round-9 layout: 1 row/doc
        D.lsh_store_append(sigs, store, k=K, bands=BANDS, n_buckets=NB)
        sigs.write.mode("append").parquet(flat)
        # warm both paths once (scheduling/codegen floor), then best-of-2
        probe_bucketed(spark, store, batch)
        wall_b, pruned, n_upd = min(
            (probe_bucketed(spark, store, batch) for _ in range(2)),
            key=lambda t: t[0],
        )
        probe_flat(spark, flat, batch)
        wall_f, n_upd_f = min(
            (probe_flat(spark, flat, batch) for _ in range(2)),
            key=lambda t: t[0],
        )
        assert n_upd == n_upd_f, (n_upd, n_upd_f)
        out.append(
            {
                "store_docs": n,
                "batch_docs": BATCH,
                "touched_buckets": f"{touched}/{NB}",
                "pruned_window_input_rows": pruned,
                "flat_window_input_rows": n * BANDS,
                "updates": n_upd,
                "wall_bucketed_probe_s": round(wall_b, 2),
                "wall_flat_probe_s": round(wall_f, 2),
            }
        )
        print(json.dumps(out[-1]))
    r = out[1]["wall_bucketed_probe_s"] / max(out[0]["wall_bucketed_probe_s"], 1e-9)
    rp = out[1]["pruned_window_input_rows"] / max(
        out[0]["pruned_window_input_rows"], 1
    )
    print(
        json.dumps(
            {
                "store_growth": 10.0,
                "bucketed_wall_ratio": round(r, 2),
                "pruned_rows_ratio": round(rp, 2),
                "verdict": "FLAT" if r < 2.0 else "NOT FLAT",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
