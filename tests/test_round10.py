"""Round-10 additions.

1. The band-partitioned LSH signature store: file-level partition
   pruning must be REAL (PartitionFilters in the scan plan, untouched
   bucket files never listed), the probe-read must be exact (returns
   precisely the store docs sharing a band hash with the batch, plus
   nothing the hash buckets alias in that the semi-join doesn't kill),
   and the incremental fold through the store must still equal the
   one-shot run (the round-9 verdict's top item).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators import dedup as D

K, BANDS, NB = 16, 4, 64


def _sigs(spark, texts, start_id=0):
    df = spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    return D.minhash_signature(df, "text", k=K).drop("text")


@pytest.fixture(scope="module")
def store_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lshstore")) + "/store"
    # 60 distinct store docs: no two share a band key (distinct texts),
    # plus one doc ("shared alpha beta gamma delta") the batch will
    # duplicate verbatim.
    texts = [f"store document number {i} unique tokens {i * 7} {i * 13}" for i in range(60)]
    texts.append("shared alpha beta gamma delta epsilon zeta")
    D.lsh_store_append(_sigs(spark, texts), root, k=K, bands=BANDS, n_buckets=NB)
    return root


def _touched_buckets(batch):
    keys = batch.select(
        F.explode(
            F.array(*[D.lsh_band_hash(b, K, BANDS) for b in range(BANDS)])
        ).alias("bh")
    ).select(F.pmod("bh", F.lit(NB)).cast("int").alias("pb"))
    return {r.pb for r in keys.distinct().collect()}


def test_store_probe_partition_pruning(spark, store_dir):
    """The store scan must carry STATIC PartitionFilters on pb whose
    IN-list is exactly the batch's touched buckets (<= BANDS values for
    a 1-doc batch) — the contract FileSourceScanExec prunes file
    listings on — and every file that yields a row must live in a
    touched bucket directory."""
    import re

    batch = _sigs(spark, ["shared alpha beta gamma delta epsilon zeta"], start_id=1000)
    batch = batch.localCheckpoint(eager=True)
    touched = _touched_buckets(batch)
    assert 0 < len(touched) <= BANDS

    pruned = D.lsh_store_probe_read(spark, store_dir, batch, k=K, bands=BANDS, n_buckets=NB)
    assert pruned is not None

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1]
    pf = pf[: pf.index("]") + 1]
    assert "pb" in pf
    in_literals = {int(x) for x in re.findall(r"\b(\d+)\b", pf.split("(", 1)[1])}
    assert in_literals == touched, (pf, touched)

    # Functional check (input_file_name survives no shuffle, so run it
    # on a raw scan carrying the same partition filter the helper
    # plants): rows only ever come out of touched bucket dirs.
    raw = spark.read.parquet(store_dir).filter(
        F.col("pb").isin(sorted(touched))
    )
    files = {
        r.f.split("pb=")[1].split("/")[0]
        for r in raw.select(F.input_file_name().alias("f")).collect()
    }
    assert files and files <= {str(b) for b in touched}


def test_store_probe_exact_retention(spark, store_dir):
    """probe-read returns exactly the store docs sharing >=1 band hash
    with the batch (here: the verbatim twin, id 60), reconstructed with
    their full signatures intact."""
    batch = _sigs(spark, ["shared alpha beta gamma delta epsilon zeta"], start_id=1000)
    batch = batch.localCheckpoint(eager=True)
    pruned = D.lsh_store_probe_read(spark, store_dir, batch, k=K, bands=BANDS, n_buckets=NB)
    rows = pruned.collect()
    # Same-bucket strangers are killed by the exact band-hash semi-join:
    # only the identical-signature store doc survives.
    assert [r.doc_id for r in rows] == [60]
    bsig = batch.collect()[0]
    assert all(rows[0][f"mh{i}"] == bsig[f"mh{i}"] for i in range(K))


def test_store_probe_empty_and_errors(spark, tmp_path):
    """No parquet files yet -> None (first refresh); a CORRUPT store
    must RAISE when consumed, not masquerade as empty (round-9 advice
    fix).  Since round 12 the store read carries an explicit schema
    (no footer inference), so the raise moved from plan time to
    execution time — and partition pruning means a corrupt file in an
    UNTOUCHED bucket is never read at all (by design: untouched
    buckets cannot affect the batch).  Corrupt files are planted in
    EVERY bucket here so the batch's touched buckets must hit one."""
    empty = str(tmp_path / "nothing")
    batch = _sigs(spark, ["any text at all"]).localCheckpoint(eager=True)
    assert D.lsh_store_probe_read(spark, empty, batch, k=K, bands=BANDS) is None

    for pb in range(D.LSH_STORE_BUCKETS):
        corrupt = tmp_path / "bad" / f"pb={pb}"
        corrupt.mkdir(parents=True)
        (corrupt / "part-0.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        D.lsh_store_probe_read(
            spark, str(tmp_path / "bad"), batch, k=K, bands=BANDS
        ).collect()


def test_incremental_fold_through_store_equals_one_shot(spark, tmp_path):
    """The full refresh loop over the bucketed store must equal the
    one-shot lsh_probe_assign on the union corpus (the batching-
    invariance theorem, now through the pruned store path)."""
    texts = [f"doc {i} body tokens {i % 5} {i % 7} filler" for i in range(30)]
    # duplicate clusters across batch boundaries
    texts += ["doc 3 body tokens 3 3 filler", "doc 12 body tokens 2 5 filler"]
    sigs = _sigs(spark, texts).localCheckpoint(eager=True)
    n = len(texts)

    store = str(tmp_path / "store")
    upd = []
    n_batches = 3
    for r in range(n_batches):
        batch = sigs.filter(F.col("doc_id") % n_batches == r).localCheckpoint(eager=True)
        hist = D.lsh_store_probe_read(spark, store, batch, k=K, bands=BANDS, n_buckets=NB)
        new = batch.withColumn("is_new", F.lit(True))
        all_sigs = (
            new if hist is None
            else hist.withColumn("is_new", F.lit(False)).unionByName(new)
        )
        upd.append(
            D.lsh_probe_assign(
                all_sigs, "is_new", "doc_id", k=K, bands=BANDS, verify_min=12
            ).localCheckpoint(eager=True)
        )
        D.lsh_store_append(batch, store, k=K, bands=BANDS, n_buckets=NB)

    folded = upd[0]
    for u in upd[1:]:
        folded = folded.unionByName(u)
    folded = folded.groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))

    one_shot = D.lsh_probe_assign(
        sigs.withColumn("is_new", F.lit(True)), "is_new", "doc_id",
        k=K, bands=BANDS, verify_min=12,
    )
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
    assert folded.count() > 0, "fixture produced no duplicate assignments"


# ---------------------------------------------------------------------------
# Rebuild-on-maximal: doubled-offset duplicate (round-9 verdict item 7).


@pytest.fixture(scope="module")
def doubled_dup_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dbldup"))
    P = " ".join(f"p{i}" for i in range(20))  # the duplicated passage
    rows = [
        (0, "first document filler alpha beta gamma delta " + P, "en", "a"),
        # The passage appears at TWO offsets in doc 1 — the old rebuild
        # excised the union via DISTINCT positions; the maximal rebuild
        # must union the intervals and excise each region once.
        (1, "intro one two three " + P + " middle six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen " + P + " tail end", "en", "a"),
        (2, "unrelated text with none of the shared material at all "
            "just words words words more words", "en", "b"),
    ]
    rows = [(i, t, lg, s, len(t)) for (i, t, lg, s) in rows]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{root}/documents.parquet")
    return root


def test_rebuild_maximal_doubled_offset(spark, doubled_dup_dir):
    import duckdb

    from tomasz_weight_tracker_spark.plans import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{doubled_dup_dir}/documents.parquet/*.parquet')"
    )

    qm = REGISTRY["dup_passage_rebuild_maximal"]
    got = {r.doc_id: r for r in qm.build(spark, doubled_dup_dir).collect()}
    # Doc 1 loses BOTH copies of the 20-token passage: 2 regions.
    assert set(got) == {1}
    assert got[1].n_regions == 2
    assert got[1].n_dropped >= 40
    assert "p0" not in got[1].kept_text.split()

    # Oracle agreement (the hash gate in miniature).
    orc = {r[0]: r for r in con.execute(qm.oracle).fetchall()}
    assert set(orc) == {1}
    g = got[1]
    assert (g.n_toks, g.n_dropped, g.n_regions, g.kept_text) == tuple(orc[1][1:])

    # And the maximal rebuild's kept_text equals the DISTINCT-position
    # rebuild's: union-then-excise-once == excise-with-dedup.
    old = {
        r.doc_id: r.kept_text
        for r in REGISTRY["dup_passage_rebuild"].build(spark, doubled_dup_dir).collect()
    }
    assert old == {1: g.kept_text}
    con.close()


def test_store_probe_pinned_snapshot(spark, tmp_path):
    """Round-12 replay floor: ``pin_files=True`` makes the probe plan a
    SNAPSHOT of the store as-of-build — later appends must not leak
    into it even when it is evaluated only afterwards (that isolation
    is what lets the replay harnesses defer every batch's output to
    one final job instead of eagerly checkpointing each probe)."""
    store = str(tmp_path / "store")
    twin = "shared alpha beta gamma delta epsilon zeta"
    D.lsh_store_append(
        _sigs(spark, [twin]), store, k=K, bands=BANDS, n_buckets=NB
    )
    batch = _sigs(spark, [twin], start_id=1000).localCheckpoint(eager=True)

    pinned = D.lsh_store_probe_read(
        spark, store, batch, k=K, bands=BANDS, n_buckets=NB, pin_files=True
    )
    # Append a SECOND verbatim twin AFTER the pinned plan is built.
    D.lsh_store_append(
        _sigs(spark, [twin], start_id=500), store, k=K, bands=BANDS, n_buckets=NB
    )
    # Deferred evaluation: the pinned plan still sees only doc 0 ...
    assert [r.doc_id for r in pinned.collect()] == [0]
    # ... while a fresh (unpinned) probe sees both store docs.
    fresh = D.lsh_store_probe_read(
        spark, store, batch, k=K, bands=BANDS, n_buckets=NB
    )
    assert sorted(r.doc_id for r in fresh.collect()) == [0, 500]


def test_store_precomputed_bha_matches_derived(spark, tmp_path):
    """A precomputed ``__bha`` band-hash array column (the replay
    harnesses compute it once on the checkpointed batch) must be
    consumed by append/probe with results identical to the derived
    path, and must never enter the store schema."""
    texts = ["shared alpha beta gamma delta epsilon zeta",
             "another quite different document body here"]
    sigs = _sigs(spark, texts)
    with_bha = sigs.withColumn("__bha", D._band_hash_array(K, BANDS))

    s_plain = str(tmp_path / "plain")
    s_bha = str(tmp_path / "bha")
    D.lsh_store_append(sigs, s_plain, k=K, bands=BANDS, n_buckets=NB)
    D.lsh_store_append(with_bha, s_bha, k=K, bands=BANDS, n_buckets=NB)
    assert "__bha" not in spark.read.parquet(s_bha).columns
    canon = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(p).drop("pb").collect())
    )
    assert canon(s_plain) == canon(s_bha)

    batch = _sigs(spark, [texts[0]], start_id=1000)
    batch_bha = batch.withColumn(
        "__bha", D._band_hash_array(K, BANDS)
    ).localCheckpoint(eager=True)
    got = D.lsh_store_probe_read(
        spark, s_plain, batch_bha, k=K, bands=BANDS, n_buckets=NB
    )
    assert [r.doc_id for r in got.collect()] == [0]
