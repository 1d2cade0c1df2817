"""Round-12 additions: trained-quantizer bitext mining and the
IVF-vs-brute pair recall audit.

The catalog queries are hash-checked against DuckDB by tools/parity.py
/ the driver gate; these tests pin the PLAN SHAPE of the trained miner
(no corpus cartesian — training must not reintroduce one) and the
audit's arithmetic invariants on the real testdata.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.plans.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_registry_has_round12_entries():
    for name in (
        "bitext_mine_margin_ivf_trained",
        "bitext_recall_audit",
        "weight_txt_parse_fileslice",
    ):
        q = REGISTRY[name]
        assert q.oracle is not None
        assert q.build.__name__ == f"q_{name}"


class TestTrainedMinerPlanShape:
    def test_no_corpus_cartesian(self, spark):
        """Same invariant as the untrained twin (round 11): no
        CartesianProduct; the candidate cut is an equi-join on
        centroid_id; every unkeyed join builds on a bounded
        (IdentityBroadcastMode) centroid exchange.  ivf_train's Lloyd
        rounds run eagerly (localCheckpoint) before this plan, so the
        mining plan itself is what we inspect."""
        df = REGISTRY["bitext_mine_margin_ivf_trained"].build(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert re.search(
            r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[centroid_id",
            plan,
        ), "candidate generation must equi-join on centroid_id"
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_ident = plan.count("IdentityBroadcastMode")
        assert n_bnlj <= n_ident, (
            f"{n_bnlj} nested-loop joins but only {n_ident} bounded "
            "broadcast builds — a corpus-sized unkeyed join crept in"
        )
        from tomasz_weight_tracker_spark.caching import release_caches

        release_caches()

    def test_no_forced_corpus_broadcast(self, spark):
        """ADVICE r11: the kx/ky top-k sum relations are O(corpus) and
        must not carry a broadcast HINT.  The candidate stage's bounded
        centroid broadcasts live inside the cached pair subtree, so the
        OPTIMIZED plan of the margin tail must print zero join hints —
        a forced broadcast on kx/ky renders as 'rightHint=(strategy=
        broadcast)' (verified: F.broadcast on a join side produces
        exactly that marker)."""
        from tomasz_weight_tracker_spark.caching import release_caches
        from tomasz_weight_tracker_spark.plans.round11 import mine_bitext_ivf

        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        df = mine_bitext_ivf(e, n_cent=8, nprobe=2, k=4)
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "hint" not in optimized.lower(), (
            "forced broadcast hint on a margin-tail join — kx/ky are "
            "O(corpus)-sized and must shuffle on their keys"
        )
        release_caches()


class TestTrainedMinerSemantics:
    def test_centroids_param_matches_default(self, spark):
        """mine_bitext_ivf(centroids=first-8) must equal the default
        first-8 path bit-for-bit — the centroids parameter only swaps
        the quantizer, never the mining semantics."""
        from tomasz_weight_tracker_spark.caching import release_caches
        from tomasz_weight_tracker_spark.plans.round11 import mine_bitext_ivf

        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        cents = e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        default = sorted(
            mine_bitext_ivf(e, n_cent=8, nprobe=2, k=4).collect(),
            key=lambda r: (r.src_id, r.tgt_id),
        )
        explicit = sorted(
            mine_bitext_ivf(e, n_cent=8, nprobe=2, k=4, centroids=cents).collect(),
            key=lambda r: (r.src_id, r.tgt_id),
        )
        assert default == explicit
        release_caches()


class TestJpeg420:
    """4:2:0 chroma subsampling — the dominant real-crawl JPEG shape.
    The r11 verdict listed it as undecoded; the decoder's sampling-
    factor MCU walk + nearest-neighbor upsample in fact handle it, and
    these tests pin that (make_jpeg grew a 4:2:0 encoder so the
    round trip is self-contained)."""

    def test_block_constant_bit_exact(self):
        from tomasz_weight_tracker_spark.operators import codecs as C

        # constant 16x16 tiles: chroma subsampling is lossless, so the
        # 4:2:0 decode must be BIT-IDENTICAL to the 4:4:4 decode
        fn = lambda x, y: (  # noqa: E731
            ((x // 16) * 40 + 20) % 256,
            ((y // 16) * 60 + 30) % 256,
            ((x // 16 + y // 16) * 50 + 10) % 256,
        )
        d420 = C.parse_jpeg(C.make_jpeg(32, 32, fn, gray=False, subsample_420=True))
        d444 = C.parse_jpeg(C.make_jpeg(32, 32, fn, gray=False))
        assert d420["pixels"] is not None
        assert d420["pixels"] == d444["pixels"]

    def test_gradient_and_odd_dims(self):
        from tomasz_weight_tracker_spark.operators import codecs as C

        fn = lambda x, y: ((x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256)  # noqa: E731
        # odd (non-16-multiple) dims exercise edge replication + crop
        d420 = C.parse_jpeg(C.make_jpeg(24, 18, fn, gray=False, subsample_420=True))
        d444 = C.parse_jpeg(C.make_jpeg(24, 18, fn, gray=False))
        assert len(d420["pixels"]) == 24 * 18
        # chroma loss is bounded: luma is full-resolution, so channel
        # deltas vs the 4:4:4 decode stay small on smooth gradients
        md = max(
            max(abs(a - b) for a, b in zip(p, q))
            for p, q in zip(d420["pixels"], d444["pixels"])
        )
        assert md <= 24

    def test_420_with_restart_markers(self):
        from tomasz_weight_tracker_spark.operators import codecs as C

        fn = lambda x, y: (((x // 16) * 40) % 256, 90, ((y // 16) * 50) % 256)  # noqa: E731
        plain = C.parse_jpeg(C.make_jpeg(48, 16, fn, gray=False, subsample_420=True))
        rst = C.parse_jpeg(
            C.make_jpeg(48, 16, fn, gray=False, subsample_420=True, restart_interval=1)
        )
        assert rst["pixels"] == plain["pixels"] and rst["pixels"] is not None


class TestRecallAudit:
    def test_audit_invariants(self, spark):
        """Count consistency: hits bound by both pair sets, ppm is the
        exact integer division, and the sampled universe is bounded by
        _BAUD_N."""
        from tomasz_weight_tracker_spark.caching import release_caches
        from tomasz_weight_tracker_spark.plans.round12 import _BAUD_N

        row = REGISTRY["bitext_recall_audit"].build(spark, SF).collect()[0]
        assert row.n_vecs <= _BAUD_N
        assert 0 <= row.n_hit_ivf <= min(row.n_ivf, row.n_brute)
        assert 0 <= row.n_hit_trained <= min(row.n_ivf_trained, row.n_brute)
        if row.n_brute > 0:
            assert row.recall_ivf_ppm == row.n_hit_ivf * 1000000 // row.n_brute
            assert (
                row.recall_trained_ppm == row.n_hit_trained * 1000000 // row.n_brute
            )
        release_caches()


class TestTuneForScale:
    """Partitions-follow-data (session.tune_for_scale): the local
    mirror of shuffle_partitions_for — small corpora must not pay a
    32-empty-reduce-task scheduler floor per exchange, big local
    corpora must keep the machine wide."""

    def test_proportionality_and_bounds(self, tmp_path):
        from tomasz_weight_tracker_spark.session import (
            _DEFAULT_CPUS,
            data_bytes,
        )

        rule = lambda b: max(8, min(4 * _DEFAULT_CPUS, (b >> 19) + 1))  # noqa: E731
        assert rule(0) == 8                      # empty -> floor
        assert rule(2 << 20) == 8                # sf0.01-ish -> floor
        assert rule(17 << 20) == 35              # sf0.1-ish -> ~cores
        assert rule(10 << 30) == 4 * _DEFAULT_CPUS  # sf1+ -> cap

        d = tmp_path / "corpus"
        d.mkdir()
        (d / "t.parquet").write_bytes(b"x" * 1024)
        (d / "sub").mkdir()
        (d / "sub" / "u.parquet").write_bytes(b"y" * 2048)
        (d / "notes.txt").write_bytes(b"z" * 4096)  # non-parquet ignored
        assert data_bytes(str(d)) == 3072

    def test_sets_session_conf(self, spark, tmp_path):
        from tomasz_weight_tracker_spark.session import tune_for_scale

        before = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            n = tune_for_scale(spark, str(tmp_path))
            assert n == 8  # empty dir -> floor
            assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", before)
