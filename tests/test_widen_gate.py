"""Plan-shape tests pinning the load() widen gate (round-12 verdict
item 2): the single-row-group round-robin widen must fire at the bench
SF (where the r12 driver measured its 1.9-4.1x wins), must NOT fire
below the bytes floor (sf0.001 — where the committed r12 _after dumps
were generated, hence showed no RoundRobin exchange), and must NOT
fire on a many-file input (the production layout, where the scan
already splits).
"""

from __future__ import annotations

from tomasz_weight_tracker_spark.plans import REGISTRY
from tomasz_weight_tracker_spark.plans.catalog import load

SF_SMALL = "/root/testdata/sf0.001"  # 64 KiB documents: below _WIDEN_MIN_BYTES
SF_BENCH = "/root/testdata/sf0.1"  # 584 KiB documents: gate on (1 split)


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _roundrobin(plan: str) -> bool:
    # Formatted mode renders the partitioning in the Exchange node's
    # Arguments detail line, not in the tree line.
    return "RoundRobinPartitioning" in plan


class TestWidenGate:
    def test_gate_on_at_bench_sf(self, spark):
        plan = _formatted(load(spark, SF_BENCH, "documents"))
        assert _roundrobin(plan), plan[:1500]

    def test_gate_off_below_bytes_floor(self, spark):
        plan = _formatted(load(spark, SF_SMALL, "documents"))
        assert not _roundrobin(plan), plan[:1500]

    def test_gate_off_on_many_file_input(self, spark, tmp_path):
        # A multi-file documents table has nparts > cores/4 at local[4]:
        # the scan already parallelizes, so the widen must be a no-op.
        path = str(tmp_path / "documents.parquet")
        load(spark, SF_BENCH, "documents", widen=False).repartition(4).write.parquet(
            path
        )
        plan = _formatted(load(spark, str(tmp_path), "documents"))
        assert not _roundrobin(plan), plan[:1500]

    def test_widened_headline_query_at_bench_sf(self, spark):
        # minhash_signature is one of the 11 queries the r12 driver
        # measured the widen on (2.0x): the exchange must be in its
        # plan at the bench SF and absent below the floor.
        on = _formatted(REGISTRY["minhash_signature"].build(spark, SF_BENCH))
        off = _formatted(REGISTRY["minhash_signature"].build(spark, SF_SMALL))
        assert _roundrobin(on), on[:1500]
        assert not _roundrobin(off), off[:1500]

    def test_optout_query_never_widens(self, spark):
        # exact_dedup opts out at its load site (measured x0.51 WITH
        # widen): no round-robin exchange even at the bench SF.
        plan = _formatted(REGISTRY["exact_dedup"].build(spark, SF_BENCH))
        assert not _roundrobin(plan), plan[:1500]
