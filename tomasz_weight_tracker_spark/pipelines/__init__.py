"""End-to-end pipelines mirroring the reference's four workloads (W1-W4)."""
