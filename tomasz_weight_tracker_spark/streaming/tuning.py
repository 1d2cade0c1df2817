"""Streaming-execution tuning helpers."""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession

# spark.sql.shuffle.partitions is SESSION-global: two threads
# save/set/restore-ing it concurrently can strand the session on the
# small value (A saves 32, B saves A's 8, B restores 8 last).  The
# engine's contract allows one session to serve parallel threads
# (tests/test_concurrency.py), so the mutate-drain-restore must be a
# critical section.  Streams drained here are short gate replays;
# serializing them is the cost of not corrupting batch partitioning.
_CONF_LOCK = threading.Lock()


@contextmanager
def state_partitions(spark: SparkSession, n: int = 8):
    """Temporarily size a stream's state-store partitioning.

    A stateful streaming query fixes its number of state-store
    partitions at FIRST start, from ``spark.sql.shuffle.partitions``
    (after that it lives in the checkpoint and cannot change).  The
    session default — one partition per core — is right for big batch
    shuffles, but each streaming state partition costs a store-provider
    load, a maintenance task, and a snapshot/delta file per
    micro-batch, so a small keyed stream pays ~32 provider setups to
    hold a few thousand keys.

    Sizing rule (same arithmetic as batch shuffles, applied to state):
    partitions ~ expected_state_bytes / target_partition_bytes, floored
    at the stream's sustained parallelism.  For the gate-scale replays
    (<=1M keys) single-digit partitions are right; a 100 TB ingest with
    billions of keys wants the core count back — pass ``n``
    accordingly, and note the choice is sticky per checkpoint.

    Restores the previous session value on exit, so surrounding batch
    plans keep their partitioning.  Use ONLY around start()+drain of a
    self-contained stream (availableNow); a stream left running after
    exit keeps the small setting for its lifetime, which is the sticky
    semantics described above.

    Yields a zero-arg ``release_early`` callable: once the stream's
    FIRST micro-batch has committed, the partition count is latched
    into the checkpoint's offset metadata and the session conf is no
    longer consulted — calling it restores the conf and releases the
    lock right then, so one slow drain (awaitTermination can run
    minutes) does not serialize every other thread's streaming work
    behind the critical section (round-4 advice).  Idempotent; the
    exit path calls it as a fallback, so ignoring the yielded value
    keeps the old serialize-everything behavior.
    """
    key = "spark.sql.shuffle.partitions"
    _CONF_LOCK.acquire()
    # Everything after acquire() runs inside the try: if conf.get/set
    # raises (or the generator is discarded before first resume), the
    # finally still releases the lock — otherwise every other thread's
    # streaming work deadlocks permanently (round-5 advice).
    old = None
    released = False

    def release_early() -> None:
        nonlocal released
        if not released:
            released = True
            try:
                if old is not None:
                    spark.conf.set(key, old)
            finally:
                _CONF_LOCK.release()

    try:
        old = spark.conf.get(key)
        spark.conf.set(key, str(n))
        yield release_early
    finally:
        release_early()
