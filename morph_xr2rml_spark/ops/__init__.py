"""LLM-pipeline operators (dedup / similarity / text / events /
multimodal) over the documents, embeddings and events tables.

Storage contract: operators that persist an intermediate frame (both
sides of a bucketed self-join reusing one computation) register it here;
``cleanup()`` releases everything.  One-shot gate/bench runs don't need
it, but a long-lived session composing operators would otherwise
accumulate executor storage — the same contract as
``engine.SparkEngine.cleanup()`` (engine.py:326-334).
"""

from __future__ import annotations

_PERSISTED: list = []
# live-entry cap: long sessions answering many distinct queries would
# otherwise accumulate cached source frames indefinitely (each distinct
# find() filter caches its own filtered copy).  Evicting the OLDEST
# entry is always safe — a later re-execution of its plan just
# recomputes from the source.  cleanup() remains the explicit release.
_MAX_LIVE = 16


def source_table(spark, path: str, spread_reads: bool = False):
    """Session-memoized lazy DataFrame HANDLE for a parquet source —
    the same session-catalog contract as ``examples.tpch_tables``: any
    real deployment registers its tables once, while re-building the
    reader per query pays a parquet-footer read (~0.1 s driver time)
    and, with ``spread_reads``, a partition-count probe on every call.
    Nothing computed is cached — every execution of the returned plan
    scans the parquet files — and the memo dies with the session."""
    cache = getattr(spark, "_mxs_ops_sources", None)
    if cache is None:
        cache = {}
        spark._mxs_ops_sources = cache
    key = (path, spread_reads)
    if key not in cache:
        df = spark.read.parquet(path)
        if spread_reads:
            df = spread(df)
        cache[key] = df
    return cache[key]


def spread(df):
    """Scale-adaptive read-side parallelism fix (guide §2.5, input skew:
    "one huge unsplittable file ... repartition immediately after the
    read"): the local test tables are single-row-group parquet files, so
    a scan yields 1-2 partitions and every compute-heavy downstream op
    (explode, regexp, dot products) serializes on 1-2 cores regardless
    of the executor count.  Round-robin repartition to the cluster's
    default parallelism; a no-op whenever the scan already has enough
    splits (the production/100-TB case).  Results are unchanged: every
    operator using this is an aggregation/join/sorted-output pipeline
    with no partition-layout-dependent semantics."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def track_persist(df, level=None):
    """persist(MEMORY_AND_DISK by default) + register for cleanup().
    Keeps at most _MAX_LIVE tracked entries: beyond that the oldest is
    unpersisted (lazily recomputable — correctness unaffected)."""
    from pyspark import StorageLevel
    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    while len(_PERSISTED) > _MAX_LIVE:
        old = _PERSISTED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass   # session already stopped — nothing to release
    return df


def cleanup() -> int:
    """Unpersist every operator intermediate registered by
    track_persist(); returns how many frames were released."""
    n = 0
    for df in _PERSISTED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass   # session already stopped — nothing to release
    _PERSISTED.clear()
    return n
