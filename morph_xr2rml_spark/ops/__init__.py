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


def track_persist(df, level=None):
    """persist(MEMORY_AND_DISK by default) + register for cleanup()."""
    from pyspark import StorageLevel
    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
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
