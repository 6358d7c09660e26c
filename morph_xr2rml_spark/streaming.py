"""Structured-Streaming materialization.

The reference is strictly batch (MorphRunner.scala one-shot, SURVEY §2.h);
this module is the Spark-native extension: the same compiled translation
stage runs on a streaming DataFrame (mapInPandas is stateless, so it
applies unchanged per micro-batch), with:

  - stream-static referencing-object-map joins (parent side read as a
    static table — supported Spark join shape); stream-stream ROM joins
    are rejected with a clear error;
  - optional deduplication within a watermark
    (``dropDuplicatesWithinWatermark``) — exact global dedup on an
    unbounded stream is unbounded state, so the batch compactor stays the
    source of truth for set semantics;
  - windowed triple-rate metrics for monitoring.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

import warnings

from .engine import CHILD_SCHEMA, _make_child_fn
from .model import MappingDocument, TriplesMap, parse_mongo_query
from .sources import mongo_filter_to_column
from .translate import EngineConfig


def stream_triples(mapping: MappingDocument, stream_df: DataFrame,
                   cfg: Optional[EngineConfig] = None,
                   content_col: str = "content",
                   event_time_col: Optional[str] = None,
                   watermark: Optional[str] = None,
                   dedup: bool = False) -> DataFrame:
    """Compile the mapping against a STREAMING document DataFrame.
    Returns a streaming (subj, pred, obj, graph[, event_time]) DataFrame
    ready for writeStream.  Triples maps with refobjectmaps are rejected
    (stream-side joins need the parent as a static table — use
    ``stream_triples_with_static_parents``)."""
    cfg = cfg or EngineConfig()
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame")
    for tm in mapping.triples_maps.values():
        if any(pom.ref_object_maps for pom in tm.predicate_object_maps):
            raise ValueError(
                f"triples map {tm.name}: refobjectmaps in pure streaming "
                "mode are unsupported; parent sides must be static tables")

    # _seq orders RDF-list members in ROM joins; pure streaming rejects
    # ROMs above, and monotonically_increasing_id is illegal on streams —
    # a constant is sufficient here
    src = stream_df.select(
        F.col(content_col).alias("content"),
        (F.col(event_time_col) if event_time_col else F.current_timestamp())
        .alias("_etime"),
        F.lit(0).cast("long").alias("_seq"))

    # batch-parity filtering: each TM's find({...}) filter applies to the
    # stream exactly as it would to the batch source — natively (pushed
    # into the micro-batch scan) when compilable, else inside the
    # translation stage.  One stream carries ONE collection; mappings
    # addressing several distinct collections are ambiguous here.
    colls: set[str] = set()
    parts = []
    for tm in mapping.triples_maps.values():
        tm_src = src.select("content", "_seq")
        py_filter = None
        ls = tm.logical_source
        if ls.kind == "query" and ls.value.lstrip().startswith("db."):
            coll, filter_text = parse_mongo_query(ls.value)
            colls.add(coll)
            native_cond = mongo_filter_to_column(filter_text, "content")
            if native_cond is not None:
                tm_src = tm_src.where(native_cond)
            else:
                py_filter = filter_text
        out = (tm_src
                  .mapInPandas(_make_child_fn(tm, cfg, 0, py_filter),
                               CHILD_SCHEMA)
                  .where(F.col("kind") == 0)
                  .select("subj", "pred", "obj", "graph"))
        parts.append(out)
    if len(colls) > 1:
        warnings.warn(
            f"stream_triples: mapping addresses {len(colls)} distinct "
            f"collections {sorted(colls)} but a single stream is bound — "
            "every triples map reads the same stream; split the mapping "
            "or the stream if that is not intended", stacklevel=2)
    triples = parts[0]
    for p in parts[1:]:
        triples = triples.unionByName(p)

    if watermark:
        # re-attach processing/event time for watermarking the output
        triples = triples.withColumn("event_time", F.current_timestamp()) \
                         .withWatermark("event_time", watermark)
        if dedup:
            triples = triples.dropDuplicatesWithinWatermark(
                ["subj", "pred", "obj", "graph"])
    return triples


def stream_sessionize(events: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Custom STATEFUL streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` — the batch ``ops.events.events_sessionize``
    semantics on an unbounded stream.  Per-user state carries the open
    session (start, last-seen, count); a micro-batch closes every session
    whose gap to the newest event exceeds the threshold and emits it;
    the still-open session stays in state.  State is bounded by one open
    session per user.

    Input: streaming DataFrame with (user_col, ts_col).  Output stream:
    (user_id, session_start, session_end, n_events) — closed sessions
    only (the open tail flushes when a later event or timeout closes it).
    """
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    gap_s = gap_minutes * 60
    # derive the key column's type from the input — string/int user ids
    # both work (a hardcoded 'long' breaks at Arrow schema check time)
    user_type = events.schema[user_col].dataType.simpleString()
    out_schema = (f"user_id {user_type}, session_start timestamp, "
                  "session_end timestamp, n_events long")
    state_schema = "start long, last long, n long"   # epoch seconds

    def fn(key, pdfs, state: GroupState):
        import pandas as pd
        (user,) = key
        if state.hasTimedOut:
            # no events for > gap: close and emit the open session
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user],
                                "session_start": [pd.Timestamp(start, unit="s")],
                                "session_end": [pd.Timestamp(last, unit="s")],
                                "n_events": [n]})
            return
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.timestamp()) for t in pdf[ts_col])
        ts_all.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_all:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                # cross-micro-batch disorder: an event older than the
                # saved high-water mark must not move `last` backwards
                # (that could split one session in two later)
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_s * 1000)
        if closed:
            import pandas as pd
            yield pd.DataFrame({
                "user_id": [user] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s")
                                  for s, _l, _n in closed],
                "session_end": [pd.Timestamp(l, unit="s")
                                for _s, l, _n in closed],
                "n_events": [n_ for _s, _l, n_ in closed]})

    return (events.groupBy(F.col(user_col))
                  .applyInPandasWithState(
                      fn, out_schema, state_schema, "append",
                      GroupStateTimeout.ProcessingTimeTimeout))


def triple_rate_metrics(triples_stream: DataFrame,
                        window: str = "1 minute") -> DataFrame:
    """Windowed triples/predicate counts — the monitoring aggregation
    (watermark + window; late data folded per watermark semantics)."""
    withtime = triples_stream if "event_time" in triples_stream.columns \
        else triples_stream.withColumn("event_time", F.current_timestamp())
    return (withtime
            .withWatermark("event_time", window)
            .groupBy(F.window("event_time", window), F.col("pred"))
            .agg(F.count(F.lit(1)).alias("triples")))
