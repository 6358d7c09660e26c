"""Event-stream batch analytics over the ``events`` table: time-bucketed
rollups and gap-based sessionization.

The reference has no windowing at all (SURVEY §2.f "absent entirely");
these are the Spark-native operators a training-data/event pipeline needs.

Output canonicalization: every emitted cell is a STRING or BIGINT —
timestamps are formatted ('yyyy-MM-dd HH:mm:ss[.ffffff]') and money-ish
doubles are quantized to BIGINT micros per row BEFORE aggregation, so the
value-hash compare against the DuckDB oracle is representation-exact
(native timestamp/decimal rendering differs between engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import source_table
    return source_table(spark, f"{sf_dir}/events.parquet")


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup per event type: count, exact integer-micro sum/min/max.
    `value` is quantized to BIGINT micros per row (exact in both engines:
    |value|*1e6 << 2^53, and the BIGINT sum is order-independent)."""
    e = _events(spark, sf_dir)
    micros = F.round(F.col("value") * 1000000).cast("long")
    return (e.groupBy(F.date_format(F.date_trunc("hour", F.col("ts")),
                                    "yyyy-MM-dd HH:mm:ss").alias("hour"),
                      F.col("event_type"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(micros).alias("total_value_micros"),
                  F.min(micros).alias("min_value_micros"),
                  F.max(micros).alias("max_value_micros"))
             .orderBy("hour", "event_type"))


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
           AS total_value_micros,
       min(CAST(round(value * 1000000) AS BIGINT)) AS min_value_micros,
       max(CAST(round(value * 1000000) AS BIGINT)) AS max_value_micros
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user: a gap > SESSION_GAP_MIN minutes
    starts a new session.  Classic lag + running-sum window composition;
    partitioned by user so the shuffle key is the session key."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = SESSION_GAP_MIN * 60
    new_sess = F.when(
        (F.unix_timestamp("ts") -
         F.unix_timestamp(F.lag("ts").over(w))) > gap_s, 1) \
        .otherwise(0)
    with_sess = (e.withColumn("_new", F.coalesce(new_sess, F.lit(0)))
                  .withColumn("session_idx",
                              F.sum("_new").over(
                                  w.rowsBetween(Window.unboundedPreceding, 0))))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (with_sess.groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min("ts"), fmt).alias("session_start"),
                 F.date_format(F.max("ts"), fmt).alias("session_end"))
            .orderBy("user_id", "session_idx"))


EVENTS_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
         CAST(sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_idx
  FROM flagged)
SELECT user_id, session_idx,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
FROM sess
GROUP BY 1, 2
ORDER BY user_id, session_idx
"""
