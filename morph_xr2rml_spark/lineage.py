"""Lineage & integrity: per-row content digests and per-partition metrics.

BASELINE.json input_hint requires a per-row invariant — sha256(content)
equality between what the pipeline read and the source of record — and
the north rule requires per-partition lineage + metrics.  Both are
computed natively (sha2/spark_partition_id; no Python per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_content_digest(df: DataFrame, content_col: str = "content",
                        out_col: str = "_sha256") -> DataFrame:
    return df.withColumn(out_col, F.sha2(F.col(content_col), 256))


def integrity_violations(df: DataFrame, content_col: str = "content",
                         digest_col: str = "commit",
                         algo: str = "sha1") -> DataFrame:
    """Rows whose recorded digest doesn't match the content actually read.
    Empty result = the per-row invariant holds for every row consumed."""
    if algo == "sha1":
        actual = F.sha1(F.col(content_col))
    elif algo == "sha256":
        actual = F.sha2(F.col(content_col), 256)
    elif algo == "md5":
        actual = F.md5(F.col(content_col))
    else:
        raise ValueError(f"unsupported digest algo {algo!r}")
    return df.where(actual != F.col(digest_col))


def partition_metrics(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-input-partition lineage metrics: row count, byte volume,
    content-digest XOR-fold (order-independent partition fingerprint)."""
    digest32 = F.conv(F.substring(F.sha2(F.col(content_col), 256), 1, 15),
                      16, 10).cast("bigint")
    return (df.withColumn("_pid", F.spark_partition_id())
              .groupBy("_pid")
              .agg(F.count(F.lit(1)).alias("rows"),
                   F.sum(F.length(F.col(content_col))).alias("bytes"),
                   F.bit_xor(digest32).alias("digest_fold"))
              .orderBy("_pid"))
