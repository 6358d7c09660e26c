"""Similarity search over the ``embeddings`` table (array<float> column).

- ``sim_cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Dot products via ``aggregate``/``zip_with`` (JVM-side higher-order
  functions; no Python in the loop).
- ``sim_ann_lsh``: random-hyperplane LSH variant — the scale path: vectors
  are bucketed by a deterministic sign signature, candidates only join
  within a bucket.  At 100 TB the brute-force quadratic join is
  impossible; LSH keeps the candidate set near-linear.

Output columns are ids + rank (no float columns) so the DuckDB oracle
hash-matches despite engine-level floating-point differences.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOPK = 5
N_QUERIES = 20          # vec_id < N_QUERIES are the query vectors
LSH_PLANES = 8
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K cosine neighbors for each query vector (vec_id < N_QUERIES),
    excluding self.  Output: (query_id, rank, neighbor_id)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES) \
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("cv"))
    # broadcast the tiny query side; candidates stream through
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id"))
    qv = F.col("qv").cast("array<double>")
    cv = F.col("cv").cast("array<double>")
    cos = _dot(qv, cv) / (_norm(qv) * _norm(cv))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= TOPK)
                  .select("query_id", "rank", "neighbor_id")
                  .orderBy("query_id", "rank"))


SIM_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
         (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))) *
          sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos
  FROM embeddings e, q
  WHERE e.vec_id != q.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN
# ---------------------------------------------------------------------------

def _plane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j: component d derived from
    md5(j,d) → uniform in [-0.5, 0.5).  Engine-portable (pure data)."""
    out = []
    for d in range(DIM):
        h = hashlib.md5(f"plane-{j}-{d}".encode()).hexdigest()
        out.append(int(h[:8], 16) / 2 ** 32 - 0.5)
    return out


def lsh_signature_col(vec_col):
    """Sign-bit signature over LSH_PLANES fixed hyperplanes → int."""
    sig = F.lit(0)
    v = vec_col.cast("array<double>")
    for j in range(LSH_PLANES):
        plane = F.array(*[F.lit(x) for x in _plane(j)])
        bit = F.when(_dot(v, plane) >= 0, 2 ** j).otherwise(0)
        sig = sig + bit
    return sig


def sim_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, bucket): the LSH bucketing itself — deterministic, so it
    has an exact SQL oracle; ANN = per-bucket brute force downstream."""
    emb = _emb(spark, sf_dir)
    return (emb.select("vec_id", lsh_signature_col(F.col("embedding"))
                       .alias("bucket"))
               .orderBy("vec_id"))


def _ann_bucket_sql() -> str:
    terms = []
    for j in range(LSH_PLANES):
        plane = "[" + ", ".join(repr(x) for x in _plane(j)) + "]"
        terms.append(
            f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {plane}) >= 0 "
            f"THEN {2 ** j} ELSE 0 END")
    sig = " + ".join(terms)
    return f"""
SELECT vec_id, {sig} AS bucket
FROM embeddings
ORDER BY vec_id
"""


SIM_ANN_LSH_BUCKETS_SQL = _ann_bucket_sql()


def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-K: brute force restricted to same-bucket candidates.
    The scale path — bucket join instead of full cross join."""
    emb = _emb(spark, sf_dir)
    sig = emb.select("vec_id", F.col("embedding"),
                     lsh_signature_col(F.col("embedding")).alias("bucket"))
    q = sig.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        F.col("bucket"))
    c = sig.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("cv"), F.col("bucket"))
    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col("neighbor_id") != F.col("query_id"))
    qv = F.col("qv").cast("array<double>")
    cv = F.col("cv").cast("array<double>")
    cos = _dot(qv, cv) / (_norm(qv) * _norm(cv))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= TOPK)
                  .select("query_id", "rank", "neighbor_id")
                  .orderBy("query_id", "rank"))


# embedding-cosine near-duplicate pairs (dedup by embedding similarity)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str,
                           threshold_pm: int = 950) -> DataFrame:
    """Near-dup pairs with cosine ≥ threshold_pm/1000, LSH-bucketed.
    Integer threshold on floor(cos*1000) keeps the comparison portable."""
    emb = _emb(spark, sf_dir)
    sig = emb.select("vec_id", "embedding",
                     lsh_signature_col(F.col("embedding")).alias("bucket"))
    a = sig.select(F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("va"), "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (pairs.select("vec_a", "vec_b",
                         F.floor(cos * 1000).alias("cos_pm"))
                 .where(F.col("cos_pm") >= threshold_pm)
                 .orderBy("vec_a", "vec_b"))


def _ann_lsh_topk_sql() -> str:
    """Bucketed ANN top-k as SQL: same plane literals, same rank rule."""
    buckets_core = _ann_bucket_sql().split("ORDER BY")[0]
    return f"""
WITH buckets AS ({buckets_core}),
q AS (SELECT b.vec_id AS query_id, e.embedding AS qv, b.bucket
      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
      WHERE b.vec_id < {N_QUERIES}),
c AS (SELECT b.vec_id AS neighbor_id, e.embedding AS cv, b.bucket
      FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.cv AS DOUBLE[])) /
         (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))) *
          sqrt(list_dot_product(CAST(c.cv AS DOUBLE[]), CAST(c.cv AS DOUBLE[])))) AS cos
  FROM q JOIN c ON q.bucket = c.bucket
  WHERE c.neighbor_id != q.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""


SIM_ANN_LSH_TOPK_SQL = _ann_lsh_topk_sql()
