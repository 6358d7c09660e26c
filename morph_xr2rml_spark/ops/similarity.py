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

from . import spread, track_persist
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOPK = 5
N_QUERIES = 20          # vec_id < N_QUERIES are the query vectors
LSH_PLANES = 8
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: single-row-group local files cap the scan at 1-2
    # partitions (guide §2.5); no-op when splits are plentiful
    from . import source_table
    return source_table(spark, f"{sf_dir}/embeddings.parquet",
                        spread_reads=True)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K cosine neighbors for each query vector (vec_id < N_QUERIES),
    excluding self.  Output: (query_id, rank, neighbor_id).

    Optimized shape (same numbers, same ranking):
      - the two vector NORMS are hoisted out of the per-pair expression
        and computed once per query row / once per candidate row before
        the join (they were re-evaluated for every pair — N_QUERIES×
        more norm work than needed);
      - the candidate side is repartitioned to the cluster parallelism
        first: the embeddings file is a few MB → 1-2 input splits, so
        the interpreted higher-order dot products otherwise run on 1-2
        cores (guide §2.5, input skew: repartition after the read).
    Float parity: _dot/_norm fold exactly as before; the norms are the
    same expressions evaluated on the same rows, so every cos is
    bit-identical and the (cos DESC, neighbor_id) ranking is unchanged."""
    emb = _emb(spark, sf_dir)
    qv = F.col("embedding").cast("array<double>")
    q = emb.where(F.col("vec_id") < N_QUERIES) \
           .select(F.col("vec_id").alias("query_id"),
                   qv.alias("qv"), _norm(qv).alias("_qn"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   qv.alias("cv"), _norm(qv).alias("_cn"))
    # broadcast the tiny query side; candidates stream through
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))
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
    # persisted: the query side and candidate side both derive from sig —
    # without it the 8-plane signature dot products run twice
    sig = emb.select("vec_id", F.col("embedding"),
                     lsh_signature_col(F.col("embedding")).alias("bucket")) \
             .transform(track_persist)
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


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (dedup by embedding similarity)
#
# Exactness design: floats never cross the comparison. Vectors are
# quantized per component to BIGINT (floor(x * QUANT) — floor of an IEEE
# double product is bit-identical across engines), and the threshold test
# cos(a,b) >= NUM/DEN is evaluated cross-multiplied in integers:
#     dot > 0  AND  dot² · DEN² >= NUM² · |a|²·|b|²
# With |x| <= ~0.6, DIM=64, QUANT=1000: dot <= ~2e7, dot² <= ~4e14,
# ×DEN²=400 <= ~2e17 — comfortably inside BIGINT (and HUGEINT in DuckDB).
# ---------------------------------------------------------------------------

COS_QUANT = 1000
COS_NUM = 7      # gate threshold 7/20 = 0.35 — the synthetic embeddings
COS_DEN = 20     # are random (max pairwise cos ≈ 0.51): 0.95 would always
                 # return zero rows, proving nothing


def _qvec(col):
    """Quantize a float vector to BIGINT components (portable)."""
    return F.transform(col.cast("array<double>"),
                       lambda x: F.floor(x * COS_QUANT))


def _idot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str,
                           num: int = COS_NUM, den: int = COS_DEN) -> DataFrame:
    """Near-dup pairs with quantized cosine ≥ num/den, LSH-bucketed so
    candidates only join within a bucket (the 100-TB path: no all-pairs).
    Integer cross-multiplied comparison — exact DuckDB oracle."""
    emb = _emb(spark, sf_dir)
    sig = emb.select("vec_id", _qvec(F.col("embedding")).alias("qv"),
                     lsh_signature_col(F.col("embedding")).alias("bucket"))
    # squared norm computed once per vector, before the self-join;
    # persisted so both self-join sides reuse one signature computation
    sig = sig.withColumn("n2", _idot(F.col("qv"), F.col("qv"))) \
             .transform(track_persist)
    a = sig.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"),
                   F.col("n2").alias("na2"), "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"),
                   F.col("n2").alias("nb2"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    dot = _idot(F.col("qa"), F.col("qb"))
    keep = (dot > 0) & (dot * dot * (den * den) >=
                        F.col("na2") * F.col("nb2") * (num * num))
    return (pairs.where(keep)
                 .select("vec_a", "vec_b")
                 .distinct()
                 .orderBy("vec_a", "vec_b"))


def _dedup_embedding_cosine_sql(num: int = COS_NUM, den: int = COS_DEN) -> str:
    buckets_core = _ann_bucket_sql().split("ORDER BY")[0]
    return f"""
WITH buckets AS ({buckets_core}),
qvecs AS (
  SELECT e.vec_id, b.bucket,
         list_transform(CAST(e.embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {COS_QUANT}) AS BIGINT)) AS qv
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id),
normed AS (
  SELECT vec_id, bucket, qv,
         list_sum(list_transform(qv, x -> x * x)) AS n2
  FROM qvecs),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.n2 AS na2, b.n2 AS nb2,
         list_sum(list_transform(list_zip(a.qv, b.qv),
                                 x -> x[1] * x[2])) AS dot
  FROM normed a
  JOIN normed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT DISTINCT vec_a, vec_b
FROM pairs
WHERE dot > 0 AND dot * dot * {den * den} >= na2 * nb2 * {num * num}
ORDER BY vec_a, vec_b
"""


DEDUP_EMBEDDING_COSINE_SQL = _dedup_embedding_cosine_sql()


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
