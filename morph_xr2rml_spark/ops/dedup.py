"""Deduplication operators over the ``documents`` table.

Scale design notes (the point is 100 TB, not 5k rows):
  - exact dedup: one hash-groupBy — map-side partial agg, single shuffle
    on the digest;
  - n-gram Jaccard: word-shingle inverted index + self-join; hot shingles
    (stopword runs) are capped (df > MAX_DF dropped) — the standard
    guard that keeps the candidate-pair blow-up linear-ish;
  - MinHash/LSH: shingle→32-bit md5-derived hash→K permutations→band
    buckets→bucket self-join; only pairs sharing a band are compared;
  - SimHash: 64-bit signature via per-bit majority over token hashes —
    one explode + groupBy, output is one BIGINT per doc;
  - embedding near-dup: cosine over float vectors (see similarity.py).

Everything is built-in Spark SQL functions (codegen) and every operator
has an exact DuckDB oracle (md5-derived hashing is engine-portable).
"""

from __future__ import annotations

from . import track_persist
from pyspark.sql import DataFrame, SparkSession, functions as F

MAX_DF = 100          # drop shingles appearing in more docs than this
JACCARD_NUM = 4       # threshold 4/5 = 0.8, integer cross-multiplied
JACCARD_DEN = 5
MINHASH_PERMS = 16    # K
MINHASH_BANDS = 4     # bands of K/BANDS rows
MERSENNE = 2147483647  # 2^31-1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import source_table
    return source_table(spark, f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy on md5(text): cluster id, size, canonical keeper."""
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5(F.col("text")).alias("content_hash"))
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.min("doc_id").alias("keep_doc_id"))
              .orderBy("content_hash"))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       count(*) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
ORDER BY content_hash
"""


# ---------------------------------------------------------------------------
# Word-shingles (shared by jaccard / minhash)
# ---------------------------------------------------------------------------

def _shingles(d: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh): distinct word n-gram shingles per document.

    Rendered as one SQL expression string: the Column-DSL build of the
    same tree costs hundreds of py4j round-trips per query build
    (driver-side overhead, guide §7.3); the string parses in one call
    with identical semantics."""
    toks = r"split(trim(lower(text)), '\\s+')"
    grams = (f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
             f"i -> concat_ws(' ', slice({toks}, i, {n})))")
    return d.selectExpr(
        "doc_id", f"explode(array_distinct({grams})) AS sh")


_SHINGLES_SQL = """
  SELECT DISTINCT doc_id,
         array_to_string(toks[i.i : i.i + 2], ' ') AS sh
  FROM (SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents) t,
       LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i) i
"""


def _rare_shingles(sh: DataFrame) -> DataFrame:
    """Drop hot shingles (document frequency > MAX_DF): the skew guard."""
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (sh.join(df_counts.where(F.col("df") <= MAX_DF).select("sh"), "sh"))


_RARE_SHINGLES_SQL = f"""
  SELECT s.doc_id, s.sh
  FROM shingles s
  JOIN (SELECT sh FROM shingles GROUP BY sh HAVING count(*) <= {MAX_DF}) r
    ON s.sh = r.sh
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard ≥ 0.8 (integer
    cross-multiplied, no float compares).  Inverted-index self-join with
    the hot-shingle cap."""
    d = _docs(spark, sf_dir)
    sh = _rare_shingles(_shingles(d))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh")) &
                       (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (inter.join(sa, "doc_a").join(sb, "doc_b")
                .where(F.col("n_inter") * JACCARD_DEN >=
                       (F.col("n_a") + F.col("n_b") - F.col("n_inter")) * JACCARD_NUM)
                .select("doc_a", "doc_b", "n_inter", "n_a", "n_b")
                .orderBy("doc_a", "doc_b"))
    return out


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH shingles AS ({_SHINGLES_SQL}),
rare AS ({_RARE_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, i.n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.n_inter * {JACCARD_DEN} >= (sa.n_sh + sb.n_sh - i.n_inter) * {JACCARD_NUM}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH band buckets
# ---------------------------------------------------------------------------

def _perm_params(j: int) -> tuple[int, int]:
    """Deterministic permutation coefficients (fixed, engine-portable)."""
    a = 2 * j + 1          # odd multiplier
    b = 104729 * (j + 1)   # 10000th prime spacing
    return a, b


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered (doc_id, sig_0..sig_{K-1}) — the composable core."""
    d = _docs(spark, sf_dir)
    sh = _shingles(d).selectExpr(
        "doc_id",
        "cast(conv(substring(md5(sh), 1, 8), 16, 10) AS bigint) AS h")
    aggs = []
    for j in range(MINHASH_PERMS):
        a, b = _perm_params(j)
        aggs.append(F.expr(
            f"min((h * {a} + {b}) % {MERSENNE}) AS sig_{j}"))
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig_0..sig_{K-1}): min over shingles of (a_j*h+b_j) mod p."""
    return _minhash_sigs(spark, sf_dir).orderBy("doc_id")


def _minhash_sql_core() -> str:
    sig_exprs = ",\n       ".join(
        f"min((h * {_perm_params(j)[0]} + {_perm_params(j)[1]}) % {MERSENNE}) AS sig_{j}"
        for j in range(MINHASH_PERMS))
    return f"""
WITH shingles AS ({_SHINGLES_SQL}),
hashed AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(sh), 1, 8)) AS UBIGINT) AS BIGINT) AS h
  FROM shingles),
sigs AS (
  SELECT doc_id,
       {sig_exprs}
  FROM hashed GROUP BY doc_id)
"""


MINHASH_SIGNATURES_SQL = _minhash_sql_core() + """
SELECT * FROM sigs ORDER BY doc_id
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band (band hash =
    md5 of the band's signature values).

    The bucket table is PERSISTED before the self-join: both join sides
    reference the same frame, and without the persist Spark recomputes
    the whole shingle→minhash pipeline once per side (measured ~2× the
    stage cost).  Signatures come from the unordered core — a sort
    feeding a band explode + join would be pure wasted work."""
    sigs = _minhash_sigs(spark, sf_dir)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_structs = []
    for b in range(MINHASH_BANDS):
        concat = ", ".join(
            f"cast(sig_{b * rows_per_band + r} AS string)"
            for r in range(rows_per_band))
        band_structs.append(
            f"struct({b} AS band, md5(concat_ws('-', {concat})) AS bh)")
    buckets = (sigs.selectExpr(
                   "doc_id",
                   f"explode(array({', '.join(band_structs)})) AS bb")
                   .selectExpr("doc_id", "bb.band AS band", "bb.bh AS bh")
                   .transform(track_persist))
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band")) &
                       (F.col("a.bh") == F.col("b.bh")) &
                       (F.col("a.doc_id") < F.col("b.doc_id")))
              .select(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
              .distinct().orderBy("doc_a", "doc_b"))
    return pairs


def _minhash_lsh_sql() -> str:
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_selects = []
    for b in range(MINHASH_BANDS):
        concat = " || '-' || ".join(
            f"CAST(sig_{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sigs")
    buckets = "\nUNION ALL\n".join(band_selects)
    return _minhash_sql_core() + f""",
buckets AS (
{buckets})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a
JOIN buckets b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


DEDUP_MINHASH_LSH_SQL = _minhash_lsh_sql()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# The 64 per-bit vote aggregates and the 64-term signature assembly are
# rendered ONCE as SQL text: building the same tree through the Column
# DSL costs ~9,000 py4j round-trips (~1.3 s of driver time PER QUERY
# BUILD, profiled — guide §7.3 driver-side work), while parsing a
# prebuilt string is a handful of calls.  Semantics are identical: the
# strings are the exact SQL forms of the previous Column expressions.
_SIMHASH_VOTES_EXPRS = tuple(
    f"sum(CASE WHEN (shiftright(h_lo, {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
    for i in range(32)) + tuple(
    f"sum(CASE WHEN (shiftright(h_hi, {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i + 32}"
    for i in range(32))
# bit 63 is the sign bit: -(2**63) as (-(2**63 - 1) - 1) to stay in bigint
_SIMHASH_SIG_EXPR = " + ".join(
    f"CASE WHEN v{i} > 0 THEN {2 ** i}L ELSE 0L END" for i in range(63)
    ) + " + CASE WHEN v63 > 0 THEN (-9223372036854775807L - 1L) ELSE 0L END"


def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered (doc_id, simhash) — the composable core."""
    d = _docs(spark, sf_dir)
    hashed = d.selectExpr(
        "doc_id",
        r"explode(array_distinct(split(trim(lower(text)), '\\s+'))) AS tok",
    ).selectExpr(
        "doc_id",
        "cast(conv(substring(md5(tok), 1, 8), 16, 10) AS bigint) AS h_lo",
        "cast(conv(substring(md5(tok), 9, 8), 16, 10) AS bigint) AS h_hi",
    )
    # per-bit vote: sum(+1/-1); bit set if sum > 0
    votes = hashed.groupBy("doc_id").agg(
        *[F.expr(e) for e in _SIMHASH_VOTES_EXPRS])
    return votes.selectExpr("doc_id", f"({_SIMHASH_SIG_EXPR}) AS simhash")


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document over distinct lowercase tokens:
    bit i of the signature = majority vote of bit i across token hashes.
    Two md5-derived 32-bit halves form the 64 bits."""
    return _simhash_sigs(spark, sf_dir).orderBy("doc_id")


def _simhash_sql() -> str:
    lo = ",\n         ".join(
        f"sum(CASE WHEN (h_lo >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32))
    hi = ",\n         ".join(
        f"sum(CASE WHEN (h_hi >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i + 32}"
        for i in range(32))
    terms = []
    for i in range(64):
        if i < 63:
            terms.append(f"CASE WHEN v{i} > 0 THEN {2 ** i}::BIGINT ELSE 0 END")
        else:
            terms.append(f"CASE WHEN v{i} > 0 THEN (-9223372036854775807 - 1) ELSE 0 END")
    sig = " +\n       ".join(terms)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
hashed AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS BIGINT) AS h_lo,
         CAST(CAST(('0x' || substr(md5(tok), 9, 8)) AS UBIGINT) AS BIGINT) AS h_hi
  FROM toks),
votes AS (
  SELECT doc_id,
         {lo},
         {hi}
  FROM hashed GROUP BY doc_id)
SELECT doc_id,
       {sig} AS simhash
FROM votes
ORDER BY doc_id
"""


SIMHASH_SIGNATURES_SQL = _simhash_sql()


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str,
                        max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.
    Banded: 4×16-bit bands; only pairs sharing a band are compared
    (a pair within distance 3 must share ≥1 exact band; larger distances
    are best-effort, as in production SimHash dedup)."""
    sigs = _simhash_sigs(spark, sf_dir)
    bands = [F.struct(F.lit(b).alias("band"),
                      F.shiftright(F.col("simhash"), b * 16)
                       .bitwiseAND(0xFFFF).alias("bh"))
             for b in range(4)]
    buckets = (sigs.select("doc_id", "simhash",
                           F.explode(F.array(*bands)).alias("bb"))
                   .select("doc_id", "simhash",
                           F.col("bb.band").alias("band"),
                           F.col("bb.bh").alias("bh"))
                   # persisted: both self-join sides reuse one computation
                   .transform(track_persist))
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band")) &
                       (F.col("a.bh") == F.col("b.bh")) &
                       (F.col("a.doc_id") < F.col("b.doc_id")))
              .select(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"),
                      F.bit_count(F.col("a.simhash").bitwiseXOR(
                          F.col("b.simhash"))).alias("hamming"))
              .distinct()
              .where(F.col("hamming") <= max_hamming)
              .orderBy("doc_a", "doc_b"))
    return pairs


def _simhash_pairs_sql(max_hamming: int = 8) -> str:
    """Banded SimHash pair generation as SQL (arithmetic >> sign-extends
    identically in Spark and DuckDB; & 0xFFFF isolates the band)."""
    core = _simhash_sql().split("ORDER BY")[0]  # sigs query without order
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * 16}) & 65535 AS bh FROM sigs"
        for b in range(4))
    return f"""
WITH sigs AS ({core}),
buckets AS (
{bands})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM buckets a
JOIN buckets b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


DEDUP_SIMHASH_PAIRS_SQL = _simhash_pairs_sql()


# ---------------------------------------------------------------------------
# Near-dup CLUSTERS: connected components over the LSH pair graph
# ---------------------------------------------------------------------------

def dedup_clusters(spark: SparkSession, sf_dir: str,
                   max_iters: int = 50) -> DataFrame:
    """Group near-duplicate documents into clusters: connected components
    over the MinHash-LSH candidate-pair graph, cluster id = min doc_id in
    the component (the canonical "keep one per cluster" dedup shape).

    Algorithm: iterative min-label propagation to FIXPOINT — each round
    every node takes min(own label, neighbors' labels); converges in
    O(diameter) rounds (near-dup components are shallow).  Each round is
    one shuffle (join + groupBy-min) and the frontier is
    ``localCheckpoint``-ed like the SPARQL path closure
    (sparql.py::_path_pairs) so lineage stays flat.  The same shape runs
    on 10^12 edges: labels and edges are both partitioned by node id, no
    driver-side state, and the round count is data-diameter-bound, not
    data-size-bound."""
    edges = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sym = edges.unionByName(
        edges.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b")))
    labels = (sym.select(F.col("doc_a").alias("node")).distinct()
                 .withColumn("label", F.col("node"))
                 .localCheckpoint())
    # convergence check: labels only ever DECREASE (min-propagation), so
    # the fixpoint is reached exactly when sum(label) stops falling —
    # one cheap aggregate per round instead of a self-join diff
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        nb = (sym.join(labels, sym["doc_b"] == labels["node"])
                 .groupBy(sym["doc_a"].alias("nnode"))
                 .agg(F.min("label").alias("nb_min")))
        new = (labels.join(nb, labels["node"] == nb["nnode"], "left")
                     .select(labels["node"].alias("node"),
                             F.least(labels["label"],
                                     F.coalesce(F.col("nb_min"),
                                                labels["label"]))
                             .alias("label"))
                     .localCheckpoint())
        new_sum = new.agg(F.sum("label")).collect()[0][0]
        labels = new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds — "
            "raise max_iters (component diameter exceeds the cap)")
    return (labels.select(F.col("node").alias("doc_id"),
                          F.col("label").alias("cluster_id"))
                  .orderBy("doc_id"))


def _clusters_sql() -> str:
    """Connected components as a DuckDB recursive CTE: reach(node, root)
    closes over the symmetric pair graph; min(root) per node = min doc_id
    in the component — exactly the Spark fixpoint's answer."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_selects = []
    for b in range(MINHASH_BANDS):
        concat = " || '-' || ".join(
            f"CAST(sig_{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sigs")
    buckets = "\nUNION ALL\n".join(band_selects)
    core = _minhash_sql_core().replace("WITH ", "WITH RECURSIVE ", 1)
    return core + f""",
buckets AS (
{buckets}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
edges AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs),
reach(node, root) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.t, r.root FROM reach r JOIN edges e ON e.s = r.node)
SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


DEDUP_CLUSTERS_SQL = _clusters_sql()
