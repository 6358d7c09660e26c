"""Text-analysis operators over the ``documents`` table — the pieces a
large-scale training-data pipeline needs (token counting, quality
scoring, language ID, document fingerprinting).

All implementations are pure built-in pyspark.sql.functions (JVM-side,
whole-stage codegen); each has an exact DuckDB oracle.  Counts and
integer-scaled scores are used instead of float ratios so engine/oracle
value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import source_table
    return source_table(spark, f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of letters/digits/
    punctuation as separate tokens)."""
    d = _docs(spark, sf_dir)
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"),
                                      F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return (d.select(F.col("doc_id"),
                     ws.alias("n_ws_tokens"),
                     bpe.alias("n_bpe_tokens"),
                     F.length(F.col("text")).alias("n_chars_measured"))
             .orderBy("doc_id"))


TEXT_TOKENS_SQL = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       len(text) AS n_chars_measured
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword signals, integer-scaled.
    quality_bucket: 2 = good (long enough, has stopwords, low punct),
    1 = medium, 0 = poor."""
    d = _docs(spark, sf_dir)
    n_chars = F.length(F.col("text"))
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_punct = F.size(F.regexp_extract_all(F.col("text"),
                                          F.lit(r"[^\w\s]"), 0))
    stop_re = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                         F.lit(stop_re), 0))
    # integer per-mille ratios: floor() to avoid engine-specific
    # double→int cast semantics (Spark truncates, DuckDB rounds)
    punct_pm = F.floor(n_punct * F.lit(1000) / F.greatest(n_chars, F.lit(1)))
    stop_pm = F.floor(n_stop * F.lit(1000) / F.greatest(n_tokens, F.lit(1)))
    bucket = (F.when((n_chars >= 200) & (n_stop >= 1) & (punct_pm <= 100), 2)
               .when((n_chars >= 50), 1).otherwise(0))
    return (d.select("doc_id", n_chars.alias("n_chars_m"),
                     n_tokens.alias("n_tokens"), n_punct.alias("n_punct"),
                     n_stop.alias("n_stop"), punct_pm.alias("punct_pm"),
                     stop_pm.alias("stop_pm"), bucket.alias("quality_bucket"))
             .orderBy("doc_id"))


TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len(text) AS n_chars_m,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(lower(text), '\\b({"|".join(_STOPWORDS)})\\b')) AS n_stop
  FROM documents)
SELECT doc_id, n_chars_m, n_tokens, n_punct, n_stop,
       CAST(floor(n_punct * 1000 / greatest(n_chars_m, 1)) AS BIGINT) AS punct_pm,
       CAST(floor(n_stop * 1000 / greatest(n_tokens, 1)) AS BIGINT) AS stop_pm,
       CASE WHEN n_chars_m >= 200 AND n_stop >= 1
                 AND floor(n_punct * 1000 / greatest(n_chars_m, 1)) <= 100 THEN 2
            WHEN n_chars_m >= 50 THEN 1 ELSE 0 END AS quality_bucket
FROM base
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Language identification (marker-word heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "with", "from"),
    "de": ("der", "und", "die", "nicht"),
    "fr": ("le", "et", "les", "dans"),
    "es": ("el", "y", "los", "que"),
    "zh": ("de", "shi", "bu", "le"),
}


def _marker_count(col, words):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-word language scorer: argmax of per-language marker
    counts with a fixed tie-break order (en > de > fr > es > zh > und)."""
    d = _docs(spark, sf_dir)
    low = F.lower(F.col("text"))
    scores = {lang: _marker_count(low, words).alias(f"score_{lang}")
              for lang, words in _LANG_MARKERS.items()}
    scored = d.select("doc_id", "lang", *scores.values())
    best = F.greatest(*[F.col(f"score_{lg}") for lg in _LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for lg in _LANG_MARKERS:  # insertion order = tie-break priority
        pred = pred.when(F.col(f"score_{lg}") == best, lg)
    return (scored.select("doc_id", F.col("lang").alias("lang_labeled"),
                          *[f"score_{lg}" for lg in _LANG_MARKERS],
                          pred.alias("lang_pred"))
                  .orderBy("doc_id"))


def _langid_sql() -> str:
    score_exprs = ",\n         ".join(
        f"len(regexp_extract_all(lower(text), '\\b({'|'.join(w)})\\b')) AS score_{lg}"
        for lg, w in _LANG_MARKERS.items())
    langs = list(_LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und'\n"
    for lg in langs:
        case += f"            WHEN score_{lg} = {best} THEN '{lg}'\n"
    case += "       END AS lang_pred"
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_labeled,
         {score_exprs}
  FROM documents)
SELECT doc_id, lang_labeled, {", ".join(f"score_{lg}" for lg in langs)},
       {case}
FROM scored
ORDER BY doc_id
"""


TEXT_LANGID_SQL = _langid_sql()


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical content fingerprint: md5 over the sorted distinct
    lowercase token set (whitespace-normalized) — the classic
    "fingerprint" clustering key for near-canonical dedup."""
    d = _docs(spark, sf_dir)
    tokens = F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    fp = F.md5(F.concat_ws(" ", F.array_sort(tokens)))
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fingerprint
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses (standard pretraining
    hygiene pass): returns the scrubbed text plus per-kind match counts —
    all native regexp ops, one pass per pattern."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    n_email = F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0))
    n_phone = F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0))
    n_ip = F.size(F.regexp_extract_all(t, F.lit(_IPV4_RE), 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"),
            _IPV4_RE, "<IP>"),
        _PHONE_RE, "<PHONE>")
    return (d.select("doc_id", n_email.alias("n_email"),
                     n_phone.alias("n_phone"), n_ip.alias("n_ip"),
                     F.md5(scrubbed).alias("scrubbed_md5"))
             .orderBy("doc_id"))


TEXT_PII_SCRUB_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(text, '{_PHONE_RE.replace("'", "''")}')) AS n_phone,
       len(regexp_extract_all(text, '{_IPV4_RE}')) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(
           text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_IPV4_RE}', '<IP>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM documents
ORDER BY doc_id
"""
