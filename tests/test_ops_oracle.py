"""Every op with a SQL oracle must match it exactly at sf0.001 — the local
pre-run of the driver's correctness gate."""

import duckdb
import pytest

from morph_xr2rml_spark.ops import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

ORACLES = registry.oracle_sql()
QUERIES = registry.queries()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_op_matches_oracle(spark, name):
    got = sorted(tuple(str(x) if x is not None else None for x in r)
                 for r in QUERIES[name](spark, SF_DIR).collect())
    want = sorted(tuple(str(x) if x is not None else None for x in r)
                  for r in _duck(ORACLES[name]))
    assert len(got) == len(want), \
        f"{name}: rows spark={len(got)} duck={len(want)}"
    bad = [(g, w) for g, w in zip(got, want) if g != w]
    assert not bad, f"{name}: first mismatches {bad[:3]}"


def test_rows_only_ops_run(spark):
    """Spark-only ops (no SQL oracle) must at least run with stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_multimodal_plumbing(spark):
    from morph_xr2rml_spark.ops import multimodal
    media = multimodal.synthetic_media_df(spark, 30)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    # per-modality feature widths: image grid 4x4x3=48, wav 8 windows+
    # zcr=9, video: MJPEG-AVI rows decode for real (48-dim temporal mean
    # of per-frame grid pools), other codecs keep the 16-dim stand-in
    widths = {r.media_id: len(r.feature) for r in rows}
    assert all(
        widths[i] == (48 if i % 3 == 0 else
                      9 if i % 3 == 1 else
                      48 if (i // 3) % 2 == 0 else 16)
        for i in widths)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in multimodal.extract_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)
    frames = multimodal.frame_sample_plan(media).collect()
    assert all(f.frame_ts_ms % 500 == 0 for f in frames)

    # codec formats stay stubbed (no PIL/cv2 in the container)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG....")


def test_pii_scrub_behavior(spark, tmp_path):
    """The oracle tables contain no PII, so also verify redaction on
    synthetic text with real emails/phones/IPs."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(1, "contact bob@example.com or +1 (555) 123-4567 at 10.0.0.1 now")],
        "doc_id long, text string")
    path = str(tmp_path / "documents.parquet")
    df.write.parquet(path)
    from morph_xr2rml_spark.ops.text import text_pii_scrub, _EMAIL_RE, _IPV4_RE, _PHONE_RE
    row = text_pii_scrub(spark, str(tmp_path)).collect()[0]
    assert row.n_email == 1 and row.n_ip == 1 and row.n_phone >= 1
    scrubbed = (df.select(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.col("text"), _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"),
        _PHONE_RE, "<PHONE>").alias("t")).collect()[0].t)
    assert "bob@example.com" not in scrubbed and "<EMAIL>" in scrubbed
    assert "10.0.0.1" not in scrubbed and "<IP>" in scrubbed
    assert "555" not in scrubbed and "<PHONE>" in scrubbed


def test_ops_cleanup_releases_persisted_frames(spark):
    """VERDICT r2 item 4: composing ops in one session must not leak
    executor storage — ops.cleanup() drains every tracked persist."""
    from morph_xr2rml_spark import ops
    from morph_xr2rml_spark.ops.dedup import dedup_minhash_lsh
    from morph_xr2rml_spark.ops.similarity import sim_ann_lsh_topk
    sf = "/root/testdata/sf0.001"
    ops.cleanup()   # reset anything earlier tests tracked
    jsc = spark.sparkContext._jsc.sc()
    dedup_minhash_lsh(spark, sf).count()
    sim_ann_lsh_topk(spark, sf).count()
    # NOTE: raw getPersistentRDDs counts are racy — unreferenced
    # localCheckpoint RDDs from earlier tests are garbage-collected
    # asynchronously by the ContextCleaner.  Assert on the DELTA the
    # tracked cleanup itself produces.
    mid = jsc.getPersistentRDDs().size()
    released = ops.cleanup()
    assert released >= 2
    assert jsc.getPersistentRDDs().size() <= mid - 2
