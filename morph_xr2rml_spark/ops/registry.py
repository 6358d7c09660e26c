"""Registry wiring the training-data ops into the driver contract
(__spark_entry__.queries / oracle_sql) and the bench harness."""

from __future__ import annotations

from . import dedup, events, multimodal, similarity, text


def queries():
    return {
        # event analytics (windowed rollup + sessionization)
        "events_hourly": events.events_hourly,
        "events_sessionize": events.events_sessionize,
        # text analysis
        "text_tokens": text.text_tokens,
        "text_quality": text.text_quality,
        "text_langid": text.text_langid,
        "text_fingerprint": text.text_fingerprint,
        "text_pii_scrub": text.text_pii_scrub,
        # dedup
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_minhash_signatures": dedup.minhash_signatures,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_simhash": dedup.simhash_signatures,
        # similarity
        "sim_cosine_topk": similarity.sim_cosine_topk,
        "sim_ann_lsh_buckets": similarity.sim_ann_lsh_buckets,
        "dedup_simhash_pairs": dedup.dedup_simhash_pairs,
        "sim_ann_lsh_topk": similarity.sim_ann_lsh_topk,
        "dedup_embedding_cosine": similarity.dedup_embedding_cosine,
        # multimodal: real stdlib WAV/BMP/PNG/JPEG decode + grid-pool
        # features through Arrow mapInPandas (video rows: documented
        # deterministic stand-in)
        "multimodal_features": multimodal.multimodal_features_gate,
    }


def oracle_sql():
    return {
        "events_hourly": events.EVENTS_HOURLY_SQL,
        "events_sessionize": events.EVENTS_SESSIONIZE_SQL,
        "text_tokens": text.TEXT_TOKENS_SQL,
        "text_quality": text.TEXT_QUALITY_SQL,
        "text_langid": text.TEXT_LANGID_SQL,
        "text_fingerprint": text.TEXT_FINGERPRINT_SQL,
        "text_pii_scrub": text.TEXT_PII_SCRUB_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": dedup.DEDUP_NGRAM_JACCARD_SQL,
        "dedup_minhash_signatures": dedup.MINHASH_SIGNATURES_SQL,
        "dedup_minhash_lsh": dedup.DEDUP_MINHASH_LSH_SQL,
        "dedup_clusters": dedup.DEDUP_CLUSTERS_SQL,
        "dedup_simhash": dedup.SIMHASH_SIGNATURES_SQL,
        "sim_cosine_topk": similarity.SIM_COSINE_TOPK_SQL,
        "sim_ann_lsh_buckets": similarity.SIM_ANN_LSH_BUCKETS_SQL,
        "dedup_simhash_pairs": dedup.DEDUP_SIMHASH_PAIRS_SQL,
        "sim_ann_lsh_topk": similarity.SIM_ANN_LSH_TOPK_SQL,
        "dedup_embedding_cosine": similarity.DEDUP_EMBEDDING_COSINE_SQL,
        "multimodal_features": multimodal.multimodal_features_oracle_sql(),
    }


def bench_queries():
    """Subset worth timing at sf0.1."""
    return {
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        # dedup_clusters is gate-only: at bench scale its wall time is
        # per-round job constants (2 rounds over 1300 edges), not work —
        # nothing a throughput bench can read from it
        "dedup_simhash": dedup.simhash_signatures,
        "text_quality": text.text_quality,
        "sim_cosine_topk": similarity.sim_cosine_topk,
    }
