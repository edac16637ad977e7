"""Pin the driver-gate ordering of ``queries.REGISTRY`` (ADVICE r3 #4).

The driver's correctness gate records only the FIRST 50 entries of
``queries()``, so gate coverage is an artifact of REGISTRY's dict order
(policy in docs/COVERAGE.md: the three demoted SQL-backed queries are
derivatives of in-cap gated siblings and carry their own pytest pins).
These pins turn any registry edit that silently reshuffles which queries
are gated into a test failure instead.
"""

from ocr_platform_spark.queries import REGISTRY

GATE_CAP = 50

# The exact first-50 (driver-gated) query names, in order.
GATED = [
    "topk_recent_orders", "pricing_summary", "orders_per_nation",
    "orders_rollup", "nation_parttype_profit", "event_type_stats",
    "customers_without_orders", "reading_order_events", "session_spans",
    "value_range_bins", "event_props_json", "session_json",
    "stream_window_counts", "zip_align_events", "coord_convert",
    "token_stats", "quality_scores", "lang_id", "doc_fingerprints",
    "doc_checksums", "tfidf_top_terms", "bpe_token_count", "dedup_exact",
    "ngram_jaccard_pairs", "minhash_signatures", "minhash_lsh_pairs",
    "simhash", "ann_bruteforce_topk", "ann_ivf_topk", "lsh_buckets",
    "embedding_near_dup_lsh", "dedup_groups", "vocab_topk",
    "repetition_scores", "pii_scrub", "stratified_sample",
    "curated_corpus", "pack_sequences", "source_mix_weights",
    "contamination_check", "chunk_dedup", "length_histogram",
    "semdedup_clusters", "semdedup_prune", "bpe_pair_counts",
    "unigram_scores", "html_text", "html_main_content", "payload_stats",
    "source_map_blocks",
]

# Everything past the cap: the three deliberately demoted SQL-backed
# queries (each pytest-pinned; verified by tools/check_oracle.py), then
# the rows-only extraction/multimodal pipelines.
PAST_CAP = [
    "simhash_pairs", "embedding_near_dup", "ann_recall",
    "html_main_blocks",
    "audio_metadata", "audio_features", "video_frame_luma",
    "eml_extract", "mbox_pages",
    "extract_spans", "extract_detect_boxes", "extract_two_phase",
    "extract_fused", "media_quarantine", "media_metadata",
    "page_features", "frame_sample",
]

# html_main_blocks (round 4) follows the same policy: derivative of the
# in-cap html_text/html_main_content siblings, pytest-pinned end-to-end
# in test_extract_html.py, oracle-verified by tools/check_oracle.py.
# The audio/video tier (round 4) likewise: the gate cap is immovable,
# so the three closed-form-oracle queries land past-cap, pytest-pinned
# in test_audio_video.py and verified by tools/check_oracle.py.
DEMOTED_SQL_BACKED = {
    "simhash_pairs", "embedding_near_dup", "ann_recall",
    "html_main_blocks",
    "audio_metadata", "audio_features", "video_frame_luma",
    "eml_extract", "mbox_pages",
}


def test_gated_first_50_pinned_exactly():
    assert list(REGISTRY)[:GATE_CAP] == GATED


def test_past_cap_tail_pinned_exactly():
    assert list(REGISTRY)[GATE_CAP:] == PAST_CAP


def test_only_the_three_demoted_queries_are_sql_backed_past_cap():
    sql_backed = {
        name for name in list(REGISTRY)[GATE_CAP:] if REGISTRY[name][1] is not None
    }
    assert sql_backed == DEMOTED_SQL_BACKED


def test_every_gated_query_is_sql_backed():
    missing = [name for name in GATED if REGISTRY[name][1] is None]
    assert missing == []
