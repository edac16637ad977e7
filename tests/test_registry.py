"""Pin the driver-gate ordering of ``queries.REGISTRY`` (ADVICE r3 #4).

The driver's correctness gate records only the FIRST 50 entries of
``queries()``, so gate coverage is an artifact of REGISTRY's dict order.
Round-5 rotation (VERDICT r4 #3): the 9 SQL-backed queries that had
never earned a driver-grade row (simhash_pairs, embedding_near_dup,
ann_recall, html_main_blocks, audio_metadata, audio_features,
video_frame_luma, eml_extract, mbox_pages) swapped INTO the gate, plus
the new docx_embedded office-interleave query; 10 long-green siblings
rotated out (each a derivative of a still-gated family member, each
pytest-pinned, all verified at HEAD by tools/check_oracle.py each
round). These pins turn any registry edit that silently reshuffles
which queries are gated into a test failure instead.
"""

from ocr_platform_spark.queries import REGISTRY

GATE_CAP = 50

# The exact first-50 (driver-gated) query names, in order.
GATED = [
    "topk_recent_orders", "pricing_summary", "orders_per_nation",
    "nation_parttype_profit", "event_type_stats",
    "customers_without_orders", "reading_order_events", "session_spans",
    "value_range_bins", "session_json", "stream_window_counts",
    "zip_align_events", "coord_convert",
    "token_stats", "quality_scores", "lang_id", "doc_fingerprints",
    "tfidf_top_terms",
    "dedup_exact", "minhash_signatures", "minhash_lsh_pairs", "simhash",
    "simhash_pairs", "embedding_near_dup",
    "ann_bruteforce_topk", "ann_ivf_topk", "ann_recall",
    "embedding_near_dup_lsh",
    "dedup_groups", "repetition_scores", "pii_scrub", "stratified_sample",
    "curated_corpus", "pack_sequences", "source_mix_weights",
    "contamination_check", "chunk_dedup", "length_histogram",
    "semdedup_clusters", "bpe_pair_counts",
    "html_main_content", "html_main_blocks",
    "payload_stats", "audio_metadata", "audio_features",
    "video_frame_luma",
    "eml_extract", "mbox_pages", "docx_embedded",
    "source_map_blocks",
]

# Everything past the cap: the ten rotated-out SQL-backed queries (each
# pytest-pinned; verified by tools/check_oracle.py at HEAD), then the
# rows-only extraction/multimodal pipelines.
PAST_CAP = [
    "orders_rollup", "event_props_json", "doc_checksums",
    "bpe_token_count", "ngram_jaccard_pairs", "lsh_buckets",
    "vocab_topk", "semdedup_prune", "unigram_scores", "html_text",
    "mbox_attach", "xlsx_embedded",
    "extract_spans", "extract_detect_boxes", "extract_two_phase",
    "extract_fused", "media_quarantine", "media_metadata",
    "page_features", "frame_sample",
]

# Past-cap SQL-backed set: derivatives of in-cap gated family members —
# orders_rollup (agg family: pricing_summary/orders_per_nation gated),
# event_props_json (session_json gated), doc_checksums
# (doc_fingerprints gated), bpe_token_count + unigram_scores
# (bpe_pair_counts gated), ngram_jaccard_pairs (minhash/simhash banding
# family gated), lsh_buckets (embedding_near_dup_lsh gated), vocab_topk
# (tfidf_top_terms gated), semdedup_prune (semdedup_clusters gated),
# html_text (html_main_content/html_main_blocks gated).
DEMOTED_SQL_BACKED = {
    "orders_rollup", "event_props_json", "doc_checksums",
    "bpe_token_count", "ngram_jaccard_pairs", "lsh_buckets",
    "vocab_topk", "semdedup_prune", "unigram_scores", "html_text",
    # round-5 interleave tiers, born past-cap (gate full), each
    # pytest-pinned in test_office_media.py
    "mbox_attach", "xlsx_embedded",
}


def test_gated_first_50_pinned_exactly():
    assert list(REGISTRY)[:GATE_CAP] == GATED


def test_past_cap_tail_pinned_exactly():
    assert list(REGISTRY)[GATE_CAP:] == PAST_CAP


def test_only_the_demoted_queries_are_sql_backed_past_cap():
    sql_backed = {
        name for name in list(REGISTRY)[GATE_CAP:] if REGISTRY[name][1] is not None
    }
    assert sql_backed == DEMOTED_SQL_BACKED


def test_every_gated_query_is_sql_backed():
    missing = [name for name in GATED if REGISTRY[name][1] is None]
    assert missing == []
