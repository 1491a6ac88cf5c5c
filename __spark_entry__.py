"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship KG-materialization query at sf0.001.
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL twin (see
ctinexus_spark/entry_queries.py for the pairing rationale).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ctinexus_spark import dataset_queries, entry_queries  # noqa: E402

# The driver's CORRECTNESS gate samples the FIRST `WINDOW` entries in
# dict order, so ordering is load-bearing. Two invariants, enforced by
# tests/test_rotation.py:
#   1. union coverage — every registry query appears in some round's
#      window (r01-r03 ran the natural merge order; later rounds are
#      the recorded rotations below), so every oracle row has at least
#      one driver-green round;
#   2. change coverage — every query whose backing implementation
#      changed this round (CHANGED_THIS_ROUND, updated alongside the
#      code) sits inside the CURRENT window, so no behavior change
#      ships driver-unchecked on the strength of a stale green row.
WINDOW = 50

# Queries whose semantics or backing operators changed in the current
# round. Must be a subset of the current window (tested).
_CHANGED_R05 = [
    "part_pagerank", "part_kcore", "dedup_incremental", "simhash",
    "simhash_candidates", "dedup_clusters_cc", "dedup_clusters_stars",
    "dedup_keeplist", "semantic_dedup", "kg_global_entities",
    "hll_distinct", "cms_topk", "bloom_probe", "bm25_topk",
    "doc_len_quantiles", "part_communities", "cluster_topics",
    "part_reach", "part_clustering", "mmr_topk", "source_drift",
    "event_asof_purchase", "part_ppr", "click_attribution",
    "event_rollup_cascade", "kmv_distinct", "kmv_overlap", "part_truss",
    "jaccard_pairs", "event_funnel", "part_linkpred", "cohort_retention",
    "part_sssp", "hybrid_topk", "event_bursts", "part_walks",
    "kg_entity_cooc", "event_twa", "revenue_cube", "idle_customers",
    "event_decay", "event_transitions", "event_cusum", "order_zorder",
    "user_event_pivot", "user_event_unpivot", "part_name_fuzzy",
    "event_props_k",
]

CHANGED_THIS_ROUND = [
    # round 6 (optimization round): results are bit-identical by
    # design, but the BACKING IMPLEMENTATIONS changed, so every
    # consumer rotates into the window for a fresh driver-grade check.
    # mint_mentions / align / analyze_graph / predict_links /
    # materialize_kg (modular KG chain reshuffle):
    "ea_mentions",
    "ea_entities",
    "ea_entities_merged",
    "ea_entities_cc",
    "ea_ioc_unmerge",
    "lp_graph",
    "lp_split_graph",
    "lp_links_flaky",
    "kg_triples",
    "kg_fused",
    "kg_entity_degree",
    "kg_entity_cooc",
    "kg_global_entities",
    # connected_components check-time barriering (all CC consumers):
    "dedup_clusters_cc",
    "dedup_keeplist",
    "dedup_incremental",
    "semantic_dedup",
    # label_propagation pre-partitioned edge table:
    "part_communities",
    # operator-internal rewrites (same integers, new dataflow):
    "jaccard_pairs",
    "shingle_overlap",
    "winnow_fp",
    "cms_topk",
]

# Per-round rotation fronts (the driver window = first WINDOW names of
# rotation + natural-order fill). r01-r03 used the natural order — an
# empty rotation. Keep every past round's list: the union-coverage
# test replays them.
ROTATION_HISTORY: dict[str, list[str]] = {
    "r01": [],
    "r02": [],
    "r03": [],
    "r04": [
        "bpe_merges", "token_pmi", "dup_grams", "part_pagerank",
        "part_kcore", "semantic_dedup", "cdc_chunks", "langid",
        "event_sessions_native", "dedup_incremental", "table_profile",
        "pack_plan", "simhash", "simhash_candidates", "ivf_assign",
        "ivf_topk", "dedup_clusters_cc", "dedup_keeplist",
        "quality_gate", "text_dedupe", "tpch_q1", "revenue_join",
        "region_revenue", "user_top_events", "event_sessions",
        "event_type_rollup", "order_percentiles", "revenue_rollup",
        "event_leadlag", "part_triangles", "stratified_sample",
        "mixture_plan", "decontaminate", "vocab_topk", "line_dedup",
        "domain_cap", "dsir_features", "rand_proj", "pq_codes",
        "pq_adc_topk", "ivf_pq_topk",
    ],
    # round 5: the changed set first, then the rows whose only greens
    # date to r01-r03 (oldest coverage), then the r04 KG block —
    # exactly WINDOW names, so the window is fully explicit this round.
    "r05": _CHANGED_R05 + [
        # url_ops leads the fill: its only green is this round's window
        # (union coverage breaks if it slips past WINDOW as the changed
        # set grows)
        "url_ops",
        "doc_sample", "doc_text_norm", "ie_triples", "ie_counts",
        "et_typed", "ea_mentions", "ea_entities", "lp_graph",
        "kg_triples", "token_stats", "quality", "lang_features",
        "gopher_rules", "repetition_ratios", "lm_scores", "doc_chunks",
        "redact_pii", "fingerprints", "bpe_tokens", "winnow_fp",
        "dedup_exact", "minhash", "lsh_bands", "lsh_candidates",
        "shingle_overlap", "emb_cosine_pairs", "ann_topk",
        "lsh_buckets", "lsh_topk", "knn_vote", "mm_metadata",
        "mm_frame_plan",
        # ea_entities_merged / ea_entities_cc / ie_demo_topk /
        # ea_ioc_unmerge / lp_links_flaky / kg_fused / lp_split_graph
        # rotated out to make room for the sketch / retrieval /
        # quantile / LPA / topic queries — all seven were green in the
        # r04 window and their backing code is unchanged this round
        # (union coverage keeps them via r04).
    ],
    # round 6 (optimization): the changed set first, then the
    # verification-refresh fill (round-5 VERDICT #1) — the queries
    # whose only greens date to r01-r03, then three of the stalest r04
    # rows the verdict named. 22 + 25 + 3 = exactly WINDOW names.
    "r06": CHANGED_THIS_ROUND + [
        "doc_text_norm", "ie_triples", "ie_counts", "et_typed",
        "token_stats", "quality", "lang_features", "gopher_rules",
        "repetition_ratios", "lm_scores", "doc_chunks", "redact_pii",
        "fingerprints", "bpe_tokens", "dedup_exact", "minhash",
        "lsh_bands", "lsh_candidates", "emb_cosine_pairs", "ann_topk",
        "lsh_buckets", "lsh_topk", "knn_vote", "mm_metadata",
        "mm_frame_plan",
        "tpch_q1", "ivf_topk", "pq_adc_topk",
    ],
}

_ROTATE_FIRST = ROTATION_HISTORY[max(ROTATION_HISTORY)]


def _rotated(merged: dict) -> dict:
    out = {k: merged[k] for k in _ROTATE_FIRST if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG pipeline (IE→ET→EA→LP→materialize) over
    sf0.001 documents; driver checks rows>0 and stable schema."""
    return entry_queries.q_kg_fused(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated({**entry_queries.QUERIES, **dataset_queries.QUERIES})


def oracle_sql() -> dict[str, str]:
    merged = {**entry_queries.ORACLES, **dataset_queries.ORACLES}
    out = {k: merged[k] for k in queries() if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out
