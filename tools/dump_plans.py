"""Regenerate PLANS.md: executed physical plans for flagship queries.

Usage: python tools/dump_plans.py   (writes PLANS.md at the repo root)

The plan-shape PROPERTIES are pinned in tests/test_plan_hygiene.py (CI
fails if they regress); this file is the human-readable snapshot of what
Catalyst+AQE actually produce for a representative query per family.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark import contract  # noqa: E402
from bigdata_weather_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: (query, why this one is the representative)
SHOWCASE = [
    ("q1_pricing_summary", "scan pushdown + column pruning + partial/final hash agg"),
    ("q3_shipping_priority", "selective broadcast dim + shuffle join + TakeOrderedAndProject top-k"),
    ("q5_local_supplier_volume", "join-graph cycle, four broadcast dims, one fact-fact shuffle"),
    ("latest_event_per_user", "window rank with WindowGroupLimit (partial top-1 map-side)"),
    ("hourly_profile", "bucketed agg + histogram-mode + broadcast modal join"),
    ("asof_click_before_purchase", "as-of join as union + forward-fill window (one shuffle)"),
    ("stratified_event_sample", "hash-rate sampling: zero-Exchange pure scan projection"),
    ("doc_vocab_coverage", "bounded top-k vocabulary broadcast back to the corpus"),
    ("events_resampled_6h", "per-key dense-grid explode + co-partitioned left join + fill window"),
    ("weighted_event_sample", "hash-derived A-ES keys: pushed-filter scan + TakeOrderedAndProject, zero exchanges"),
    ("doc_segment_dedup", "narrow array-lambda segmentation; corpus count shuffles md5 keys only"),
    ("doc_pii_redaction", "chained regexp redaction: single codegen stage, zero exchanges"),
    ("doc_fuzzy_match_pairs", "blocked record linkage via grouped-postings pair_up (one shuffle)"),
    ("scd2_user_state_history", "SCD2: lag + run-grouping + interval agg + versioning on ONE partitioning"),
    ("ohlc_6h_bars", "OHLC via mergeable min_by/max_by: partial/final agg, no window"),
    ("events_quality_report", "N quality constraints folded into one scan + one reduce"),
    ("funnel_signup_click_purchase", "per-step min-ts aggs; aggregated (bounded) sides broadcast-joined"),
    ("cdc_apply_user_state", "MERGE apply: WindowGroupLimit collapse + full-outer merge on one key"),
    ("golden_user_profile", "survivorship: single partial/final argmax aggregation, no window/join"),
    ("cusum_change_points", "stateful-looking CUSUM as one-exchange window algebra"),
    ("part_copurchase_pagerank", "fixed-iteration PageRank: cached edges, one shuffle per iteration"),
    ("feature_store_pit_join", "PIT feature join: union-window as-of with staleness null-out"),
    ("doc_unigram_logprob", "corpus LM + per-doc likelihood: shared exploded relation, token-key join"),
    ("bootstrap_value_mean", "Poisson bootstrap: 32x map-side fan-out collapsing into 32 partial-agg groups"),
    ("part_price_volume_skyline", "two-phase skyline: local Arrow fronts, single-partition global merge"),
    ("incremental_join_view_delta", "IVM delta-join: three delta-sized join terms unioned"),
    ("doc_duplicate_span_stats", "ExactSubstr span dedup: linear window hashing, no pair generation"),
    ("doc_bm25_search", "BM25: term-filtered explode, broadcast df/corpus scalars, top-k"),
    ("doc_containment_pairs", "containment prefix filter: rarest-first prefixes probe the full index"),
    ("autoregressive_forecast_hourly", "vectorized AR rollout + wall-clock hourly rollup"),
    ("media_pcm_decode", "Arrow-batched PCM codec: narrow mapInPandas, blob bytes stay in Arrow"),
    ("theta_sketch_user_overlap", "KMV theta: WindowGroupLimit top-64 per side, broadcast-only joins"),
    ("markov_removal_attribution", "absorbing-chain power rounds as 1-row projections (zero shuffles/round)"),
    ("media_ahash_near_dups", "perceptual-hash image near-dup: zero-shuffle hash map stage + lossless band join"),
    ("gmm_em_value_mixture", "in-plan EM: 5 moment scans against broadcast 1-row parameters, no Python"),
    ("retrieval_rrf_fusion", "RRF: two BM25 arms, TakeOrderedAndProject top-50 each, 50x50 fusion join"),
    ("triple_barrier_labels", "bounded 20-row future frame + array-lambda first-crossing: one window pass, no future self-join"),
    ("part_harmonic_centrality", "labeled multi-source BFS: per-hop frontier joins with visited anti-join, localCheckpoint lineage cut"),
    ("incremental_agg_retraction", "IVM with retractions: change-feed-sized delta join + #types-row full-outer combine"),
    ("cube_materialization_advisor", "one Expand-fed cube sizing all 2^3 lattice groupings; 8-row scored relation"),
    ("part_edge_triangle_support", "degree-ordered wedges on the weight>=2 repeat graph; O(3 triangles) credit aggregation"),
    ("hurst_rescaled_range", "R/S: per-(type,bs,block) cumulative windows; skew-free fine-grained keys; 3-point log-log fit"),
    ("lineitem_column_stats", "exact ANALYZE quartiles: range-partitioned histogram prefix-sum, no NDV-sized task state"),
    ("preference_pair_mining", "DPO pairs: both extremes per group from ONE max_by/min_by partial aggregation"),
    ("lsh_parameter_planner", "banding S-curve planner: closed-form literal folds, zero scans"),
    ("token_heavy_hitters_mg", "Misra-Gries: k counters per partition in one Arrow pass, parallelism-bounded merge"),
    ("embedding_silhouette_by_label", "centroid silhouette: broadcast labels-x-dims centroids, point-x-centroid only"),
    ("doc_warc_extract_pipeline", "raw-web ingestion WARC->HTML->text: one zero-Exchange scan-fused string-algebra map chain"),
    ("domain_cap_survivors", "per-domain cap: WindowGroupLimit prunes each partition to K rows before the window sort"),
    ("domain_concentration_metrics", "domain gini/HHI: closed-form tied-group rank sums over the distinct-cnt relation (no per-domain window at all) + TakeOrderedAndProject shares"),
    ("knn_label_eval_ann", "self-kNN at scale: adaptive-plane LSH shuffle equi-join on the bucket key, narrow score-before-dedup, window-group-limit top-5"),
    ("doc_fuzzy_match_pairs_capped", "record linkage with the hot-block cap IN the plan: grouped-postings pair_up, cap filter before pair explosion"),
    ("distributed_linear_train", "in-engine training: one narrow Arrow stats pass + singleton merge agg + in-plan literal-coefficient scoring"),
    ("media_gif_decode", "inter-frame video decode: zero-Exchange Arrow map stage (fabricate+decode fused), exact per-frame facts"),
    ("semantic_decontamination", "eval-leakage scan: broadcast eval matrix, one narrow pass over the corpus, two scalar aggs"),
    ("knn_label_eval_ann_serving", "LSH top-k at the SERVING shape: exploded query-probe rows broadcast, corpus side never shuffles (the other join strategy of the self-kNN twin above)"),
    ("media_mpv_decode", "motion-compensated video decode: zero-Exchange Arrow map stage, per-block mv gather + residual add fused with fabrication"),
    ("minhash_lsh_near_dups", "md5-keyed MinHash-LSH: explode -> 32 codegen'd digest-slice mins -> band pair_up with hot-bucket cap -> array-intersect Jaccard verify"),
]

HEADER = """# PLANS — executed physical plans (flagship queries)

Generated by `tools/dump_plans.py` at sf0.001 (plan SHAPES are scale-
independent; AQE may choose different join strategies at real scale where
a side stops fitting the broadcast threshold — those decision points are
called out inline). The load-bearing properties (pushdown, pruning,
broadcasts, WindowGroupLimit, partial aggregation, zero-Exchange where
claimed) are enforced by `tests/test_plan_hygiene.py`.
"""


def main() -> None:
    spark = get_spark(app_name="dump-plans")
    out = [HEADER]
    for name, why in SHOWCASE:
        df = contract.QUERIES[name](spark, SF_DIR)
        df.collect()  # let AQE finalize so the plan shows runtime decisions
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"\n## {name}\n\n*{why}*\n\n```\n{plan.rstrip()}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
