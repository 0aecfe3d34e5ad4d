"""Regenerate PLANS.md: formatted physical plans of representative
queries, the human-readable companion to tests/test_plan_quality.py.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

PICKS = {
    "q01_pricing_summary": "flagship aggregation: pruned 7-col scan, pushed filter, partial+final hash agg, codegen",
    "q03_revenue_by_nation": "star join: fact scan + 3 broadcast dims, no fact shuffle before agg",
    "q28_jaccard_pairs": "PPJoin jaccard: narrow prefix index, size-ratio filter fused into the candidate join condition (r7), candidate distinct, per-side array fetch",
    "q31_knn_bruteforce": "ANN brute force: corpus never shuffles; query side broadcast",
    "q54_asof_join": "as-of join: union + single per-key window, no range join",
    "q59_range_join": "banded range join: equi-join on band id, no BroadcastNestedLoop",
    "q61_simhash_banded": "banded simhash: one agg for signatures, band equi-join for candidates, no cross join",
    "q65_resample_ffill": "resample+ffill: span agg -> sequence spine (no driver loop), left equi-join, one analytic window",
    "q67_tfidf_terms": "relational TF-IDF: persisted TF feeds both DF agg and probe (InMemoryTableScan x2, one corpus scan), broadcast vocab join",
    "q69_cdc_merge": "CDC merge: anti-join + union, no full-outer coalesce plan",
    "q70_rolling_range_window": "value-range frame: single window node, RANGE 3599 PRECEDING",
    "q82_pack_chunks": "distributed prefix sum: range-partition exchange, window partitioned by __pid (never SinglePartition), broadcast offset map",
    "q87_vocab_encode": "tokenizer: TakeOrdered vocab, broadcast vocab join, one grouped positional reassembly",
    "q91_span_dedup": "span dedup: span-key agg + join back (broadcast-eligible dup set), grouped reassembly, no cross join",
    "q94_semantic_dedup": "semantic dedup: argmax-expression assignment (no join), cluster-keyed pair join, dropped-id join back",
    "q96_zorder_layout": "z-order: 32-term interleave folded into the projection, partial+final agg, two exchanges total",
    "q104_bm25": "BM25: token explode feeds two map-side counts; df + corpus stats broadcast back; no cartesian",
    "q112_triangle_count": "triangle count: degree-oriented wedge join + LeftSemi closing-edge check, no cartesian",
    "q113_expectations": "expectations: all rules in ONE partial+final aggregate over one scan, stack on the 1-row result",
    "q114_quantized_ann": "quantized ANN: int8 corpus scan for candidates, rerank join touches only survivors",
    "q132_bpe_encode": "BPE encode: merge folds on the DISTINCT-word vocab only, broadcast join back to (doc,pos), grouped ordered flatten; no EvalPython",
    "q133_sliding_chunks": "RAG chunking: shuffle-free substring explode inside the scan stage, no window, no join",
    "q135_psi_drift": "PSI drift: two map-side-combined bin counts + broadcast 1-row totals; n_bins-row tail",
    "q138_ensemble_report": "ensemble report: ONE partial+final aggregate carries all 20 conditional counts (5 models x 4 CM cells); Generate unpivots the 1-row result; votes stay in the projection",
    "q139_normalize_text": "text normalization: regexp_replace chain inside the scan stage projection, zero exchanges before the orderBy",
    "q145_winnow_fingerprints": "winnowing: tokenize -> gram-hash column -> per-window fold -> distinct -> explode, ALL inside the scan-stage projection; zero exchanges before the orderBy",
    "q147_decontaminate_bloom": "bloom decontamination: ArrowEvalPython probe directly on the exploded gram stream, exact re-check join only over survivors",
    "q148_bloom_semi_join": "bloom semi join: Arrow probe on the fact scan (no fact exchange below it), BroadcastHashJoin LeftSemi re-check",
    "q150_winnow_clusters": "winnow-cluster pipeline: fingerprint equi-join pairs -> iterative CC (lineage-truncated, plan shows final round) -> cluster-keyed canonical window",
    "q152_exact_substring_spans": "exact-substring dedup (r10 de-skewed): gram-hash projection in the scan stage, map-side-partial groupBy(gram) aggregate (hot boilerplate grams absorbed in partial combine, never buffered in a window partition) joined back on the gram hash (one row per key — no fan-out, AQE-skew-splittable), doc-partitioned island merge whose groupBy reuses the exchange — 3 exchanges, one equi-join",
    "q154_retrieval_eval": "retrieval eval (r9): brute-force rank window over the broadcast query set, broadcast positives label join, one grouped integer aggregation",
    "q155_duplicated_run_report": "duplicated-run report (r9): one gram aggregation (count + distinct-docs + min-position in a single groupBy), TakeOrdered top-k, k-row broadcast join back for text slicing",
    "q157_quality_classifier": "linear text classifier (r10): gram generation + md5 bucketing in the scan projection, BROADCAST weight-table join on the exploded gram stream (no exchange below it), one map-side-combined (doc,label) aggregate, broadcast-tiny bias cross join, bounded per-doc argmax window; no EvalPython",
    "q158_temperature_mixture": "temperature mixture (r10): k-row count aggregate + k-row weight/alloc computation, broadcast alloc join onto the corpus scan, explode for epochs — no window, no big-table shuffle",
    "q159_fim_transform": "FIM transform (r10): md5 decision cut + salted 32-bit split points + segment slices + sentinel re-serialization, ALL inside the scan-stage projection — zero exchanges before the orderBy",
    "q161_token_weighted_mixture": "token-weighted mixture (r11): k-row SUM(token-count) mass aggregate, DECIMAL(38,0) take/cut arithmetic on the k-row side, broadcast alloc join onto the corpus scan, explode for epochs — no window, no big-table shuffle",
    "q162_dsir_select": "DSIR selection (r11): two map-side-combined bucket histograms (<= n_buckets rows out), bucket-sized full-outer weight join, broadcast weight/bias join onto the exploded gram stream, ONE (doc,label) aggregate, id join-back + scan-stage ln(u) acceptance; no EvalPython",
    "q163_gopher_quality": "Gopher rules (r11): every counter and verdict is a scan-stage expression (splits, HOF filters/aggregate, literal-replace deltas) — zero exchanges before the orderBy",
    "q164_c4_line_clean": "C4 cleaning (r11): line retention + page gates as one scan-stage projection; the filter form is a single pushable predicate — zero exchanges before the orderBy",
    "q165_contamination_report": "contamination report (r11): ONE corpus gram index feeds both map-side-combined aggregates (totals + hits), benchmark grams DISTINCT + broadcast — the corpus never shuffles for the probe",
    "q166_ccnet_buckets": "CCNet buckets (r11): unigram-LM scores -> ONE global range-sorted cumsum rank (window partitioned by __pid, never by lang) + broadcast k-row group offsets — per-language terciles with no language-keyed window",
    "q167_span_corruption": "span corruption (r11): md5 unit selection, run-boundary scans and both sentinel serializations are scan-stage higher-order array expressions, each intermediate single-evaluated in its own projected column — zero exchanges before the orderBy",
    "q168_sft_chat_spans": "SFT chat spans (r11): ONE conversation-keyed window carries the turn index and the prefix-sum offset (bounded groups), digest join is conv-keyed — no Python, no cartesian",
    "q170_k_anonymity": "k-anonymity (r11): map-side-combined quasi-identifier count + one join back; no window (a coarse bin can be corpus-sized)",
    "q171_preference_pairs": "preference pairs (r11): ONE max_by/min_by aggregate over (score, id) ordering structs — no window, no join, O(1) state per prompt",
    "q172_pack_best_fit": "SPFHP packing (r11): size-histogram aggregate (driver solve on counts), distributed per-size rank (range-partition cumsum, never a size-keyed window), broadcast range-table join for arithmetic assignment",
    "q175_t_closeness": "t-closeness (r11): one corpus cell aggregate, global distribution as a literal map (no second join), integer TV-EMD arithmetic on the cell table, null-safe join back — no window",
    "q177_mixture_of_denoisers": "UL2 denoiser mixture (r11): md5 route + routed per-position selection + shared masked-run serializer, ALL scan-stage — zero exchanges before the orderBy",
    "q178_sft_pack": "packed SFT (r12): conversation lengths from a PLAIN aggregate over the pre-window segment column (the span window never runs in that branch), distributed cumsum rank for the fixed-count assignment (pid window, never global), ONE bounded per-pack window for offsets, turn join-back; pack text = two bounded grouped aggregates",
    "q179_t_closeness_ordered": "ordered t-closeness (r12): one corpus cell aggregate, m-row domain index/cumsum window (bounded), broadcast group x domain grid whose per-group cumsum window partitions are m-bounded, null-safe join back — no corpus-sized window",
    "q180_best_of_n": "best-of-n (r12): ONE grouped collect+array_sort+slice aggregate over bounded prompt groups, Generate for ranks — no window, no join",
    "q182_epoch_budget": "epoch budgeting (r12): the k-row mass table localCheckpoints so totals AND takes read it (ONE corpus pass, not two), then scan-stage ppm/decay arithmetic on k rows",
    "q189_bpe_token_spans": "BPE token spans (r13): merge folds on the DISTINCT-field vocab only (the q132 rule), broadcast piece-length join, ONE per-doc grouped reassembly; span conversion itself is scan-stage array prefix arithmetic on the joined row — zero windows, no EvalPython",
    "q190_prefix_loss_dedup": "prefix-loss dedup (r13): per-message min-struct digest aggregate (map-side combined; output = distinct messages) + NULL-safe join back — no message-keyed window, so viral messages on corpus-many paths stay map-side; the tree fixture contributes the bounded frontier-walk joins",
    "q191_cross_source_neardups": "cross-source near-dups (r13): q29's band self-join for candidates with inline jaccard verify, slim id->source equi-joins on the pair set only, sources^2 cell aggregates — document bodies never reship",
    "q192_priority_dedup": "priority dedup (r13): ONE map-side min-struct aggregate per content hash (corpus-sized dup groups absorbed in partial combine), slim keep-set LeftSemi join back on the id — no window, text bytes shuffle only as 32-hex keys",
    "q193_leakage_safe_split": "leakage-safe split (r13): winnow edge set -> iterative CC (lineage-truncated; plan shows the final round) -> slim (node, comp) join back -> scan-stage md5 bucket cuts on coalesce(comp, id) — the split itself adds zero exchanges",
    "q194_dup_downweight": "soft dedup downweighting (r13): cluster sizes = one count over the pair-derived component table, broadcast (comp, weight) join onto the corpus scan, integer ppm div in the projection — no window, no body shuffle",
    "q195_neardup_decontam": "near-dup decontam (r13): one signature aggregate per side, corpus->bench band equi-join (never a cross join), candidate-only shingle-set joins, ONE map-side max-struct verdict aggregate, left join back to the corpus",
    "q196_pack_bpe_boundaries": "BPE pack boundaries (r13): the q188 boundary aggregate feeds the q189 converter — merge folds on the distinct-field vocab of PACK texts, broadcast piece-length join, per-pack grouped reassembly, scan-stage span arithmetic; composition adds zero new shuffle classes",
    "q197_line_dedup": "cross-doc line dedup (r13): two column-pruned posexplodes (frequency pass carries only md5(norm)+id, never the line body), countDistinct on the 32-char key, AQE-decided common-set join (never forced broadcast), one grouped conditional collect_list rebuild, distinct-id pass-through join",
}


def main() -> None:
    from nsl_kdd_spark.plans.catalog import QUERIES
    from nsl_kdd_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical plans of representative queries (sf0.001, AQE pre-execution)",
        "",
        "Generated by tools/dump_plans.py; regenerate after plan-affecting changes.",
        "The properties asserted in tests/test_plan_quality.py are visible here:",
        "pruned ReadSchema, PushedFilters, BroadcastHashJoin on dims, no EvalPython.",
        "",
    ]
    for name, why in PICKS.items():
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"*{why}*", "", "```"]
        out += plan.split("\n")[:120] + ["```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
