"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), local[$SPARK_GRAFT_CPUS]. Prints ONE SHORT JSON line to stdout
(guaranteed < 2 KB — the driver's output capture truncated round 2's
135-entry line, costing the round its official number):
{"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
 "n_queries": N, "queries": {top-10 heaviest only},
 "detail": "BENCH_DETAIL.json"}

The FULL per-query map (medians + minima for every headline query) is
written to the BENCH_DETAIL.json sidecar, and per-query minima are
folded monotonically into BENCH_MINIMA.json (keyed by sf — minima at
different scale factors are not comparable). Minima are the stable
cross-round signal on this bursty shared box (BASELINE.md); --compare
prefers them over any single round's medians.

Each query is forced end-to-end with the noop sink (full computation, no
driver collection). One warmup of a trivial action first so JVM/codegen
startup isn't billed to the first query. Per-query numbers are the
MEDIAN of $SPARK_GRAFT_BENCH_PASSES (default 3) interleaved passes —
robust to one-off JIT/GC/page-cache noise on a shared box, unlike min
(which hides steady-state regressions) or mean (which a single stall
poisons).

--compare PATH: diff per-query against a previous benchmark document —
a BENCH_DETAIL.json sidecar, a driver-recorded BENCH_r*.json (including
ones whose "parsed" is null), or BENCH_MINIMA.json — and report >1.5x
regressions/improvements to stderr (stdout stays the one JSON line the
driver parses). With no PATH after --compare, defaults to
BENCH_MINIMA.json next to this script.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cancer_survival_etl_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "supplier_rank_quartile",
    "a4_percentile_disc",
    "w1_rank_window",
    "r2_pivot_sum",
    "benchmark_standards",
    "events_tumbling",
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard",
    "ann_brute_force",
    "text_quality",
    "lang_id",
    "win_running_sum",
    "skew_salted_agg",
    "dedup_embedding",
    "sketch_approx_distinct",
    "quality_profile",
    "events_asof",
    "events_range_join",
    "rollup_agg",
    "global_topk",
    "dataset_split",
    "dedup_lsh_pipeline",
    "dedup_lsh_quality",
    "text_decontaminate",
    "text_fuzzy_decontaminate",
    "web_url_dedup",
    "text_chunk",
    "text_pack_bins",
    "text_boilerplate",
    "text_tfidf",
    "events_rollup",
    "stats_zscore",
    "stats_corr",
    "stats_regression",
    "stats_theil_sen",
    "stats_mann_kendall",
    "stats_histogram",
    "quality_expectations",
    "quality_benford",
    "stats_gini",
    "stats_entropy",
    "stats_trimmed_mean",
    "win_distinct_count",
    "shipping_priority",
    "model_score",
    "events_json_props",
    "events_funnel",
    "dataset_mixture",
    "zorder_values",
    "tokenizer_bpe",
    "tokenizer_bpe_encode",
    "tokenizer_bpe_bytes_encode",
    "tokenizer_unigram_encode",
    "tokenizer_vocab_coverage",
    "text_suffix_repeat",
    "custdist",
    "big_orders",
    "suppliers_kept_waiting",
    "sketch_kmv_distinct",
    "text_repetition",
    "order_priority_check",
    "forecast_revenue",
    "volume_shipping",
    "market_share",
    "returned_items",
    "shipmode_priority",
    "promo_revenue",
    "top_supplier",
    "small_qty_revenue",
    "disjunctive_brand_revenue",
    "dedup_spans",
    "embedding_quantize",
    "embedding_matryoshka",
    "snapshot_diff",
    "weighted_sample",
    "graph_pagerank",
    "multimodal_headers",
    "multimodal_audio",
    "multimodal_pcm",
    "multimodal_bmp",
    "multimodal_decode",
    "multimodal_ppm",
    "multimodal_gif",
    "multimodal_video",
    "text_normalize",
    "local_supplier_revenue",
    "min_cost_supplier",
    "product_profit",
    "important_parts",
    "supplier_part_counts",
    "excess_suppliers",
    "events_gap_fill",
    "events_scd2",
    "dataset_stratified",
    "bm25_topk",
    "lm_score",
    "dsir_weights",
    "hybrid_search",
    "record_linkage",
    "incremental_agg",
    "events_anomaly",
    "events_cusum",
    "events_seasonal",
    "stats_psi_drift",
    "bloom_decontaminate",
    "hierarchy_closure",
    "corpus_shuffle",
    "heavy_hitters",
    "events_cohort",
    "events_attribution",
    "stats_chi_square",
    "events_transitions",
    "key_skew_profile",
    "corpus_ccnet_buckets",
    "events_pattern",
    "stats_winsorize",
    "events_journeys",
    "stats_robust_scale",
    "ann_pq_adc",
    "ann_ivfpq_percell",
    "stats_ks",
    "stats_mutual_info",
    "eval_pr_auc",
    "stats_bootstrap_ci",
    "corpus_source_overlap",
    "stats_ks_by",
    "eval_pr_auc_by",
    "dedup_keep_best",
    "dedup_semantic",
    "ann_hard_negatives",
    "stats_ols_multi",
    "stats_auc",
    "retrieval_diversify",
    "retrieval_mmr",
    "eval_calibration",
    "eval_ndcg",
    "eval_kappa",
    "eval_rouge",
    "eval_bleu",
    "eval_confusion",
    "dataset_group_kfold",
    "stats_js_divergence",
    "dedup_containment",
    "stats_cuped",
    "linkage_golden",
    "sketch_hll_rollup",
    "sketch_kll_rollup",
    "sketch_theta_overlap",
    "stats_spearman",
    "stats_welch",
    "stats_rank_sum",
    "stats_bh_adjust",
    "graph_triangles",
    "model_train_logistic",
    "eval_isotonic",
    "eval_isotonic_unbinned",
    "join_size_estimate",
    "text_hashed_features",
    "embedding_drift",
    "stats_kendall",
    "stats_kendall_weighted",
    "events_rolling_distinct",
    "dataset_temperature",
    # round-4 session additions: the survival flagship family +
    # the new exact-oracle operators
    "survival_km",
    "survival_cif",
    "survival_net_std",
    "survival_excess_model",
    "survival_rmst",
    "events_rfm",
    "events_cdc_apply",
    "embedding_pca",
    "ann_pca_topk",
    "sketch_countmin",
    "stats_kruskal",
    "stats_anova",
    "text_readability",
    "graph_kcore",
    # round-5: full batch registry coverage (VERDICT r04 item 5)
    "survival_index",
    "survival_logrank",
    "survival_cox",
    "survival_relative",
    "survival_net_pp",
    "survival_conditional",
    "survival_actuarial",
    "survival_median",
    "survival_diff",
    "rates_ratio",
    "rates_age_standardized",
    "tokenizer_wordpiece_encode",
    "ann_binary_hamming",
    "model_train_quantile",
    "eval_platt",
    "stats_ridge",
    "stats_cliffs",
    "survival_flexible_model",
    "stats_winsorize_approx",
    "ann_opq_adc",
    "survival_km_delayed",
    "survival_cox_efron",
    "stats_poisson_glm",
    "survival_logrank_strat",
    "survival_cox_strat",
    "survival_ph_test",
    "survival_fine_gray",
    "survival_relative_e1",
    "survival_cox_baseline",
    "survival_period",
    "survival_conditional_net",
    "survival_crude_prob",
    "model_train_als",
    "text_pmi_pairs",
    "stats_did",
    "stats_msprt",
    "survival_net_pp_ci",
    "survival_smr",
    "embedding_procrustes",
    "survival_cox_hr",
    "stats_poisson_dispersion",
    "survival_relative_hak",
    "survival_rmst_net",
    "survival_index_net",
    "vocab_topk",
    "ann_ivf_kmeans",
    "dataset_cap_per_key",
    "corpus_zipf_fit",
    "dataset_leakage_safe_split",
    "idle_rich_customers",
    "corpus_curation",
    "conditional_agg",
    "sketch_quantiles",
    "sketch_sample_quantiles",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "ann_ivf",
    "ann_lsh",
    "text_token_stats",
    "text_bpe_tokens",
    "fingerprint",
    "text_pii",
    "events_sliding",
    "events_sessionize",
    "p1_filter_disjunctive",
    "p2_membership_flags",
    "p3_null_semantics",
    "p4_negated_conjunctive",
    "p6_projection_rename",
    "f_string_surgery",
    "f_concat_key",
    "f_case_sort_keys",
    "j1_left_join_const",
    "a1_groupby_all_max",
    "a2_count_per_group",
    "a3_minmax_benchmark",
    "a4b_percentile_cont",
    "u1_union_best_scaffold",
    "u3_row_duplication",
    "r1_unpivot",
    "win_lag_delta",
    "win_topk",
    "win_ntile",
    "skew_salted_join",
    "semi_join",
    "anti_join",
    "cube_agg",
    "grouping_sets_agg",
    "set_intersect",
    "set_except",
    "correlated_scalar",
    "string_agg_group",
    "win_percent_rank",
    "win_range_frame",
    "win_first_last",
    "lateral_explode",
    "quality_dup_grains",
    # round-6 additions
    "survival_gray_test",
    "survival_aalen_johansen",
    "survival_cox_td",
    "sketch_kll_incremental",
    "survival_lyl",
    "survival_logrank_fh",
    "survival_cif_ci",
    "stats_poisson_robust",
    "stats_negbin_glm",
    "stats_mantel_haenszel",
    "survival_median_ci",
    "stats_breslow_day",
    "stats_cochran_armitage",
    "survival_logrank_trend",
    # round-7 additions
    "survival_km_turnbull",
    "survival_aalen_additive",
    "survival_fine_gray_ci",
    "survival_cox_spline",
    "rates_apc",
    "survival_lexis",
    "stats_cuzick",
    "survival_prevalence",
    "survival_ipw_km",
    "stats_conditional_logistic",
    "rates_joinpoint",
    "survival_flexible_allcause",
    "stats_mcnemar",
    # round-8 additions
    "rates_joinpoint_k",
    "survival_aipw_contrast",
    "survival_relative_lt",
    "survival_rp_td",
    "survival_ipcw_km",
    "survival_aipcw_contrast",
    "stats_firth_logistic",
    "survival_direct_adjusted",
    "survival_cindex",
    "survival_cure_mixture",
    "survival_km_band",
    "stats_zip",
    "survival_cindex_uno",
    "survival_brier",
    "survival_rmst_ci",
    "survival_logrank_renyi",
    "survival_rmtl",
    "stats_gee",
    "survival_auc_td",
    "survival_calibration",
    "demography_life_table",
    "stats_meta_dl",
    "survival_frailty",
    "rates_cumulative_risk",
    "survival_cox_robust",
    "survival_fine_gray_strat",
    "survival_fine_gray_robust",
    "survival_mcf",
    "rates_paf",
    "survival_weibull_aft",
    "survival_pwe",
    "stats_ordinal",
    "stats_tmle",
    "stats_fisher_exact",
    "stats_bayes_ab",
    "stats_tost",
    "eval_qini",
    "stats_cronbach",
    "stats_psm",
    "stats_multinomial",
    "survival_ibs",
    "quality_funnel",
    "events_asof_nearest",
    "survival_loglogistic_aft",
    "survival_gray_strat",
    "survival_cox_ag",
    "events_absorbing",
    "rates_apc_drift",
    "stats_signed_rank",
    "stats_friedman",
    # round-10 session additions: period net survival, RP excess
    # hazard, multiple imputation
    "survival_net_period",
    "survival_rp_excess",
    "stats_mi_rubin",
    "survival_net_cond_ci",
    "stats_quantile_reg",
    # round-10 late tranche: multistate AJ, net-survival inference,
    # binary repeated measures, confounding sensitivity, cure twin
    "survival_illness_death",
    "stats_cochran_q",
    "stats_evalue",
    "survival_net_gap",
    "survival_net_logrank",
    "survival_cure_nonmix",
]

REGRESSION_RATIO = 1.5
REPO_DIR = os.path.dirname(os.path.abspath(__file__))
DETAIL_PATH = os.path.join(REPO_DIR, "BENCH_DETAIL.json")
MINIMA_PATH = os.path.join(REPO_DIR, "BENCH_MINIMA.json")


def _baseline_maps(doc: dict, sf_key: str) -> tuple[dict, dict | None]:
    """Extract (queries, queries_min) from any benchmark document shape:
    a bench.py stdout line, a BENCH_DETAIL.json sidecar, a driver
    BENCH_r*.json wrapper (whose "parsed" may be null when the capture
    window truncated the line — ADVICE r2), or a BENCH_MINIMA.json
    ({"sf0.1": {name: sec}})."""
    # "parsed" present-but-null must fall back to the top-level doc
    parsed = doc.get("parsed") or doc
    base = doc.get("queries") or parsed.get("queries") or {}
    base_min = doc.get("queries_min") or parsed.get("queries_min")
    if not base and not base_min and sf_key in doc:
        # minima-file shape: per-sf maps of name -> min seconds
        base_min = doc[sf_key]
    return base, base_min


def load_classified() -> dict[str, str]:
    """Floor-governance map (VERDICT r09 item 3): BENCH_MINIMA.json's
    top-level "classified" key maps query -> SCALE.md anchor for flags
    that have already been adjudicated (deliberate correctness trades,
    reproducible new floors, inter-VM ambient variance). Classified
    queries are reported SEPARATELY from genuine new regressions so a
    flag that was litigated in SCALE.md stops reappearing every round.
    The floors themselves stay monotonic — classification changes
    reporting, never the recorded minima."""
    if not os.path.exists(MINIMA_PATH):
        return {}
    try:
        with open(MINIMA_PATH) as fh:
            doc = json.load(fh)
    except (json.JSONDecodeError, OSError):
        return {}
    cls = doc.get("classified", {})
    return cls if isinstance(cls, dict) else {}


def update_minima(mins: dict[str, float], sf_key: str) -> dict[str, float]:
    """Fold this run's per-query minima into MINIMA_PATH monotonically
    (only ever decreasing), keyed by sf. Returns the updated map."""
    doc: dict[str, dict[str, float]] = {}
    if os.path.exists(MINIMA_PATH):
        try:
            with open(MINIMA_PATH) as fh:
                doc = json.load(fh)
        except (json.JSONDecodeError, OSError):
            doc = {}
    cur = doc.setdefault(sf_key, {})
    for name, took in mins.items():
        prev = cur.get(name)
        if prev is None or took < prev:
            cur[name] = took
    with open(MINIMA_PATH, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    return cur


def compare(
    timings: dict[str, float],
    baseline_path: str,
    mins: dict[str, float] | None = None,
    sf_key: str = "sf0.1",
) -> None:
    with open(baseline_path) as fh:
        doc = json.load(fh)
    base, base_min = _baseline_maps(doc, sf_key)
    # compare minima when both sides recorded them — medians flag
    # ambient bursts as regressions on this box (verified; BASELINE.md)
    cur = timings
    if base_min and mins:
        base, cur = base_min, mins
    classified = load_classified()
    flagged = []
    adjudicated = []
    for name, took in sorted(cur.items()):
        prev = base.get(name)
        if prev is None or prev <= 0:
            continue
        ratio = took / prev
        if ratio > REGRESSION_RATIO:
            if name in classified:
                adjudicated.append((name, prev, took, ratio))
            else:
                flagged.append((name, prev, took, ratio, "REGRESSION"))
        elif ratio < 1 / REGRESSION_RATIO:
            flagged.append((name, prev, took, ratio, "improved"))
    print(
        f"-- compare vs {baseline_path}: {len(flagged)} queries moved "
        f">{REGRESSION_RATIO}x of {sum(1 for n in cur if n in base)} "
        f"shared ({len(adjudicated)} classified flags reported below)",
        file=sys.stderr,
    )
    for name, prev, took, ratio, tag in flagged:
        print(
            f"   {tag:>10} {name}: {prev:.3f}s -> {took:.3f}s ({ratio:.2f}x)",
            file=sys.stderr,
        )
    if adjudicated:
        print(
            "-- classified flags (already adjudicated in SCALE.md; not "
            "regressions):",
            file=sys.stderr,
        )
        for name, prev, took, ratio in adjudicated:
            print(
                f"   classified {name}: {prev:.3f}s -> {took:.3f}s "
                f"({ratio:.2f}x) [{classified[name]}]",
                file=sys.stderr,
            )


def family_match(name: str, families: list[str]) -> bool:
    """True iff ``name`` IS a listed family or extends one at an
    underscore boundary — `--family survival_cox` picks survival_cox
    and survival_cox_td but `--family s` matches nothing s-prefixed
    (the documented 'comma-separated query-name prefixes' contract;
    the looser bare-startswith alternative was dropped, ADVICE r06)."""
    return any(name == f or name.startswith(f + "_") for f in families)


def main() -> None:
    args = sys.argv[1:]
    baseline_path = None
    if "--compare" in args:
        i = args.index("--compare")
        if i + 1 < len(args) and not args[i + 1].startswith("-"):
            baseline_path = args[i + 1]
        else:
            baseline_path = MINIMA_PATH

    # --family shard mode: re-bench only the named families (comma-
    # separated query-name prefixes, e.g. --family survival,sketch).
    # Minima still fold monotonically (per-query, so a subset run can
    # only tighten floors); the full-run artifacts are NOT clobbered —
    # the shard writes its detail to BENCH_DETAIL_family.json and its
    # stdout metric is marked "families" so the driver's official
    # number always comes from a full run.
    families: list[str] | None = None
    if "--family" in args:
        i = args.index("--family")
        if i + 1 >= len(args) or args[i + 1].startswith("-"):
            raise SystemExit(
                "--family needs a comma-separated prefix list, "
                "e.g. --family survival,sketch"
            )
        families = [f.strip() for f in args[i + 1].split(",") if f.strip()]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    headline = HEADLINE
    if families:
        headline = [n for n in HEADLINE if family_match(n, families)]
        if not headline:
            raise SystemExit(
                f"--family {','.join(families)} matches no headline query"
            )

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warmup: touch the fact table so first-query numbers are query cost,
    # not JVM spin-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    samples: dict[str, list[float]] = {name: [] for name in headline}

    def drop_persisted() -> None:
        # several operators localCheckpoint narrow shared frames;
        # without explicit release the blocks accumulate across the
        # headline queries and storage-memory pressure bleeds into
        # later timings
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for _ in range(passes):
        for name in headline:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
            drop_persisted()

    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    mins = {name: round(min(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    sf_key = f"sf{sf}" if sf is not None else "sf?"

    # Full per-query maps go to the sidecar — NOT stdout. Round 2's
    # 135-entry stdout line (~3.6 KB) outgrew the driver's ~2.2 KB
    # capture window and the round lost its official number.
    detail_path = (
        os.path.join(REPO_DIR, "BENCH_DETAIL_family.json")
        if families
        else DETAIL_PATH
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "passes": passes,
                "queries": timings,
                # per-query minima: the stable cross-round signal on a
                # bursty shared box (medians inflate when a co-tenant
                # burst lands mid-pass; minima reproduce run-to-run —
                # see BASELINE.md measurements)
                "queries_min": mins,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    all_time_mins = update_minima(mins, sf_key)

    top10 = dict(
        sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": top10,
        "detail": os.path.basename(detail_path),
    }
    if families:
        # shard runs are explicitly marked: never an official number
        payload["families"] = families
    line = json.dumps(payload)
    assert len(line) < 2000, f"stdout line {len(line)}B breaches capture window"
    print(line)
    if baseline_path:
        compare(timings, baseline_path, mins, sf_key)
    else:
        # always surface movement vs the all-time minima to stderr —
        # classified flags (floor governance, VERDICT r09 item 3) are
        # counted separately so only genuine new flags draw attention
        classified = load_classified()
        over = [
            n
            for n, t in mins.items()
            if n in all_time_mins and t > all_time_mins[n] * REGRESSION_RATIO
        ]
        fresh = [n for n in over if n not in classified]
        print(
            f"-- {len(fresh)} UNCLASSIFIED queries >{REGRESSION_RATIO}x "
            f"above all-time minima ({len(over) - len(fresh)} classified; "
            f"{MINIMA_PATH})",
            file=sys.stderr,
        )
        for n in fresh:
            print(
                f"   unclassified {n}: floor {all_time_mins[n]:.3f}s -> "
                f"min {mins[n]:.3f}s",
                file=sys.stderr,
            )
    spark.stop()


if __name__ == "__main__":
    main()
