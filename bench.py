"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mssql_dataframe_spark import connect  # noqa: E402
from mssql_dataframe_spark import queries as Q  # noqa: E402

HEADLINE = [
    # TPC-H-ish read path
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q4_order_priority",
    "q7_volume_shipping",
    "q14_promo_revenue",
    "q9_product_profit",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q21_waiting_suppliers",
    # window / agg surface
    "window_top3_orders_per_customer",
    "window_moving_avg_frames",
    "rollup_lineitem_status",
    "grouping_sets_revenue",
    "distinct_aggregates",
    # joins
    "asof_join_events_orders",
    "broadcast_join_brand_volume",
    # sources & UDF surface
    "source_csv_roundtrip",
    "pandas_udf_embedding_norm",
    # streaming
    "streaming_tumbling_counts",
    # mutation verbs on the COW store (update/SCD2 track the pruned-
    # rewrite path's wall clock, not just insert/upsert)
    "verb_insert_read",
    "verb_merge_upsert",
    "verb_update",
    "verb_merge_scd2",
    # LLM-pipeline operators
    "dedup_exact_text",
    "minhash_dedup_pairs",
    "dedup_cluster_survivors",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "fuzzy_join_names",
    "embedding_semantic_dedup",
    "exact_substring_dup_pairs",
    "text_quality_features",
    "text_tfidf_top_terms",
    "unigram_logprob_quality",
    "embedding_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "kmeans_codebook_train",
    "scd2_point_in_time_join",
    # multimodal (real PPM/BMP/WAV codecs over mapInPandas)
    "multimodal_resize",
    "multimodal_audio_features",
    # training-dataset assembly & curation gate
    "pack_sequences_budget",
    "dataset_split_hash",
    "stratified_sample_lang",
    "corpus_quality_filter",
    # round-5 session 2 additions: iterative graph, exact-ANN scale
    # path, runtime-filtered join, BPE training, fuzzy decontam,
    # predicate DELETE on the store
    "pagerank_customer_supplier",
    "embedding_topk_exact_scalable",
    "bloom_filter_join_prune",
    "tokenizer_learn_merges",
    "decontamination_fuzzy",
    "verb_delete_where",
    "pipeline_training_mixture",
    "temperature_resample_lang",
    "timeseries_ewma_quantized",
]

# Post-r6 additions, benched SEPARATELY (VERDICT r11 #2): the 57-entry
# HEADLINE list is frozen for round-over-round continuity, so a perf
# regression in the newest operator families (incremental-MV
# maintenance, the stream->MV loop, bloom-index reads, IVF-PQ, CCNet
# perplexity buckets, the PIT left-join contract) would be invisible
# to BENCH files. This list carries them with its own total — never
# merged into the headline number.
SUPPLEMENTARY = [
    "mv_minmax_partial_rescan",
    "mv_distinct_count_two_level",
    "mv_topk_maintenance",
    "streaming_incremental_mv",
    "verb_bloom_index_read",
    "ivfpq_adc_search",
    "corpus_perplexity_buckets",
    "pit_left_unmatched_facts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = connect(app_name="bench")

    # session warmup: initialize the JVM, codegen, shuffle and parquet
    # reader paths once so the first timed query measures the query,
    # not SparkSession bring-up (touches no benchmark table data)
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v").groupBy(
        "k"
    ).sum("v").collect()

    # per-query median of N runs post-warmup: the first run of a query
    # absorbs its codegen/compile cost, so a single-shot number mixes
    # fixed JVM overhead into the data-scaled signal and round-over-
    # round regressions aren't attributable. The p50 is the steady-
    # state cost.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    def time_list(names: list[str]) -> tuple[dict, dict]:
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name in names:
            samples: list[float] = []
            # per-query fault isolation: one broken query must not
            # erase the round's entire perf signal — record it and
            # keep timing the rest (the registry lookup sits INSIDE
            # the guard too: a renamed entry must degrade to one ERROR
            # line, not a KeyError that erases every other timing)
            try:
                fn = Q.REGISTRY[name]["fn"]
                for _ in range(runs):
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    # force FULL execution through the noop sink:
                    # count() lets Catalyst column-prune deterministic
                    # pandas-UDF / window projections, timing only the
                    # parquet scan for projection-shaped entries — the
                    # noop DataSource evaluates every output column
                    # with zero driver transfer (no collect/
                    # serialization skew)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
                    # drop persisted intermediates (LSH signatures
                    # etc.) so runs don't inherit each other's cache
                    # pressure
                    spark.catalog.clearCache()
            except Exception as exc:  # noqa: BLE001 — harness boundary
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
                spark.catalog.clearCache()
                continue
            timings[name] = round(statistics.median(samples), 3)
            spread = ", ".join(f"{s:.3f}" for s in samples)
            print(
                f"# {name}: p50 {timings[name]}s of [{spread}]",
                file=sys.stderr,
            )
        return timings, errors

    timings, errors = time_list(HEADLINE)
    supp_timings, supp_errors = time_list(SUPPLEMENTARY)

    total = round(sum(timings.values()), 3)
    out = {
        # the headline metric stays the FROZEN 57-entry list so the
        # round-over-round series remains comparable; the post-r6
        # operators ride along under their own separately-summed keys
        "metric": "headline_queries_total_wall_clock_p50",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "supplementary_queries": supp_timings,
        "supplementary_total": round(sum(supp_timings.values()), 3),
        "runs_per_query": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors or supp_errors:
        # the totals exclude errored queries by construction — flag it
        # so a crash-lowered total is never misread as a win
        out["errors"] = {**errors, **supp_errors}
        out["incomplete"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
