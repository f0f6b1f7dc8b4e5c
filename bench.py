"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO stdout lines: an early `BENCH_FULL {...}` line carrying the
complete per-query record, then a FINAL compact JSON line (<=1500
chars) that fits the driver's 2000-char stdout tail capture:
{"metric": "...", "value": N, "unit": "sec", "total_min": N,
 "supplementary_total": N, "runs_per_query": N, "sf": ...,
 "host_noisy": bool, "sentinel_ratios": {...}, "top5_slowest": {...}}
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

# Host-noise self-certification (VERDICT r12 #2). The r12 session's
# 1.63x "regression" was a degraded host, not code — proving that
# cost a full judge-side re-measurement cycle because nothing in the
# artifact recorded host state. Two sentinel queries whose code and
# plan have been untouched since round 4 carry recorded quiet-session
# medians (p50 across the r04-r11 BENCH_LOCAL files; the noisy r12
# session showed 1.25x/1.47x on exactly these): if either deviates
# >1.3x, or the 1-minute load average exceeds 2 before the bench has
# spawned any work, the output flags host_noisy=true so a shifted
# total is never misread as a code regression.
SENTINELS = {
    "q7_volume_shipping": 1.009,
    "source_csv_roundtrip": 0.289,
}
SENTINEL_TOLERANCE = 1.3
PRE_LOAD_LIMIT = 2.0


def _read_proc_stat() -> dict[str, int] | None:
    """First `cpu` line of /proc/stat as named jiffy counters."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
    except OSError:
        return None
    names = [
        "user", "nice", "system", "idle", "iowait",
        "irq", "softirq", "steal",
    ]
    return dict(zip(names, (int(v) for v in parts[1:1 + len(names)])))


def _proc_stat_delta(pre: dict | None, post: dict | None) -> dict | None:
    if not pre or not post:
        return None
    delta = {k: post[k] - pre[k] for k in pre}
    total = sum(delta.values())
    if total > 0:
        delta["busy_frac"] = round(1.0 - delta["idle"] / total, 4)
    return delta


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # sample host state BEFORE the JVM spawns: at this point any load
    # is someone else's, so loadavg > PRE_LOAD_LIMIT is a clean
    # foreign-noise signal (after bring-up the bench's own 32 threads
    # dominate and the number stops being attributable)
    try:
        load_pre = tuple(round(v, 2) for v in os.getloadavg())
    except OSError:
        load_pre = None

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

    def time_list(names: list[str]) -> tuple[dict, dict, dict]:
        timings: dict[str, float] = {}
        minima: dict[str, float] = {}
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
            # per-query MIN alongside p50 (VERDICT r13 #7): minima are
            # far more robust to foreign host load — the floor tracks
            # code changes even when the medians are noise-inflated
            minima[name] = round(min(samples), 3)
            spread = ", ".join(f"{s:.3f}" for s in samples)
            print(
                f"# {name}: p50 {timings[name]}s of [{spread}]",
                file=sys.stderr,
            )
        return timings, minima, errors

    stat_pre = _read_proc_stat()
    timings, minima, errors = time_list(HEADLINE)
    stat_mid = _read_proc_stat()
    supp_timings, supp_minima, supp_errors = time_list(SUPPLEMENTARY)
    stat_post = _read_proc_stat()
    try:
        load_post = tuple(round(v, 2) for v in os.getloadavg())
    except OSError:
        load_post = None

    # sentinel ratios vs the recorded quiet-session medians: these two
    # queries' code and plans are frozen, so a uniform shift here is
    # host state, not this round's changes
    sentinel_ratios = {
        name: round(timings[name] / median, 3)
        for name, median in SENTINELS.items()
        if name in timings
    }
    noisy_load = load_pre is not None and load_pre[0] > PRE_LOAD_LIMIT
    noisy_sentinel = any(
        r > SENTINEL_TOLERANCE for r in sentinel_ratios.values()
    )
    host_noisy = bool(noisy_load or noisy_sentinel)
    print(
        f"# host: load_pre={load_pre} load_post={load_post} "
        f"sentinel_ratios={sentinel_ratios} host_noisy={host_noisy}",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    full = {
        # the headline metric stays the FROZEN 57-entry list so the
        # round-over-round series remains comparable; the post-r6
        # operators ride along under their own separately-summed keys
        "metric": "headline_queries_total_wall_clock_p50",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # min-of-runs series alongside p50 (VERDICT r13 #7): per-query
        # floors are noise-robust — on a loaded host the minima still
        # track code changes while medians absorb foreign CPU
        "queries_min": minima,
        "total_min": round(sum(minima.values()), 3),
        "supplementary_queries": supp_timings,
        "supplementary_queries_min": supp_minima,
        "supplementary_total": round(sum(supp_timings.values()), 3),
        "runs_per_query": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-noise self-certification (VERDICT r12 #2): see the
        # SENTINELS comment for the recorded-median provenance
        "host": {
            "load_pre": load_pre,
            "load_post": load_post,
            "proc_stat_delta_headline": _proc_stat_delta(
                stat_pre, stat_mid
            ),
            "proc_stat_delta_supplementary": _proc_stat_delta(
                stat_mid, stat_post
            ),
        },
        "sentinel_ratios": sentinel_ratios,
        "host_noisy": host_noisy,
    }
    if errors or supp_errors:
        # the totals exclude errored queries by construction — flag it
        # so a crash-lowered total is never misread as a win
        full["errors"] = {**errors, **supp_errors}
        full["incomplete"] = True

    # The driver captures only the LAST 2000 characters of stdout, so
    # the 57+8-entry per-query dict no longer fits on the final line
    # (BENCH_r12/r13 recorded parsed=null; VERDICT r13 #2). Emit the
    # FULL record on an EARLY stdout line (prefixed so humans can grep
    # it, still one JSON object after the marker) and finish with a
    # compact line that always fits the tail capture.
    print("BENCH_FULL " + json.dumps(full))
    # The final line carries the FULL per-query dict (the driver
    # contract names it), made to fit the tail by compact separators
    # and 2-decimal seconds: 57 entries ≈ 1730 chars with the
    # host-noise fields, ~1900 all-in — inside the 2000-char capture
    # with margin. The lossless 3-decimal series stays on BENCH_FULL.
    compact = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": full["sf"],
        "supplementary_total": full["supplementary_total"],
        "runs_per_query": runs,
        "host_noisy": host_noisy,
        "sentinel_ratios": sentinel_ratios,
        "n_errors": len(errors) + len(supp_errors),
    }
    line = json.dumps(compact, separators=(",", ":"))
    # hard guarantee: the driver tail is 2000 chars; if the registry
    # ever grows the queries dict past the margin, shed the
    # supplementary fields first (they are all on BENCH_FULL), and as
    # a last resort round to 1 decimal — never drop the queries dict
    if len(line) > 1900:
        for k in ("sentinel_ratios", "runs_per_query",
                  "supplementary_total"):
            compact.pop(k, None)
            line = json.dumps(compact, separators=(",", ":"))
            if len(line) <= 1900:
                break
    if len(line) > 1900:
        compact["queries"] = {
            k: round(v, 1) for k, v in timings.items()
        }
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # absolute last resort (ADVICE r14): a grown registry must
        # still yield VALID JSON inside the driver's 2000-char tail —
        # fall back to the top-N-slowest dict, shrinking N until the
        # line fits (the lossless record is on BENCH_FULL above)
        n = len(timings)
        while n > 1 and len(line) > 1900:
            n -= 5
            compact["queries"] = {
                k: round(v, 1)
                for k, v in sorted(
                    timings.items(), key=lambda kv: -kv[1]
                )[:max(n, 1)]
            }
            compact["queries_truncated_to_top_n"] = max(n, 1)
            line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
