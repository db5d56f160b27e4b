"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is timed as a full action (count of the result) after a session
warm-up, so JVM/codegen startup is excluded but each query's own scan,
shuffle, and aggregation are included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_workflows_spark.queries import QUERIES
from etl_workflows_spark.session import get_spark

# Headline set: scan-agg, broadcast+shuffle joins, snowflake, window, event
# ops, and the LLM-pipeline scale paths. (The O(n²) brute-force twins are
# deliberately absent — they exist as correctness oracles, not scale paths.)
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_left_fill",
    "window_topk_per_group",
    "window_running_sum",
    "topk_orders",
    "set_ops",
    "events_hourly",
    "sessionize",
    "asof_last_click",
    "cohort_retention",
    "funnel_conversion",
    "doc_stats",
    "token_frequencies",
    "dedup_exact",
    "near_dup_minhash_lsh",
    "near_dup_prefix_filter",
    "ann_cosine_topk",
    "pipeline_doc_curation",
    # round-2 scale paths
    "events_multigrain_rollup",
    "repetition_signals",
    "pack_sequences",
    "profile_documents",
    # round-2 continuation: curation + time-series scale paths
    "pii_redaction",
    "decontaminate_overlap",
    "chunk_windows",
    "quality_gate",
    "events_gap_fill",
    "events_hourly_anomaly",
    # round-3 scale paths: sketch-bounded frequent items, layout-key
    # computation, stream-stream attribution shape (batch twin),
    # broadcast knn join, ordered-collect sequence mining
    "heavy_hitter_tokens",
    "zorder_keys_parts",
    "attribution_view_purchase",
    "knn_join_bench_fast",
    "user_journey_pattern",
    # round-4: single-partition-free total-order ops, retrieval,
    # mixture/selection, temporal join
    "epoch_shuffle_docs",
    "budget_select_docs",
    "bm25_topk_docs",
    "hybrid_rrf_docs",
    "blend_sources_docs",
    "purchase_state_temporal_join",
    "bpe_encode_docs",
    "purchase_click_interval_join",
    "split_leakage_audit",
    # round-4 continuation: substring-span dedup, deletion-variant
    # fuzzy matching
    "duplicated_spans_docs",
    "excise_spans_docs",
    "fuzzy_name_pairs",
    "pipeline_curation_v2",
    # round-4 continuation: link authority, importance resampling,
    # bloom dedup firewall
    "link_graph_pagerank",
    "dsir_weights_docs",
    "bloom_firewall_docs",
    "cms_token_freq_docs",
    "pipeline_curation_v3",
    # round-4 continuation: corpus statistics (cross-source overlap via
    # fingerprint self-join, two-level lexical-diversity agg, vocabulary
    # coverage curve, label-centroid drift, CUSUM change-point)
    "dup_overlap_sources",
    "lexical_diversity_docs",
    "vocab_coverage_docs",
    "embedding_label_drift",
    "events_cusum_changepoint",
    "ngram_novelty_docs",
    "token_entropy_sources",
    # round-4: recurring fact⋈fact join over bucketed storage (the
    # one-time bucketed write lands in the untimed warmup), two-stage
    # retrieval, SFT rendering, inference batching
    "bucketed_join_revenue",
    "rerank_bm25_topk",
    "sft_render_docs",
    "score_documents_batched",
    # round-4 continuation: duplicate down-weighting (one fingerprint-
    # window shuffle), dataloader shard assignment (bucketed prefix sum)
    "soft_dedup_docs",
    "token_shards_docs",
    # round-5: embedding-space dedup scale paths + corpus-trained LMs
    "embedding_near_dup_banded",
    "semantic_dedup_embeddings",
    "lm_perplexity_docs",
    "charlm_scores_docs",
]


# Scaled pass (×10 replication of $SPARK_GRAFT_SF_DIR ≈ sf1): the most
# expensive headline queries re-timed where data, not plan launch,
# dominates (BASELINE.md: at sf0.1 most entries measure ~0.15-0.2 s of
# launch floor). Disable with SPARK_GRAFT_SCALED=0.
SCALED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_topk_per_group",
    "events_hourly",
    "sessionize",
    "doc_stats",
    "dedup_exact",
    "near_dup_minhash_lsh",
    "near_dup_prefix_filter",
    "heavy_hitter_tokens",
    "pipeline_doc_curation",
    "decontaminate_overlap",
    # round-4: the bucketed total-order rewrite, query-term-restricted
    # BM25, and line-frequency boilerplate removal under 10× data
    "epoch_shuffle_docs",
    "bm25_topk_docs",
    "boilerplate_removal_docs",
    "purchase_click_interval_join",
    "split_leakage_audit",
    "duplicated_spans_docs",
    "dsir_weights_docs",
    "bloom_firewall_docs",
    "pipeline_curation_v3",
    "events_seasonal_decompose",
    "link_graph_pagerank",
    # round-4 continuation: the fingerprint self-join and the two-level
    # lexical agg under 10x data (both should scale near-linearly)
    "dup_overlap_sources",
    "lexical_diversity_docs",
    "ngram_novelty_docs",
    # round-4: two-stage retrieval + Python-path inference batching
    # under 10× data (the one deliberate mapInPandas hot path)
    "rerank_bm25_topk",
    "score_documents_batched",
    "soft_dedup_docs",
    "token_shards_docs",
    # round-5: embedding dedup at 10× vectors (banded pairs stay
    # near-linear via self-sized planes/bands; SemDeDup's Σ|cell|² with
    # n_lists ~ √n is the paper's n^1.5 contract — expect ratio ~4) and
    # the corpus-trained bigram LM
    "embedding_near_dup_banded",
    "semantic_dedup_embeddings",
    "lm_perplexity_docs",
]


def _time_query(spark, fn, sf_dir: str, runs: int = 3) -> float:
    fn(spark, sf_dir).count()  # untimed warmup
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    # lower median: for 3 runs the middle, for 2 the faster (steady-state)
    return round(sorted(samples)[(len(samples) - 1) // 2], 3)


def _plain_join_revenue(spark, sf_dir: str):
    """The bucketed_join_revenue aggregation over plain parquet: identical
    logical query, but the orderkey shuffle is paid on every run."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.queries.base import dec, table

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


def _snapshot_lookup_legs(spark, scaled_dir: str) -> dict:
    """Storage-services economics at 10× data: the same needle-in-corpus
    point lookup through (a) a full scan + filter, (b) manifest range
    stats on the clustered doc_id, (c) a manifest Bloom index on an
    unordered fingerprint column. The snapshot table is built once per
    scaled dir (range-clustered into 16 files, stats + blooms recorded
    at commit) — the read legs are what a recurring lookup pays."""
    import time as _time

    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks import snapshots as SNAP

    snap_dir = os.path.join(
        "/tmp/etlws_snap_bench", os.path.basename(scaled_dir.rstrip("/"))
    )
    if not SNAP.versions(snap_dir):
        docs = (
            spark.read.parquet(os.path.join(scaled_dir, "documents.parquet"))
            .withColumn("fp", F.md5("text"))
            .repartitionByRange(16, "doc_id")
        )
        SNAP.commit(
            docs, snap_dir, stat_cols=["doc_id"], bloom_cols=["fp"]
        )
    target = SNAP.read_snapshot(spark, snap_dir).select(
        "doc_id", "fp"
    ).limit(1).collect()[0]

    def timed(fn):
        fn()  # warm
        samples = []
        for _ in range(2):
            t0 = _time.perf_counter()
            fn()
            samples.append(_time.perf_counter() - t0)
        return round(min(samples), 3)

    full = timed(
        lambda: SNAP.read_snapshot(spark, snap_dir)
        .filter(F.col("fp") == target["fp"])
        .count()
    )
    by_range = timed(
        lambda: SNAP.read_snapshot(
            spark,
            snap_dir,
            predicates={"doc_id": (target["doc_id"], target["doc_id"])},
        ).count()
    )
    by_bloom = timed(
        lambda: SNAP.read_snapshot(
            spark, snap_dir, equals={"fp": target["fp"]}
        ).count()
    )
    return {
        "snapshot_lookup_fullscan": full,
        "snapshot_lookup_range_stats": by_range,
        "snapshot_lookup_bloom": by_bloom,
    }


def _snapshot_dml_legs(spark, scaled_dir: str) -> dict:
    """Table-layer round-trip at 10× data: build a range-clustered
    snapshot table from the scaled documents corpus, run one CDC-sized
    MERGE (keys confined to a narrow doc_id range — the file-pruning
    case the manifest stats exist for), one keyed DELETE, one vacuum,
    and a read-verify. Each leg timed once (they're mutations); the
    table is rebuilt per bench run so timings are reproducible."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks import snapshots as SNAP

    dml_dir = os.path.join(
        "/tmp/etlws_snap_bench",
        os.path.basename(scaled_dir.rstrip("/")) + "_dml",
    )
    shutil.rmtree(dml_dir, ignore_errors=True)
    docs = spark.read.parquet(
        os.path.join(scaled_dir, "documents.parquet")
    ).repartitionByRange(16, "doc_id")
    legs: dict[str, float] = {}

    t0 = _time.perf_counter()
    SNAP.commit(docs, dml_dir, stat_cols=["doc_id"])
    legs["snapshot_build_x10"] = round(_time.perf_counter() - t0, 3)

    ids = [r["doc_id"] for r in spark.read.parquet(
        os.path.join(scaled_dir, "documents.parquet")
    ).select("doc_id").orderBy("doc_id").limit(1200).collect()]
    if len(ids) < 2:
        print(json.dumps({"snapshot_dml_check": f"skipped: corpus too small ({len(ids)} docs)"}))
        return legs
    # key windows scale with the corpus — ~5/6 of the collected ids feed
    # the MERGE, the rest the DELETE (a corpus under 1200 docs used to
    # IndexError on ids[999] and abort the whole scaled pass)
    n_merge = min(1000, max(1, (len(ids) * 5) // 6))
    lo, hi = ids[0], ids[n_merge - 1]
    schema_cols = docs.columns
    src = (
        spark.read.parquet(os.path.join(scaled_dir, "documents.parquet"))
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        .withColumn("text", F.concat(F.col("text"), F.lit(" [patched]")))
        .select(*schema_cols)
    )
    t0 = _time.perf_counter()
    res_m = SNAP.merge_into_snapshot(spark, src, dml_dir, ["doc_id"])
    legs["snapshot_merge_cdc_x10"] = round(_time.perf_counter() - t0, 3)

    doomed = spark.createDataFrame(
        [(i,) for i in (ids[n_merge:n_merge + 200] or ids[-1:])],
        "doc_id long",
    )
    t0 = _time.perf_counter()
    res_d = SNAP.delete_from_snapshot(spark, doomed, dml_dir, ["doc_id"])
    legs["snapshot_delete_x10"] = round(_time.perf_counter() - t0, 3)

    t0 = _time.perf_counter()
    SNAP.vacuum(dml_dir, keep_last=1, min_age_seconds=0)
    legs["snapshot_vacuum_x10"] = round(_time.perf_counter() - t0, 3)

    t0 = _time.perf_counter()
    n = SNAP.read_snapshot(spark, dml_dir).count()
    legs["snapshot_read_verify_x10"] = round(_time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "snapshot_dml_check": {
                    "merge_files_rewritten": res_m["files_rewritten"],
                    "merge_files_total": res_m["files_total"],
                    "deleted": res_d["deleted"],
                    "rows_after": n,
                }
            }
        )
    )
    return legs


def _scaled_pass(spark, sf_dir: str, factor: int = 10) -> dict:
    from etl_workflows_spark.queries.analytics import skewed_join_salted
    from tools.scale_data import ensure_scaled

    scaled_dir = ensure_scaled(spark, sf_dir, factor, "/tmp/etlws_scaled")
    timings: dict[str, float] = {}
    for name in SCALED:
        timings[name] = _time_query(spark, QUERIES[name], scaled_dir, runs=2)
    # Bucketed-storage demo, two legs (broadcast off so both joins are
    # real shuffle-or-colocated joins): the same orders⋈lineitem revenue
    # agg through plain parquet (pays the orderkey shuffle every run) vs
    # through bucketed tables (shuffle paid once at write — the bucketed
    # write itself happens in the untimed warmup, so the timed runs
    # measure the recurring-query cost a nightly pipeline actually pays).
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        timings["join_revenue_shuffle"] = _time_query(
            spark, _plain_join_revenue, scaled_dir, runs=2
        )
        timings["join_revenue_bucketed"] = _time_query(
            spark, QUERIES["bucketed_join_revenue"], scaled_dir, runs=2
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    # Skew-join demo, three legs (broadcast off so the skewed shuffle join
    # is real; the hot key holds ~4/5 of all events):
    #   unsalted + AQE skew-split  — what you'd ship: AQE repairs at runtime
    #   unsalted, AQE skew off     — the naive plan where AQE can't see it
    #   salted,   AQE skew off     — the manual fix for those AQE-blind
    #                                 shapes (streaming joins, skewed aggs)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        timings["skewed_join_unsalted_aqe"] = _time_query(
            spark, QUERIES["skewed_join_unsalted"], scaled_dir, runs=2
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timings["skewed_join_unsalted_noaqe"] = _time_query(
            spark, QUERIES["skewed_join_unsalted"], scaled_dir, runs=2
        )
        timings["skewed_join_salted_noaqe"] = _time_query(
            spark, skewed_join_salted, scaled_dir, runs=2
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    timings.update(_snapshot_lookup_legs(spark, scaled_dir))
    timings.update(_snapshot_dml_legs(spark, scaled_dir))
    return {
        "factor": factor,
        "dir": scaled_dir,
        "value": round(sum(timings.values()), 3),
        "queries": timings,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="etl_workflows_spark_bench")

    # Warm up the JVM / codegen / parquet footer cache with a trivial job.
    spark.range(1000).selectExpr("sum(id)").collect()

    # Host calibration: a fixed CPU-bound JVM job, timed. Round-over-round
    # query deltas are only meaningful after dividing by this (the VM the
    # driver provisions per round varies ~2× in single-thread speed —
    # observed round 3 → 4).
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib = round(time.perf_counter() - t0, 3)

    # One untimed warmup pass, then the MEDIAN of three timed passes per
    # query: steady-state execution (codegen compiled, footers cached)
    # with single-run GC/scheduler noise filtered out.
    # (clearCache between queries: internally-persisted relations — LSH
    # shingles etc. — must not pressure later queries' memory)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = _time_query(spark, QUERIES[name], sf_dir, runs=3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_jvm_sec": calib,
    }
    if os.environ.get("SPARK_GRAFT_SCALED", "1") != "0":
        scaled = _scaled_pass(spark, sf_dir)
        # 10×-data / 1×-data time ratio per shared query: the direct
        # linearity evidence (≪10 = launch-floor amortization or
        # sublinear plans; ~10 = linear; >10 needs a look)
        ratios = {
            q: round(scaled["queries"][q] / t, 2)
            for q, t in timings.items()
            if q in scaled["queries"] and t > 0
        }
        # The scaled per-query detail goes to (a) its own stdout line and
        # (b) a durable file — NOT the final line. Round 4's driver
        # artifact came back "parsed": null because the single combined
        # line outgrew the driver's stdout tail capture; the compact
        # headline JSON must be the LAST line printed.
        scaled_full = {"scaled": scaled, "scaling_ratio": ratios}
        print(json.dumps(scaled_full))
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "BENCH_SCALED_LOCAL.json"), "w") as f:
                json.dump({**out, **scaled_full}, f, indent=1)
        except OSError:
            pass
        out["scaled_total"] = scaled["value"]
        out["scaled_factor"] = scaled["factor"]
        out["scaling_ratio_max"] = max(ratios.values()) if ratios else None
    # The driver captures only a ~2000-char stdout window; the final line
    # must fit inside it to parse. If the per-query dict has outgrown the
    # budget, elide the FASTEST entries (launch-floor ~0.15 s rows carry
    # the least information) — their timings are still on the full-detail
    # line above and in BENCH_SCALED_LOCAL.json. The headline total always
    # covers ALL queries.
    final = dict(out)
    budget = 1900
    line = json.dumps(final, separators=(",", ":"))
    if len(line) > budget:
        print(json.dumps({"queries_full": timings}, separators=(",", ":")))
        kept = dict(timings)
        elided = 0
        for name in sorted(timings, key=timings.get):
            if len(line) <= budget:
                break
            del kept[name]
            elided += 1
            final["queries"] = kept
            final["queries_elided"] = elided
            line = json.dumps(final, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
