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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="etl_workflows_spark_bench")

    # Warm up the JVM / codegen / parquet footer cache with a trivial job.
    spark.range(1000).selectExpr("sum(id)").collect()

    # One untimed warmup pass, then the MEDIAN of three timed passes per
    # query: steady-state execution (codegen compiled, footers cached)
    # with single-run GC/scheduler noise filtered out.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        # queries that persist internally (LSH shingles etc.) would leave
        # one cached copy per invocation resident for the rest of the
        # session, pressuring later queries' memory — release between
        # queries so each timing stands alone
        spark.catalog.clearCache()

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
