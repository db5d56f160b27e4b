"""Per-round optimization measurement harness (guide §1).

Plans land in plans/$OPT_PLAN_ROUND (default r11).

Times individual catalog queries ISOLATED, with both the bench's
``.count()`` action (comparability with bench.py) and the noop sink
(``df.write.format("noop")`` — computes every column, so projection
pruning can't flatter a query), and dumps ``explain("formatted")`` to
``plans/r10/<name>_<tag>.txt`` so before/after plan claims are auditable
without running Spark.

Usage:
  python tools/opt_measure.py --tag before q1_pricing_summary charlm_scores_docs
  python tools/opt_measure.py --tag after --runs 5 pipeline_curation_v2
  python tools/opt_measure.py --tag probe --no-plan --sf /tmp/etlws_scaled/sf0.1_x10 <names...>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_workflows_spark.queries import QUERIES  # noqa: E402
from etl_workflows_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", os.environ.get("OPT_PLAN_ROUND", "r11"))
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark(app_name="opt_measure_r10")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {"__calib__": {"jvm": calib()}}
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.names:
        fn = QUERIES[name]
        rec: dict[str, float | list] = {}
        spark.sparkContext.setJobDescription(f"opt:{name}:warmup")
        fn(spark, args.sf).count()  # untimed warmup (codegen, footers)

        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt:{name}:count:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            samples.append(round(time.perf_counter() - t0, 3))
        rec["count_med"] = sorted(samples)[(len(samples) - 1) // 2]
        rec["count_all"] = samples

        if not args.no_noop:
            noops = []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"opt:{name}:noop:{i}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                noops.append(round(time.perf_counter() - t0, 3))
            rec["noop_med"] = sorted(noops)[(len(noops) - 1) // 2]
            rec["noop_all"] = noops

        if not args.no_plan:
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(mode)
            path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan.strip() + "\n")
            rec["plan"] = path
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    out["__calib__"]["jvm_post"] = calib()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
