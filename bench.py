"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is executed with a `noop` sink write so the full plan runs
JVM-side (scan → joins → aggregation) without driver materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship views + the heaviest operator families
# (warehouse build, wide star join, text dedup, similarity search,
# event-time analytics).
HEADLINE = [
    "yearly_sales_profit",
    "sales_employees_regions",
    "pricing_summary",
    "demand_category_region",
    "seasonality_segment",
    "fact_orders",
    "order_details_wide",
    "minhash_lsh_candidates",
    "cosine_topk",
    "events_sessionize",
    "vocab_topk",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from global_superstore_data_warehouse_spark import get_spark, registry

    spark = get_spark("gsdw-bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm-up (not timed): JVM + parquet footers, plus one tiny-SF
    # pass over each headline query so whole-stage codegen is JIT'd
    # before measurement — the timed numbers are steady-state.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in names:
            try:
                qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # best-of-2 per query: reports steady-state rather than whatever
    # transient system load coincided with a single run
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(2):
            df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
