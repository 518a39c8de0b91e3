"""Stage-level profiler: run ONE registered query with the Spark
event log enabled, then summarize per-job / per-stage wall time,
task counts, shuffle bytes, and max/median task skew from the log.

Usage:
    python tools/stageprof.py NAME [--sf DIR] [--runs N]

The summary is printed for the LAST (warmed) run only; earlier runs
just JIT the JVM. This is the measurement tool behind the
OPTIMIZATION_r13.md stage attributions (guide section 1/7: decide
whether time goes to shuffle read, compute, or scheduling before
touching anything).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

LOG_DIR = "/tmp/sparklogs"


def summarize(log_path: str, min_job_time_ms: int = 1) -> None:
    jobs = {}  # job_id -> {desc, submit, done, stages: [ids]}
    stages = {}  # stage_id -> info
    tasks = {}  # stage_id -> [metrics]
    with open(log_path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev.get("Submission Time", 0),
                    "t1": None,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "n_tasks": si.get("Number of Tasks", 0),
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                sr = (tm.get("Shuffle Read Metrics") or {})
                sw = (tm.get("Shuffle Write Metrics") or {})
                tasks.setdefault(sid, []).append(
                    {
                        "run_ms": tm.get("Executor Run Time", 0),
                        "cpu_ms": (tm.get("Executor CPU Time", 0)) / 1e6,
                        "sr_bytes": sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0),
                        "sw_bytes": sw.get("Shuffle Bytes Written", 0),
                        "result_ms": tm.get("Result Serialization Time", 0),
                        "gc_ms": tm.get("JVM GC Time", 0),
                    }
                )

    for jid in sorted(jobs):
        j = jobs[jid]
        if j["t1"] is None:
            continue
        dur = j["t1"] - j["t0"]
        if dur < min_job_time_ms:
            continue
        print(f"job {jid} [{dur/1000:.3f}s] desc={j['desc'][:60]!r}")
        for sid in sorted(j["stages"]):
            if sid not in stages:
                continue  # skipped stage (reused exchange)
            s = stages[sid]
            if s["t0"] is None or s["t1"] is None:
                continue
            ts = tasks.get(sid, [])
            runs = sorted(t["run_ms"] for t in ts) or [0]
            med = runs[len(runs) // 2]
            mx = runs[-1]
            cpu = sum(t["cpu_ms"] for t in ts)
            srb = sum(t["sr_bytes"] for t in ts)
            swb = sum(t["sw_bytes"] for t in ts)
            nm = s["name"].split(" at ")[0]
            print(
                f"  stage {sid:4d} [{(s['t1']-s['t0'])/1000:7.3f}s] "
                f"{len(ts):3d} tasks  taskmax/med={mx}/{med}ms "
                f"cpu={cpu/1000:.2f}s sr={srb/1024:.0f}KB sw={swb/1024:.0f}KB  {nm}"
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import shutil

    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from global_superstore_data_warehouse_spark import registry

    # the SHARED session config (session.session_confs — round-14
    # ADVICE fix: the hand-copied list here could silently diverge
    # from the bench session), plus only the event-log keys this
    # profiler needs
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    from global_superstore_data_warehouse_spark.session import session_confs

    builder = SparkSession.builder.master(master).appName("gsdw-stageprof")
    confs = dict(session_confs())
    confs.update(
        {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.dir": f"file:{LOG_DIR}",
        }
    )
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    assert spark.conf.get("spark.eventLog.enabled", "false") == "true", (
        "event log not enabled — builder config did not take"
    )

    from global_superstore_data_warehouse_spark.plans.events import (
        event_transitions_pandas,
    )

    qs = dict(registry.queries())
    qs["event_transitions_pandas"] = event_transitions_pandas
    fn = qs[args.name]

    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        try:
            fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    for i in range(args.runs):
        marker = f"{args.name}#run{i}"
        spark.sparkContext.setJobDescription(marker)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"run {i}: {el:.3f}s")
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)
    candidates = glob.glob(f"{LOG_DIR}/*{app_id}*") + glob.glob(f"{LOG_DIR}/*")
    log_files: list[str] = []
    for c in candidates:
        if os.path.isdir(c):  # rolling event log dir (eventlog_v2_<app>)
            log_files = sorted(
                p for p in glob.glob(f"{c}/*") if "appstatus" not in p
            )
        else:
            log_files = [c]
        if log_files:
            break
    print("\n== stage summary (all runs; last run is the warmed one) ==")
    for lf in log_files:
        summarize(lf)


if __name__ == "__main__":
    main()
