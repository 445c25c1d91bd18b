"""Profile one or more declared queries: wall time + per-job breakdown
from the Spark event log (the UI is disabled on this box, so the event
log is the measurement channel — guide §1/§7).

Usage:
    python scripts/profile_query.py [sf_dir] query [query ...]

For each query: runs it end-to-end with the noop sink (guide §1.4),
then parses the event log and prints every job with its wall time,
task count, and the callsite/description — the evidence for WHERE a
multi-job operator (store commits, iterative algorithms) spends its
time.  Set PROFILE_RUNS=N for min-of-N (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libmr_spark.queries import QUERIES  # noqa: E402
from libmr_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def parse_eventlog(path: str) -> list[dict]:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:  # noqa: BLE001
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "id": jid,
                    "t0": ev.get("Submission Time", 0),
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "callsite": "",
                    "stages": ev.get("Stage IDs", []),
                }
                infos = ev.get("Stage Infos") or []
                if infos:
                    jobs[jid]["callsite"] = infos[-1].get("Stage Name", "")
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                stages[si.get("Stage ID")] = {
                    "name": si.get("Stage Name", ""),
                    "ntasks": si.get("Number of Tasks", 0),
                }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        ntasks = sum(stages.get(s, {}).get("ntasks", 0) for s in j["stages"])
        out.append(
            {
                "id": jid,
                "sec": round(dur, 3),
                "ntasks": ntasks,
                "nstages": len(j["stages"]),
                "desc": j["desc"] or j["callsite"],
            }
        )
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)]
    runs = int(os.environ.get("PROFILE_RUNS", "1"))

    import shutil

    os.makedirs(EVDIR, exist_ok=True)
    for f in os.listdir(EVDIR):
        p = os.path.join(EVDIR, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # warm the reader path once
    QUERIES["kv_count"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name].fn
        walls = []
        marker = None
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"== {name} run{i} start ==")
            spark.range(1).count()  # marker job
            if i == runs - 1:
                marker = f"== {name} run{i} start =="
            spark.sparkContext.setJobDescription(None)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        print(f"\n##### {name}: wall={[round(w, 2) for w in walls]} (min {min(walls):.2f}s)")
        # flush the event log and parse the LAST run's jobs
        logs = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR) if not f.startswith(".")]
        log = max(logs, key=os.path.getmtime)
        if os.path.isdir(log):  # Spark 4 rolling event-log directory
            parts = [
                os.path.join(log, f)
                for f in os.listdir(log)
                if f.startswith("events_")
            ]
            log = max(parts, key=os.path.getmtime)
        jobs = parse_eventlog(log)
        idx = 0
        for k, j in enumerate(jobs):
            if marker and marker in j["desc"]:
                idx = k + 1
        sel = jobs[idx:]
        total = sum(j["sec"] for j in sel)
        print(f"  {len(sel)} jobs, sum-of-job-walls {total:.2f}s (gaps = driver/plan time)")
        for j in sel:
            d = j["desc"][:110].replace("\n", " ")
            print(f"  job {j['id']:>4}  {j['sec']:7.3f}s  {j['nstages']}st/{j['ntasks']:>4}t  {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
