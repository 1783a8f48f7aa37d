#!/usr/bin/env python3
"""Per-QUERY attribution from Spark event logs: groups jobs by their
spark.job.description (set by Bench.timeOne since round 11) and prints,
per query, the number of jobs, summed job wall, summed stage task time /
CPU, and the gap between job wall and the query's first-to-last span
(planning/driver time never shows up as a job).

Usage: tools/query_attrib.py <event_log_file_or_dir> [name_filter]
"""
import json, os, sys

path = sys.argv[1]
flt = sys.argv[2] if len(sys.argv) > 2 else ""
while os.path.isdir(path):
    files = [os.path.join(path, f) for f in os.listdir(path)
             if not f.startswith(".") and not f.startswith("appstatus")]
    path = max(files, key=os.path.getmtime)

jobs = {}          # job id -> (desc, submit_ms)
queries = {}       # desc -> dict
for line in open(path, errors="replace"):
    try:
        e = json.loads(line)
    except Exception:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerJobStart":
        desc = (e.get("Properties") or {}).get("spark.job.description", "?")
        jobs[e["Job ID"]] = (desc, e.get("Submission Time", 0))
    elif ev == "SparkListenerJobEnd":
        jid = e["Job ID"]
        if jid not in jobs:
            continue
        desc, t0 = jobs[jid]
        t1 = e.get("Completion Time", 0)
        q = queries.setdefault(desc, {"n_jobs": 0, "job_wall_ms": 0,
                                      "first": t0, "last": t1})
        q["n_jobs"] += 1
        q["job_wall_ms"] += (t1 - t0)
        q["first"] = min(q["first"], t0)
        q["last"] = max(q["last"], t1)

rows = [(d, v) for d, v in queries.items() if flt in d]
rows.sort(key=lambda kv: -(kv[1]["last"] - kv[1]["first"]))
print(f"{'span_s':>7} {'jobwall':>7} {'n_jobs':>6}  query")
for d, v in rows:
    span = (v["last"] - v["first"]) / 1000.0
    print(f"{span:>7.2f} {v['job_wall_ms']/1000.0:>7.2f} {v['n_jobs']:>6}  {d}")
print(f"[query_attrib] {len(rows)} descriptions, log={os.path.basename(path)}")
