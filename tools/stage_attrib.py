#!/usr/bin/env python3
"""Per-stage attribution from Spark event logs (the q363/q368 protocol):
for each completed stage print shuffle read/write records+bytes, memory/disk
spill, executor CPU vs run time — the facts that separate "records grew
superlinearly" (a plan bug) from "same records, single-box spill" (the
documented out-scaling cost).

Usage: tools/stage_attrib.py <event_log_file_or_dir> [min_seconds]
"""
import json, os, sys

path = sys.argv[1]
min_s = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
# descend through log dirs (eventlog_v2_* rolling dirs hold the files)
while os.path.isdir(path):
    files = [os.path.join(path, f) for f in os.listdir(path)
             if not f.startswith(".") and not f.startswith("appstatus")]
    path = max(files, key=os.path.getmtime)

if path.endswith(".zstd"):
    import io, subprocess
    raw = subprocess.run(["zstd", "-dc", path], capture_output=True).stdout
    lines = io.StringIO(raw.decode(errors="replace"))
else:
    lines = open(path, errors="replace")

stages = []
for line in lines:
    try:
        e = json.loads(line)
    except Exception:
        continue
    if e.get("Event") != "SparkListenerStageCompleted":
        continue
    si = e["Stage Info"]
    acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
    def g(name):
        v = acc.get(name, 0)
        try:
            return int(v)
        except Exception:
            return 0
    dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0
    stages.append({
        "stage": si.get("Stage ID"),
        "name": (si.get("Stage Name") or "")[:60],
        "sec": round(dur, 1),
        "tasks": si.get("Number of Tasks"),
        "sh_read_rec": g("internal.metrics.shuffle.read.recordsRead"),
        "sh_write_rec": g("internal.metrics.shuffle.write.recordsWritten"),
        "sh_write_mb": g("internal.metrics.shuffle.write.bytesWritten") // 2**20,
        "spill_mem_mb": g("internal.metrics.memoryBytesSpilled") // 2**20,
        "spill_disk_mb": g("internal.metrics.diskBytesSpilled") // 2**20,
        "cpu_s": g("internal.metrics.executorCpuTime") // 10**9,
        "run_s": g("internal.metrics.executorRunTime") // 10**3,
        "rows_out": g("number of output rows"),
    })

stages.sort(key=lambda s: -s["sec"])
print(f"{'stage':>5} {'sec':>7} {'tasks':>5} {'shR_rec':>12} {'shW_rec':>12} "
      f"{'shW_MB':>7} {'spillM':>7} {'spillD':>7} {'cpu_s':>6} {'run_s':>6}  name")
for s in stages:
    if s["sec"] < min_s:
        continue
    print(f"{s['stage']:>5} {s['sec']:>7} {s['tasks']:>5} {s['sh_read_rec']:>12} "
          f"{s['sh_write_rec']:>12} {s['sh_write_mb']:>7} {s['spill_mem_mb']:>7} "
          f"{s['spill_disk_mb']:>7} {s['cpu_s']:>6} {s['run_s']:>6}  {s['name']}")
tot_spill = sum(s["spill_disk_mb"] for s in stages)
print(f"[attrib] {len(stages)} stages, total disk spill {tot_spill} MB, "
      f"log={os.path.basename(path)}")
