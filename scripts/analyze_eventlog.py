"""Decompose a Spark event log into per-stage wall / task-time / shuffle /
GC aggregates — the measurement tool behind BENCH_SCALING.md's substrate
decomposition (where does a superstep's wall actually go at N vs 4N
executors?).

Usage: python scripts/analyze_eventlog.py <event-log-file> [top_n]

Per stage: wall (completion - submission), sum of task run times, input /
shuffle-read / shuffle-write bytes, GC time, task count — plus totals and
the app-level wall so fixed chain vs W-bearing stages are separable.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    stages: dict[tuple, dict] = {}
    task_agg: dict[tuple, dict] = defaultdict(
        lambda: {"run_ms": 0, "gc_ms": 0, "in_b": 0, "sr_b": 0, "sw_b": 0,
                 "tasks": 0, "deser_ms": 0, "ser_ms": 0, "fetch_ms": 0}
    )
    stage_desc: dict[int, str] = {}  # stage id -> job description tag
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif e == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                for sid in ev.get("Stage IDs", []):
                    stage_desc[sid] = desc
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                stages[key] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                    "n_tasks": si.get("Number of Tasks"),
                }
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                a = task_agg[key]
                a["tasks"] += 1
                a["run_ms"] += m.get("Executor Run Time", 0)
                a["gc_ms"] += m.get("JVM GC Time", 0)
                a["deser_ms"] += m.get("Executor Deserialize Time", 0)
                a["ser_ms"] += m.get("Result Serialization Time", 0)
                a["in_b"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                a["sr_b"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                a["fetch_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                a["sw_b"] += sw.get("Shuffle Bytes Written", 0)

    rows = []
    for key, s in stages.items():
        a = task_agg.get(key, {})
        wall = ((s["complete"] or 0) - (s["submit"] or 0)) / 1000.0
        rows.append({
            "stage": key[0], "wall_s": round(wall, 2),
            "task_s": round(a.get("run_ms", 0) / 1000.0, 1),
            "gc_s": round(a.get("gc_ms", 0) / 1000.0, 1),
            "fetchwait_s": round(a.get("fetch_ms", 0) / 1000.0, 1),
            "in_mb": a.get("in_b", 0) >> 20,
            "sr_mb": a.get("sr_b", 0) >> 20,
            "sw_mb": a.get("sw_b", 0) >> 20,
            "tasks": a.get("tasks", 0),
            "phase": stage_desc.get(key[0], ""),
            "name": s["name"],
        })
    rows.sort(key=lambda r: -r["wall_s"])
    total_wall = sum(r["wall_s"] for r in rows)
    app_wall = ((app_end or 0) - (app_start or 0)) / 1000.0
    print(f"app_wall={app_wall:.1f}s  sum_stage_wall={total_wall:.1f}s  "
          f"stages={len(rows)}  (gap = driver/commit/python-side time)")

    # per-phase rollup (needs FrontierCrawler._jobdesc tags in the log)
    phase_agg: dict[str, dict] = defaultdict(
        lambda: {"wall_s": 0.0, "task_s": 0.0, "gc_s": 0.0, "in_mb": 0,
                 "sr_mb": 0, "sw_mb": 0, "stages": 0})
    for r in rows:
        p = phase_agg[r["phase"] or "(untagged)"]
        p["wall_s"] += r["wall_s"]; p["task_s"] += r["task_s"]
        p["gc_s"] += r["gc_s"]; p["in_mb"] += r["in_mb"]
        p["sr_mb"] += r["sr_mb"]; p["sw_mb"] += r["sw_mb"]; p["stages"] += 1
    print("\n-- per-phase stage-wall rollup --")
    print("phase\twall_s\ttask_s\tgc_s\tin_mb\tsr_mb\tsw_mb\tstages")
    for name, p in sorted(phase_agg.items(), key=lambda kv: -kv[1]["wall_s"]):
        print(f"{name}\t{p['wall_s']:.1f}\t{p['task_s']:.0f}\t{p['gc_s']:.0f}"
              f"\t{p['in_mb']}\t{p['sr_mb']}\t{p['sw_mb']}\t{p['stages']}")

    print("\n-- top stages --")
    hdr = ("stage", "wall_s", "task_s", "gc_s", "fetchwait_s",
           "in_mb", "sr_mb", "sw_mb", "tasks", "phase", "name")
    print("\t".join(hdr))
    for r in rows[:top_n]:
        print("\t".join(str(r[h]) for h in hdr))


if __name__ == "__main__":
    main()
