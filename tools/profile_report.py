"""Per-stage device-vs-host time table from a jax.profiler trace.

Run the pipeline with --profile_dir <dir>, then:

    python tools/profile_report.py <dir> [--out PROFILE_STAGES.json]

Parses the perfetto trace (trace.json.gz), finds the `telr_stage:<name>`
spans the pipeline emits (pipeline.py timed()), and attributes every
device-lane event whose timestamp falls inside a stage span to that
stage.  The output table is the SURVEY §5 "tracing/profiling" artifact:
measured device seconds per stage next to wall seconds — "TPU-native" as
a number, not an assertion.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_trace(profile_dir: str) -> dict:
    cands = sorted(glob.glob(os.path.join(
        profile_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not cands:
        raise SystemExit(f"no trace.json.gz under {profile_dir}")
    with gzip.open(cands[-1], "rt") as f:
        return json.load(f)


def build_report(trace: dict) -> dict:
    events = trace.get("traceEvents", [])
    # process/thread names
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()
                   or "Device" in n}
    # stage spans from the host-side annotations
    stages = []   # (name, ts, te)
    for e in events:
        if e.get("ph") == "X" and str(e.get("name", "")).startswith(
                "telr_stage:"):
            stages.append((e["name"].split(":", 1)[1], e["ts"],
                           e["ts"] + e.get("dur", 0)))
    stages.sort(key=lambda s: s[1])

    dev_time = defaultdict(float)
    dev_total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        # skip meta-lanes (steady-state counters etc.)
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():
            continue
        ts = e["ts"]
        dur = e.get("dur", 0)
        dev_total += dur
        for name, s0, s1 in stages:
            if s0 <= ts < s1:
                dev_time[name] += dur
                break

    table = []
    for name, s0, s1 in stages:
        wall = (s1 - s0) / 1e6
        dev = dev_time.get(name, 0.0) / 1e6
        table.append({
            "stage": name,
            "wall_s": round(wall, 3),
            "device_s": round(dev, 3),
            "device_frac": round(dev / wall, 3) if wall else 0.0,
        })
    return {"stages": table,
            "device_total_s": round(dev_total / 1e6, 3),
            "device_lanes": sorted(pid_names[p] for p in device_pids)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--out", default="PROFILE_STAGES.json")
    a = ap.parse_args()
    report = build_report(load_trace(a.profile_dir))
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)
    for row in report["stages"]:
        print(f"{row['stage']:20s} wall {row['wall_s']:8.2f}s   "
              f"device {row['device_s']:8.2f}s   "
              f"({row['device_frac'] * 100:5.1f}%)")
    print(f"device lanes: {report['device_lanes']}")


if __name__ == "__main__":
    main()
