"""Round-5 hardened N->4N protocol (verdict Next #1): the 4->16-core
packed-J1 + SortAggregate protocol at >=5 fresh-JVM reps per level,
reporting MEDIAN alongside MIN, with per-pass JVM cpu-seconds and GC
collection time recorded per rep (the 16-core bimodality chase).
Appends a dated section to BENCH/BASELINE.md.

Usage: nohup python scripts/run_scaling_r5.py > /tmp/scaling_r5.log 2>&1 &
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 14080000
os.environ["SPARK_GRAFT_SCALING_DOCS"] = str(N_DOCS)
os.environ["SPARK_GRAFT_SCALING_VARIANTS"] = "bucketed"
os.environ["SPARK_GRAFT_SCALING_REPS"] = os.environ.get(
    "SPARK_GRAFT_SCALING_REPS", "5")
os.environ["SPARK_GRAFT_SKIP_PREPARE"] = "1"  # layout already built

import bench  # noqa: E402


def main():
    t0 = time.monotonic()
    summary = bench.run_scaling(small=4, big=16)
    wall = time.monotonic() - t0
    print(json.dumps(summary))
    vs = summary.get("bucketed", {})
    lines = ["\n## Round-5 hardened protocol: N->4N at 4->16 cores, "
             f"{N_DOCS} docs, {os.environ['SPARK_GRAFT_SCALING_REPS']} "
             "fresh-JVM reps per level\n\n",
             "Same job/input/protocol as the round-4 packed-J1 + "
             "SortAggregate section (taskset-confined levels, "
             "JIT-warm data-cold best-of-3 passes per JVM), at 5 reps "
             "per level with per-pass JVM cpu + GC seconds recorded.\n\n",
             "| key | value |\n|---|---|\n"]
    for k, v in vs.items():
        if k.startswith("reps_"):
            continue
        lines.append(f"| {k} | {v} |\n")
    lines.append(f"| protocol_wall_sec | {round(wall, 1)} |\n")
    for lvl in (4, 16):
        reps = vs.get(f"reps_{lvl}") or []
        lines.append(f"\nPer-rep detail, {lvl} cores (each rep = one "
                     "fresh JVM, 3 passes; sec/cpu/gc per pass):\n\n")
        for i, r in enumerate(reps):
            ps = ", ".join(
                f"{p['sec']}s/{p['cpu_sec']}cpu/{p['gc_sec']}gc"
                for p in (r.get("passes") or []))
            lines.append(f"- rep {i}: best {r['value']} s "
                         f"(cpu {r['cpu_sec']}) — passes: {ps}\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
