"""Round-4 scaling protocol at 4x the round-3 input (verdict Next
#8): the bucketed two-level protocol at ~7M docs, appended to
BENCH/BASELINE.md as a dated section (the bench --scaling path
rewrites the whole file; this preserves the round-3 440k/1.76M
evidence alongside).

Usage: nohup python scripts/run_scaling_7m.py > /tmp/scaling7m.log 2>&1 &
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_SCALING_DOCS", "7040000")
os.environ.setdefault("SPARK_GRAFT_SCALING_VARIANTS", "bucketed")
os.environ.setdefault("SPARK_GRAFT_SCALING_REPS", "3")

import bench


def main():
    t0 = time.monotonic()
    summary = bench.run_scaling()
    wall = time.monotonic() - t0
    print(json.dumps(summary))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    vs = summary.get("bucketed", {})
    lines = ["\n## Round-4 re-run: 7.04M docs (4x round-3 input), "
             "bucketed variant\n\n",
             "Same job, same protocol (3 fresh-JVM reps per level, "
             "per-level min, taskset-confined small level, JIT-warm "
             "data-cold, best-of-3 passes per JVM).\n\n",
             "| key | value |\n|---|---|\n"]
    for k, v in vs.items():
        lines.append(f"| {k} | {v} |\n")
    lines.append(f"| protocol_wall_sec | {round(wall, 1)} |\n")
    with open(md, "a") as f:
        f.writelines(lines)
    print("appended to", md)


if __name__ == "__main__":
    main()
