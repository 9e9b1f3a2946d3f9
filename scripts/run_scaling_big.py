"""Scaling protocol at larger inputs (verdict Next #8 and beyond):
the bucketed two-level protocol at N docs, appended to
BENCH/BASELINE.md as a dated section (the bench --scaling path
rewrites the whole file; appending preserves the earlier 440k/1.76M/
7.04M evidence alongside).

Usage:
  nohup python scripts/run_scaling_big.py [n_docs] > /tmp/scaling.log 2>&1 &

Round-3 ran 1.76M docs (efficiency 0.551), round-4 7.04M (0.749,
work inflation 1.149): the job becomes compute-dominated as input
grows and the DRAM-bandwidth share shrinks.  Default here is 14.08M
(8x round-3) to extend that curve.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 14080000
os.environ["SPARK_GRAFT_SCALING_DOCS"] = str(N_DOCS)
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
    lines = [f"\n## Larger-input re-run: {N_DOCS} docs, "
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
