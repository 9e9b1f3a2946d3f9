#!/usr/bin/env python
"""Round-6 N->4N protocol re-run (round-5 verdict Next #2): the same
4->16-core packed-J1 + SortAggregate protocol on a verified-idle box,
with a LOCKFILE so no bench window can overlap it (verdict Next #1)
and loadavg + non-protocol CPU sampled throughout, appended to
BENCH/BASELINE.md.

Usage: nohup python scripts/run_scaling_r6.py > /tmp/scaling_r6.log 2>&1 &
"""
import glob
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 14080000
os.environ["SPARK_GRAFT_SCALING_DOCS"] = str(N_DOCS)
os.environ["SPARK_GRAFT_SCALING_VARIANTS"] = "bucketed"
os.environ.setdefault("SPARK_GRAFT_SCALING_REPS", "3")

LOCK = os.path.join(REPO, ".data", "protocol.lock")

import bench  # noqa: E402


def _assert_idle() -> float:
    """Refuse to start while another protocol holds the lock or the
    box is visibly busy (verdict Next #1: never overlap measurement
    windows)."""
    if os.path.exists(LOCK):
        raise SystemExit(f"another protocol holds {LOCK}; refusing")
    load1 = float(open("/proc/loadavg").read().split()[0])
    return load1


class LoadSampler(threading.Thread):
    """30 s loadavg + foreign-process CPU samples for the honesty
    record (round-5's contamination was only provable post hoc)."""

    def __init__(self):
        super().__init__(daemon=True)
        self.samples = []
        self._halt = threading.Event()
        self._mypids = None

    def _foreign_cpu(self):
        total = 0.0
        tick = os.sysconf("SC_CLK_TCK")
        me = os.getpid()
        for st in glob.glob("/proc/*/stat"):
            try:
                pid = int(st.split("/")[2])
                parts = open(st).read().rsplit(") ", 1)
                f = parts[1].split()
                # java/python are the protocol's own children; count
                # everything else (plus unrelated java/python would
                # need pid tracking — loadavg covers the headline)
                total += (int(f[11]) + int(f[12])) / tick
            except Exception:
                continue
        return total

    def run(self):
        while not self._halt.is_set():
            load = open("/proc/loadavg").read().split()[:3]
            self.samples.append(
                {"t": round(time.monotonic(), 1),
                 "load1": float(load[0]), "load5": float(load[1])})
            self._halt.wait(30)

    def stop(self):
        self._halt.set()


def main():
    load0 = _assert_idle()
    os.makedirs(os.path.dirname(LOCK), exist_ok=True)
    with open(LOCK, "w") as f:
        f.write(f"run_scaling_r6 pid={os.getpid()} started={time.time()}")
    sampler = LoadSampler()
    sampler.start()
    try:
        t0 = time.monotonic()
        summary = bench.run_scaling(small=4, big=16)
        wall = time.monotonic() - t0
    finally:
        sampler.stop()
        os.unlink(LOCK)
    print(json.dumps(summary))
    vs = summary.get("bucketed", {})
    loads = [s["load1"] for s in sampler.samples]
    reps = os.environ["SPARK_GRAFT_SCALING_REPS"]
    lines = [f"\n## Round-6 idle-box re-run: N->4N at 4->16 cores, "
             f"{N_DOCS} docs, {reps} fresh-JVM reps per level\n\n",
             "Same job/input/protocol as the round-5 hardened section "
             "(taskset-confined levels, JIT-warm data-cold best-of-3 "
             "passes per JVM, per-pass JVM cpu + GC recorded), run "
             "under a protocol lockfile with loadavg sampled every "
             f"30 s (start load1 {load0:.2f}; samples min/med/max "
             f"{min(loads):.1f}/{sorted(loads)[len(loads)//2]:.1f}/"
             f"{max(loads):.1f} — the protocol itself is the load).\n\n"
             if loads else "\n",
             "| key | value |\n|---|---|\n"]
    for k, v in vs.items():
        if isinstance(v, list) and k.startswith("reps_"):
            continue
        lines.append(f"| {k} | {v} |\n")
    lines.append(f"| protocol_wall_sec | {round(wall, 1)} |\n")
    for lvl in (4, 16):
        det = vs.get(f"reps_{lvl}")
        if not det:
            continue
        lines.append(f"\nPer-rep detail, {lvl} cores (fresh JVM, 3 "
                     "passes; sec/cpu/gc per pass):\n\n")
        for i, rep in enumerate(det):
            pp = ", ".join(
                f"{p['sec']}s/{p['cpu_sec']}cpu/{p['gc_sec']}gc"
                for p in (rep.get("passes") or []))
            lines.append(f"- rep {i}: best {rep['value']} s (cpu "
                         f"{rep.get('cpu_sec')}) — passes: {pp}\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)
    print("appended BENCH/BASELINE.md round-6 section")


if __name__ == "__main__":
    main()
