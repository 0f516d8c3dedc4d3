#!/usr/bin/env python
"""Steal-robust A/B: total PROCESS-TREE CPU seconds per run of one
registry key (utime+stime of the driver python + forked JVM +
workers), plus wall and job/task counts. Hypervisor steal inflates
WALL but not CPU accounting, so under a steal burst the CPU number
still ranks two shapes by total work; job count ranks barriers.

    python tools/r15_cpu_ab.py <key> [reps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pudatalake_spark import registry
from pudatalake_spark.session import get_spark

CLK = os.sysconf("SC_CLK_TCK")


def _tree_cpu() -> float:
    """utime+stime of this process and every descendant, seconds."""
    total = 0.0
    me = os.getpid()
    # children map
    procs = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            ut, st = int(parts[11]), int(parts[12])
            procs[int(pid)] = (ppid, (ut + st) / CLK)
        except Exception:
            continue
    # Walk descendants of me
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    stack = [me]
    while stack:
        p = stack.pop()
        if p in procs:
            total += procs[p][1]
        stack.extend(kids.get(p, []))
    return total


def _jobs(sc) -> int:
    return len(sc.statusTracker().getJobIdsForGroup(None))


def main() -> None:
    key = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"cpu-ab-{key}")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    fn = registry.QUERIES[key]

    def run():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # cold
    rows = []
    for _ in range(reps):
        registry.clear_caches(spark)
        c0, j0 = _tree_cpu(), _jobs(sc)
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
        c1, j1 = _tree_cpu(), _jobs(sc)
        rows.append((round(c1 - c0, 2), round(wall, 3), j1 - j0))
    med_cpu = statistics.median(r[0] for r in rows)
    med_wall = statistics.median(r[1] for r in rows)
    print(f"{key}: cpu med {med_cpu:.2f}s wall med {med_wall:.3f}s "
          f"jobs {rows[0][2]}  rows={rows}")


if __name__ == "__main__":
    main()
