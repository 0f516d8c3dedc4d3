#!/usr/bin/env python
"""Interleaved A/B timer for r14 optimization work on a steal-noisy box.

    python tools/r14_ab.py <key> [reps] [sf_dir]

Times ONE registry key with the bench's noop-sink methodology,
interleaving is left to the caller (run it before/after an edit);
reports per-rep seconds + median + the pass's hypervisor steal %, so
a contaminated rep is self-describing. For true interleaving of two
code states use git stash/apply between invocations - process-level
interleaving is impossible once the module is imported.
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


def _steal():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]


def main() -> None:
    key = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab-{key}")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    fn = registry.QUERIES[key]

    def run():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # cold: codegen + JIT
    runs = []
    for _ in range(reps):
        registry.clear_caches(spark)
        s0 = _steal()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        s1 = _steal()
        st = 100.0 * (s1[1] - s0[1]) / max(1, s1[0] - s0[0])
        runs.append((round(dt, 3), round(st, 2)))
    med = statistics.median(r[0] for r in runs)
    print(f"{key}: median {med:.3f}s  runs={runs}")


if __name__ == "__main__":
    main()
