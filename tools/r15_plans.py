#!/usr/bin/env python
"""Dump explain('formatted') AND job/task counters for registry keys
into plans/r15/ (VERDICT r14 #7: checkpoint wins are invisible to
explain - the after-plan shows the truncated lineage - so each round
artifact now carries the executed job count, task count, and wall
seconds per key alongside the static plan).

    python tools/r15_plans.py before q_graph_pagerank q_tpch_q5 ...
    python tools/r15_plans.py after  q_graph_pagerank ...

Writes plans/r15/<key>_<tag>.txt (static plan) and appends one JSON
line per key to plans/r15/counters_<tag>.jsonl:
  {"key": ..., "jobs": N, "tasks": N, "secs": S, "steal_pct": P}

Counters come from statusTracker deltas around ONE noop-sink
execution of the key (cold for that session - the job/task count of a
fixed plan is deterministic, unlike wall seconds, so cold is fine and
keeps this tool cheap).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pudatalake_spark import registry
from pudatalake_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _steal():
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7]
    except Exception:
        return None


def _counters(sc) -> tuple[int, int]:
    """(total jobs, total tasks) seen by this context so far."""
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(None)
    tasks = 0
    for j in jobs:
        info = st.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = st.getStageInfo(s)
            if si is not None:
                tasks += si.numTasks
    return len(jobs), tasks


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r15-plans")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    counters_path = os.path.join(out_dir, f"counters_{tag}.jsonl")
    for k in keys:
        df = registry.QUERIES[k](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{k}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {k} @ {SF_DIR} ({tag})\n")
            f.write(buf.getvalue())
        # One executed run for job/task counters (deterministic for a
        # fixed plan; rebuild the frame so lazy checkpoints run inside
        # the measured window exactly as bench.py times them).
        registry.clear_caches(spark)
        df = registry.QUERIES[k](spark, SF_DIR)
        sc.setJobDescription(f"r15-counters:{k}")
        j0, t0 = _counters(sc)
        s0 = _steal()
        w0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        secs = round(time.perf_counter() - w0, 3)
        s1 = _steal()
        j1, t1 = _counters(sc)
        sc.setJobDescription(None)
        steal = (
            round(100.0 * (s1[1] - s0[1]) / max(1, s1[0] - s0[0]), 2)
            if s0 and s1
            else None
        )
        row = {"key": k, "jobs": j1 - j0, "tasks": t1 - t0,
               "secs": secs, "steal_pct": steal}
        with open(counters_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print("wrote", path, row)
        registry.clear_caches(spark)


if __name__ == "__main__":
    main()
