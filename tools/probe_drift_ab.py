#!/usr/bin/env python
"""Interleaved A/B: r1-era code vs HEAD for the two drifted bench keys
(r9, VERDICT r8 #5).

q_join_star_multiway and q_win_rownumber_topk read 1.37-1.41x their
BENCH_r01 values for two rounds running, while their builder sources
are byte-identical to r1 (verified: git show 92769ad extracts equal
function bodies). This probe isolates CODE from ENVIRONMENT: export
the r1 tree (92769ad) to a temp dir, then alternate fresh
subprocesses A(r1 code) / B(HEAD code) on TODAY's testdata with the
SAME driver heap, cold + K steady runs each, several rounds
interleaved so box drift hits both arms equally.

If A == B (ratio ~1), the drift is environmental (testdata parquet
regeneration / box state), not a plan regression; if B >> A, bisect.

Usage: python tools/probe_drift_ab.py [rounds=3] [steady=5]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1_SHA = "92769ad"
KEYS = ["q_join_star_multiway", "q_win_rownumber_topk"]

def build_compat_dir() -> str:
    """Both arms read ONE dir: today's sf0.1 tables, except events.ts
    converted back to the raw int64-nanos encoding the r1 loaders
    expect (the testdata was REGENERATED between r1 and now - r1 code
    cannot parse the current TIMESTAMP_NTZ events file at all, which
    is itself evidence that scan-side drift is environmental). The
    two probed keys never read events; the loader just has to parse
    it."""
    import duckdb

    d = "/tmp/drift_ab_sf01"
    os.makedirs(d, exist_ok=True)
    src = "/root/testdata/sf0.1"
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "events.parquet":
            dst = os.path.join(d, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(src, f), dst)
    ev = os.path.join(d, "events.parquet")
    if not os.path.exists(ev):
        duckdb.sql(
            f"COPY (SELECT event_id, epoch_ns(ts) AS ts, user_id, "
            f"event_type, value, props FROM "
            f"read_parquet('{src}/events.parquet')) TO '{ev}' "
            f"(FORMAT PARQUET)"
        )
    return d


CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from pudatalake_spark import registry
from pudatalake_spark.session import get_spark
registry.load_all()
spark = get_spark(app_name="drift-ab")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[4]
keys = json.loads(sys.argv[2])
steady = int(sys.argv[3])
out = {}
for k in keys:
    fn = registry.QUERIES[k]
    t0 = time.time(); fn(spark, sf).count(); cold = time.time() - t0
    samples = []
    for _ in range(steady):
        t0 = time.time(); fn(spark, sf).count()
        samples.append(time.time() - t0)
    out[k] = {"cold": round(cold, 3),
              "steady": [round(s, 3) for s in samples]}
print("RESULT " + json.dumps(out))
"""


def run_arm(tree: str, steady: int, sf_dir: str) -> dict:
    env = dict(os.environ, PUDL_DRIVER_MEM="32g",
               PYTHONPATH="")  # arm picks its tree via sys.path
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree, json.dumps(KEYS), str(steady),
         sf_dir],
        capture_output=True, text=True, env=env, timeout=600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"arm failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    steady = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print("loadavg:", open("/proc/loadavg").read().strip(), flush=True)
    r1_tree = tempfile.mkdtemp(prefix="r1tree_")
    subprocess.run(
        f"git -C {REPO} archive {R1_SHA} | tar -x -C {r1_tree}",
        shell=True, check=True,
    )
    sf_dir = build_compat_dir()
    acc: dict[str, dict[str, list[float]]] = {
        k: {"r1": [], "head": []} for k in KEYS
    }
    for rnd in range(rounds):
        for arm, tree in (("r1", r1_tree), ("head", REPO)):
            res = run_arm(tree, steady, sf_dir)
            for k in KEYS:
                acc[k][arm].extend(res[k]["steady"])
            print(f"round {rnd} arm {arm}: "
                  + ", ".join(f"{k}={res[k]['steady']}" for k in KEYS),
                  flush=True)
    summary = {}
    for k in KEYS:
        m1 = statistics.median(acc[k]["r1"])
        mh = statistics.median(acc[k]["head"])
        summary[k] = {"r1_median": round(m1, 3), "head_median": round(mh, 3),
                      "head_over_r1": round(mh / m1, 3)}
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
