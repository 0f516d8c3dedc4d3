#!/usr/bin/env python
"""Spark-only wall time for EVERY inventory key at a given SF.

The full-inventory SELFCHECK sweeps (tools/drive_driver.py) record a
per-key ``secs`` that conflates Spark execution with toPandas, the
DuckDB oracle run, and the canonicalize/compare step — fine as a
correctness artifact, useless for ranking Spark plans.  This tool
times ONLY the Spark side: build the DataFrame and materialize it
through the ``noop`` sink (same protocol as bench.py — full plan
execution, no collect-to-driver cost), clearing operator caches
between keys so each measurement pays its own build cost the way a
fresh job would.

    python tools/bench_inventory.py [sf_dir] [--out FILE]

Writes {"sf_dir":..., "per_query": {key: secs}} sorted by key; prints
the slowest 25.  Side-effect keys (sinks) execute their write to a
temp dir exactly as the registry's query callable defines; streaming
keys run their bounded batch form like everywhere else.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pudatalake_spark import registry
from pudatalake_spark.session import get_spark


_STAT0 = None


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    else:
        sfname = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        out = os.path.join(REPO, "tools", f"spark_times_{sfname}.json")

    import bench as _b
    global _STAT0
    _STAT0 = _b._cpu_stat()

    spark = get_spark(app_name="bench-inventory")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    # Session warm-up: the first measured key otherwise pays ~5-7 s of
    # JIT/codegen/scan initialization that belongs to the session, not
    # the plan (measured r10: q_agg_any_all read 6.0 s cold, 0.66 s
    # warm). One untimed run of a representative key absorbs it.
    try:
        registry.QUERIES["q_agg_groupby"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    finally:
        registry.clear_caches(spark)

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in sorted(registry.QUERIES):
        t0 = time.time()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - survey, keep going
            errs[name] = f"{type(e).__name__}: {str(e)[:160]}"
        finally:
            registry.clear_caches(spark)
        print(f"  {name}: {times.get(name, 'ERR')}")

    import bench as _bench
    steal = None
    stat1 = _bench._cpu_stat()
    if _STAT0 and stat1 and stat1[0] > _STAT0[0]:
        steal = round(
            100.0 * (stat1[1] - _STAT0[1]) / (stat1[0] - _STAT0[0]), 2
        )
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "protocol": "noop-sink, caches cleared per key",
                   "cpu_steal_pct": steal,
                   "per_query": times, "errors": errs}, f, indent=1, sort_keys=True)
    print(f"\nwrote {out}  ({len(times)} keys, {len(errs)} errors)")
    print(f"total spark wall: {sum(times.values()):.1f}s")
    print("slowest 25:")
    for s, k in sorted(((v, k) for k, v in times.items()), reverse=True)[:25]:
        print(f"  {s:8.2f}  {k}")
    for k, m in errs.items():
        print(f"  ERR {k}: {m}")


if __name__ == "__main__":
    main()
