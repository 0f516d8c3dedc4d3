"""Per-key oracle check: tools/check_keys.py KEY [KEY ...]

Same protocol as drive_driver.py (Spark engine vs DuckDB oracle at
sf0.01, canonicalized compare) but only for the named keys - the
fast inner loop while developing a new operator. Use drive_driver.py
for the full-inventory SELFCHECK sweep at round close.
"""
import sys, time
sys.path.insert(0, "/root/repo")

# Parse BEFORE touching Spark: a usage error must not pay (or hide
# behind) the multi-second local[32] startup, and an SF_DIR-only
# invocation must fail loudly rather than "pass" on zero keys.
SF = "/root/testdata/sf0.01"
keys = []
for a in sys.argv[1:]:
    if a.startswith("/"):
        SF = a
    else:
        keys.append(a)
if not keys:
    sys.exit("usage: tools/check_keys.py [SF_DIR] KEY [KEY ...]")

import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .appName("check-keys").getOrCreate())

import __spark_entry__ as E

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

sys.path.insert(0, "/root/repo/tests")
from tests.conftest import canonicalize

Q, O = E.queries(), E.oracle_sql()
bad = 0
for name in keys:
    if name not in Q:
        print(f"  {name}: NOT REGISTERED"); bad += 1; continue
    t0 = time.time()
    try:
        spdf = Q[name](spark, SF).toPandas()
        if name not in O:
            print(f"  {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        dpdf = con.execute(O[name]).df()
        a, b = canonicalize(spdf), canonicalize(dpdf)
        if list(a.columns) != list(b.columns):
            print(f"  {name}: FAIL cols {list(a.columns)} vs {list(b.columns)}"); bad += 1
        elif len(a) != len(b):
            print(f"  {name}: FAIL rowcount {len(a)} vs {len(b)}"); bad += 1
        elif not a.equals(b):
            n = int((a != b).any(axis=1).sum())
            diff = (a != b).any(axis=1)
            print(f"  {name}: FAIL {n}/{len(a)} rows differ")
            print("    spark:", a[diff].head(3).to_dict("records"))
            print("    oracle:", b[diff].head(3).to_dict("records"))
            bad += 1
        else:
            print(f"  {name}: oracle-match ({len(a)} rows, {time.time()-t0:.1f}s)")
    except Exception as e:
        print(f"  {name}: ERROR {type(e).__name__}: {e}"); bad += 1
sys.exit(1 if bad else 0)
