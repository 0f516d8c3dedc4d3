#!/usr/bin/env python
"""Measure the dedup family's scale claim on a self-similar synthetic
corpus (r9, VERDICT r8 #2).

The hot-shingle df-cap's 5.4x speedup was measured at sf0.1 only; this
script generates corpora at 1x / 3x / 10x the sf0.1 document count
with the SAME unigram distribution, document-length distribution, and
planted near-dup rate (so shingle dfs scale the way a real corpus
growing self-similarly scales), then measures:

- wall time of q_dedup_near_jaccard / q_dedup_near_minhash /
  q_dedup_groups at each size, WITH the hot cap (production path);
- wall time of the jaccard key with the cap DISABLED
  (HOT_DF_MIN = 1e9 -> no shingle classified hot -> the pure
  inverted-index self-join), where feasible;
- the ANALYTIC join volumes from the shingle df distribution:
  uncapped = sum(df^2), capped-rare = sum over non-hot shingles -
  computed in DuckDB without running the join, so the infeasible
  uncapped-at-10x point still gets a projected row count.

Output: one JSON line per measurement (consumed into
docs/SCALING.md §20 by hand). Deterministic corpus: seeded
numpy Generator; doc_ids disjoint from the fixture's.

Usage:
    python tools/measure_dedup_scale.py            # all sizes
    python tools/measure_dedup_scale.py --gen-only # just corpora
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT_ROOT = os.path.join(REPO, ".scratch", "dedup_scale")
SIZES = {"x1": 5_000, "x3": 15_000, "x10": 50_000}
SEED = 20260815
CLONE_FRAC = 0.04  # 4% of docs are near-dup clones (sf0.1 planted rate)


def _empirical(con):
    rows = con.execute(
        "SELECT w, count(*) FROM (SELECT unnest(string_split(text,' ')) w "
        f"FROM read_parquet('{BASE}')) GROUP BY w ORDER BY count(*) DESC, w"
    ).fetchall()
    words = [r[0] for r in rows]
    freqs = np.array([r[1] for r in rows], dtype=float)
    lens = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT len(string_split(text,' ')) FROM "
                f"read_parquet('{BASE}')"
            ).fetchall()
        ]
    )
    return words, freqs / freqs.sum(), lens


def generate(n_docs: int, out_dir: str) -> str:
    """Self-similar synthetic corpus: unigram + length distributions
    resampled from sf0.1; CLONE_FRAC of docs are near-dup mutations of
    a base doc (last ~10% of words resampled -> shingle J ~ 0.85-0.95,
    the planted-dup regime)."""
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    words, probs, lens = _empirical(con)
    rng = np.random.default_rng(SEED + n_docs)
    n_clones = int(n_docs * CLONE_FRAC)
    n_base = n_docs - n_clones
    docs: list[str] = []
    for _ in range(n_base):
        L = int(rng.choice(lens))
        docs.append(" ".join(rng.choice(words, size=L, p=probs)))
    # Clones: mutate a random base doc's TAIL (prefix shared, like the
    # fixture's 40-char-prefix plants); one base can host several
    # clones (groups of 2-4).
    base_idx = rng.integers(0, n_base, size=n_clones)
    for bi in base_idx:
        ws = docs[bi].split(" ")
        k = max(1, len(ws) // 10)
        ws[-k:] = rng.choice(words, size=k, p=probs)
        docs.append(" ".join(ws))
    ids = np.arange(1_000_000, 1_000_000 + n_docs)
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT "
        "unnest(?::BIGINT[]) AS doc_id, unnest(?::VARCHAR[]) AS text) ",
        [ids.tolist(), docs],
    )
    con.execute(
        "COPY (SELECT doc_id, text, 'en' AS lang, 'synth' AS source, "
        f"length(text) AS n_chars FROM t ORDER BY doc_id) TO '{path}' "
        "(FORMAT PARQUET)"
    )
    # loaders.load() opens every lake table in the dir: symlink the
    # non-documents tables from the sf0.1 fixture (the dedup keys
    # never read them, but the loader's schema pass does).
    src_dir = os.path.dirname(BASE)
    for f in os.listdir(src_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(src_dir, f), dst)
    return path


def join_volumes(path: str, n_docs: int) -> dict:
    """Analytic inverted-index volumes from the df distribution:
    uncapped = sum(df^2); capped = sum(df^2) over NON-hot shingles
    (hot = df > max(32, 0.2 n), 256 hottest) + the hot-doc
    broadcast-pair volume."""
    con = duckdb.connect()
    d_thresh = max(32, int(0.2 * n_docs))
    row = con.execute(
        f"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([hash(substr(lower(text), i + 1, 5))
                                FOR i IN range(0, length(text) - 4)]) AS s
          FROM read_parquet('{path}')),
        df AS (SELECT g, count(*) AS df FROM
                 (SELECT doc_id, unnest(s) AS g FROM sh) GROUP BY g),
        hot AS (SELECT g FROM df WHERE df > {d_thresh}
                ORDER BY df DESC, g LIMIT 256)
        SELECT sum(df * df) AS uncapped,
               sum(CASE WHEN g NOT IN (SELECT g FROM hot)
                        THEN df * df ELSE 0 END) AS capped_rare,
               count(*) AS n_shingles,
               (SELECT count(*) FROM hot) AS n_hot
        FROM df
        """
    ).fetchone()
    return {
        "uncapped_join_rows": int(row[0]),
        "capped_rare_join_rows": int(row[1]),
        "n_distinct_shingles": int(row[2]),
        "n_hot_dict": int(row[3]),
    }


def run_spark_measurements(sizes: dict[str, int], uncapped_max: int,
                           timeout_note: str,
                           keys: tuple[str, ...] | None = None) -> list[dict]:
    from pudatalake_spark import registry
    from pudatalake_spark.llmops import dedup
    from pudatalake_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        spark.conf.set("spark.ui.showConsoleProgress", "false")
    except Exception:
        pass
    results = []
    out_path = os.path.join(OUT_ROOT, "results.jsonl")
    sink = open(out_path, "a")

    def emit(rec):
        results.append(rec)
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)
    for tag, n in sizes.items():
        sf_dir = os.path.join(OUT_ROOT, tag)
        vols = join_volumes(os.path.join(sf_dir, "documents.parquet"), n)
        for key in keys or ("q_dedup_near_jaccard", "q_dedup_near_minhash",
                            "q_dedup_groups"):
            t0 = time.time()
            try:
                out_rows = registry.QUERIES[key](spark, sf_dir).count()
                rec = {
                    "corpus": tag, "n_docs": n, "key": key, "capped": True,
                    "wall_s": round(time.time() - t0, 2),
                    "out_rows": out_rows, **vols,
                }
            except Exception as e:
                rec = {
                    "corpus": tag, "n_docs": n, "key": key, "capped": True,
                    "wall_s": round(time.time() - t0, 2),
                    "error": str(e)[:300], **vols,
                }
            emit(rec)
        # uncapped jaccard: only where the analytic volume is sane
        # (skipped entirely when a --keys subset was requested)
        if keys is not None:
            continue
        if vols["uncapped_join_rows"] <= uncapped_max:
            orig = dedup.HOT_DF_MIN
            dedup.HOT_DF_MIN = 10**9
            t0 = time.time()
            try:
                out_rows = registry.QUERIES["q_dedup_near_jaccard"](
                    spark, sf_dir
                ).count()
                rec = {
                    "corpus": tag, "n_docs": n,
                    "key": "q_dedup_near_jaccard", "capped": False,
                    "wall_s": round(time.time() - t0, 2),
                    "out_rows": out_rows, **vols,
                }
            except Exception as e:
                rec = {
                    "corpus": tag, "n_docs": n,
                    "key": "q_dedup_near_jaccard", "capped": False,
                    "wall_s": round(time.time() - t0, 2),
                    "error": str(e)[:300], **vols,
                }
            finally:
                dedup.HOT_DF_MIN = orig
            emit(rec)
        else:
            rec = {
                "corpus": tag, "n_docs": n,
                "key": "q_dedup_near_jaccard", "capped": False,
                "wall_s": None,
                "note": f"not attempted: projected "
                        f"{vols['uncapped_join_rows']:,} join rows "
                        f"({timeout_note})", **vols,
            }
            emit(rec)
    return results


def main() -> None:
    for tag, n in SIZES.items():
        p = generate(n, os.path.join(OUT_ROOT, tag))
        print(f"corpus {tag}: {n} docs at {p}", flush=True)
    if "--gen-only" in sys.argv:
        return
    # --keys k1,k2: measure only those dedup keys (r12: re-measuring
    # the CC rows after the one-job-per-round change without paying
    # the jaccard family's multi-minute/disk-bound arms again).
    keys = None
    if "--keys" in sys.argv:
        keys = tuple(sys.argv[sys.argv.index("--keys") + 1].split(","))
    run_spark_measurements(
        SIZES, uncapped_max=20_000_000_000,
        timeout_note="uncapped budget 2e10 rows",
        keys=keys,
    )
    print("WROTE", os.path.join(OUT_ROOT, "results.jsonl"))


if __name__ == "__main__":
    main()
