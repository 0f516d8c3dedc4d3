#!/usr/bin/env python
"""Analytic probe: would PPJoin-style prefix filtering beat the
hot-shingle df-cap for q_dedup_near_jaccard? (r10)

Prefix filtering (Bayardo et al. 2007; Xiao et al. 2008): order the
shingle universe by ascending (df, shingle); for J >= tau it is
provably complete to index/join only each doc's PREFIX — its first
|s| - ceil(tau*|s|) + 1 shingles in that order — because two sets
with J >= tau must share at least one prefix element under a common
total order. The index join volume is then sum over shingles of
(prefix-df)^2 instead of df^2, and the exact verify runs per
candidate (array intersect on the full cached sets) instead of
riding the counting join.

This probe computes IN DUCKDB, without running any join:
  - uncapped volume           = sum(df^2)            (r9 baseline)
  - capped-rare volume        = sum(df^2) over non-hot (current plan)
  - prefix volume             = sum(prefix_df^2)     (candidate plan)
  - distinct candidate pairs from the prefix join (upper bound on
    verify input) and the verify cost proxy (pairs x mean set size)

over the self-similar dedup-scale corpora (x1=5k, x3=15k, x10=50k
docs). Decision rule stated up front: implement the rework only if
prefix volume is >= 5x below capped-rare AND the verify proxy stays
below the saved join volume; otherwise record the probe as the
evidence (the SCALING §23 discipline).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(REPO, ".scratch", "dedup_scale")
TAU = 0.5
SIZES = {"x1": 5_000, "x3": 15_000, "x10": 50_000}


def probe(path: str, n_docs: int) -> dict:
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    d_thresh = max(32, int(0.2 * n_docs))
    row = con.execute(
        f"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([hash(substr(lower(text), i + 1, 5))
                                FOR i IN range(0, length(text) - 4)]) AS s
          FROM read_parquet('{path}')),
        inst AS (SELECT doc_id, unnest(s) AS g, len(s) AS n_sh FROM sh),
        df AS (SELECT g, count(*) AS df FROM inst GROUP BY g),
        hot AS (SELECT g FROM df WHERE df > {d_thresh}
                ORDER BY df DESC, g LIMIT 256),
        ranked AS (
          SELECT i.doc_id, i.g, i.n_sh,
                 row_number() OVER (PARTITION BY i.doc_id
                                    ORDER BY d.df, i.g) AS rk
          FROM inst i JOIN df d USING (g)),
        prefix AS (
          SELECT doc_id, g FROM ranked
          WHERE rk <= n_sh - CAST(ceil({TAU} * n_sh) AS BIGINT) + 1),
        pdf AS (SELECT g, count(*) AS pdf FROM prefix GROUP BY g)
        SELECT
          (SELECT sum(df * df) FROM df)                    AS uncapped,
          (SELECT sum(df * df) FROM df
            WHERE g NOT IN (SELECT g FROM hot))            AS capped_rare,
          (SELECT sum(pdf * pdf) FROM pdf)                 AS prefix_vol,
          (SELECT count(*) FROM prefix)                    AS prefix_entries,
          (SELECT count(*) FROM inst)                      AS all_entries,
          (SELECT avg(len(s)) FROM sh)                     AS mean_set
        """
    ).fetchone()
    # distinct candidate pairs from the prefix join (exact, still
    # analytic: count distinct (d1, d2) sharing a prefix shingle,
    # with the size-ratio prune)
    cand = con.execute(
        f"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([hash(substr(lower(text), i + 1, 5))
                                FOR i IN range(0, length(text) - 4)]) AS s
          FROM read_parquet('{path}')),
        inst AS (SELECT doc_id, unnest(s) AS g, len(s) AS n_sh FROM sh),
        df AS (SELECT g, count(*) AS df FROM inst GROUP BY g),
        ranked AS (
          SELECT i.doc_id, i.g, i.n_sh,
                 row_number() OVER (PARTITION BY i.doc_id
                                    ORDER BY d.df, i.g) AS rk
          FROM inst i JOIN df d USING (g)),
        prefix AS (
          SELECT doc_id, g, n_sh FROM ranked
          WHERE rk <= n_sh - CAST(ceil({TAU} * n_sh) AS BIGINT) + 1)
        SELECT count(*) FROM (
          SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM prefix a JOIN prefix b ON a.g = b.g
           AND a.doc_id < b.doc_id
           AND a.n_sh >= {TAU} * b.n_sh AND b.n_sh >= {TAU} * a.n_sh)
        """
    ).fetchone()[0]
    return {
        "uncapped_join_rows": int(row[0]),
        "capped_rare_join_rows": int(row[1]),
        "prefix_join_rows": int(row[2]),
        "prefix_index_entries": int(row[3]),
        "all_index_entries": int(row[4]),
        "mean_set_size": round(float(row[5]), 1),
        "distinct_candidate_pairs": int(cand),
        "verify_cost_proxy_rows": int(cand * 2 * float(row[5])),
    }


def main() -> None:
    for tag, n in SIZES.items():
        path = os.path.join(ROOT, tag, "documents.parquet")
        if not os.path.exists(path):
            print(f"{tag}: corpus missing, run measure_dedup_scale.py --gen-only")
            continue
        rec = {"corpus": tag, "n_docs": n, **probe(path, n)}
        rec["prefix_vs_capped_x"] = round(
            rec["capped_rare_join_rows"] / max(1, rec["prefix_join_rows"]), 2
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
