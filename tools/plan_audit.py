#!/usr/bin/env python
"""Physical-plan audit: assert the plan properties the 100 TB design
relies on (SURVEY §4), then write the evidence to PLANS.md.

A correctness gate checks results; this gate checks PLANS — that the
declarative formulation actually engaged Catalyst's scan pruning,
predicate pushdown, broadcast strategy, top-k rewrite, and
whole-stage codegen, and that no row-at-a-time Python evaluation
appears outside the explicitly-UDF operators. Run after any operator
change:

    python tools/plan_audit.py          # audit + rewrite PLANS.md
    python tools/plan_audit.py --check  # audit only (CI mode)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pudatalake_spark import registry
from pudatalake_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# name -> (must_contain regexes, must_NOT_contain regexes, why)
RULES: dict[str, tuple[list[str], list[str], str]] = {
    "q_scan_pushdown": (
        [r"PushedFilters: \[.*GreaterThanOrEqual"],
        [],
        "shipdate predicate must reach the parquet row-group reader",
    ),
    "q_scan_prune": (
        [r"ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"],
        [],
        "2-of-11-column projection must prune at the scan",
    ),
    "q_join_inner_broadcast": (
        [r"BroadcastHashJoin"],
        [r"SortMergeJoin"],
        "nation x region dim join must broadcast, never shuffle",
    ),
    "q_join_star_multiway": (
        [r"BroadcastHashJoin"],
        [],
        "star dims (customer/nation/region) must broadcast into the fact scan",
    ),
    "q_topk": (
        [r"TakeOrderedAndProject"],
        [r"(?<!Take)(?<!AQEShuffleRead )Sort(?!MergeJoin)\s"],
        "global top-10 must use the streaming top-k operator, not a full sort",
    ),
    "q_agg_groupby": (
        # AQE hides codegen ids pre-execution; the two-phase shape
        # (partial agg -> Exchange -> final agg) is the invariant.
        [r"partial_sum", r"Exchange", r"PushedFilters: \[IsNotNull\(l_shipdate\), LessThanOrEqual"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
        "flagship agg must be two-phase hash agg with pushdown, no Python",
    ),
    "q_win_rownumber_topk": (
        [r"WindowGroupLimit"],
        [],
        "rank<=k filter must push into the shuffle (WindowGroupLimit)",
    ),
    "q_sim_cosine_topk": (
        [r"BroadcastNestedLoopJoin|BroadcastHashJoin"],
        [r"CartesianProduct", r"SortMergeJoin"],
        "query set must broadcast; candidates stream (never shuffle N)",
    ),
    "q_dedup_near_minhash": (
        [r"InMemoryTableScan"],
        [r"CartesianProduct"],
        "signature/shingle tables are materialized once; band join is an equi join",
    ),
    "q_stream_tumbling": (
        [],
        [r"BatchEvalPython", r"ArrowEvalPython", r"CartesianProduct"],
        "windowed agg stays JVM-side",
    ),
    "q_text_tfidf": (
        [r"BroadcastHashJoin|BroadcastExchange"],
        [r"CartesianProduct"],
        "df/N side of tf-idf is small -> broadcast into tf",
    ),
}

# Operators whose PURPOSE is Python evaluation; everything else must
# stay JVM-side.
UDF_KEYS = {
    "udf_python_scalar", "udf_pandas_scalar", "udf_grouped_map",
    "udf_pandas_agg", "udtf_python", "q_multimodal_decode",
    "q_multimodal_framesample", "s_stateful_running",
}

SIDE_EFFECT = {"src_csv", "src_json", "sink_parquet_partitioned",
               "sink_overwrite_dynamic", "s_foreach_sink"}


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    check_only = "--check" in sys.argv
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    failures: list[str] = []
    sections: list[str] = []

    for name, (must, must_not, why) in sorted(RULES.items()):
        plan = explain_str(registry.QUERIES[name](spark, SF_DIR))
        for pat in must:
            if not re.search(pat, plan):
                failures.append(f"{name}: MISSING /{pat}/ ({why})")
        for pat in must_not:
            if re.search(pat, plan):
                failures.append(f"{name}: FORBIDDEN /{pat}/ present ({why})")
        # Evidence excerpt: the operator-tree header of the plan.
        tree = plan.split("\n\n")[0]
        sections.append(f"### `{name}`\n\n*Invariant: {why}.*\n\n```\n{tree}\n```\n")

    # Global rule: no Python evaluation outside the UDF surface.
    py_rx = re.compile(r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas")
    for name, fn in sorted(registry.QUERIES.items()):
        if name in UDF_KEYS or name in SIDE_EFFECT or name.startswith("s_"):
            continue
        plan = explain_str(fn(spark, SF_DIR))
        if py_rx.search(plan):
            failures.append(f"{name}: Python evaluation in a non-UDF operator")

    if failures:
        print("PLAN AUDIT FAILED:")
        for f in failures:
            print(" -", f)
        sys.exit(1)

    print(f"plan audit OK: {len(RULES)} invariant sets, "
          f"{len(registry.QUERIES) - len(UDF_KEYS) - len(SIDE_EFFECT)} "
          "queries JVM-side-verified")

    if not check_only:
        doc = [
            "# PLANS — physical-plan audit evidence",
            "",
            "Generated by `tools/plan_audit.py` (run it after any operator",
            f"change; `--check` for CI mode). Audited at `{SF_DIR}`.",
            "",
            "Two layers of enforcement:",
            "",
            "1. **Per-operator invariants** (below): regex assertions on",
            "   `explain('formatted')` — pushdown reached the scan, dims",
            "   broadcast, top-k avoided the full sort, aggregates are",
            "   codegen'd two-phase hash aggs.",
            "2. **Global rule**: no `BatchEvalPython`/`ArrowEvalPython`/",
            "   pandas evaluation node in ANY operator outside the declared",
            "   UDF surface — the whole relational/window/text inventory",
            "   runs JVM-side under whole-stage codegen.",
            "",
        ] + sections
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PLANS.md"), "w") as f:
            f.write("\n".join(doc))
        print("wrote PLANS.md")


if __name__ == "__main__":
    main()
