"""Reliable-checkpoint opt-in (r9, VERDICT r8 #3): every iterative /
shared-frame materialization rides ``session.superstep_checkpoint``,
which defaults to ``localCheckpoint`` (fast, non-replicated — executor
loss fails the job) and switches to reliable ``checkpoint()`` into
``spark.pudatalake.checkpoint.dir`` when that conf is set (the
dynamic-allocation / spot-cluster posture at 100 TB; docs/SCALING.md
§6).

The gate here: the reliable path must produce IDENTICAL output on one
representative key per iterative family — CC pointer-jumping
(q_dedup_groups), PageRank supersteps (q_graph_pagerank), k-core
peeling (q_graph_kcore), BFS frontier (q_graph_bfs_levels), and the
bucketed global-rank helper (q_events_rfm → ranks.global_order ×3).
"""

from __future__ import annotations

import pytest

from pudatalake_spark import registry
from pudatalake_spark.session import CHECKPOINT_DIR_CONF, superstep_checkpoint

from tests.conftest import SF_DIR

registry.load_all()

FAMILY_KEYS = [
    "q_dedup_groups",     # connected components (pointer jumping)
    "q_graph_pagerank",   # damped superstep iteration
    "q_graph_kcore",      # peeling fixpoint + bucketed K-pick
    "q_graph_bfs_levels", # frontier expansion fixpoint
    "q_events_rfm",       # ranks.global_order bucketed two-pass x3
]


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture
def reliable_dir(spark, tmp_path):
    """Point the session at a throwaway reliable checkpoint dir for
    one test, restoring the localCheckpoint default afterwards. The
    JVM checkpoint dir itself is session-global and harmless to leave
    set — superstep_checkpoint only consults the conf."""
    spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ckpt"))
    yield str(tmp_path / "ckpt")
    spark.conf.unset(CHECKPOINT_DIR_CONF)


def test_conf_switches_strategy(spark, reliable_dir, monkeypatch):
    """ADVICE r9: the old assertion (JVM getCheckpointDir().isDefined())
    went vacuous whenever another test had already set the
    session-global dir (test_eager_capture does). Observe the ACTUAL
    strategy call instead: patch the classic DataFrame methods (the
    public pyspark.sql.DataFrame ABC's methods are overridden -
    patches there capture nothing, r8) and assert conf-set routes to
    checkpoint() and conf-unset to localCheckpoint()."""
    import pyspark.sql.classic.dataframe as cdf

    calls: list[str] = []
    orig_ck = cdf.DataFrame.checkpoint
    orig_lck = cdf.DataFrame.localCheckpoint
    monkeypatch.setattr(
        cdf.DataFrame, "checkpoint",
        lambda self, eager=True: (
            calls.append("reliable"), orig_ck(self, eager=eager)
        )[1],
    )
    monkeypatch.setattr(
        cdf.DataFrame, "localCheckpoint",
        lambda self, eager=True: (
            calls.append("local"), orig_lck(self, eager=eager)
        )[1],
    )
    out = superstep_checkpoint(spark.range(100))
    assert calls == ["reliable"]
    assert out.count() == 100
    spark.conf.unset(CHECKPOINT_DIR_CONF)
    calls.clear()
    out2 = superstep_checkpoint(spark.range(5))
    assert calls == ["local"]
    assert out2.count() == 5


@pytest.mark.parametrize("key", FAMILY_KEYS)
def test_reliable_path_identical_output(spark, key, tmp_path):
    base = _rows(registry.QUERIES[key](spark, SF_DIR))
    spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ckpt"))
    try:
        reliable = _rows(registry.QUERIES[key](spark, SF_DIR))
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    assert reliable == base
