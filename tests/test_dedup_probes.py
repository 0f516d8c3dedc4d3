"""Probe tests for the df-capped exact-Jaccard plan
(pudatalake_spark/llmops/dedup.py::near_jaccard_pairs).

The df-cap drops stopword-like shingles (df > D) from the
inverted-index self-join and recovers their contribution from small
per-doc hot sets plus a hot-dominated-docs fallback. These probes
plant corpora where the fallback MUST fire and where the hot
add-back MUST be exact, and compare against a Python brute force
(the same shingle definition, no hashing - xxhash64 collisions are
the only divergence and are negligible at this size).
"""

from __future__ import annotations

import pytest

from pudatalake_spark.llmops.dedup import (
    HOT_DF_MIN,
    SHINGLE_LEN,
    near_jaccard_pairs,
)

# A base text long enough to dominate Jaccard when shared (~56
# distinct shingles) - every one of its shingles goes hot once >32
# docs contain it.
BASE = "the quick brown fox jumps over the lazy dog again and again ok"


def _brute(docs: list[tuple[int, str]], tau: float) -> dict[tuple[int, int], float]:
    sets = {
        i: {t[j : j + SHINGLE_LEN] for j in range(len(t) - (SHINGLE_LEN - 1))}
        for i, t in ((i, t.lower()) for i, t in docs)
    }
    out: dict[tuple[int, int], float] = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            union = len(a) + len(b) - inter
            if union and inter / union >= tau:
                out[(ids[x], ids[y])] = inter / union
    return out


def _planted_corpus() -> list[tuple[int, str]]:
    """34 identical hot-only docs (every shingle df=38 > HOT_DF_MIN=32
    once the tailed docs are counted), 2 near-dup docs sharing the hot
    base plus identical rare tails, 30 background docs whose shared
    template shingles stay rare (df=30 <= 32). n_docs=66 keeps
    D = max(HOT_DF_MIN, HOT_DF_FRAC*66) = 32."""
    docs = [(100 + i, BASE) for i in range(34)]
    docs += [(200, BASE + " zq unusual accounting tail"),
             (201, BASE + " zq unusual accounting tailx")]
    docs += [(i, f"background document number {i:04d} payload {i * 7919:07d}")
             for i in range(30)]
    return docs


def test_hot_only_duplicates_found_via_fallback(spark):
    """Pairs among the 34 identical docs share ZERO rare shingles -
    only the hot-dominated fallback can emit them. The (200, 201)
    pair shares hot AND rare shingles - exact only if the hot-set
    add-back is correct. Cross pairs (base x tailed) are hot-only
    between NON-identical docs. Brute force is ground truth for all."""
    docs = _planted_corpus()
    tau = 0.5
    got = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in near_jaccard_pairs(
            spark.createDataFrame(docs, "doc_id INT, text STRING"), tau
        ).collect()
    }
    want = _brute(docs, tau)
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))[:10]} "
        f"extra={sorted(set(got) - set(want))[:10]}"
    )
    for pair, j in want.items():
        assert got[pair] == pytest.approx(j, abs=1e-12), pair
    # The planted structure actually exercised the paths it claims:
    ident = [(a, b) for (a, b) in want if 100 <= a < 134 and 100 <= b < 134]
    assert len(ident) == 34 * 33 // 2 and all(
        want[p] == 1.0 for p in ident
    ), "hot-only identical block missing from ground truth"
    assert (200, 201) in want and want[(200, 201)] < 1.0
    assert any(100 <= a < 134 and b in (200, 201) for (a, b) in want), (
        "expected hot-only pairs between non-identical docs"
    )


def test_df_cap_engages_on_planted_corpus(spark):
    """The rare-only self-join input must be strictly smaller than the
    uncapped inverted index - i.e. the cap is live, not vacuous, on a
    corpus where 36 docs share every BASE shingle."""
    from pyspark.sql import functions as F

    from pudatalake_spark.llmops.dedup import _hashed_shingles_col

    docs = spark.createDataFrame(_planted_corpus(), "doc_id INT, text STRING")
    inst = docs.select(
        "doc_id", F.explode(_hashed_shingles_col()).alias("shingle")
    )
    from pudatalake_spark.llmops.dedup import HOT_DF_FRAC

    n_docs = inst.select("doc_id").distinct().count()
    dfs = inst.groupBy("shingle").agg(F.count("*").alias("df"))
    cap = max(HOT_DF_MIN, HOT_DF_FRAC * n_docs)
    total = inst.count()
    rare = dfs.filter(F.col("df") <= cap).join(inst, "shingle").count()
    assert rare < total, "df-cap never fired on the planted corpus"
    # BASE has ~56 distinct shingles shared by 36 docs: the cap must
    # remove at least that many instances.
    assert total - rare >= 36 * 50


def test_short_text_yields_no_shingles_and_no_pairs(spark):
    """Text shorter than SHINGLE_LEN must produce an EMPTY shingle set
    (the unguarded sequence() counts DOWN and substr() fabricates junk)
    and short docs must never pair - not even with identical text,
    matching the DuckDB range() comprehension which yields nothing."""
    from pyspark.sql import functions as F

    from pudatalake_spark.llmops.dedup import _hashed_shingles_col

    docs = [(1, "ab"), (2, "ab"), (3, ""), (4, "abcd"),
            (5, "abcde"), (6, "abcde")]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    sizes = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(_hashed_shingles_col()).alias("n")
        ).collect()
    }
    assert sizes == {1: 0, 2: 0, 3: 0, 4: 0, 5: 1, 6: 1}
    got = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in near_jaccard_pairs(df, 0.5).collect()
    }
    assert got == {(5, 6): 1.0}


def test_cc_min_label_chain_components_singletons(spark):
    """cc_min_label's fixed CC_ROUNDS=6 must converge a 100-node
    chain (documented diameter bound 2^(R+1)-1 = 127), a separate
    triangle component, and leave singletons labeled by themselves."""
    from pudatalake_spark.llmops.dedup import cc_min_label

    chain = [(i, i + 1) for i in range(99)]  # 0-1-...-99
    tri = [(200, 201), (201, 202), (200, 202)]
    pairs = spark.createDataFrame(
        chain + tri, "doc1 BIGINT, doc2 BIGINT"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in range(100)] + [(200,), (201,), (202,), (300,)],
        "u BIGINT",
    )
    got = {r["u"]: r["lbl"] for r in cc_min_label(nodes, pairs).collect()}
    want = {i: 0 for i in range(100)} | {200: 200, 201: 200, 202: 200, 300: 300}
    assert got == want


def test_pair_cond_pushdown_equals_post_filter(spark):
    """pair_cond (r8, the q_dedup_cross_corpus parity pushdown) must
    be pure pushdown: conjoining the predicate into the candidate
    joins yields EXACTLY the post-filtered pair set - including
    hot-only pairs that exist only via the fallback enumeration."""
    docs = _planted_corpus()
    tau = 0.5
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    parity = lambda d1, d2: (d1 % 2) != (d2 % 2)  # noqa: E731
    pushed = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in near_jaccard_pairs(df, tau, pair_cond=parity).collect()
    }
    post = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in near_jaccard_pairs(df, tau).collect()
        if (r["doc1"] % 2) != (r["doc2"] % 2)
    }
    assert pushed == post
    assert pushed, "planted corpus must contain opposite-parity pairs"


def test_cross_corpus_probe_branch_matches_exact(spark, monkeypatch):
    """q_dedup_cross_corpus's r10 size switch: forcing the
    minhash-probe branch (threshold -> -1) must produce EXACTLY the
    exact-index branch's output at sf0.001, and forcing the exact
    branch (threshold -> huge) must reproduce the default. Pins that
    the branch switch changes the PLAN, never the answer - the
    q_dedup_groups edge-set argument applied to the parity split."""
    from pudatalake_spark import registry
    from pudatalake_spark.llmops import dedup
    from tests.conftest import SF_DIR

    registry.load_all()
    q = registry.QUERIES["q_dedup_cross_corpus"]

    def rows():
        return sorted(
            (r["batch_doc"], r["ref_doc"], round(r["jaccard"], 9))
            for r in q(spark, SF_DIR).collect()
        )

    monkeypatch.setattr(dedup, "CROSS_EXACT_MAX_BYTES", 1 << 60)
    exact = rows()
    monkeypatch.setattr(dedup, "CROSS_EXACT_MAX_BYTES", -1)
    probe = rows()
    assert exact == probe
    assert exact, "fixture must contain cross-parity near-dup pairs"


def test_minhash_pair_cond_pushdown_equals_post_filter(spark):
    """minhash_verified_pairs' pair_cond (r10) must be pure pushdown,
    same contract as near_jaccard_pairs': conjoining the parity
    predicate into the band-bucket join yields exactly the
    post-filtered verified-pair set."""
    from pudatalake_spark.llmops.dedup import minhash_verified_pairs

    docs = _planted_corpus()
    tau = 0.5
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    parity = lambda d1, d2: (d1 % 2) != (d2 % 2)  # noqa: E731
    pushed = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in minhash_verified_pairs(df, tau, pair_cond=parity).collect()
    }
    post = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in minhash_verified_pairs(df, tau).collect()
        if (r["doc1"] % 2) != (r["doc2"] % 2)
    }
    assert pushed == post
    assert pushed, "planted corpus must contain opposite-parity pairs"
