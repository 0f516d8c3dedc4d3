"""Structural invariants for the r5c pipeline-prep operators —
properties the row-for-row oracle can't state (it would just repeat
the same SQL): chunk coverage/addressing algebra, mixture quota
maths, histogram closure, and PIT-join totality.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from pudatalake_spark import registry
from pudatalake_spark.llmops.pipeline import (
    CHUNK_STRIDE,
    CHUNK_W,
    MIX_WEIGHTS,
)
from pudatalake_spark.loaders import table

from tests.conftest import SF_DIR

registry.load_all()


def test_chunk_coverage_and_addressing(spark):
    """Every document's chunks tile it: start = idx*stride, windows
    cover word 0..n-1 with no gap, every chunk is full-width except
    trailing ones, and n_words = min(W, n - start) exactly."""
    out = registry.QUERIES["q_chunk_documents"](spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["n"]
        for r in table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower("text"), " "), lambda t: t != ""
                )
            ).alias("n"),
        )
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every non-empty doc is chunked
    assert set(by_doc) == {d for d, n in docs.items() if n > 0}
    for doc_id, rows in by_doc.items():
        n = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert len(rows) == math.ceil(n / CHUNK_STRIDE)
        for r in rows:
            assert r["start_word"] == r["chunk_idx"] * CHUNK_STRIDE
            assert r["n_words"] == min(CHUNK_W, n - r["start_word"])
        covered_to = rows[-1]["start_word"] + rows[-1]["n_words"]
        assert covered_to == n  # no tail words dropped


def test_mix_weighted_quota_math(spark):
    """Quotas follow the capacity solve exactly: T = min(n_l / w_l),
    k_l = floor(w_l * T), every quota is filled, and achieved shares
    sum to 1."""
    rows = {r["lang"]: r for r in
            registry.QUERIES["q_mix_weighted"](spark, SF_DIR).collect()}
    assert set(rows) == set(MIX_WEIGHTS)
    t_max = min(r["n_avail"] / MIX_WEIGHTS[l] for l, r in rows.items())
    total_quota = 0
    for lang, r in rows.items():
        assert r["quota"] == math.floor(MIX_WEIGHTS[lang] * t_max)
        assert r["n_taken"] == r["quota"] <= r["n_avail"]
        total_quota += r["quota"]
    assert abs(sum(r["achieved_share"] for r in rows.values()) - 1.0) < 1e-12
    # the mix is within one doc per language of the target proportion
    for lang, r in rows.items():
        assert abs(r["n_taken"] - MIX_WEIGHTS[lang] * total_quota) <= 1.0


def test_seq_len_buckets_closure(spark):
    """The histogram closes: cum_docs ends at the corpus size and
    cum_token_share at exactly 1.0."""
    rows = sorted(
        registry.QUERIES["q_seq_len_buckets"](spark, SF_DIR).collect(),
        key=lambda r: r["bucket_lo"],
    )
    n_docs = table(spark, SF_DIR, "documents").count()
    assert rows[-1]["cum_docs"] == sum(r["n_docs"] for r in rows) == n_docs
    assert rows[-1]["cum_token_share"] == 1.0
    assert all(
        a["cum_docs"] < b["cum_docs"] for a, b in zip(rows, rows[1:])
    )


def test_oov_rate_bounds(spark):
    rows = registry.QUERIES["q_text_oov_rate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_rate"] == r["n_oov"] / r["n_tokens"]


def test_pit_scd2_attributes_every_purchase(spark):
    """Prior-state PIT accounting: every purchase with ANY earlier
    non-purchase activity is attributed exactly once (no fan-out
    despite multiple qualifying versions), purchases with no prior
    state are excluded - the two counts reconcile against a direct
    computation, and the state distribution is non-degenerate
    (>1 state, the reason the prior-state form exists)."""
    out = registry.QUERIES["q_join_pit_scd2"](spark, SF_DIR).collect()
    n_attr = sum(r["n_purchases"] for r in out)
    ev = table(spark, SF_DIR, "events")
    first_np = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_np"))
    )
    n_expected = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_np, "user_id")
        .filter(F.col("ts") >= F.col("t_np"))
        .count()
    )
    assert n_attr == n_expected
    assert len(out) > 1  # degenerate single-state output is the bug


def test_forecast_backtest_window(spark):
    """The backtest scores only the trailing week: 1..7 scored days
    per event type, and MAPE is consistent with MAE scale (both
    derive from the same |err| terms)."""
    rows = registry.QUERIES["q_events_forecast_seasonal"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_days"] <= 7
        assert r["mae"] >= 0 and r["mape"] >= 0
        assert abs(r["bias"]) <= r["mae"] + 1e-9


def test_hamming_pairs_64_planted(spark):
    """The shared 4x16 pigeonhole banding (text SimHash + image pHash
    dedup) finds EVERY pair at hamming <= 3 and nothing beyond -
    including the adversarial hamming-4 case with one flipped bit per
    band (no band equal, so blocking alone would miss it; it must be
    absent because it is truly beyond radius, and the
    one-band-concentrated hamming-4 case must be caught as a
    candidate then rejected by the exact verify)."""
    from pudatalake_spark.llmops.dedup import hamming_pairs_64

    base = 0x1234_5678_9ABC_DEF0
    hashes = {
        1: base,
        2: base ^ 0x1,                                   # hamming 1
        3: base ^ 0x7,                                   # hamming 3
        4: base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48)),  # 4, spread
        5: base ^ 0xF,                                   # 4, one band
        6: base,                                         # exact dup
    }
    sig = spark.createDataFrame(
        [(i, h - (1 << 64) if h >= (1 << 63) else h)
         for i, h in hashes.items()],
        "doc_id long, phash long",
    )
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in hamming_pairs_64(sig, "doc_id", "phash").collect()
    }
    expect = {}
    ids = sorted(hashes)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin(hashes[i] ^ hashes[j]).count("1")
                if d <= 3:
                    expect[(i, j)] = d
    assert got == expect


def test_approx_topk_exact_at_low_cardinality(spark):
    """approx_top_k with capacity >> cardinality is exact: the
    sketch's top-10 supplier counts must equal the exact groupBy
    counts (sets compared count-wise; tie ORDER at the k boundary is
    sketch-unspecified, so membership is compared per count class,
    not positionally)."""
    from pudatalake_spark.loaders import table

    rows = registry.QUERIES["q_agg_approx_topk"](spark, SF_DIR).collect()
    exact = (
        table(spark, SF_DIR, "lineitem")
        .groupBy("l_suppkey")
        .count()
        .orderBy(F.col("count").desc(), "l_suppkey")
        .collect()
    )
    assert len(rows) == 10
    got_counts = sorted((r["cnt"] for r in rows), reverse=True)
    want_counts = sorted((r["count"] for r in exact[:10]), reverse=True)
    assert got_counts == want_counts
    # every reported (supplier, cnt) matches its exact count
    exact_map = {r["l_suppkey"]: r["count"] for r in exact}
    for r in rows:
        assert exact_map[r["supplier"]] == r["cnt"]


def test_pca_power_matches_numpy(spark):
    """The in-plan power iteration equals numpy's from the same
    uniform start (tolerance covers float-sum ordering), and after
    sign canonicalization it is within the expected angle of numpy's
    true top right-singular vector at this iteration count."""
    import numpy as np
    import pyarrow.parquet as pq

    from pudatalake_spark.llmops.similarity import PCA_ITERS

    rows = sorted(
        registry.QUERIES["q_embeddings_pca_power"](spark, SF_DIR).collect(),
        key=lambda r: r["dim"],
    )
    A = np.array(
        pq.read_table(f"{SF_DIR}/embeddings.parquet")["embedding"]
        .to_pylist(),
        dtype=np.float64,
    )
    v = np.full(64, 1 / np.sqrt(64))
    for _ in range(PCA_ITERS):
        u = A.T @ (A @ v)
        v = u / np.linalg.norm(u)
    got = np.array([r["loading"] for r in rows])
    assert np.allclose(got, v, atol=1e-9)
    sigma = np.linalg.norm(A @ v)
    assert abs(rows[0]["sigma"] - sigma) < 1e-6
    # algebraic property: every power step is a steepest-ascent move
    # on the Rayleigh quotient, so sigma(v_final) > sigma(v_0) and
    # sigma can never exceed the true top singular value. (This
    # corpus's near-isotropic spectrum makes 3 iterations FAR from
    # the SVD direction - a data property, not an operator bug - so
    # proximity to vt[0] is deliberately NOT asserted.)
    sigma0 = np.linalg.norm(A @ np.full(64, 1 / np.sqrt(64)))
    top_sv = np.linalg.svd(A, compute_uv=False)[0]
    assert sigma0 < rows[0]["sigma"] <= top_sv + 1e-9
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9


def test_survival_km_properties(spark):
    """KM invariants the oracle can't state: the not-yet-converted
    curve is in [0,1] and non-increasing over days-since-signup; the
    at-risk count is non-increasing; conversions-at-t never exceed
    at-risk; and censoring is REAL on this fixture (the curve's
    final value stays above zero because never-converters exist)."""
    rows = sorted(
        registry.QUERIES["q_events_survival_km"](spark, SF_DIR).collect(),
        key=lambda r: r["days_since_signup"],
    )
    assert rows, "no conversion events - vacuous fixture"
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r["km_not_yet_converted"] <= 1.0
        assert r["km_not_yet_converted"] <= prev_s + 1e-12
        assert 0 < r["n_converted"] <= r["n_at_risk"]
        if prev_n is not None:
            assert r["n_at_risk"] <= prev_n
        prev_s, prev_n = r["km_not_yet_converted"], r["n_at_risk"]
    # accounting closes: conversions never exceed the largest
    # at-risk pool (at sf0.001 every signup user converts, so
    # equality is legitimate; sf0.01 has real censoring - 69 events
    # over 150 subjects - which the driver run exercises)
    n_events = sum(r["n_converted"] for r in rows)
    assert 1 <= n_events <= max(r["n_at_risk"] for r in rows)


def test_changelog_apply_tombstone_semantics(spark):
    """A key whose LATEST record is a tombstone is absent; a key with
    an older tombstone but newer upsert survives - checked against a
    pandas replay of the same log."""
    import duckdb

    surviving = {
        r["key"]
        for r in registry.QUERIES["q_lake_changelog_apply"](
            spark, SF_DIR
        ).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT o_custkey AS key,
               arg_max(CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END,
                       lpad(CAST(epoch_us(o_orderdate) AS VARCHAR), 20, '0')
                         || lpad(CAST(o_orderkey AS VARCHAR), 12, '0'))
                   AS last_op
        FROM read_parquet('{SF_DIR}/orders.parquet')
        GROUP BY 1
        """
    ).fetchall()
    con.close()
    live = {k for k, op in ref if op == "U"}
    dead = {k for k, op in ref if op == "D"}
    assert surviving == live
    assert surviving.isdisjoint(dead)
    assert dead, "fixture has no tombstone-final keys; test is vacuous"


def test_boilerplate_strip_targets_injected_footer(spark):
    """Exactly the even-doc_id docs are stripped, their cleaned word
    count drops by the footer length, and odd docs pass through with
    their original text hash."""
    import hashlib

    from pudatalake_spark.llmops.text import BOILER_WORDS

    rows = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_text_boilerplate_strip"](
            spark, SF_DIR
        ).collect()
    }
    docs = {
        r["doc_id"]: [w for w in r["text"].lower().split(" ") if w != ""]
        for r in table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert set(rows) == set(docs)
    for doc_id, words in docs.items():
        r = rows[doc_id]
        # in BOTH branches the cleaned text must equal the
        # pre-injection original - a strip that removes the wrong 8
        # words keeps the count right but flips the hash
        want = hashlib.md5(" ".join(words).encode()).hexdigest()
        assert r["stripped"] == (1 if doc_id % 2 == 0 else 0)
        assert r["n_words_clean"] == len(words)
        assert r["clean_hash"] == want


def test_compression_ratio_matches_zlib(spark):
    """The compression signal equals direct zlib(level 6) on the same
    texts for every document, and the flag applies the declared
    threshold."""
    import zlib

    from pudatalake_spark.llmops.text import COMPRESS_MAX_RATIO

    rows = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_text_compression_ratio"](
            spark, SF_DIR
        ).collect()
    }
    docs = dict(
        table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    )
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        r = rows[doc_id]
        raw = text.encode("utf-8")
        assert r["raw_bytes"] == len(raw)
        assert r["comp_bytes"] == len(zlib.compress(raw, 6))
        assert r["comp_ratio"] == r["comp_bytes"] / r["raw_bytes"]
        assert r["too_repetitive"] == (
            1 if r["comp_ratio"] < COMPRESS_MAX_RATIO else 0
        )


def test_hamming_pairs_64_fuzz(spark):
    """Hypothesis fuzz of the shared banding vs brute force: for
    random signature sets (drawn to cluster within a few bits so
    near pairs actually occur), the banded join returns EXACTLY the
    hamming<=3 pairs. Few examples (each costs a Spark job), but
    each example checks every pair."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pudatalake_spark.llmops.dedup import hamming_pairs_64

    base_s = st.integers(0, (1 << 64) - 1)
    # each signature = base XOR a mask with 0..6 random bit flips
    flips_s = st.lists(
        st.lists(st.integers(0, 63), min_size=0, max_size=6),
        min_size=2,
        max_size=8,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(base=base_s, flip_sets=flips_s)
    def run(base, flip_sets):
        hashes = {}
        for i, flips in enumerate(flip_sets):
            h = base
            for b in flips:
                h ^= 1 << b
            hashes[i] = h
        sig = spark.createDataFrame(
            [
                (i, h - (1 << 64) if h >= (1 << 63) else h)
                for i, h in hashes.items()
            ],
            "doc_id long, phash long",
        )
        got = {
            (r["doc1"], r["doc2"]): r["hamming"]
            for r in hamming_pairs_64(sig, "doc_id", "phash").collect()
        }
        expect = {
            (i, j): bin(hashes[i] ^ hashes[j]).count("1")
            for i in hashes
            for j in hashes
            if i < j and bin(hashes[i] ^ hashes[j]).count("1") <= 3
        }
        assert got == expect

    run()


def test_knn_graph_recall_floor(spark):
    """The multi-probe banded kNN graph must keep recall@5 >= 0.95
    against the exact numpy graph (measured 0.992 with 6 bands + 2
    margin-ranked flip probes at sf0.001, 0.996 at sf0.01 - the r11
    operating point; 1 probe measured 0.960/0.966 - on this
    near-isotropic corpus, the HARD case for sign-bit LSH; the
    measured recall/volume ladder lives in the operator docstring
    and SCALING sec 21). Every returned edge's cosine must also
    match numpy to 1e-6."""
    import numpy as np
    import pyarrow.parquet as pq

    from pudatalake_spark.llmops.similarity import KNN_GRAPH_K

    rows = registry.QUERIES["q_sim_knn_graph"](spark, SF_DIR).collect()
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["src"], set()).add(r["dst"])
        assert len(got[r["src"]]) <= KNN_GRAPH_K
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    A = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    A = A / np.linalg.norm(A, axis=1, keepdims=True)
    S = A @ A.T
    np.fill_diagonal(S, -2)
    idx = {v: i for i, v in enumerate(ids)}
    hits = tot = 0
    for i, vid in enumerate(ids):
        top = {ids[j] for j in np.argsort(-S[i])[:KNN_GRAPH_K]}
        hits += len(top & got.get(vid, set()))
        tot += KNN_GRAPH_K
    assert hits / tot >= 0.95
    for r in rows:
        assert abs(r["cos_sim"] - S[idx[r["src"]], idx[r["dst"]]]) < 1e-6


def test_knn_probe_ladder_guard(spark, monkeypatch):
    """ADVICE r11: the single-flip probe ladder has exactly
    KNN_BITS_PER_BAND rungs; a KNN_PROBES bump past it must fail
    LOUDLY at plan-construction time, not silently probe duplicate
    buckets and erode recall."""
    from pudatalake_spark.llmops import similarity as sim

    monkeypatch.setattr(
        sim, "KNN_PROBES", sim.KNN_BITS_PER_BAND + 1
    )
    with pytest.raises(NotImplementedError, match="probe ladder"):
        registry.QUERIES["q_sim_knn_graph"](spark, SF_DIR)


def test_kmeans_lloyd_matches_numpy(spark):
    """q_sim_kmeans_lloyd pin: re-run the IDENTICAL algorithm in
    numpy - seed centroids = vec_id 0..7, exactly 2 (assign, update)
    supersteps with min-(dist, cid) tie-break, final assignment on
    the updated centroids, empty clusters dropped - and require the
    same cluster sizes and 4dp inertia row-for-row."""
    import numpy as np
    import pyarrow.parquet as pq

    from pudatalake_spark.llmops.similarity import KMEANS_ITERS, KMEANS_K

    got = {
        int(r["cluster_id"]): (int(r["n_members"]), float(r["inertia"]))
        for r in registry.QUERIES["q_sim_kmeans_lloyd"](spark, SF_DIR).collect()
    }

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    A = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, A = ids[order], A[order]
    cids = list(range(KMEANS_K))
    C = A[np.isin(ids, cids)]

    def assign(C, cids):
        d = ((A[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)  # ties -> lowest index = lowest cid
        return np.array([cids[b] for b in best]), d.min(axis=1)

    for _ in range(KMEANS_ITERS):
        a, _ = assign(C, cids)
        kept, newC = [], []
        for c in cids:
            m = a == c
            if m.any():
                kept.append(c)
                newC.append(A[m].mean(axis=0))
        cids, C = kept, np.array(newC)
    a, d = assign(C, cids)
    expect = {}
    for c in cids:
        m = a == c
        if m.any():
            expect[c] = (int(m.sum()), round(float(d[m].sum()), 4))
    assert set(got) == set(expect)
    # Membership allows +-1 slack per cluster: Spark's sequential
    # avg and numpy's pairwise-summed mean differ in centroid ULPs,
    # so a vector near-equidistant between two centroids may flip -
    # totals and inertia pin the substance without the ULP coupling.
    assert sum(g[0] for g in got.values()) == len(ids)
    for c in expect:
        assert abs(got[c][0] - expect[c][0]) <= 1, (c, got[c], expect[c])
        assert abs(got[c][1] - expect[c][1]) < 1e-2 * max(
            1.0, expect[c][1]
        ), (c, got[c], expect[c])


def test_bfs_levels_matches_python_bfs(spark):
    """q_graph_bfs_levels vs a dict-based BFS over the same edges."""
    import collections
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    adj = collections.defaultdict(set)
    for ck, sk in j[["o_custkey", "l_suppkey"]].drop_duplicates().itertuples(False):
        adj[int(ck) + 1].add(-(int(sk) + 1))
        adj[-(int(sk) + 1)].add(int(ck) + 1)
    level = {2: 0}  # seed customer 1 -> node +2 under the offset ids
    frontier = [2]
    for lvl in range(1, 9):
        nxt = {b for a in frontier for b in adj[a] if b not in level}
        if not nxt:
            break
        for b in nxt:
            level[b] = lvl
        frontier = list(nxt)
    ref = collections.Counter()
    for node, lvl in level.items():
        ref[(lvl, node > 0)] += 1
    rows = registry.QUERIES["q_graph_bfs_levels"](spark, SF_DIR).collect()
    got = {(r.level, True): r.n_customers for r in rows}
    got.update({(r.level, False): r.n_suppliers for r in rows})
    got = {k: v for k, v in got.items() if v}
    assert got == {k: v for k, v in ref.items() if v}


def test_zonemap_prune_matches_pandas(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    ref = {}
    for layout, keys in [
        ("date_clustered", ["o_orderdate", "o_orderkey"]),
        ("value_sorted", ["cents", "o_orderkey"]),
    ]:
        s = o.sort_values(keys, kind="mergesort").reset_index(drop=True)
        s["fid"] = s.index // 1000
        z = s.groupby("fid")["cents"].agg(["min", "max", "count"])
        skip = (z["max"] < 20_000_000) | (z["min"] > 21_000_000)
        ref[layout] = (len(z), int(skip.sum()), int(z.loc[~skip, "count"].sum()))
    rows = registry.QUERIES["q_lake_zonemap_prune"](spark, SF_DIR).collect()
    got = {r.layout: (r.n_files, r.n_files_skipped, r.rows_scanned) for r in rows}
    assert got == ref


def test_geo_nearest_matches_numpy_haversine(spark):
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    ck = c["c_custkey"].to_numpy().astype("int64")
    clat = ((ck * 31 + 17) % 160 - 80).astype("float64") + 0.25
    clon = ((ck * 61 + 29) % 360 - 180).astype("float64") + 0.25
    nk = np.arange(25)
    slat = ((nk * 7) % 140 - 70).astype("float64") + 0.5
    slon = ((nk * 37) % 360 - 180).astype("float64") + 0.5
    p1, p2 = np.radians(clat)[:, None], np.radians(slat)[None, :]
    dphi = np.radians(slat[None, :] - clat[:, None]) / 2
    dlam = np.radians(slon[None, :] - clon[:, None]) / 2
    hav = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    d = np.round(2 * 6371.0 * np.arcsin(np.sqrt(hav)), 6)
    nearest = d.argmin(axis=1)  # ties impossible by construction
    rows = registry.QUERIES["q_join_geo_nearest"](spark, SF_DIR).collect()
    got_counts = {r.site_id: r.n_customers for r in rows}
    ref_counts = dict(zip(*np.unique(nearest, return_counts=True)))
    assert got_counts == {int(k): int(v) for k, v in ref_counts.items()}
    for r in rows:
        m = nearest == r.site_id
        assert r.avg_dist_km == pytest.approx(
            round(d[m, r.site_id].mean(), 4), abs=2e-4
        )


def test_hits_matches_numpy_iteration(spark):
    """q_graph_hits vs two numpy incidence-matrix power steps."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    e = j[["o_custkey", "l_suppkey"]].drop_duplicates()
    cks = sorted(e["o_custkey"].unique())
    sks = sorted(e["l_suppkey"].unique())
    ci = {k: i for i, k in enumerate(cks)}
    si = {k: i for i, k in enumerate(sks)}
    M = np.zeros((len(cks), len(sks)), dtype=np.int64)
    for ck, sk in e.itertuples(False):
        M[ci[ck], si[sk]] = 1
    hub0 = np.ones(len(cks), dtype=np.int64)
    auth1 = M.T @ hub0
    hub1 = M @ auth1
    auth2 = M.T @ hub1
    order = sorted(range(len(sks)), key=lambda i: (-auth2[i], sks[i]))[:10]
    ref = [(int(sks[i]), int(auth2[i])) for i in order]
    tot = int(auth2.sum())
    rows = registry.QUERIES["q_graph_hits"](spark, SF_DIR).collect()
    assert [(r.s_suppkey, r.auth_score) for r in rows] == ref
    for r in rows:
        assert r.auth_share == pytest.approx(r.auth_score / tot, abs=1e-12)


def test_bollinger_matches_pandas_rolling(spark):
    """q_win_bollinger vs pandas rolling mean/population-std."""
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e[e.event_type == "purchase"].copy()
    e["day"] = pd.to_datetime(e["ts"]).dt.floor("D")
    e["cents"] = (e["value"] * 100).round().astype("int64")
    daily = e.groupby("day")["cents"].sum().sort_index()
    roll = daily.rolling(14, min_periods=1)
    mean = roll.mean()
    sd = roll.std(ddof=0).fillna(0.0)
    rows = registry.QUERIES["q_win_bollinger"](spark, SF_DIR).collect()
    assert len(rows) == len(daily)
    for r in rows:
        d = pd.Timestamp(r.day)
        assert r.rev == pytest.approx(daily[d] / 100.0, abs=1e-9)
        assert r.mean_w == pytest.approx(mean[d] / 100.0, rel=1e-9)
        assert r.upper_band == pytest.approx(
            (mean[d] + 2 * sd[d]) / 100.0, rel=1e-9
        )
        assert r.lower_band == pytest.approx(
            (mean[d] - 2 * sd[d]) / 100.0, rel=1e-9
        )
        want = 0
        if daily[d] > mean[d] and (daily[d] - mean[d]) ** 2 > 4 * sd[d] ** 2:
            want = 1
        elif daily[d] < mean[d] and (daily[d] - mean[d]) ** 2 > 4 * sd[d] ** 2:
            want = -1
        assert r.breach == want, str(d)


def test_ohlc_matches_pandas_bars(spark):
    """q_time_ohlc vs pandas first/last/min/max daily bars."""
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e[e.event_type == "purchase"].copy()
    e["day"] = pd.to_datetime(e["ts"]).dt.floor("D")
    e["cents"] = (e["value"] * 100).round().astype("int64")
    e = e.sort_values(["ts", "event_id"], kind="mergesort")
    g = e.groupby("day")["cents"]
    ref = pd.DataFrame(
        {
            "n": g.size(),
            "open": g.first(),
            "high": g.max(),
            "low": g.min(),
            "close": g.last(),
            "turnover": g.sum(),
        }
    )
    rows = registry.QUERIES["q_time_ohlc"](spark, SF_DIR).collect()
    assert len(rows) == len(ref)
    for r in rows:
        w = ref.loc[pd.Timestamp(r.day)]
        assert r.n_trades == w["n"]
        assert (r.open, r.high, r.low, r.close, r.turnover) == (
            w["open"] / 100.0,
            w["high"] / 100.0,
            w["low"] / 100.0,
            w["close"] / 100.0,
            w["turnover"] / 100.0,
        )


def test_kcore_matches_python_peeling(spark):
    """q_graph_kcore vs a dict-based peel at the same p05 K."""
    import collections
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey", "l_quantity"]
    ]
    li = li[li.l_quantity >= 35]
    adj = collections.defaultdict(set)
    for _, grp in li.groupby("l_orderkey")["l_partkey"]:
        ps = sorted(set(grp))
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                adj[u].add(v)
                adj[v].add(u)
    degs = sorted(len(s) for s in adj.values())
    k = degs[int(0.05 * (len(degs) - 1))]
    alive = set(adj)
    while True:
        drop = {u for u in alive
                if sum(v in alive for v in adj[u]) < k}
        if not drop:
            break
        alive -= drop
    deg = {u: sum(v in alive for v in adj[u]) for u in alive}
    row = registry.QUERIES["q_graph_kcore"](spark, SF_DIR).collect()[0]
    assert row.k == k
    assert row.n_core_nodes == len(alive)
    assert alive, "p05 K must leave a non-empty core at the test SF"
    assert row.n_core_edges == sum(deg.values()) // 2
    assert row.min_core_degree == min(deg.values())
    assert row.min_core_degree >= k
    assert row.avg_core_degree == pytest.approx(
        sum(deg.values()) / len(alive), rel=1e-12
    )


def test_bpe_merges_matches_python_reference(spark):
    """q_text_bpe_merges vs an independent pure-Python BPE trainer
    (re-splitting and re-counting the corpus from pandas)."""
    import collections
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wc = collections.Counter()
    for t in d["text"]:
        for w in str(t).lower().split(" "):
            if w:
                wc[w] += 1
    vocab = {tuple(w): f for w, f in wc.items()}
    ref = []
    for rank in range(1, 9):
        pc = collections.Counter()
        for syms, f in vocab.items():
            for pair in zip(syms, syms[1:]):
                pc[pair] += f
        if not pc:
            break
        mx = max(pc.values())
        best = min(p for p in pc if pc[p] == mx)
        nv = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = nv
        ref.append((rank, best[0], best[1], best[0] + best[1], pc[best]))
    rows = registry.QUERIES["q_text_bpe_merges"](spark, SF_DIR).collect()
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in sorted(rows, key=lambda r: r.merge_rank)
    ]
    assert got == ref
    assert len(got) == 8


def test_bpe_encode_matches_python_reference(spark):
    """q_text_bpe_encode vs an independent pure-Python train+encode:
    re-learn the 8 merges from pandas (same protocol as the trainer
    test), apply them per word in rank order with left-to-right
    non-overlapping replacement, and rebuild every output column -
    word_count, bpe_token_count, fertility, (count desc, token asc)
    top token - for every doc."""
    import collections
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    wc = collections.Counter()
    doc_words = {}
    for doc_id, t in zip(d["doc_id"], d["text"]):
        ws = [w for w in str(t).lower().split(" ") if w]
        doc_words[int(doc_id)] = ws
        wc.update(ws)
    vocab = {tuple(w): f for w, f in wc.items()}
    merges = []
    for _ in range(8):
        pc = collections.Counter()
        for syms, f in vocab.items():
            for pair in zip(syms, syms[1:]):
                pc[pair] += f
        if not pc:
            break
        mx = max(pc.values())
        best = min(p for p in pc if pc[p] == mx)
        nv = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = nv
        merges.append(best)

    def encode(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    enc_cache = {w: encode(w) for w in wc}
    ref = {}
    for doc_id, ws in doc_words.items():
        toks = collections.Counter()
        for w in ws:
            toks.update(enc_cache[w])
        n_bpe = sum(toks.values())
        top = min((-n, t) for t, n in toks.items())
        ref[doc_id] = (
            len(ws), n_bpe, n_bpe / len(ws), top[1], -top[0]
        )
    rows = registry.QUERIES["q_text_bpe_encode"](spark, SF_DIR).collect()
    assert len(rows) == len(ref)
    for r in rows:
        exp = ref[r.doc_id]
        assert (
            r.word_count, r.bpe_token_count, r.top_token, r.top_token_n
        ) == (exp[0], exp[1], exp[3], exp[4]), r
        assert abs(r.fertility - exp[2]) < 1e-12


def test_line_dedup_drops_planted_boilerplate(spark, tmp_path):
    """q_text_line_dedup on a planted corpus (the q_text_pii_redact
    fixture discipline): boilerplate lines pasted across >= 3 docs
    (and one pasted 3x inside a single doc) must be dropped; unique
    lines survive; re-assembly preserves original order; clean_md5
    is the md5 of exactly the surviving lines joined by newline."""
    import hashlib
    docs = [
        (0, "keep me zero\nSUBSCRIBE TO OUR NEWSLETTER\nunique tail zero"),
        (1, "SUBSCRIBE TO OUR NEWSLETTER\nkeep me one"),
        (2, "keep me two\nSUBSCRIBE TO OUR NEWSLETTER"),
        # one doc pasting the same footer 3x: total-occurrence
        # semantics must drop it even with df(docs) == 1
        (3, "COOKIE FOOTER\nmiddle three\nCOOKIE FOOTER\nCOOKIE FOOTER"),
        (4, "all unique here\nno boilerplate at all"),
    ]
    src = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["planted"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    fix = tmp_path / "sf_planted"
    fix.mkdir()
    pdf.to_parquet(fix / "documents.parquet")
    for name in (
        "region nation customer supplier part orders lineitem "
        "events embeddings".split()
    ):
        (fix / f"{name}.parquet").symlink_to(f"{SF_DIR}/{name}.parquet")
    rows = {
        r.doc_id: r
        for r in registry.QUERIES["q_text_line_dedup"](
            spark, str(fix)
        ).collect()
    }
    expect_kept = {
        0: ["keep me zero", "unique tail zero"],
        1: ["keep me one"],
        2: ["keep me two"],
        3: ["middle three"],
        4: ["all unique here", "no boilerplate at all"],
    }
    for doc_id, text in docs:
        n = len(text.split("\n"))
        kept = expect_kept[doc_id]
        r = rows[doc_id]
        assert (r.n_lines, r.kept_lines, r.dropped_lines) == (
            n, len(kept), n - len(kept)
        ), r
        assert r.clean_md5 == hashlib.md5(
            "\n".join(kept).encode()
        ).hexdigest(), doc_id


def test_modularity_matches_python_reference(spark):
    """q_graph_modularity vs an independent dict-based Q over the
    same bipartite edge set and nation partition."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    s = pd.read_parquet(f"{SF_DIR}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    edges = (
        o.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
    )
    cn = dict(zip(c.c_custkey, c.c_nationkey))
    sn = dict(zip(s.s_suppkey, s.s_nationkey))
    m = len(edges)
    m_c, d_c = {}, {}
    for ck, sk in edges.itertuples(index=False):
        a, b = cn[ck], sn[sk]
        d_c[a] = d_c.get(a, 0) + 1
        d_c[b] = d_c.get(b, 0) + 1
        if a == b:
            m_c[a] = m_c.get(a, 0) + 1
    q_ref = sum(
        m_c.get(nk, 0) / m - (d_c[nk] / (2 * m)) ** 2 for nk in d_c
    )
    names = dict(zip(n.n_nationkey, n.n_name))
    rows = registry.QUERIES["q_graph_modularity"](spark, SF_DIR).collect()
    assert len(rows) == len(d_c)
    by_name = {r.community: r for r in rows}
    for nk, dsum in d_c.items():
        r = by_name[names[nk]]
        assert r.deg_sum == dsum
        assert r.m_intra == m_c.get(nk, 0)
        assert r.q_term == pytest.approx(
            m_c.get(nk, 0) / m - (dsum / (2 * m)) ** 2, abs=1e-12
        )
    for r in rows:
        assert r.modularity == pytest.approx(q_ref, abs=1e-10)


def test_pq_adc_matches_numpy_and_recall(spark):
    """q_sim_pq_adc vs an independent numpy PQ (same trained-codebook
    protocol: 32x2-dim subspaces, K=256, 2 Lloyd supersteps in exact
    int64 micro-units), plus a recall@3 floor vs exact L2 neighbors."""
    SUBS, K, ITERS = 32, 256, 2
    # PQ_TRAIN_CAP (4096) is a no-op at fixture sizes (N=500 here),
    # so this reference trains on the full corpus like the engine.
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(
        e.embedding.map(lambda a: np.asarray(a, dtype=np.float64))
    )
    ids = e.vec_id.to_numpy()
    N = len(V)
    # coordinates snapped to int64 micro-units FIRST; all later
    # arithmetic is exact integer (order-independent in any engine).
    subs = np.round(V * 1e6).astype("int64").reshape(N, SUBS, 2)
    cb = subs[:K].transpose(1, 0, 2).copy()  # (SUBS, K, 2)
    for _ in range(ITERS):
        d2 = ((subs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1)
        # argmin returns the FIRST minimum -> lowest code on ties,
        # matching the engines' (d2, code) tie-break.
        codes = d2.argmin(axis=2)  # (N, SUBS)
        newcb = cb.copy()
        for s in range(SUBS):
            for c in range(K):
                m = codes[:, s] == c
                n = int(m.sum())
                if n:  # empty clusters keep their previous centroid
                    newcb[s, c] = np.floor_divide(
                        subs[m, s, :].sum(0), n
                    )
        cb = newcb
    d2 = ((subs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1)
    codes = d2.argmin(axis=2)
    # r13 two-stage protocol (VERDICT r12 #2): ADC top-(3k) candidate
    # probe, exact int64 L2 re-rank of the survivors, emit top-3 by
    # (exact, cand_id).
    ref_rows = {}
    for qi in range(10):
        qlut = d2[qi]  # (SUBS, K) int64 LUT for query qi
        micro = qlut[np.arange(SUBS)[None, :], codes].sum(1)
        cand = sorted(
            (int(micro[x]), int(ids[x]), x)
            for x in range(N)
            if ids[x] != qi
        )[:9]  # PQ_RERANK = 3 * PQ_TOPK
        rer = sorted(
            (
                int(((subs[x] - subs[qi]) ** 2).sum()),
                int(ids[x]),
                int(micro[x]),
            )
            for _, _, x in cand
        )[:3]
        ref_rows[qi] = sorted(
            (exact, cid, adc) for exact, cid, adc in rer
        )
    rows = registry.QUERIES["q_sim_pq_adc"](spark, SF_DIR).collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(
            (round(r.exact_dist * 1e12), r.cand_id,
             round(r.adc_dist * 1e12))
        )
    assert set(got) == set(ref_rows)
    hit = total = 0
    for qi, ref in ref_rows.items():
        assert sorted(got[qi]) == ref
        # recall@3 of the re-ranked output vs exact L2 top-3
        ex = np.argsort(((V - V[qi]) ** 2).sum(-1))
        exact3 = [int(ids[x]) for x in ex if ids[x] != qi][:3]
        hit += len({c for _, c, _ in ref} & set(exact3))
        total += 3
    # Two-stage (ADC top-9 probe -> exact re-rank -> top-3): measured
    # recall@3 = 1.0 at all three SFs (raw ADC top-3 measured
    # 0.77/0.90/0.80 - the re-rank converts "ADC must RANK them
    # top-3" into "ADC must only SURFACE them in the top-9"). Floor
    # 0.95 per the r12 verdict's target.
    assert hit / total >= 0.95, f"PQ recall@3 = {hit/total}"


def test_rake_matches_python_reference(spark):
    """q_text_keyphrase_rake vs an independent pure-Python RAKE."""
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    stops = {
        "the", "and", "of", "to", "is", "el", "la", "de", "que", "los",
        "der", "die", "und", "das", "ist", "le", "les", "des", "est",
    }
    insts = []  # (phrase_words tuple)
    for t in d.text:
        words = [w for w in str(t).lower().split(" ") if w]
        cur = []
        for w in words:
            if w in stops:
                if cur:
                    insts.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            insts.append(tuple(cur))
    insts = [p for p in insts if len(p) <= 3]
    freq, deg = {}, {}
    for p in insts:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    scored = {}
    occur = {}
    for p in insts:
        ph = " ".join(p)
        occur[ph] = occur.get(ph, 0) + 1
        scored[ph] = round(sum(deg[w] / freq[w] for w in p), 6)
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = registry.QUERIES["q_text_keyphrase_rake"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == len(top)
    for r, (ph, sc) in zip(rows, top):
        assert r.phrase == ph
        assert r.n_occur == occur[ph]
        assert r.score == pytest.approx(sc, abs=2e-6)


def test_quality_expectations_matches_pandas(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    rows = {
        (r.tbl, r.rule): r
        for r in registry.QUERIES["q_quality_expectations"](
            spark, SF_DIR
        ).collect()
    }
    exp = {
        ("orders", "orderkey_unique"):
            (len(o), len(o) - o.o_orderkey.nunique()),
        ("orders", "totalprice_positive"):
            (len(o), int((~(o.o_totalprice > 0)).sum())),
        ("orders", "orderdate_in_range"):
            (len(o), int((~o.o_orderdate.astype(str).between(
                "1992-01-01", "1998-12-31")).sum())),
        ("orders", "orderstatus_in_set"):
            (len(o), int((~o.o_orderstatus.isin(["F", "O", "P"])).sum())),
        ("lineitem", "orderkey_fk_resolves"):
            (len(li), int((~li.l_orderkey.isin(o.o_orderkey)).sum())),
        ("lineitem", "quantity_in_range"):
            (len(li), int((~li.l_quantity.between(1, 50)).sum())),
        ("events", "user_id_not_null"):
            (len(e), int(e.user_id.isna().sum())),
    }
    assert set(rows) == set(exp)
    for key, (n, bad) in exp.items():
        r = rows[key]
        assert (r.n_checked, r.n_violations) == (n, bad)
        assert r.passed == int(bad == 0)


def test_louvain_round_matches_python(spark):
    """q_graph_louvain_round vs an independent dict-based synchronous
    local-move pass over the same graph and seeding."""
    import collections

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    cst = pd.read_parquet(f"{SF_DIR}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")[
        ["n_nationkey", "n_name"]
    ]
    pairs = (
        o.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_suppkey"]
        ].drop_duplicates()
    )
    adj = collections.defaultdict(list)
    for ck, sk in pairs.itertuples(index=False):
        adj[f"C{ck}"].append(f"S{sk}")
        adj[f"S{sk}"].append(f"C{ck}")
    comm = {f"C{r.c_custkey}": r.c_nationkey for r in cst.itertuples()}
    comm |= {f"S{r.s_suppkey}": r.s_nationkey for r in sup.itertuples()}
    deg = {u: len(vs) for u, vs in adj.items()}
    two_m = sum(deg.values())
    sigma = collections.Counter()
    for u, k in deg.items():
        sigma[comm[u]] += k
    new_comm = {}
    for u, vs in adj.items():
        kuc = collections.Counter(comm[v] for v in vs)
        best = None
        for c_id, k_uc in kuc.items():
            adj_sigma = sigma[c_id] - (deg[u] if c_id == comm[u] else 0)
            gain = round(k_uc - deg[u] * adj_sigma / two_m, 9)
            key = (-gain, c_id)
            if best is None or key < best[0]:
                best = (key, c_id)
        new_comm[u] = best[1]
    before = collections.Counter(comm.values())
    after = collections.Counter(new_comm.values())
    left = collections.Counter(
        comm[u] for u in comm if new_comm[u] != comm[u]
    )
    names = dict(zip(nat.n_nationkey, nat.n_name))
    rows = {r.community: r for r in registry.QUERIES[
        "q_graph_louvain_round"](spark, SF_DIR).collect()}
    assert sum(r.n_left for r in rows.values()) > 0  # a real move pass
    for nk, name in names.items():
        if name not in rows:
            assert before[nk] == 0 and after[nk] == 0
            continue
        r = rows[name]
        assert r.n_before == before[nk]
        assert r.n_after == after[nk]
        assert r.n_left == left[nk]


def test_bm25_matches_python_reference(spark):
    """q_text_bm25 vs an independent pure-Python BM25."""
    import math

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    query = ("spark", "join", "stream")
    docs = {
        r.doc_id: [w for w in str(r.text).lower().split(" ") if w]
        for r in d.itertuples()
    }
    n_docs = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n_docs
    df = {
        t: sum(1 for ws in docs.values() if t in ws) for t in query
    }
    scores = {}
    hits = {}
    for did, ws in docs.items():
        s = 0.0
        h = 0
        for t in query:
            tf = ws.count(t)
            if tf == 0:
                continue
            h += 1
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
        if h:
            scores[did] = round(s, 6)
            hits[did] = h
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = registry.QUERIES["q_text_bm25"](spark, SF_DIR).collect()
    assert [(r.doc_id, r.bm25) for r in rows] == [
        (d_, pytest.approx(s, abs=2e-6)) for d_, s in top
    ]
    for r in rows:
        assert r.n_terms_hit == hits[r.doc_id]


def test_rank_fusion_is_consistent_with_components(spark):
    """RRF output must equal 1/(60+ra) + 1/(60+rb) for ranks that are
    consistent with the component orderings."""
    rows = registry.QUERIES["q_sim_rank_fusion"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expect = 0.0
        if r.rank_bm25 is not None:
            expect += 1 / (60 + r.rank_bm25)
        if r.rank_tfidf is not None:
            expect += 1 / (60 + r.rank_tfidf)
        assert r.rrf == pytest.approx(expect, abs=1e-9)
    # descending fused order with doc_id tie-break
    key = [(-r.rrf, r.doc_id) for r in rows]
    assert key == sorted(key)


def test_embedding_drift_matches_numpy(spark):
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    V = np.stack(e.embedding.map(lambda a: np.asarray(a, np.float64)))
    snap = (e.vec_id % 2).to_numpy()
    c_old = np.round(V[snap == 0].mean(axis=0), 6)
    c_new = np.round(V[snap == 1].mean(axis=0), 6)
    cos = c_old @ c_new / (
        np.linalg.norm(c_old) * np.linalg.norm(c_new)
    )
    l2 = np.linalg.norm(c_new - c_old)
    rows = registry.QUERIES["q_sim_embedding_drift"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.c_old == pytest.approx(c_old[r.dim], abs=2e-6)
        assert r.c_new == pytest.approx(c_new[r.dim], abs=2e-6)
        assert r.abs_shift == pytest.approx(
            abs(c_new[r.dim] - c_old[r.dim]), abs=2e-6
        )
        assert r.centroid_cosine == pytest.approx(cos, abs=2e-6)
        assert r.centroid_l2 == pytest.approx(l2, abs=2e-6)


def test_heaps_law_matches_python(spark):
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet").sort_values(
        "doc_id"
    )
    seen = set()
    cum_t = 0
    xs, ys = [], []
    for r in d.itertuples():
        ws = [w for w in str(r.text).lower().split(" ") if w]
        cum_t += len(ws)
        seen.update(ws)
        xs.append(np.log(cum_t))
        ys.append(np.log(len(seen)))
    beta_ref, b = np.polyfit(xs, ys, 1)
    row = registry.QUERIES["q_text_heaps_law"](spark, SF_DIR).collect()[0]
    assert row.n_docs == len(d)
    assert row.total_vocab == len(seen)
    assert row.beta == pytest.approx(beta_ref, abs=2e-6)
    assert row.k == pytest.approx(np.exp(b), rel=1e-3)
    assert 0 < row.beta < 1  # Heaps exponent is sublinear


def test_ndcg_matches_numpy(spark):
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(e.embedding.map(lambda a: np.asarray(a, np.float64)))
    ids = e.vec_id.to_numpy()
    labels = dict(zip(e.vec_id, e.label))
    norms = np.linalg.norm(V, axis=1)
    rows = {r.query_id: r for r in
            registry.QUERIES["q_sim_ndcg"](spark, SF_DIR).collect()}
    ndcgs = []
    for qi in range(10):
        cos = np.round(V @ V[qi] / (norms * norms[qi]), 6)
        order = sorted(
            ((-cos[i], int(ids[i])) for i in range(len(V))
             if ids[i] != qi)
        )[:5]
        rel = [int(labels[c] == labels[qi]) for _, c in order]
        dcg = sum(r / np.log2(p + 2) for p, r in enumerate(rel))
        ideal = sorted(rel, reverse=True)
        idcg = sum(r / np.log2(p + 2) for p, r in enumerate(ideal))
        nd = dcg / idcg if idcg > 0 else 0.0
        ndcgs.append(round(nd, 6))
        r = rows[qi]
        assert r.n_rel == sum(rel)
        assert r.dcg == pytest.approx(dcg, abs=2e-6)
        assert r.ndcg == pytest.approx(nd, abs=2e-6)
    for r in rows.values():
        assert r.mean_ndcg == pytest.approx(np.mean(ndcgs), abs=2e-6)


def test_cluster_nmi_matches_sklearn_free(spark):
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(e.embedding.map(lambda a: np.asarray(a, np.float64)))
    ids = e.vec_id.to_numpy()
    labels = e.label.to_numpy()
    norms = np.linalg.norm(V, axis=1)
    C = V[:8]
    cn = norms[:8]
    # rounded-cosine argmax with centroid-id tie-break
    cells = []
    for i in range(len(V)):
        cos = np.round(V[i] @ C.T / (norms[i] * cn), 6)
        best = max(range(8), key=lambda c: (cos[c], -c))
        cells.append(int(ids[best]))
    import collections
    joint = collections.Counter(zip(cells, labels))
    nc = collections.Counter(cells)
    nl = collections.Counter(labels)
    nn = len(V)
    mi = sum(
        (n / nn) * np.log(n * nn / (nc[c] * nl[l]))
        for (c, l), n in joint.items()
    )
    hc = -sum((n / nn) * np.log(n / nn) for n in nc.values())
    hl = -sum((n / nn) * np.log(n / nn) for n in nl.values())
    row = registry.QUERIES["q_sim_cluster_nmi"](spark, SF_DIR).collect()[0]
    assert row.n_cells == len(nc) and row.n_labels == len(nl)
    assert row.mutual_info == pytest.approx(mi, abs=2e-6)
    assert row.nmi == pytest.approx(mi / np.sqrt(hc * hl), abs=2e-6)
    assert 0 <= row.nmi <= 1


def test_dim_truncation_recall_ladder(spark):
    """Recall must be measured against the full ranking: dim=64 would
    be 1.0 by construction; 16 <= 32 is the expected monotone ladder
    (checked weakly: 32-dim recall within [16-dim recall - 0.1, 1])."""
    rows = {r.dim: r for r in registry.QUERIES["q_sim_dim_truncation"](
        spark, SF_DIR).collect()}
    assert set(rows) == {16, 32}
    for r in rows.values():
        assert r.n_queries == 10
        assert 0 <= r.recall_at_5 <= 1
        assert r.hits == round(r.recall_at_5 * 50)
    assert rows[32].recall_at_5 >= rows[16].recall_at_5 - 0.1
    # numpy cross-check of the 16-dim recall
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(e.embedding.map(lambda a: np.asarray(a, np.float64)))
    ids = e.vec_id.to_numpy()

    def topk(dim):
        P = V[:, :dim]
        nrm = np.linalg.norm(P, axis=1)
        out = {}
        for qi in range(10):
            cos = np.round(P @ P[qi] / (nrm * nrm[qi]), 6)
            order = sorted(
                ((-cos[i], int(ids[i])) for i in range(len(V))
                 if ids[i] != qi)
            )[:5]
            out[qi] = {c for _, c in order}
        return out

    full, d16 = topk(64), topk(16)
    hits = sum(len(full[q] & d16[q]) for q in range(10))
    assert rows[16].hits == hits


def test_autocomplete_matches_python(spark):
    import collections

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    freq = collections.Counter(
        w
        for t in d.text
        for w in str(t).lower().split(" ")
        if len(w) >= 4
    )
    by_prefix = collections.defaultdict(list)
    for w, n in freq.items():
        by_prefix[w[:3]].append((-n, w))
    ref = []
    for p in sorted(by_prefix):
        for rk, (negn, w) in enumerate(sorted(by_prefix[p])[:3], 1):
            ref.append((p, rk, w, -negn))
    rows = registry.QUERIES["q_text_autocomplete"](spark, SF_DIR).collect()
    assert [(r.prefix, r.rank, r.completion, r.n) for r in rows] == ref


def test_isotropy_matches_numpy(spark):
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    V = np.stack(e.embedding.map(lambda a: np.asarray(a, np.float64)))
    var_d = np.round(V.var(axis=0), 6)  # population variance per dim
    d = len(var_d)
    s1, s2 = var_d.sum(), (var_d**2).sum()
    cv = np.sqrt(d * s2 - s1 * s1) / s1
    iso = 1 - np.sqrt(max(d * s2 - s1 * s1, 0)) / (s1 * np.sqrt(d - 1))
    row = registry.QUERIES["q_sim_isotropy"](spark, SF_DIR).collect()[0]
    assert row.n_dims == d
    assert row.mean_var == pytest.approx(s1 / d, abs=2e-6)
    assert row.cv_of_vars == pytest.approx(cv, abs=2e-5)
    assert row.isotropy_score == pytest.approx(iso, abs=2e-5)
    assert 0 <= row.isotropy_score <= 1


def test_lang_divergence_matches_python(spark):
    import collections

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts = collections.defaultdict(collections.Counter)
    for r in d.itertuples():
        for w in str(r.text).lower().split(" "):
            if w:
                counts[r.lang][w] += 1
    vocab = set().union(*(c.keys() for c in counts.values()))
    vv = len(vocab)
    langs = sorted(counts)
    rows = {(r.lang_a, r.lang_b): r.jsd_nats for r in
            registry.QUERIES["q_text_lang_divergence"](
                spark, SF_DIR).collect()}
    assert len(rows) == len(langs) * (len(langs) - 1) // 2
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            ta = sum(counts[la].values())
            tb = sum(counts[lb].values())
            jsd = 0.0
            for w in vocab:
                pa = (counts[la][w] + 0.5) / (ta + vv * 0.5)
                pb = (counts[lb][w] + 0.5) / (tb + vv * 0.5)
                m = (pa + pb) / 2
                jsd += 0.5 * pa * np.log(pa / m) + 0.5 * pb * np.log(
                    pb / m
                )
            assert rows[(la, lb)] == pytest.approx(jsd, abs=2e-6)
            assert 0 <= rows[(la, lb)] <= np.log(2)


def test_query_expansion_properties(spark):
    """PRF invariants: the added terms are real corpus words outside
    the query+stopword sets, every result doc matches >=1 of the 5
    expanded terms, and the expanded ranking is internally ordered."""
    rows = registry.QUERIES["q_sim_query_expansion"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 10
    added = rows[0].added.split(",")
    assert len(added) == 2
    stops = {
        "the", "and", "of", "to", "is", "el", "la", "de", "que", "los",
        "der", "die", "und", "das", "ist", "le", "les", "des", "est",
    }
    for t in added:
        assert t not in stops and t not in ("spark", "join", "stream")
    key = [(-r.bm25_expanded, r.doc_id) for r in rows]
    assert key == sorted(key)
    for r in rows:
        assert 1 <= r.n_hit <= 5


def test_dedup_eval_matches_python(spark):
    """q_dedup_eval's truth/hit counts recomputed from the parquet
    prefix groups and an independent run of the detector."""
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    pfx = d.assign(p=d.text.str[:40])
    truth = set()
    for _, g in pfx.groupby("p"):
        ids = sorted(g.doc_id)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                truth.add((a, b))
    from pudatalake_spark.llmops.dedup import (
        JACCARD_TAU, minhash_verified_pairs,
    )
    from pudatalake_spark.loaders import spread, table
    det = {
        (min(r.doc1, r.doc2), max(r.doc1, r.doc2))
        for r in minhash_verified_pairs(
            spread(table(spark, SF_DIR, "documents"), "doc_id"),
            JACCARD_TAU,
        ).collect()
    }
    row = registry.QUERIES["q_dedup_eval"](spark, SF_DIR).collect()[0]
    assert row.n_truth_pairs == len(truth)
    assert row.n_detected == len(det)
    assert row.n_hits == len(det & truth)
    assert row.recall >= 0.9  # the planted groups must be found


def test_padding_waste_matches_python(spark):
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    lens = d.text.map(
        lambda t: len([w for w in str(t).lower().split(" ") if w])
    ).to_numpy()
    rows = {r.ctx: r for r in registry.QUERIES["q_pack_padding_waste"](
        spark, SF_DIR).collect()}
    for ctx in (512, 1024, 2048):
        seqs = -(-lens // ctx)  # ceil division
        padded = (seqs * ctx).sum()
        r = rows[ctx]
        assert r.n_docs == len(lens)
        assert r.n_sequences == seqs.sum()
        assert r.real_tokens == lens.sum()
        assert r.padded_tokens == padded
        assert r.waste_share == pytest.approx(
            (padded - lens.sum()) / padded, abs=1e-12
        )
    # waste grows with context length on a short-doc corpus
    assert rows[2048].waste_share >= rows[512].waste_share


def test_pack_on_bpe_counts(spark):
    """The packing math is token-source-agnostic (r13): packing on
    q_text_bpe_encode's bpe_token_count through pack_on_counts must
    equal an independent pandas cumsum/floor-div pack over the same
    counts - the documented bpe-token variant of q_pack_sequences."""
    from pudatalake_spark.llmops.pipeline import PACK_TOKENS, pack_on_counts

    bpe = (
        registry.QUERIES["q_text_bpe_encode"](spark, SF_DIR)
        .select("doc_id", F.col("bpe_token_count").alias("n_tok"))
    )
    got = {
        r.pack_id: (r.n_docs, r.total_tokens)
        for r in pack_on_counts(bpe).collect()
    }
    pdf = bpe.toPandas().sort_values("doc_id").reset_index(drop=True)
    cum = pdf["n_tok"].cumsum()
    pack = ((cum - pdf["n_tok"]) // PACK_TOKENS).astype("int64")
    ref = {
        int(p): (int((pack == p).sum()), int(pdf["n_tok"][pack == p].sum()))
        for p in pack.unique()
    }
    assert got == ref
    assert len(ref) > 1, "fixture should span multiple packs"
