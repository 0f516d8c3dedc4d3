"""Independent reference pins for operators/stats.py.

The DuckDB oracles in the registry MIRROR each operator's formula,
so a formulation bug would pass the oracle gate on both sides.
These tests recompute each statistic from the raw parquet with
plain numpy/python (different code path, different algebra where
possible) and assert agreement — the same discipline as
test_pack_bestfit / test_mmr for the rows-only family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from pudatalake_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def events_pdf():
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    df["ts"] = pd.to_datetime(df["ts"])
    df["day"] = df["ts"].dt.floor("D")
    return df


@pytest.fixture(scope="module")
def seg_prices():
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    a = j.loc[j.c_mktsegment == "BUILDING", "o_totalprice"].to_numpy()
    b = j.loc[j.c_mktsegment == "MACHINERY", "o_totalprice"].to_numpy()
    return a, b


def _daily(events_pdf):
    """The shared bounded frame: per (type, day) revenue, 4dp."""
    d = (
        events_pdf.groupby(["event_type", "day"])["value"]
        .sum()
        .round(4)
        .reset_index(name="y")
    )
    return d


def test_ks_matches_bruteforce(spark, seg_prices):
    a, b = seg_prices
    # Brute force: evaluate both ECDFs on the combined support.
    support = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), support, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), support, side="right") / len(b)
    d_ref = np.abs(fa - fb).max()
    row = registry.QUERIES["q_stats_ks_test"](spark, SF_DIR).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.ks_d == pytest.approx(d_ref, abs=1e-6)


def test_mannwhitney_matches_bruteforce(spark, seg_prices):
    a, b = seg_prices
    # Brute force: scipy-free tie-averaged ranks via argsort.
    combined = np.concatenate([a, b])
    order = pd.Series(combined).rank(method="average").to_numpy()
    r1 = order[: len(a)].sum()
    u_ref = r1 - len(a) * (len(a) + 1) / 2
    row = registry.QUERIES["q_stats_mannwhitney"](spark, SF_DIR).collect()[0]
    assert row.u == pytest.approx(u_ref, abs=0.01)
    assert row.cles == pytest.approx(u_ref / (len(a) * len(b)), abs=1e-6)
    # z sanity: tie-corrected normal approximation, same formula
    n = len(a) + len(b)
    _, t_counts = np.unique(combined, return_counts=True)
    ties = (t_counts.astype(float) ** 3 - t_counts).sum()
    sigma = np.sqrt(len(a) * len(b) / 12 * ((n + 1) - ties / (n * (n - 1))))
    z_ref = (u_ref - len(a) * len(b) / 2) / sigma
    assert row.z == pytest.approx(z_ref, abs=1e-5)


def test_cusum_matches_recursion(spark, events_pdf):
    # Reference: the literal S_t = max(0, S_{t-1} + x - mu) recursion
    # (the operator uses the cumsum - running-min identity instead).
    counts = (
        events_pdf.groupby(["event_type", "day"]).size().reset_index(name="x")
    )
    out = {
        r.event_type: r
        for r in registry.QUERIES["q_stats_cusum"](spark, SF_DIR).collect()
    }
    for et, g in counts.groupby("event_type"):
        xs = g.sort_values("day")["x"].to_numpy(dtype=float)
        mu = xs.mean()
        s, smax, drift = 0.0, 0.0, 0
        for x in xs:
            s = max(0.0, s + (x - mu))
            smax = max(smax, s)
            if s > mu:
                drift += 1
        row = out[et]
        assert row.n_days == len(xs)
        assert row.max_cusum == pytest.approx(smax, abs=1e-4)
        assert row.n_drift_days == drift


def test_changepoint_matches_bruteforce(spark, events_pdf):
    # Reference: O(n^2)-style direct scan over every split using the
    # exact integer units the operator aggregates in.
    d = events_pdf.copy()
    d["yi"] = (d["value"] * 10000).round().astype("int64")
    daily = d.groupby(["event_type", "day"])["yi"].sum().reset_index()
    out = {
        r.event_type: r
        for r in registry.QUERIES["q_stats_changepoint"](spark, SF_DIR).collect()
    }
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        y = g["yi"].to_numpy(dtype="int64")
        days = g["day"].to_list()
        n = len(y)
        best_gain, best_t = -1.0, None
        for t in range(1, n):
            m_l = y[:t].sum() / (t * 10000.0)
            m_r = y[t:].sum() / ((n - t) * 10000.0)
            gain = (t * (n - t)) / n * (m_l - m_r) ** 2
            if gain > best_gain:
                best_gain, best_t = gain, t
        row = out[et]
        assert row.split_day == days[best_t - 1]
        assert row.gain == pytest.approx(best_gain, rel=1e-12)


def test_theil_sen_matches_bruteforce(spark, events_pdf):
    daily = _daily(events_pdf)
    out = {
        r.event_type: r
        for r in registry.QUERIES["q_stats_theil_sen"](spark, SF_DIR).collect()
    }
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        x = (g["day"] - g["day"].min()).dt.days.to_numpy(dtype=float)
        y = g["y"].to_numpy(dtype=float)
        slopes = [
            (y[j] - y[i]) / (x[j] - x[i])
            for i in range(len(x))
            for j in range(i + 1, len(x))
        ]
        row = out[et]
        assert row.n_pairs == len(slopes)
        assert row.sen_slope == pytest.approx(np.median(slopes), abs=1e-6)


def test_ols_matches_numpy(spark, events_pdf):
    daily = _daily(events_pdf)
    out = {
        r.event_type: r
        for r in registry.QUERIES["q_stats_ols_trend"](spark, SF_DIR).collect()
    }
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        x = (g["day"] - g["day"].min()).dt.days.to_numpy(dtype=float)
        y = g["y"].to_numpy(dtype=float)
        slope_ref, intercept_ref = np.polyfit(x, y, 1)
        r_ref = np.corrcoef(x, y)[0, 1] ** 2
        row = out[et]
        assert row.slope == pytest.approx(slope_ref, abs=1e-4)
        assert row.intercept == pytest.approx(intercept_ref, abs=1e-2)
        assert row.r2 == pytest.approx(r_ref, abs=1e-6)


def test_did_matches_pandas(spark, events_pdf):
    p = events_pdf[events_pdf.event_type == "purchase"].copy()
    p["treated"] = (p["user_id"] % 2 == 0).astype(int)
    p["post"] = (p["ts"].dt.day >= 15).astype(int)
    cells = p.groupby(["treated", "post"])["value"].mean().round(4)
    did_ref = round(
        (cells[1, 1] - cells[1, 0]) - (cells[0, 1] - cells[0, 0]), 4
    )
    row = registry.QUERIES["q_stats_did"](spark, SF_DIR).collect()[0]
    assert row.t_post == pytest.approx(cells[1, 1], abs=2e-4)
    assert row.did == pytest.approx(did_ref, abs=5e-4)


def test_autocorr_matches_numpy(spark, events_pdf):
    daily = _daily(events_pdf)
    rows = registry.QUERIES["q_stats_autocorr"](spark, SF_DIR).collect()
    out = {(r.event_type, r.lag): r for r in rows}
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").set_index("day")
        y = g["y"]
        d = y - y.mean()
        den = (d**2).sum()
        for lag in (1, 2, 3):
            shifted = d.copy()
            shifted.index = shifted.index - pd.Timedelta(days=lag)
            joined = pd.concat(
                [d.rename("a"), shifted.rename("b")], axis=1, join="inner"
            )
            r_ref = (joined["a"] * joined["b"]).sum() / den
            row = out[(et, lag)]
            assert row.n_pairs == len(joined)
            assert row.acf == pytest.approx(r_ref, abs=1e-6)


def test_silhouette_bounds_and_reference(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    cents = {
        l: v[labels == l].mean(axis=0) for l in np.unique(labels)  # noqa: E741
    }
    cl = sorted(cents)
    cmat = np.stack([cents[l] for l in cl])
    sims = (v @ cmat.T) / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(cmat, axis=1)[None, :]
    )
    dist = 1.0 - sims
    own = np.array([cl.index(l) for l in labels])
    a = dist[np.arange(len(v)), own]
    masked = dist.copy()
    masked[np.arange(len(v)), own] = np.inf
    b = masked.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    # quantize exactly as the operator does before averaging
    s_q = np.round(s * 1_000_000) / 1_000_000
    rows = registry.QUERIES["q_sim_silhouette"](spark, SF_DIR).collect()
    for row in rows:
        mask = labels == row.label
        assert row.n_vectors == int(mask.sum())
        assert row.mean_silhouette == pytest.approx(
            s_q[mask].mean(), abs=2e-6
        )
        assert -1.0 <= row.mean_silhouette <= 1.0


def test_benford_matches_bruteforce(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    v = o.loc[o.o_totalprice > 0, "o_totalprice"].to_numpy(dtype=float)
    first = (v / 10 ** np.floor(np.log10(v))).astype(int)
    rows = registry.QUERIES["q_stats_benford"](spark, SF_DIR).collect()
    total = len(first)
    for row in rows:
        n_ref = int((first == row.digit).sum())
        assert row.n == n_ref
        assert row.observed_p == pytest.approx(n_ref / total, rel=1e-12)
        assert row.benford_p == pytest.approx(
            np.log10(1 + 1 / row.digit), abs=1e-6
        )
    assert sum(r.n for r in rows) == total


def test_seasonal_decompose_matches_pandas(spark, events_pdf):
    d = events_pdf.copy()
    d["yi"] = (d["value"] * 10000).round().astype("int64")
    daily = d.groupby(["event_type", "day"])["yi"].sum().reset_index()
    rows = registry.QUERIES["q_stats_seasonal_decompose"](
        spark, SF_DIR
    ).collect()
    out = {(r.event_type, r.dow): r for r in rows}
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        y = g["yi"].to_numpy(dtype="int64")
        trend = pd.Series(y).rolling(7, center=True).sum()
        interior = trend.notna()
        det = y[interior] / 10000.0 - trend[interior].to_numpy() / 70000.0
        dows = g.loc[interior, "day"].dt.dayofweek.to_numpy() + 1
        seas = {dw: det[dows == dw].mean() for dw in np.unique(dows)}
        resid = det - np.array([seas[dw] for dw in dows])
        strength = max(0.0, 1 - resid.var(ddof=1) / det.var(ddof=1))
        for dw, s_ref in seas.items():
            row = out[(et, dw)]
            assert row.n_days == int((dows == dw).sum())
            assert row.seasonal == pytest.approx(s_ref, abs=2e-4)
            assert row.seasonal_strength == pytest.approx(strength, abs=1e-6)


def test_chi2_matches_bruteforce(spark, events_pdf):
    d = events_pdf.copy()
    d["dow"] = d["ts"].dt.dayofweek + 1
    obs = d.groupby(["event_type", "dow"]).size().unstack(fill_value=0)
    o = obs.to_numpy(dtype=float)
    rt = o.sum(axis=1, keepdims=True)
    ct = o.sum(axis=0, keepdims=True)
    n = o.sum()
    e = rt @ ct / n
    mask = e > 0
    chi2_ref = (((o - e) ** 2 / np.where(mask, e, 1))[mask]).sum()
    row = registry.QUERIES["q_stats_chi2"](spark, SF_DIR).collect()[0]
    assert row.n_obs == int(n)
    assert row.dof == (o.shape[0] - 1) * (o.shape[1] - 1)
    assert row.chi2 == pytest.approx(chi2_ref, abs=1e-4)
    v_ref = np.sqrt(chi2_ref / (n * min(o.shape[0] - 1, o.shape[1] - 1)))
    assert row.cramers_v == pytest.approx(v_ref, abs=1e-6)


def test_power_analysis_matches_formula(spark, events_pdf):
    p = events_pdf[events_pdf.event_type == "purchase"].copy()
    p["c"] = (p["value"] * 100).round().astype("int64")
    spend = p.groupby("user_id")["c"].sum() / 100.0
    mean, sd = spend.mean(), spend.std(ddof=1)
    z = 1.959964 + 0.841621
    n_ref = int(np.ceil(2 * z * z * sd * sd / (0.05 * mean) ** 2))
    row = registry.QUERIES["q_stats_power_analysis"](spark, SF_DIR).collect()[0]
    assert row.n_users == len(spend)
    assert row.mean_spend == pytest.approx(mean, rel=1e-9)
    assert row.sd_spend == pytest.approx(sd, abs=1e-3)
    assert row.n_per_arm == n_ref
    assert row.currently_powered == (len(spend) >= 2 * n_ref)


def test_srm_matches_formula(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    users = events_pdf["user_id"].drop_duplicates()
    n_a = int(((users * A + B) % P % 2 == 0).sum())
    n_b = len(users) - n_a
    exp = (n_a + n_b) / 2
    chi2_ref = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    row = registry.QUERIES["q_events_srm_check"](spark, SF_DIR).collect()[0]
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.chi2 == pytest.approx(chi2_ref, abs=1e-5)
    assert row.srm_alarm == (chi2_ref > 3.841)


def test_cuped_reduces_variance_and_matches(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    p = events_pdf[events_pdf.event_type == "purchase"].copy()
    p["c"] = (p["value"] * 100).round().astype("int64")
    p["pre"] = np.where(p["ts"].dt.day < 15, p["c"], 0)
    p["post"] = np.where(p["ts"].dt.day >= 15, p["c"], 0)
    u = p.groupby("user_id")[["pre", "post"]].sum()
    th = np.cov(u["pre"], u["post"], ddof=1)[0, 1] / u["pre"].var(ddof=1)
    pre_mean = u["pre"].mean() / 100.0
    y = u["post"] / 100.0
    y_adj = y - th * (u["pre"] / 100.0 - pre_mean)
    variant = np.where((u.index * A + B) % P % 2 == 0, "A", "B")
    rows = {r.variant: r for r in
            registry.QUERIES["q_events_ab_cuped"](spark, SF_DIR).collect()}
    for v in ("A", "B"):
        m = variant == v
        row = rows[v]
        assert row.n == int(m.sum())
        assert row.mean_raw == pytest.approx(y[m].mean(), abs=2e-4)
        assert row.mean_cuped == pytest.approx(y_adj[m].mean(), abs=2e-4)
        assert row.var_cuped <= row.var_raw  # the whole point of CUPED


def test_psi_matches_bruteforce(spark, events_pdf):
    p = events_pdf[events_pdf.event_type == "purchase"].copy()
    cents = (p["value"] * 100).round().astype("int64").to_numpy()
    ed = (p["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days.to_numpy()
    mid = (ed.min() + ed.max() + 1) // 2
    w = max(1, (cents.max() - cents.min() + 1) // 10)
    band = np.minimum(9, (cents - cents.min()) // w)
    cur = ed >= mid
    psi_ref = 0.0
    tb, tc = int((~cur).sum()), int(cur.sum())
    for b in np.unique(band):
        nb = int(((band == b) & ~cur).sum())
        nc = int(((band == b) & cur).sum())
        pb = (nb + 0.5) / (tb + 5.0)
        qb = (nc + 0.5) / (tc + 5.0)
        psi_ref += (pb - qb) * np.log(pb / qb)
    rows = registry.QUERIES["q_stats_psi"](spark, SF_DIR).collect()
    assert sum(r.n_base for r in rows) == tb
    assert sum(r.n_curr for r in rows) == tc
    assert rows[0].psi_total == pytest.approx(psi_ref, abs=1e-5)


def test_spearman_matches_pandas_rank(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    x = (j["o_totalprice"] * 100).round().astype("int64")
    y = (j["c_acctbal"] * 100).round().astype("int64")
    # Different algebra: pandas tie-average ranks + np.corrcoef.
    rho_ref = np.corrcoef(x.rank(method="average"), y.rank(method="average"))[0, 1]
    row = registry.QUERIES["q_stats_spearman"](spark, SF_DIR).collect()[0]
    assert row.n == len(j)
    assert row.rho == pytest.approx(rho_ref, abs=1e-6)
    assert row.z_approx == pytest.approx(rho_ref * np.sqrt(len(j) - 1), abs=1e-4)


def test_anova_matches_centered_sums(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["v"] = j["o_totalprice"].round(0).astype("int64")
    # Different algebra: centered sums of squares, not the power-sum
    # identity the operator and oracle share.
    groups = [g["v"].to_numpy() for _, g in j.groupby("c_mktsegment")]
    grand = j["v"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(j)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    row = registry.QUERIES["q_stats_anova"](spark, SF_DIR).collect()[0]
    assert (row.k, row.n) == (k, n)
    assert (row.df_between, row.df_within) == (k - 1, n - k)
    assert row.f_stat == pytest.approx(f_ref, abs=1e-4)
    assert row.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-6)


def test_mutual_info_matches_crosstab(spark, events_pdf):
    dow = events_pdf["ts"].dt.weekday + 1
    ct = pd.crosstab(events_pdf["event_type"], dow).to_numpy().astype(float)
    n = ct.sum()
    pr, pc = ct.sum(axis=1) / n, ct.sum(axis=0) / n
    pij = ct / n
    outer = np.outer(pr, pc)
    mask = pij > 0
    mi_ref = (pij[mask] * np.log(pij[mask] / outer[mask])).sum()
    h_row = -(pr * np.log(pr)).sum()
    h_col = -(pc * np.log(pc)).sum()
    row = registry.QUERIES["q_stats_mutual_info"](spark, SF_DIR).collect()[0]
    assert row.n == int(n)
    assert row.mi == pytest.approx(mi_ref, abs=1e-6)
    assert row.h_row == pytest.approx(h_row, abs=1e-6)
    assert row.h_col == pytest.approx(h_col, abs=1e-6)
    assert row.nmi == pytest.approx(mi_ref / np.sqrt(h_row * h_col), abs=1e-6)


def test_bootstrap_ci_matches_numpy_replicates(spark, events_pdf):
    K1, K2, P = 2654435761, 40503, 1_000_000_007
    CDF = [0.36787944117144233, 0.7357588823428847, 0.919698602928606,
           0.9810118431238462, 0.9963401531726563, 0.9994058151824183]
    p = events_pdf[events_pdf.event_type == "purchase"].copy()
    p["c"] = (p["value"] * 100).round().astype("int64")
    u = p.groupby("user_id")["c"].sum()
    uid = u.index.to_numpy().astype("int64")
    c = u.to_numpy()
    means = []
    for r in range(32):
        h = ((uid * K1 + 7) % P) * (r * K2 + 10007) % P
        unif = h.astype("float64") / P
        w = np.searchsorted(CDF, unif, side="right")  # Poisson(1) inverse CDF
        w = np.minimum(w, 6)
        means.append((w * c).sum() / (100.0 * w.sum()))
    means.sort()
    row = registry.QUERIES["q_stats_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert row.n_users == len(uid)
    assert row.point_mean == pytest.approx(c.sum() / (100.0 * len(uid)), rel=1e-12)
    assert row.ci_lo == pytest.approx(means[1], rel=1e-12)
    assert row.ci_hi == pytest.approx(means[30], rel=1e-12)
    assert row.ci_lo < row.point_mean < row.ci_hi
    # the replicate means must actually SPREAD (the additive-hash bug
    # collapsed them to one value)
    assert means[30] - means[1] > 0


def test_kendall_tau_matches_bruteforce(spark):
    """q_stats_kendall_tau vs an O(n^2) loop over nation sums."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["rev"] = (j["o_totalprice"] * 100).round().astype("int64")
    j["bal"] = (j["c_acctbal"] * 100).round().astype("int64")
    nm = j.groupby("c_nationkey").agg(x=("rev", "sum"), y=("bal", "sum"))
    xs, ys = nm["x"].to_numpy(), nm["y"].to_numpy()
    C = D = tx = ty = 0
    n = len(nm)
    for i in range(n):
        for k in range(i + 1, n):
            s = (xs[i] - xs[k]) * (ys[i] - ys[k])
            if s > 0:
                C += 1
            elif s < 0:
                D += 1
            if xs[i] == xs[k]:
                tx += 1
            if ys[i] == ys[k]:
                ty += 1
    n0 = n * (n - 1) // 2
    row = registry.QUERIES["q_stats_kendall_tau"](spark, SF_DIR).collect()[0]
    assert (row.n_pairs, row.concordant, row.discordant) == (n0, C, D)
    assert (row.ties_x, row.ties_y) == (tx, ty)
    assert row.tau_b == pytest.approx(
        (C - D) / np.sqrt((n0 - tx) * (n0 - ty)), rel=1e-12
    )


def test_fdr_bh_matches_erfc_reference(spark, events_pdf):
    """q_stats_fdr_bh vs exact math.erfc p-values (the registry uses
    the A&S 26.2.17 polynomial, |err| <= 7.5e-8 — an independent
    formula) plus a standalone BH step-up."""
    import math
    df = events_pdf.copy()
    df["c"] = (df["value"] * 100).round().astype("int64")
    df["a"] = ((df["user_id"] * 2654435761 + 1013904223)
               % 1_000_000_007) % 2 == 0
    stats = {}
    for t, g in df.groupby("event_type"):
        xa = g.loc[g.a, "c"].to_numpy(dtype=np.float64)
        xb = g.loc[~g.a, "c"].to_numpy(dtype=np.float64)
        se = np.sqrt(xa.var(ddof=1) / len(xa) + xb.var(ddof=1) / len(xb))
        z = (xa.mean() - xb.mean()) / se
        p = math.erfc(abs(z) / math.sqrt(2))  # two-sided
        stats[t] = (len(xa), len(xb), z, p)
    order = sorted(stats, key=lambda t: (stats[t][3], t))
    m = len(order)
    istar = max(
        (i + 1 for i, t in enumerate(order)
         if stats[t][3] <= (i + 1) * 0.10 / m),
        default=0,
    )
    rows = registry.QUERIES["q_stats_fdr_bh"](spark, SF_DIR).collect()
    assert [r.event_type for r in rows] == order
    for r in rows:
        na, nb, z, p = stats[r.event_type]
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.z == pytest.approx(z, abs=1e-6)
        assert r.p_value == pytest.approx(p, abs=2e-7)  # A&S bound + 8dp
        assert r.rejected == (1 if r.rank <= istar else 0)


def test_tost_matches_bruteforce(spark, events_pdf):
    """q_stats_tost vs a direct numpy TOST on per-user spend."""
    df = events_pdf[events_pdf.event_type == "purchase"]
    spend = df.groupby("user_id")["value"].sum().round(4)
    a = ((spend.index.to_numpy() * 2654435761 + 1013904223)
         % 1_000_000_007) % 2 == 0
    xa, xb = spend[a].to_numpy(), spend[~a].to_numpy()
    diff = xa.mean() - xb.mean()
    delta = 0.05 * spend.to_numpy().mean()
    se = np.sqrt(xa.var(ddof=1) / len(xa) + xb.var(ddof=1) / len(xb))
    row = registry.QUERIES["q_stats_tost"](spark, SF_DIR).collect()[0]
    assert (row.n_a, row.n_b) == (len(xa), len(xb))
    assert row.diff == pytest.approx(diff, abs=1e-5)
    assert row.delta == pytest.approx(delta, abs=1e-5)
    assert row.t_lower == pytest.approx((diff + delta) / se, abs=1e-3)
    assert row.t_upper == pytest.approx((delta - diff) / se, abs=1e-3)
    want = int((diff + delta) / se > 1.644854
               and (delta - diff) / se > 1.644854)
    assert row.equivalent == want


def _eval_users(events_pdf):
    g = events_pdf.groupby("user_id")["event_type"]
    n = g.size()
    clicks = g.apply(lambda s: (s == "click").sum())
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    s_milli = (1000 * clicks) // n
    pos = (2 * purch > cv).astype(int)
    return pd.DataFrame(
        {"s_milli": s_milli, "pos": pos}
    ).reset_index()


def test_calibration_matches_bruteforce(spark, events_pdf):
    u = _eval_users(events_pdf)
    u["bin"] = np.minimum(u.s_milli // 100, 9)
    rows = {
        r.bin: r
        for r in registry.QUERIES["q_stats_calibration"](
            spark, SF_DIR
        ).collect()
    }
    gap_sum = 0
    for b, grp in u.groupby("bin"):
        r = rows[b]
        assert r.n_users == len(grp) and r.n_pos == grp.pos.sum()
        assert r.conf == pytest.approx(
            grp.s_milli.mean() / 1000, abs=1e-12
        )
        assert r.acc == pytest.approx(grp.pos.mean(), abs=1e-12)
        gap_sum += abs(grp.s_milli.sum() - 1000 * grp.pos.sum())
    ece_ref = gap_sum / (1000 * len(u))
    for r in rows.values():
        assert r.ece == pytest.approx(ece_ref, abs=1e-12)
    assert set(rows) == set(u.bin.unique())


def test_lift_gains_matches_bruteforce(spark, events_pdf):
    u = _eval_users(events_pdf).sort_values(
        ["s_milli", "user_id"], ascending=[False, True]
    ).reset_index(drop=True)
    # ntile semantics: remainder spread over the EARLIEST tiles.
    n, k = len(u), 10
    base, rem = divmod(n, k)
    sizes = [base + (1 if i < rem else 0) for i in range(k)]
    u["decile"] = np.repeat(np.arange(1, k + 1), sizes)
    total_pos = u.pos.sum()
    rows = registry.QUERIES["q_stats_lift_gains"](spark, SF_DIR).collect()
    cum_n = cum_pos = 0
    for r in rows:
        grp = u[u.decile == r.decile]
        cum_n += len(grp)
        cum_pos += grp.pos.sum()
        assert r.n_users == len(grp) and r.n_pos == grp.pos.sum()
        assert r.gains == pytest.approx(cum_pos / total_pos, abs=1e-12)
        assert r.lift == pytest.approx(
            (cum_pos * n) / (cum_n * total_pos), abs=1e-12
        )


def test_rsi_matches_bruteforce(spark, events_pdf):
    cents = (events_pdf.value * 100).round(0).astype("int64")
    d = (
        events_pdf.assign(c=cents)
        .groupby(["event_type", "day"])["c"]
        .sum()
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    ref = {}
    for et, grp in d.groupby("event_type"):
        diffs = grp.c.diff().dropna().astype("int64").to_numpy()
        days = grp.day.to_numpy()[1:]
        for i in range(13, len(diffs)):
            w = diffs[i - 13 : i + 1]
            gain = int(w[w > 0].sum())
            loss = int(-w[w < 0].sum())
            if gain + loss > 0:
                ref[(et, pd.Timestamp(days[i]))] = (
                    gain,
                    loss,
                    100 * gain / (gain + loss),
                )
    rows = registry.QUERIES["q_win_rsi"](spark, SF_DIR).collect()
    assert len(rows) == len(ref)
    for r in rows:
        gain, loss, rsi = ref[(r.event_type, pd.Timestamp(r.day))]
        assert (r.gain_cents, r.loss_cents) == (gain, loss)
        assert r.rsi == pytest.approx(rsi, abs=1e-12)


def test_winsorized_matches_bruteforce(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round(0).astype("int64")
    rows = {
        r.seg: r
        for r in registry.QUERIES["q_stats_winsorized"](
            spark, SF_DIR
        ).collect()
    }
    for seg, grp in j.groupby("c_mktsegment"):
        srt = grp.sort_values(["cents", "o_orderkey"]).cents.to_numpy()
        n = len(srt)
        lo = srt[(10 * n + 99) // 100 - 1]
        hi = srt[(90 * n + 99) // 100 - 1]
        r = rows[seg]
        assert (r.n, r.lo_cents, r.hi_cents) == (n, lo, hi)
        assert r.winsorized_mean == pytest.approx(
            np.clip(srt, lo, hi).sum() / (100 * n), abs=1e-9
        )
        assert r.raw_mean == pytest.approx(
            srt.sum() / (100 * n), abs=1e-9
        )
        # winsorizing pulls the estimate toward the median side
        assert r.lo_cents <= r.hi_cents


def test_kanon_matches_bruteforce(spark):
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cents = (c.c_acctbal * 100).round(0).astype("int64")
    bucket = np.floor(cents / 100000.0).astype("int64")
    cls = (
        pd.DataFrame(
            {
                "nk": c.c_nationkey,
                "seg": c.c_mktsegment,
                "b": bucket,
            }
        )
        .groupby(["nk", "seg", "b"])
        .size()
    )
    rows = registry.QUERIES["q_privacy_kanon"](spark, SF_DIR).collect()
    assert [r.k for r in rows] == [2, 5, 10]
    for r in rows:
        small = cls[cls < r.k]
        assert r.n_classes == len(cls)
        assert r.n_records == cls.sum()
        assert r.min_class == cls.min()
        assert r.n_classes_small == len(small)
        assert r.n_records_risk == small.sum()
        assert r.risk_share == pytest.approx(
            small.sum() / cls.sum(), abs=1e-12
        )


def test_jsd_matches_bruteforce(spark, events_pdf):
    we = events_pdf.ts.dt.dayofweek.isin([5, 6])  # pandas: Mon=0
    ct = pd.crosstab(events_pdf.event_type, we)
    wd = ct.get(False, pd.Series(0, index=ct.index)).astype(float)
    wk = ct.get(True, pd.Series(0, index=ct.index)).astype(float)
    k = len(ct)
    p = (wd + 0.5) / (wd.sum() + k * 0.5)
    q = (wk + 0.5) / (wk.sum() + k * 0.5)
    m = (p + q) / 2
    terms = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
    rows = registry.QUERIES["q_stats_jsd"](spark, SF_DIR).collect()
    assert len(rows) == k
    for r in rows:
        assert r.n_wd == wd[r.event_type] and r.n_we == wk[r.event_type]
        assert r.jsd_term == pytest.approx(
            terms[r.event_type], abs=2e-6
        )
        assert r.jsd_total == pytest.approx(terms.sum(), abs=2e-6)
    # JSD in nats is bounded by ln 2
    assert 0 <= rows[0].jsd_total <= np.log(2)


def test_xcorr_matches_numpy(spark, events_pdf):
    daily = (
        events_pdf.assign(
            ed=(events_pdf.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        )
        .pivot_table(
            index="ed", columns="event_type", values="event_id",
            aggfunc="count", fill_value=0,
        )
    )
    x = daily["click"]
    y = daily["purchase"]
    rows = registry.QUERIES["q_stats_xcorr"](spark, SF_DIR).collect()
    assert [r.lag for r in rows] == list(range(-3, 4))
    for r in rows:
        a, b = x.align(y.copy().set_axis(y.index - r.lag), join="inner")
        assert r.n == len(a)
        assert r.xcorr == pytest.approx(
            np.corrcoef(a.to_numpy(float), b.to_numpy(float))[0, 1],
            abs=1e-9,
        )


def test_holt_winters_matches_python_recursion(spark, events_pdf):
    daily = (
        events_pdf.assign(
            ed=(events_pdf.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        )
        .groupby(["event_type", "ed"])
        .size()
        .reset_index(name="y")
    )
    rows = registry.QUERIES["q_events_holt_winters"](spark, SF_DIR).collect()
    got = {}
    for r in rows:
        got.setdefault(r.event_type, {})[r.h] = r
    for et, grp in daily.groupby("event_type"):
        y = grp.sort_values("ed").y.to_numpy(float)
        m = 7
        w1, w2 = y[:m].mean(), y[m : 2 * m].mean()
        level, trend = w1, (w2 - w1) / m
        seas = [y[i] - w1 for i in range(m)]
        for t in range(m, len(y)):
            sp = seas[t - m]
            ln = 0.3 * (y[t] - sp) + 0.7 * (level + trend)
            trend = 0.1 * (ln - level) + 0.9 * trend
            seas.append(0.2 * (y[t] - ln) + 0.8 * sp)
            level = ln
        for h in range(1, 8):
            ref = level + h * trend + seas[len(y) - m + (h - 1) % m]
            r = got[et][h]
            assert r.forecast == pytest.approx(ref, abs=2e-6)
            assert r.level == pytest.approx(level, abs=2e-6)
            assert r.trend == pytest.approx(trend, abs=2e-6)


def test_resample_interp_matches_pandas(spark, events_pdf):
    cents = (events_pdf.value * 100).round(0).astype("int64")
    sel = events_pdf.assign(c=cents)
    sel = sel[sel.c >= 25000]
    sel["ed"] = (
        sel.ts.dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    rows = registry.QUERIES["q_time_resample_interp"](
        spark, SF_DIR
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.event_type, {})[r.epoch_day] = r
    for et, grp in sel.groupby("event_type"):
        known = grp.groupby("ed").c.sum()
        full = known.reindex(
            range(known.index.min(), known.index.max() + 1)
        )
        interp = full.interpolate(method="index")
        assert set(got[et]) == set(full.index)
        for ed, v in interp.items():
            r = got[et][ed]
            assert r.interpolated == int(pd.isna(full[ed]))
            assert r.cents_resampled == pytest.approx(v, abs=1e-6)


def test_hill_tail_matches_numpy(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (o.o_totalprice * 100).round(0).astype("int64")
    srt = (
        pd.DataFrame({"c": cents, "k": o.o_orderkey})
        .sort_values(["c", "k"], ascending=[False, True])
        .c.to_numpy()
    )
    n = len(srt)
    k = max(10, n // 100)
    thr = srt[k]  # rank k+1, 0-indexed
    lt = np.log(srt[:k].astype(float) / thr)
    row = registry.QUERIES["q_stats_hill_tail"](spark, SF_DIR).collect()[0]
    assert (row.n, row.k, row.thr_cents) == (n, k, thr)
    assert row.hill_alpha == pytest.approx(k / lt.sum(), abs=2e-6)
    assert row.mean_excess_log == pytest.approx(lt.mean(), abs=2e-6)


def test_markov_attribution_matches_power_iteration(spark, events_pdf):
    rows = registry.QUERIES["q_events_markov_attribution"](
        spark, SF_DIR
    ).collect()
    # Rebuild journeys independently: 30-min-gap sessions, cut at
    # first purchase, transitions + START and NULL edges.
    df = events_pdf.sort_values(["user_id", "ts", "event_id"])
    counts = {}
    for _, g in df.groupby("user_id"):
        gap = g.ts.diff().dt.total_seconds() > 1800
        sid = gap.cumsum()
        for _, sess in g.groupby(sid):
            prev = "START"
            converted = False
            for et in sess.event_type:
                counts[(prev, et)] = counts.get((prev, et), 0) + 1
                prev = et
                if et == "purchase":
                    converted = True
                    break
            if not converted:
                counts[(prev, "NULL")] = counts.get((prev, "NULL"), 0) + 1

    def absorb(drop=None):
        # power iteration on P(absorb CONV | state)
        states = {s for s, _ in counts} | {
            d for _, d in counts if d not in ("purchase", "NULL")
        }
        p = {s: 0.0 for s in states}
        for _ in range(200):
            nxt = {}
            for s in states:
                tot = sum(n for (a, _), n in counts.items() if a == s)
                if tot == 0:
                    nxt[s] = 0.0
                    continue
                acc = 0.0
                for (a, d), n in counts.items():
                    if a != s or d == drop or d == "NULL":
                        continue
                    if d == "purchase":
                        acc += n / tot
                    else:
                        acc += n / tot * p[d]
                nxt[s] = 0.0 if s == drop else acc
            p = nxt
        return p["START"]

    base = absorb()
    channels = sorted(
        {d for _, d in counts if d not in ("purchase", "NULL", "START")}
    )
    effects = {c: max(0.0, base - absorb(c)) for c in channels}
    z = sum(effects.values())
    got = {r.channel: r for r in rows}
    assert sorted(got) == channels
    for c in channels:
        assert got[c].base_cvr == pytest.approx(base, abs=2e-6)
        assert got[c].removal_effect == pytest.approx(
            effects[c], abs=2e-6
        )
        assert got[c].attribution == pytest.approx(
            effects[c] / z if z else 0.0, abs=2e-6
        )


def test_runs_test_matches_bruteforce(spark, events_pdf):
    d = (
        events_pdf[events_pdf.event_type == "purchase"]
        .assign(c=lambda x: (x.value * 100).round(0).astype("int64"))
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )
    ed = (d.index - pd.Timestamp("1970-01-01")).days
    srt = sorted(zip(d.to_numpy(), ed))
    m = srt[(len(srt) + 1) // 2 - 1][0]
    s = [1 if v > m else 0 for v in d.to_numpy() if v != m]
    n, n1 = len(s), sum(s)
    n2 = n - n1
    r = 1 + sum(a != b for a, b in zip(s, s[1:]))
    row = registry.QUERIES["q_stats_runs_test"](spark, SF_DIR).collect()[0]
    assert (row.n, row.n1, row.n2, row.r) == (n, n1, n2, r)
    exp = 1 + 2 * n1 * n2 / n
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n**2 * (n - 1))
    assert row.expected_r == pytest.approx(exp, abs=1e-9)
    assert row.z == pytest.approx((r - exp) / np.sqrt(var), abs=2e-6)


def test_brown_forsythe_matches_scipy_free(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    # whole-dollar units (cent-squared sums overflow int64 at sf0.1)
    j["cents"] = j.o_totalprice.round(0).astype("int64")
    groups = []
    for seg, grp in j.groupby("c_mktsegment"):
        srt = grp.sort_values(["cents", "o_orderkey"]).cents.to_numpy()
        med = srt[(len(srt) + 1) // 2 - 1]
        groups.append(np.abs(srt - med).astype(float))
    k = len(groups)
    nn = sum(len(g) for g in groups)
    gm = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (nn - k))
    row = registry.QUERIES["q_stats_brown_forsythe"](
        spark, SF_DIR
    ).collect()[0]
    assert (row.k, row.n) == (k, nn)
    assert row.f_stat == pytest.approx(f_ref, abs=2e-6)
    assert row.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=2e-6)


def test_peak_detect_matches_bruteforce(spark, events_pdf):
    d = (
        events_pdf.assign(
            c=lambda x: (x.value * 100).round(0).astype("int64"),
            ed=lambda x: (
                x.ts.dt.normalize() - pd.Timestamp("1970-01-01")
            ).dt.days,
        )
        .groupby(["event_type", "ed"])["c"]
        .sum()
    )
    ref = {}
    for et in d.index.get_level_values(0).unique():
        s = d[et].sort_index()
        v = s.to_numpy()
        eds = s.index.to_numpy()
        for i in range(3, len(v) - 3):
            nb = np.concatenate([v[i - 3 : i], v[i + 1 : i + 4]])
            if (v[i] > nb).all():
                ref[(et, eds[i])] = (v[i], v[i] - nb.max())
    rows = registry.QUERIES["q_win_peak_detect"](spark, SF_DIR).collect()
    assert len(rows) == len(ref)
    for r in rows:
        cents, prom = ref[(r.event_type, r.epoch_day)]
        assert (r.cents, r.prominence_cents) == (cents, prom)


def test_cep_vshape_matches_bruteforce(spark, events_pdf):
    d = (
        events_pdf.assign(
            c=lambda x: (x.value * 100).round(0).astype("int64"),
            ed=lambda x: (
                x.ts.dt.normalize() - pd.Timestamp("1970-01-01")
            ).dt.days,
        )
        .groupby(["event_type", "ed"])["c"]
        .sum()
    )
    ref = {}
    for et in d.index.get_level_values(0).unique():
        s = d[et].sort_index()
        v, eds = s.to_numpy(), s.index.to_numpy()
        for i in range(2, len(v) - 2):
            if v[i - 2] > v[i - 1] > v[i] < v[i + 1] < v[i + 2]:
                ref[(et, eds[i])] = (
                    v[i], v[i - 2] - v[i], v[i + 2] - v[i]
                )
    rows = registry.QUERIES["q_win_cep_vshape"](spark, SF_DIR).collect()
    assert len(rows) == len(ref) > 0
    for r in rows:
        c, drop, rec = ref[(r.event_type, r.trough_day)]
        assert (r.trough_cents, r.drop_cents, r.recovery_cents) == (
            c, drop, rec,
        )


def test_dp_noise_matches_inverse_cdf(spark, events_pdf):
    counts = events_pdf.event_type.value_counts().sort_index()
    rows = registry.QUERIES["q_privacy_dp_noise"](spark, SF_DIR).collect()
    assert [r.event_type for r in rows] == list(counts.index)
    for i, r in enumerate(rows, start=1):
        u = ((i * 1103515245 + 12345) % 2147483648 + 0.5) / 2147483648
        c = u - 0.5
        noise = -np.sign(c) * np.log(1 - 2 * abs(c))
        n = counts[r.event_type]
        assert r.raw_count == n
        assert r.noise == pytest.approx(noise, abs=2e-6)
        assert r.released_count == max(0, round(n + noise))
    # the mechanism must actually perturb (not an identity release)
    assert any(r.released_count != r.raw_count for r in rows)


def test_bayes_ab_matches_closed_form(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    g = events_pdf.groupby("user_id").event_type
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    succ = (2 * purch > cv).astype(int)
    variant = pd.Series(
        ["A" if ((u * A + B) % P) % 2 == 0 else "B" for u in succ.index],
        index=succ.index,
    )
    rows = {r.variant: r for r in
            registry.QUERIES["q_stats_bayes_ab"](spark, SF_DIR).collect()}
    post = {}
    for v in ["A", "B"]:
        s = succ[variant == v]
        n, k = len(s), s.sum()
        pm = (k + 1) / (n + 2)
        pv = (k + 1) * (n - k + 1) / ((n + 2) ** 2 * (n + 3))
        post[v] = (n, k, pm, pv)
        r = rows[v]
        assert (r.n, r.s) == (n, k)
        assert r.post_mean == pytest.approx(pm, abs=1e-12)
        assert r.ci_lo == pytest.approx(
            pm - 1.959963984540054 * np.sqrt(pv), abs=1e-9
        )
    dm = post["B"][2] - post["A"][2]
    dv = post["B"][3] + post["A"][3]
    from math import erf, sqrt
    p_ref = 0.5 * (1 + erf((dm / sqrt(dv)) / sqrt(2)))
    # A&S 26.2.17 is accurate to ~7.5e-8; rounded 8dp in the engine
    assert rows["A"].p_b_beats_a == pytest.approx(p_ref, abs=1e-6)


def test_burstiness_matches_numpy(spark, events_pdf):
    df = events_pdf.sort_values(["event_type", "ts", "event_id"])
    # unit-proof: normalize to ms first, then truncate to deciseconds
    ds = df.ts.astype("datetime64[ms]").astype("int64") // 100
    rows = {r.event_type: r for r in
            registry.QUERIES["q_events_burstiness"](spark, SF_DIR).collect()}
    for et, g in df.assign(ds=ds).groupby("event_type"):
        gaps = g.ds.diff().dropna().to_numpy(dtype="int64")
        mu = gaps.mean()
        sig = np.sqrt(((gaps - mu) ** 2).mean())
        r = rows[et]
        assert r.n == len(gaps)
        assert r.mean_gap_s == pytest.approx(mu / 10, rel=1e-9)
        assert r.cv == pytest.approx(sig / mu, rel=1e-6)
        assert r.burstiness == pytest.approx(
            (sig - mu) / (sig + mu), abs=1e-9
        )


def test_theil_decomposition_identity(spark):
    rows = registry.QUERIES["q_agg_theil"](spark, SF_DIR).collect()
    # brute force from parquet
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["cents"] = (j.o_totalprice * 100).round(0).astype("int64")
    x = j.groupby(["n_name", "c_custkey"]).cents.sum()
    X, N = x.sum(), len(x)
    sh = x / X
    t_total = float((sh * np.log(N * sh)).sum())
    by_name = {r.nation: r for r in rows}
    acc = 0.0
    for nation, xg in x.groupby(level=0):
        Xg, ng = xg.sum(), len(xg)
        shg = xg / Xg
        tw = float((shg * np.log(ng * shg)).sum())
        r = by_name[nation]
        assert r.n_customers == ng
        assert r.revenue_share == pytest.approx(Xg / X, abs=1e-12)
        assert r.t_within == pytest.approx(tw, abs=2e-6)
        acc += (Xg / X) * tw
    r0 = rows[0]
    assert r0.t_total == pytest.approx(t_total, abs=2e-6)
    # additive decomposition: T = T_between + sum share*T_within
    assert r0.t_between + acc == pytest.approx(t_total, abs=1e-5)


def test_capture_recapture_matches_formula(spark, events_pdf):
    p = events_pdf[events_pdf.event_type == "purchase"]
    s1 = set(p.loc[p.ts.dt.day < 15, "user_id"])
    s2 = set(p.loc[p.ts.dt.day >= 15, "user_id"])
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    row = registry.QUERIES["q_stats_capture_recapture"](
        spark, SF_DIR
    ).collect()[0]
    assert (row.n1, row.n2, row.m2) == (n1, n2, m)
    assert row.n_observed == len(s1 | s2)
    assert row.chapman_estimate == pytest.approx(
        (n1 + 1) * (n2 + 1) / (m + 1) - 1, abs=1e-9
    )
    # the estimate must dominate the naive lower bound
    assert row.chapman_estimate >= row.n_observed - 1


def test_simpson_check_matches_pandas(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    g = events_pdf.groupby("user_id").event_type
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    succ = (2 * purch > cv).astype(int)
    u = pd.DataFrame({
        "s": succ,
        "variant": ["A" if ((i * A + B) % P) % 2 == 0 else "B"
                    for i in succ.index],
        "stratum": [i % 3 for i in succ.index],
    })
    cells = u.groupby(["stratum", "variant"]).s.agg(["count", "sum"])
    ka = u[u.variant == "A"].s.sum(); na = (u.variant == "A").sum()
    kb = u[u.variant == "B"].s.sum(); nb = (u.variant == "B").sum()
    pooled = kb / nb - ka / na
    rows = registry.QUERIES["q_stats_simpson_check"](
        spark, SF_DIR
    ).collect()
    assert [r.stratum for r in rows] == [0, 1, 2]
    for r in rows:
        ca = cells.loc[(r.stratum, "A")]
        cb = cells.loc[(r.stratum, "B")]
        assert (r.n_a, r.n_b) == (ca["count"], cb["count"])
        diff = cb["sum"] / cb["count"] - ca["sum"] / ca["count"]
        assert r.diff == pytest.approx(diff, abs=1e-12)
        assert r.pooled_diff == pytest.approx(pooled, abs=1e-12)
        assert r.flipped == int(diff * pooled < 0)


def test_partial_corr_matches_numpy(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    x = j.o_totalprice.to_numpy(float)
    y = j.c_acctbal.to_numpy(float)
    z = j.c_nationkey.to_numpy(float)
    rxy = round(np.corrcoef(x, y)[0, 1], 4)
    rxz = round(np.corrcoef(x, z)[0, 1], 4)
    ryz = round(np.corrcoef(y, z)[0, 1], 4)
    ref = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    row = registry.QUERIES["q_stats_partial_corr"](
        spark, SF_DIR
    ).collect()[0]
    assert row.n == len(j)
    assert row.r_xy == pytest.approx(rxy, abs=1e-4)
    assert row.r_xy_given_z == pytest.approx(ref, abs=3e-4)


def test_neyman_matches_formula(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["d"] = j.o_totalprice.round(0).astype("int64")
    weights = {}
    for seg, g in j.groupby("c_mktsegment"):
        v = g.d.to_numpy(float)
        n = len(v)
        sig = np.sqrt(((v - v.mean()) ** 2).mean())  # population sd
        weights[seg] = (n, n * sig)
    z = sum(w for _, w in weights.values())
    rows = {r.seg: r for r in
            registry.QUERIES["q_sample_neyman"](spark, SF_DIR).collect()}
    total_alloc = 0
    for seg, (n, w) in weights.items():
        r = rows[seg]
        assert r.n_h == n
        assert r.alloc_share == pytest.approx(w / z, abs=2e-6)
        assert r.n_alloc == min(n, max(1, round(1000 * w / z)))
        total_alloc += r.n_alloc
    assert abs(total_alloc - 1000) <= len(weights)  # rounding slack


def test_periodogram_matches_numpy_fft(spark, events_pdf):
    daily = (
        events_pdf[events_pdf.event_type == "purchase"]
        .groupby("day")
        .size()
        .sort_index()
        .to_numpy(float)
    )
    spec = np.fft.fft(daily)
    rows = registry.QUERIES["q_stats_periodogram"](spark, SF_DIR).collect()
    assert [r.k for r in rows] == list(range(1, 8))
    powers = [abs(spec[k]) ** 2 for k in range(1, 8)]
    for r, p in zip(rows, powers):
        assert r.n_days == len(daily)
        assert r.power == pytest.approx(p, rel=1e-6, abs=1e-3)
        assert r.power_share == pytest.approx(p / sum(powers), abs=1e-5)


def test_odds_ratio_matches_formula(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    g = events_pdf.groupby("user_id").event_type
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    succ = (2 * purch > cv).astype(int)
    a = pd.Series(
        [1 if ((u * A + B) % P) % 2 == 0 else 0 for u in succ.index],
        index=succ.index,
    )
    c11 = int(((a == 1) & (succ == 1)).sum())
    c10 = int(((a == 1) & (succ == 0)).sum())
    c01 = int(((a == 0) & (succ == 1)).sum())
    c00 = int(((a == 0) & (succ == 0)).sum())
    row = registry.QUERIES["q_stats_odds_ratio"](spark, SF_DIR).collect()[0]
    assert (row.c11, row.c10, row.c01, row.c00) == (c11, c10, c01, c00)
    orr = (c11 * c00) / (c10 * c01)
    se = np.sqrt(1 / c11 + 1 / c10 + 1 / c01 + 1 / c00)
    assert row.odds_ratio == pytest.approx(orr, abs=1e-12)
    assert row.log_or_ci_lo == pytest.approx(
        np.log(orr) - 1.959963984540054 * se, abs=2e-6
    )
    assert row.log_or_ci_hi == pytest.approx(
        np.log(orr) + 1.959963984540054 * se, abs=2e-6
    )


def test_mantel_haenszel_matches_formula(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    g = events_pdf.groupby("user_id").event_type
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    succ = (2 * purch > cv).astype(int)
    num = den = 0.0
    cells_ref = {}
    for st in (0, 1, 2):
        idx = [u for u in succ.index if u % 3 == st]
        a = {u: ((u * A + B) % P) % 2 == 0 for u in idx}
        c11 = sum(1 for u in idx if a[u] and succ[u])
        c10 = sum(1 for u in idx if a[u] and not succ[u])
        c01 = sum(1 for u in idx if not a[u] and succ[u])
        c00 = sum(1 for u in idx if not a[u] and not succ[u])
        n = c11 + c10 + c01 + c00
        cells_ref[st] = (c11, c10, c01, c00)
        num += c11 * c00 / n
        den += c10 * c01 / n
    rows = registry.QUERIES["q_stats_mantel_haenszel"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        assert (r.c11, r.c10, r.c01, r.c00) == cells_ref[r.stratum]
        assert r.mh_pooled_or == pytest.approx(num / den, abs=2e-6)


def test_ljung_box_matches_numpy(spark, events_pdf):
    daily = (
        events_pdf.groupby(["event_type", "day"]).size().reset_index(name="y")
    )
    rows = {r.event_type: r for r in
            registry.QUERIES["q_stats_ljung_box"](spark, SF_DIR).collect()}
    for et, g in daily.groupby("event_type"):
        y = g.sort_values("day").y.to_numpy(float)
        n = len(y)
        u = y - y.mean()
        d0 = (u * u).sum()
        q = 0.0
        for k in (1, 2, 3):
            rk = (u[k:] * u[:-k]).sum() / d0
            q += rk * rk / (n - k)
            assert getattr(rows[et], f"r{k}") == pytest.approx(
                rk, abs=2e-6
            )
        q *= n * (n + 2)
        assert rows[et].q_stat == pytest.approx(q, abs=2e-5)
        assert rows[et].reject_white_noise == int(q > 7.814727903251179)


def test_weibull_fit_matches_numpy(spark, events_pdf):
    ds = events_pdf.ts.astype("datetime64[ms]").astype("int64") // 100
    df = events_pdf.assign(ds=ds)
    t0 = df.groupby("user_id").ds.min()
    tp = df[df.event_type == "purchase"].groupby("user_id").ds.min()
    dt = (tp - t0.loc[tp.index]).pipe(lambda s: s[s > 0])
    srt = np.sort(dt.to_numpy(float))
    n = len(srt)
    i = np.arange(1, n + 1)
    x = np.log(srt / 10.0)
    y = np.log(-np.log(1 - (i - 0.38) / (n + 0.25)))
    k_ref, b_ref = np.polyfit(x, y, 1)
    row = registry.QUERIES["q_stats_weibull_fit"](spark, SF_DIR).collect()[0]
    assert row.n_converters == n
    assert row.shape_k == pytest.approx(k_ref, abs=2e-6)
    assert row.scale_lambda_s == pytest.approx(
        np.exp(-b_ref / k_ref), rel=1e-4
    )


def test_cohens_kappa_consistent_with_confusion(spark):
    """kappa recomputed from q_text_lang_confusion's own matrix must
    equal q_stats_cohens_kappa (shared classifier, independent
    rollups)."""
    conf = registry.QUERIES["q_text_lang_confusion"](
        spark, SF_DIR
    ).collect()
    n = sum(r.n for r in conf)
    agree = sum(r.n for r in conf if r.true_lang == r.pred_lang)
    rows_m = {}
    cols_m = {}
    for r in conf:
        rows_m[r.true_lang] = rows_m.get(r.true_lang, 0) + r.n
        cols_m[r.pred_lang] = cols_m.get(r.pred_lang, 0) + r.n
    pe = sum(rows_m.get(l, 0) * cols_m.get(l, 0)
             for l in set(rows_m) | set(cols_m)) / n**2
    po = agree / n
    row = registry.QUERIES["q_stats_cohens_kappa"](
        spark, SF_DIR
    ).collect()[0]
    assert row.n_docs == n and row.agree == agree
    assert row.p_observed == pytest.approx(po, abs=1e-12)
    assert row.p_expected == pytest.approx(pe, abs=1e-12)
    assert row.kappa == pytest.approx((po - pe) / (1 - pe), abs=1e-12)


def test_horvitz_thompson_unbiasedness_shape(spark):
    row = registry.QUERIES["q_sample_horvitz_thompson"](
        spark, SF_DIR
    ).collect()[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (o.o_totalprice * 100).round(0).astype("int64")
    inc = (((o.o_orderkey * 2654435761 + 1013904223) % 1000000007)
           % 97 < 32)
    assert row.n_pop == len(o)
    assert row.n_sample == int(inc.sum())
    assert row.total_cents == cents.sum()
    ht = (cents[inc] / (32 / 97)).sum()
    assert row.ht_estimate == pytest.approx(ht / 100, abs=0.02)
    assert row.rel_error == pytest.approx(
        (ht - cents.sum()) / cents.sum(), abs=2e-6
    )
    # a ~33% hash sample should estimate the total within ~5%
    assert abs(row.rel_error) < 0.05


def test_freq_severity_identity(spark, events_pdf):
    row = registry.QUERIES["q_events_freq_severity"](
        spark, SF_DIR
    ).collect()[0]
    p = events_pdf[events_pdf.event_type == "purchase"]
    cents = (p.value * 100).round(0).astype("int64")
    n_users = events_pdf.user_id.nunique()
    n_buyers = p.user_id.nunique()
    assert (row.n_users, row.n_buyers, row.n_purchases) == (
        n_users, n_buyers, len(p),
    )
    assert row.arpu_direct == pytest.approx(
        cents.sum() / (100 * n_users), abs=1e-9
    )
    # the decomposition is an exact identity
    assert row.arpu_decomposed == pytest.approx(
        row.arpu_direct, rel=1e-12
    )


def test_entropy_rate_matches_bruteforce(spark, events_pdf):
    df = events_pdf.sort_values(["user_id", "ts", "event_id"])
    counts = {}
    for _, g in df.groupby("user_id"):
        ets = g.event_type.to_list()
        for a, b in zip(ets, ets[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    nn = sum(counts.values())
    src = {}
    for (a, _), n in counts.items():
        src[a] = src.get(a, 0) + n
    h_rate = -sum(
        (n / nn) * np.log(n / src[a]) for (a, _), n in counts.items()
    )
    h_marg = -sum((n / nn) * np.log(n / nn) for n in src.values())
    row = registry.QUERIES["q_stats_entropy_rate"](
        spark, SF_DIR
    ).collect()[0]
    assert row.entropy_rate == pytest.approx(h_rate, abs=2e-6)
    assert row.h_marginal == pytest.approx(h_marg, abs=2e-6)
    # conditioning can only reduce entropy
    assert row.entropy_rate <= row.h_marginal + 1e-9


def test_kpi_tree_additivity(spark, events_pdf):
    rows = registry.QUERIES["q_events_kpi_tree"](spark, SF_DIR).collect()
    assert len(rows) == 4
    total = sum(r.delta_ln for r in rows)
    assert total == pytest.approx(rows[0].delta_ln_revenue, abs=5e-6)
    assert sum(r.contribution for r in rows) == pytest.approx(
        1.0, abs=5e-5
    )
    # cross-check one factor against pandas
    p1 = events_pdf[events_pdf.ts.dt.day < 15]
    p2 = events_pdf[events_pdf.ts.dt.day >= 15]
    au = {r.factor: r for r in rows}["active_users"]
    assert au.period1 == p1.user_id.nunique()
    assert au.period2 == p2.user_id.nunique()


def test_hurst_matches_python(spark, events_pdf):
    d = (
        events_pdf[events_pdf.event_type == "purchase"]
        .assign(c=lambda x: (x.value * 100).round(0).astype("int64"))
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    xs, ys = [], []
    rows = {r.w: r for r in
            registry.QUERIES["q_stats_hurst"](spark, SF_DIR).collect()}
    for w in (5, 10, 15):
        ratios = []
        for i in range(len(d) // w):
            y = d[i * w : (i + 1) * w].astype(float)
            u = np.cumsum(w * y - y.sum())
            rng = u.max() - u.min()
            den = np.sqrt(float(w * (y**2).sum() - y.sum() ** 2))
            if den > 0:
                ratios.append(rng / den)
        m = np.mean(ratios)
        xs.append(np.log(w)); ys.append(np.log(m))
        r = rows[w]
        assert r.n_chunks == len(ratios)
        assert r.mean_rs == pytest.approx(m, abs=2e-6)
    h_ref = np.polyfit(xs, ys, 1)[0]
    for r in rows.values():
        assert r.hurst_h == pytest.approx(h_ref, abs=2e-6)


def test_msprt_matches_formula(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    g = events_pdf.groupby("user_id").event_type
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    succ = (2 * purch > cv).astype(int)
    a = pd.Series(
        [1 if ((u * A + B) % P) % 2 == 0 else 0 for u in succ.index],
        index=succ.index,
    )
    na, ka = int((a == 1).sum()), int(succ[a == 1].sum())
    nb, kb = int((a == 0).sum()), int(succ[a == 0].sum())
    d = kb / nb - ka / na
    pool = (ka + kb) / (na + nb)
    v = pool * (1 - pool) * (1 / na + 1 / nb)
    tau = 1.0
    lam = np.sqrt(v / (v + tau)) * np.exp(
        tau * d * d / (2 * v * (v + tau))
    )
    row = registry.QUERIES["q_stats_msprt"](spark, SF_DIR).collect()[0]
    assert (row.na, row.ka, row.nb, row.kb) == (na, ka, nb, kb)
    assert row.mixture_lr == pytest.approx(lam, abs=2e-6)
    assert row.reject == int(lam > 20.0)


def test_dkw_band_matches_numpy(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    srt = (
        pd.DataFrame(
            {"c": (o.o_totalprice * 100).round(0).astype("int64"),
             "k": o.o_orderkey}
        )
        .sort_values(["c", "k"])
        .c.to_numpy()
    )
    n = len(srt)
    eps = np.sqrt(np.log(2 / 0.05) / (2 * n))
    rows = registry.QUERIES["q_stats_dkw_band"](spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 10))
    for r in rows:
        rn = (r.decile * n + 9) // 10
        assert r.value_cents == srt[rn - 1]
        assert r.ecdf == pytest.approx(rn / n, abs=1e-12)
        assert r.band_lo == pytest.approx(max(0, rn / n - eps), abs=1e-9)
        assert r.band_hi == pytest.approx(min(1, rn / n + eps), abs=1e-9)


def test_retention_fit_matches_numpy(spark, events_pdf):
    days = (
        events_pdf.assign(
            ed=(events_pdf.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        )[["user_id", "ed"]]
        .drop_duplicates()
    )
    d0 = days.ed.min()
    cohort = set(days.loc[days.ed == d0, "user_id"])
    pts = []
    rows = {r.t: r for r in registry.QUERIES["q_events_retention_fit"](
        spark, SF_DIR).collect()}
    for t in range(1, 15):
        n_t = len(cohort & set(days.loc[days.ed == d0 + t, "user_id"]))
        if n_t > 0:
            pts.append((np.log(t), np.log(n_t / len(cohort))))
            r = rows[t]
            assert r.n_t == n_t
            assert r.retention == pytest.approx(
                n_t / len(cohort), abs=1e-6
            )
    b, a = np.polyfit([x for x, _ in pts], [y for _, y in pts], 1)
    some = next(iter(rows.values()))
    assert some.decay_b == pytest.approx(b, abs=2e-6)
    assert some.predicted_day30 == pytest.approx(
        np.exp(a + b * np.log(30)), abs=2e-6
    )


def test_sketch_error_within_guarantee(spark):
    rows = registry.QUERIES["q_stats_sketch_error"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 4
    for r in rows:
        # KLL-style guarantee: rank error <= 1/accuracy
        assert r.rank_err <= 1.0 / 1000 + 1e-12
        # exact side must really be the rank-picked order statistic
        assert r.n > 0 and r.exact_cents > 0


def test_friedman_matches_bruteforce(spark, events_pdf):
    cents = (events_pdf.value * 100).round(0).astype("int64")
    d = (
        events_pdf.assign(c=cents)
        .groupby(["day", "event_type"])["c"]
        .sum()
        .unstack()
        .dropna()  # complete blocks only
    )
    ranks = d.rank(axis=1, method="min")
    r_sums = ranks.sum()
    n, k = len(d), d.shape[1]
    q_ref = 12 / (n * k * (k + 1)) * (r_sums**2).sum() - 3 * n * (k + 1)
    rows = {r.event_type: r for r in
            registry.QUERIES["q_stats_friedman"](spark, SF_DIR).collect()}
    for et, rs in r_sums.items():
        r = rows[et]
        assert r.r_sum == int(rs)
        assert (r.n_blocks, r.k) == (n, k)
        assert r.friedman_q == pytest.approx(q_ref, abs=2e-6)


def test_cronbach_matches_numpy(spark, events_pdf):
    d = (
        events_pdf.groupby(["day", "event_type"])
        .size()
        .unstack()
        .dropna()
    )
    item_vars = d.var(axis=0, ddof=0)
    total_var = d.sum(axis=1).var(ddof=0)
    k = d.shape[1]
    alpha_ref = k / (k - 1) * (1 - item_vars.sum() / total_var)
    row = registry.QUERIES["q_stats_cronbach_alpha"](
        spark, SF_DIR
    ).collect()[0]
    assert row.k == k
    assert row.sum_item_var == pytest.approx(item_vars.sum(), abs=2e-5)
    assert row.total_var == pytest.approx(total_var, abs=2e-5)
    assert row.cronbach_alpha == pytest.approx(alpha_ref, abs=2e-5)


def test_hll_cumulative_error_envelope(spark, events_pdf):
    rows = registry.QUERIES["q_agg_hll_cumulative"](
        spark, SF_DIR
    ).collect()
    days = (
        events_pdf.assign(
            ed=(events_pdf.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        )[["user_id", "ed"]]
        .drop_duplicates()
    )
    fd = days.groupby("user_id").ed.min()
    assert len(rows) == days.ed.nunique()
    for r in rows:
        assert r.exact_cum == int((fd <= r.epoch_day).sum())
        # lgK=12 sketch: ~1.04/sqrt(2^12) ~ 1.6% SE; 5 sigma bound
        assert r.rel_err <= 0.10
    # cumulative curve is monotone in both forms
    assert all(
        a.exact_cum <= b.exact_cum and a.approx_cum <= b.approx_cum
        for a, b in zip(rows, rows[1:])
    )


def test_kruskal_wallis_matches_scipy_free(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = (j.o_totalprice * 100).round(0).astype("int64")
    j["rk"] = j.x.rank(method="average")
    n = len(j)
    groups = j.groupby("c_mktsegment")
    h = 12 / (n * (n + 1)) * sum(
        g.rk.sum() ** 2 / len(g) for _, g in groups
    ) - 3 * (n + 1)
    _, t_counts = np.unique(j.x, return_counts=True)
    corr = 1 - ((t_counts**3 - t_counts).sum()) / (n**3 - n)
    h_ref = h / corr
    rows = {r.seg: r for r in registry.QUERIES["q_stats_kruskal_wallis"](
        spark, SF_DIR).collect()}
    for seg, g in groups:
        r = rows[seg]
        assert r.n_g == len(g)
        assert r.mean_rank == pytest.approx(g.rk.mean(), abs=1e-3)
        assert r.h_stat == pytest.approx(h_ref, abs=2e-5)


def test_spc_xbar_matches_numpy(spark, events_pdf):
    d = (
        events_pdf[events_pdf.event_type == "purchase"]
        .assign(c=lambda x: (x.value * 100).round(0).astype("int64"))
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    nfull = len(d) // 5
    subs = d[: nfull * 5].reshape(nfull, 5)
    xbars = subs.mean(axis=1)
    ranges = subs.max(axis=1) - subs.min(axis=1)
    xbb, rb = xbars.mean(), ranges.mean()
    rows = registry.QUERIES["q_win_spc_xbar_r"](spark, SF_DIR).collect()
    assert len(rows) == nfull
    for r, xb, rg in zip(rows, xbars, ranges):
        assert r.xbar == pytest.approx(xb, abs=1e-3)
        assert r.range_cents == rg
        assert r.ucl_x == pytest.approx(xbb + 0.577 * rb, abs=1e-3)
        assert r.out_of_control == int(
            xb > xbb + 0.577 * rb or xb < xbb - 0.577 * rb
        )


def test_mcnemar_matches_bruteforce(spark):
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    markers = {
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "la", "de", "que", "los"],
        "de": ["der", "die", "und", "das", "ist"],
        "fr": ["le", "la", "les", "des", "est"],
    }

    def classify(text, word_lists):
        toks = str(text).lower().split(" ")
        hits = {
            lang: sum(toks.count(w) for w in ws)
            for lang, ws in word_lists.items()
        }
        best = max(hits.values())
        if best == 0:
            return "und"
        for lang in word_lists:  # dict order = tie priority
            if hits[lang] == best:
                return lang

    weak = {lang: ws[:1] for lang, ws in markers.items()}
    b = c = 0
    cells = [0, 0, 0, 0]
    for r in d.itertuples():
        a_ok = classify(r.text, markers) == r.lang
        b_ok = classify(r.text, weak) == r.lang
        cells[(1 - a_ok) * 2 + (1 - b_ok)] += 1
        if a_ok and not b_ok:
            b += 1
        if b_ok and not a_ok:
            c += 1
    chi2 = (abs(b - c) - 1) ** 2 / (b + c) if b + c else None
    row = registry.QUERIES["q_stats_mcnemar"](spark, SF_DIR).collect()[0]
    assert (row.both_ok, row.only_a, row.only_b, row.both_bad) == (
        cells[0], cells[1], cells[2], cells[3],
    )
    if chi2 is None:
        # no discordant pairs at this SF: NULL chi2, not significant
        assert row.mcnemar_chi2 is None and row.significant == 0
    else:
        assert row.mcnemar_chi2 == pytest.approx(chi2, abs=2e-6)
        assert row.significant == int(chi2 > 3.841458820694124)


def test_tolerance_interval_matches_wilks(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (o.o_totalprice * 100).round(0).astype("int64")
    n = len(cents)
    g = 0.95
    conf = 1 - n * g ** (n - 1) * (1 - g) - g**n
    row = registry.QUERIES["q_stats_tolerance_interval"](
        spark, SF_DIR
    ).collect()[0]
    assert (row.n, row.lower_cents, row.upper_cents) == (
        n, cents.min(), cents.max(),
    )
    assert row.confidence == pytest.approx(conf, abs=2e-6)
    assert row.meets_95 == int(conf >= 0.95)


def test_business_days_matches_numpy(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    first = li.groupby("l_orderkey").l_shipdate.min().dt.normalize()
    j = o.assign(d0=o.o_orderdate.dt.normalize()).merge(
        first.rename("d1"), left_on="o_orderkey", right_index=True
    )
    j = j[j.d1 > j.d0]
    cal = (j.d1 - j.d0).dt.days.to_numpy()
    biz = np.busday_count(
        j.d0.dt.date.to_numpy("datetime64[D]") + np.timedelta64(1, "D"),
        j.d1.dt.date.to_numpy("datetime64[D]") + np.timedelta64(1, "D"),
    )
    row = registry.QUERIES["q_time_business_days"](
        spark, SF_DIR
    ).collect()[0]
    assert row.n_orders == len(j)
    assert row.avg_cal_days == pytest.approx(cal.mean(), abs=1e-9)
    assert row.avg_biz_days == pytest.approx(biz.mean(), abs=1e-9)
    assert row.max_biz_days == biz.max()


def test_jarque_bera_matches_numpy(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = j.o_totalprice.round(0).astype("int64")
    rows = {r.seg: r for r in registry.QUERIES["q_stats_jarque_bera"](
        spark, SF_DIR).collect()}
    for seg, g in j.groupby("c_mktsegment"):
        x = g.x.to_numpy(float)
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        skew = ((x - m) ** 3).mean() / m2**1.5
        exk = ((x - m) ** 4).mean() / m2**2 - 3
        jb = n / 6 * (skew**2 + exk**2 / 4)
        r = rows[seg]
        assert r.n == n
        assert r.skewness == pytest.approx(skew, abs=2e-5)
        assert r.excess_kurtosis == pytest.approx(exk, abs=2e-5)
        assert r.jb_stat == pytest.approx(jb, rel=1e-4)
        assert r.reject_normality == int(jb > 5.991464547107979)


def test_skyline_matches_bruteforce(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    first = li.groupby("l_orderkey").l_shipdate.min().dt.normalize()
    j = o.assign(d0=o.o_orderdate.dt.normalize()).merge(
        first.rename("d1"), left_on="o_orderkey", right_index=True
    )
    j = j[j.d1 > j.d0].copy()
    j["price"] = (j.o_totalprice * 100).round(0).astype("int64")
    j["lat"] = (j.d1 - j.d0).dt.days
    pts = j[["o_orderkey", "price", "lat"]].to_numpy()
    # O(n^2) dominance check (ground truth independent of the sweep)
    sky = []
    for k, p, l in pts:
        dominated = any(
            (p2 <= p and l2 < l) or (p2 < p and l2 <= l)
            for _, p2, l2 in pts
        )
        if not dominated:
            sky.append((k, p, l))
    # the sweep's tie convention keeps EVERY equal-price row that
    # beats all strictly-cheaper rows; reconcile by the same rule
    sweep_truth = []
    for k, p, l in sorted(map(tuple, pts), key=lambda t: (t[1], t[0])):
        cheaper = [l2 for _, p2, l2 in pts if p2 < p]
        if not cheaper or l < min(cheaper):
            sweep_truth.append((k, p, l))
    rows = registry.QUERIES["q_win_skyline_2d"](spark, SF_DIR).collect()
    got = [(r.o_orderkey, r.price_cents, r.latency_days) for r in rows]
    assert got == sorted(sweep_truth, key=lambda t: (t[1], t[0]))
    # every strictly-dominant point must be present
    for k, p, l in sky:
        cheaper = [l2 for _, p2, l2 in pts if p2 < p]
        if not cheaper or l < min(cheaper):
            assert (k, p, l) in got


def test_cooks_distance_matches_numpy(spark, events_pdf):
    daily = (
        events_pdf[events_pdf.event_type == "purchase"]
        .groupby("day")
        .size()
        .sort_index()
    )
    ed = (daily.index - pd.Timestamp("1970-01-01")).days.to_numpy()
    y = daily.to_numpy(float)
    x = np.arange(len(y), dtype=float)
    n = len(y)
    b, a = np.polyfit(x, y, 1)
    e = y - (a + b * x)
    h = 1 / n + (x - x.mean()) ** 2 / ((x - x.mean()) ** 2).sum()
    s2 = (e**2).sum() / (n - 2)
    d = e**2 * h / (2 * s2 * (1 - h) ** 2)
    order = sorted(
        range(n), key=lambda i: (-round(d[i], 6), ed[i])
    )[:5]
    rows = registry.QUERIES["q_stats_cooks_distance"](
        spark, SF_DIR
    ).collect()
    for r, i in zip(rows, order):
        assert r.epoch_day == ed[i]
        assert r.cooks_d == pytest.approx(d[i], abs=2e-6)
        assert r.leverage == pytest.approx(h[i], abs=2e-6)


def test_bartlett_matches_scipy_free(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = j.o_totalprice.round(0).astype("int64")
    groups = [g.x.to_numpy(float) for _, g in j.groupby("c_mktsegment")]
    k = len(groups)
    nn = sum(len(g) for g in groups)
    vars_ = [g.var(ddof=1) for g in groups]
    sp2 = sum((len(g) - 1) * v for g, v in zip(groups, vars_)) / (
        nn - k
    )
    num = (nn - k) * np.log(sp2) - sum(
        (len(g) - 1) * np.log(v) for g, v in zip(groups, vars_)
    )
    den = 1 + (
        sum(1 / (len(g) - 1) for g in groups) - 1 / (nn - k)
    ) / (3 * (k - 1))
    rows = registry.QUERIES["q_stats_bartlett"](spark, SF_DIR).collect()
    for r in rows:
        assert r.bartlett_stat == pytest.approx(num / den, abs=2e-5)


def test_mix_shift_decomposition_identity(spark, events_pdf):
    cents = (events_pdf.value * 100).round(0).astype("int64")
    df = events_pdf.assign(
        c=cents, p=np.where(events_pdf.ts.dt.day < 15, 1, 2)
    )
    rows = registry.QUERIES["q_events_mix_shift"](spark, SF_DIR).collect()
    # the per-type effects must sum to the overall average's change
    avg1 = df[df.p == 1].c.mean() / 100
    avg2 = df[df.p == 2].c.mean() / 100
    total = sum(r.total_effect for r in rows)
    assert total == pytest.approx(avg2 - avg1, abs=5e-5)
    for r in rows:
        g1 = df[(df.p == 1) & (df.event_type == r.event_type)]
        g2 = df[(df.p == 2) & (df.event_type == r.event_type)]
        w1 = len(g1) / (df.p == 1).sum()
        w2 = len(g2) / (df.p == 2).sum()
        r1 = g1.c.mean() / 100
        r2 = g2.c.mean() / 100
        assert r.mix_effect == pytest.approx(
            (w2 - w1) * (r1 + r2) / 2, abs=2e-6
        )
        assert r.rate_effect == pytest.approx(
            (r2 - r1) * (w1 + w2) / 2, abs=2e-6
        )


def test_ulcer_index_matches_numpy(spark, events_pdf):
    d = (
        events_pdf[events_pdf.event_type == "purchase"]
        .assign(c=lambda x: (x.value * 100).round(0).astype("int64"))
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    eq = np.cumsum(d)
    peak = np.maximum.accumulate(eq)
    ddp = 100 * (peak - eq) / peak
    row = registry.QUERIES["q_win_ulcer_index"](spark, SF_DIR).collect()[0]
    assert row.n_days == len(d)
    assert row.max_drawdown_pct == pytest.approx(ddp.max(), abs=2e-6)
    assert row.ulcer_index == pytest.approx(
        np.sqrt((ddp**2).mean()), abs=2e-6
    )


def test_ks_uniformity_matches_numpy(spark, events_pdf):
    A, B, P = 2654435761, 1013904223, 1_000_000_007
    users = sorted(events_pdf.user_id.unique())
    buckets = np.array(sorted(((u * A + B) % P) % 1024 for u in users))
    n = len(buckets)
    rn = np.arange(1, n + 1)
    up = np.abs(rn / n - (buckets + 1) / 1024)
    lo = np.abs((rn - 1) / n - buckets / 1024)
    ks = max(up.max(), lo.max())
    row = registry.QUERIES["q_stats_ks_uniformity"](
        spark, SF_DIR
    ).collect()[0]
    assert row.n_users == n
    assert row.ks_d == pytest.approx(ks, abs=2e-6)
    assert row.reject_uniform == int(ks * np.sqrt(n) > 1.358)


def test_info_gain_matches_bruteforce(spark, events_pdf):
    g = events_pdf.groupby("user_id").event_type
    purch = g.apply(lambda s: (s == "purchase").sum())
    cv = g.apply(lambda s: s.isin(["click", "view"]).sum())
    y = (2 * purch > cv).astype(int)
    feat = pd.Series([u % 3 for u in y.index], index=y.index)

    def h(p):
        if p in (0, 1):
            return 0.0
        return -(p * np.log(p) + (1 - p) * np.log(1 - p))

    hy = h(y.mean())
    h_cond = sum(
        (len(y[feat == f]) / len(y)) * h(y[feat == f].mean())
        for f in (0, 1, 2)
    )
    rows = registry.QUERIES["q_stats_info_gain"](spark, SF_DIR).collect()
    for r in rows:
        sub = y[feat == r.feat]
        assert (r.n, r.k) == (len(sub), sub.sum())
        assert r.h_y == pytest.approx(hy, abs=2e-6)
        assert r.info_gain == pytest.approx(hy - h_cond, abs=2e-6)
    # conditioning cannot increase entropy
    assert rows[0].info_gain >= -1e-9
