"""Invariant tests for the round-8 fourth-session operators
(analytics8): independent numpy/pandas recomputes."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd

from vectordb_agentic_rag_spark import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def _cents(v):
    return np.floor(np.asarray(v) * 100 + 0.5).astype(np.int64)


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["vc"] = _cents(ev.value)
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    return ev


def _low_median(a):
    s = sorted(a)
    return s[(len(s) + 1) // 2 - 1]


def test_median_polish_matches_python_sweeps(spark):
    pdf = (
        QUERIES["agg_median_polish_grid"](spark, SF)
        .toPandas()
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    ev = _events()
    cell = ev.groupby(["day", "event_type"]).vc.sum().unstack()
    assert cell.notna().all().all()  # complete 30 x 5 grid
    z = cell.to_numpy().astype(np.int64)
    days, types = list(cell.index), list(cell.columns)
    re = np.zeros(len(days), dtype=np.int64)
    ce = np.zeros(len(types), dtype=np.int64)
    t = 0
    for _ in range(3):
        rd = np.array([_low_median(row) for row in z])
        z -= rd[:, None]
        re += rd
        mc = _low_median(ce)
        t += mc
        ce -= mc
        cd = np.array([_low_median(col) for col in z.T])
        z -= cd[None, :]
        ce += cd
        mr = _low_median(re)
        t += mr
        re -= mr
    assert len(pdf) == len(days) * len(types)
    got = pdf.set_index(["day", "event_type"])
    for i, d in enumerate(days):
        for j, ty in enumerate(types):
            row = got.loc[(d, ty)]
            assert row.total_cents == cell.iloc[i, j]
            assert row.overall_cents == t
            assert row.row_effect_cents == re[i]
            assert row.col_effect_cents == ce[j]
            assert row.residual_cents == z[i, j]
    # additive decomposition is an exact-integer invariant
    assert (
        pdf.total_cents
        == pdf.overall_cents
        + pdf.row_effect_cents
        + pdf.col_effect_cents
        + pdf.residual_cents
    ).all()


def _daily_means():
    ev = _events()
    g = ev.groupby("day").vc.agg(["sum", "count"]).sort_index()
    return np.array(
        [round(s / c / 100.0, 6) for s, c in zip(g["sum"], g["count"])]
    )


def test_ljung_box_matches_manual_acf(spark):
    pdf = QUERIES["agg_ljung_box_test"](spark, SF).toPandas()
    ev = _events()
    for typ, grp in ev.groupby("event_type"):
        g = grp.groupby("day").vc.agg(["sum", "count"]).sort_index()
        m = np.array(
            [round(s / c / 100.0, 6) for s, c in zip(g["sum"], g["count"])]
        )
        n = len(m)
        dx = m - m.mean()
        den = (dx * dx).sum()
        qsum = 0.0
        for k in range(1, 8):
            rho = (dx[k:] * dx[:-k]).sum() / den
            qsum += rho * rho / (n - k)
            row = pdf[(pdf.event_type == typ) & (pdf.lag == k)].iloc[0]
            assert row.n_days == n
            assert abs(row.acf - rho) < 1e-5
            assert abs(row.q_stat - n * (n + 2) * qsum) < 1e-3
        # acf at every lag is a genuine correlation
        assert pdf[pdf.event_type == typ].acf.abs().max() <= 1.0 + 1e-9


def test_variance_ratio_matches_manual(spark):
    pdf = (
        QUERIES["agg_variance_ratio_test"](spark, SF)
        .toPandas()
        .set_index("q")
    )
    m = _daily_means()
    d = np.diff(m)
    nd = len(d)
    mu = d.mean()
    var1 = ((d - mu) ** 2).sum() / (nd - 1)
    for q in range(2, 6):
        w = m[q:] - m[:-q]
        nw = len(w)
        vr = (((w - q * mu) ** 2).sum() / (q * nw)) / var1
        z = (vr - 1) / math.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * nd))
        row = pdf.loc[q]
        assert row.n_windows == nw and row.n_diffs == nd
        assert abs(row.vr - vr) < 1e-5
        assert abs(row.z_stat - z) < 1e-4


def _pava(y):
    # pool-adjacent-violators with unit weights
    vals, wts = [], []
    for v in y:
        vals.append(float(v))
        wts.append(1.0)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            tot = wts[-2] + wts[-1]
            avg = (vals[-2] * wts[-2] + vals[-1] * wts[-1]) / tot
            vals[-2:] = [avg]
            wts[-2:] = [tot]
    out = []
    for v, w in zip(vals, wts):
        out.extend([v] * int(w))
    return np.array(out)


def test_isotonic_matches_pava(spark):
    pdf = (
        QUERIES["win_isotonic_regression_day"](spark, SF)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    m = _daily_means()
    fit = _pava(m)
    assert len(pdf) == len(m)
    assert np.abs(pdf.observed.to_numpy() - m).max() < 1e-9
    assert np.abs(pdf.iso_fit.to_numpy() - fit).max() < 1e-5
    # monotone nondecreasing, and residuals are observed - fit
    assert (np.diff(pdf.iso_fit.to_numpy()) >= -1e-9).all()
    assert (
        np.abs(pdf.residual - (pdf.observed - pdf.iso_fit)).max() < 2e-6
    )


def _copurchase_edges_py():
    import itertools

    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    pairs = collections.Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp.l_partkey))
        for u, v in itertools.combinations(parts, 2):
            pairs[(u, v)] += 1
    return {e for e, c in pairs.items() if c >= 2}


def test_katz_matches_python_power_iteration(spark):
    pdf = QUERIES["graph_katz_centrality"](spark, SF).toPandas()
    edges = _copurchase_edges_py()
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    x = {n: 1.0 for n in adj}
    for _ in range(6):
        x = {
            n: round(1.0 + 0.015625 * sum(x[m] for m in adj[n]), 9)
            for n in adj
        }
    top = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(pdf) == 20
    for row, (n, score) in zip(pdf.itertuples(), top):
        assert row.p_partkey == n
        assert abs(row.katz_score - score) < 1e-6
        assert row.degree == len(adj[n])


def test_scan_statistic_matches_bruteforce(spark):
    pdf = QUERIES["agg_scan_statistic_daily"](spark, SF).toPandas()
    ev = _events()
    daily = ev.groupby("day").size().sort_index()
    c = daily.to_numpy()
    days = list(daily.index)
    N, D = int(c.sum()), len(c)
    pre = np.concatenate([[0], np.cumsum(c)])
    cands = []
    for s in range(1, D + 1):
        for t in range(s, min(s + 7, D + 1)):
            cw = int(pre[t] - pre[s - 1])
            w = t - s + 1
            e = N * w / D
            if cw * D > N * w and 0 < cw < N:
                llr = cw * math.log(cw / e) + (N - cw) * math.log(
                    (N - cw) / (N - e)
                )
                cands.append((round(llr, 9), s, t, cw, e))
    cands.sort(key=lambda r: (-r[0], r[1], r[2]))
    assert len(pdf) == min(5, len(cands))
    for row, (llr, s, t, cw, e) in zip(pdf.itertuples(), cands[:5]):
        assert row.start_day == days[s - 1]
        assert row.end_day == days[t - 1]
        assert row.width_days == t - s + 1
        assert row.observed == cw
        assert abs(row.expected - e) < 1e-4
        assert abs(row.llr - llr) < 1e-4
        assert row.llr > 0


def test_conformal_intervals_exact_and_calibrated(spark):
    pdf = (
        QUERIES["win_conformal_interval_daily"](spark, SF)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    ev = _events()
    daily = ev.groupby("day").vc.sum().sort_index()
    y = daily.to_numpy()
    days = list(daily.index)
    scores = np.abs(y[7:] - y[:-7])  # index i -> day i+7
    n_total = len(y)
    cal = sorted(scores[: n_total - 7 - 8])
    k = math.ceil((len(cal) + 1) * 0.8)
    q = cal[k - 1]
    assert len(pdf) == 8
    assert (pdf.n_calibration == len(cal)).all()
    for i, row in pdf.iterrows():
        t = days.index(row.day)
        assert row.actual == y[t]
        assert row.forecast == y[t - 7]
        assert row.lower_cents == y[t - 7] - q
        assert row.upper_cents == y[t - 7] + q
        want = int(row.lower_cents <= row.actual <= row.upper_cents)
        assert row.covered == want


def test_process_capability_matches_numpy(spark):
    pdf = (
        QUERIES["agg_process_capability"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    for typ, grp in ev.groupby("event_type"):
        c = grp.vc.to_numpy()
        n = len(c)
        mu = c.mean() / 100.0
        sd = c.std(ddof=1) / 100.0
        row = pdf.loc[typ]
        assert row.n == n
        assert abs(row.mean_value - mu) < 1e-5
        assert abs(row.sigma - sd) < 1e-5
        assert abs(row.cp - 300.0 / (6 * sd)) < 1e-4
        assert abs(row.cpk - min(300.0 - mu, mu) / (3 * sd)) < 1e-4
        oos = int(((c < 0) | (c > 30000)).sum())
        assert row.n_out_of_spec == oos
        assert abs(row.oos_rate - oos / n) < 1e-6
        # off-center process: cpk strictly below cp
        assert row.cpk < row.cp


def test_periodogram_matches_numpy_fft(spark):
    pdf = (
        QUERIES["win_periodogram_daily"](spark, SF)
        .toPandas()
        .sort_values("freq_index")
        .reset_index(drop=True)
    )
    m = _daily_means()
    n = len(m)
    x = m - m.mean()
    t = np.arange(1, n + 1)
    total = 0.0
    powers = []
    for k in range(1, 15):
        a = (x * np.cos(2 * np.pi * k * t / n)).sum()
        b = (x * np.sin(2 * np.pi * k * t / n)).sum()
        powers.append(2 * (a * a + b * b) / n)
    for row, (k, p) in zip(pdf.itertuples(), enumerate(powers, 1)):
        assert row.freq_index == k
        assert abs(row.period_days - n / k) < 1e-6
        assert abs(row.power - p) < 1e-3
        assert abs(row.power_share - p / sum(powers)) < 1e-4
    assert abs(pdf.power_share.sum() - 1.0) < 1e-4


def test_beta_binomial_shrinkage_matches_manual(spark):
    pdf = QUERIES["agg_beta_binomial_shrinkage"](spark, SF).toPandas()
    ev = _events()
    g = ev.groupby("user_id")
    n = g.size()
    x = g.apply(
        lambda d: int((d.event_type == "purchase").sum()),
        include_groups=False,
    )
    p = (x / n).round(9)
    mu = p.mean()
    v = p.var(ddof=1)
    M = mu * (1 - mu) / v - 1
    shrunk = ((x + mu * M) / (n + M)).sort_values(ascending=False)
    assert len(pdf) == 10
    assert (pdf.prior_strength - round(M, 6)).abs().max() < 1e-4
    for row in pdf.itertuples():
        assert abs(row.shrunk_rate - shrunk[row.user_id]) < 1e-5
        assert row.n_purchases == x[row.user_id]
        # shrinkage pulls every rate toward the prior mean
        raw = x[row.user_id] / n[row.user_id]
        assert (
            min(raw, mu) - 1e-9
            <= row.shrunk_rate
            <= max(raw, mu) + 1e-9
        )
    # top-10 by shrunk rate is the true top-10
    assert set(pdf.user_id) == set(shrunk.index[:10])


def test_holt_winters_matches_python_fold(spark):
    pdf = (
        QUERIES["win_holt_winters_seasonal"](spark, SF)
        .toPandas()
        .sort_values("horizon")
        .reset_index(drop=True)
    )
    m = _daily_means()
    n = len(m)
    l = m[:7].sum() / 7
    b = (m[7:14].sum() / 7 - m[:7].sum() / 7) / 7
    s = {k: m[k - 1] - l for k in range(1, 8)}
    for t in range(8, n + 1):
        d = (t - 1) % 7 + 1
        x = m[t - 1]
        newl = 0.5 * (x - s[d]) + 0.5 * (l + b)
        newb = 0.25 * (newl - l) + 0.75 * b
        s[d] = 0.5 * (x - newl) + 0.5 * s[d]
        l, b = newl, newb
    assert len(pdf) == 7
    for row in pdf.itertuples():
        h = row.horizon
        slot = (n + h - 1) % 7 + 1
        assert abs(row.level - l) < 1e-5
        assert abs(row.trend - b) < 1e-5
        assert abs(row.seasonal - s[slot]) < 1e-5
        assert abs(row.forecast - (l + h * b + s[slot])) < 1e-5
    # seven distinct target days, consecutive after the last fixture day
    ev = _events()
    last = max(ev.day)
    assert list(pd.to_datetime(pdf.target_day).dt.date) == [
        last + pd.Timedelta(days=h).to_pytimedelta() for h in range(1, 8)
    ]


def test_matrix_profile_matches_bruteforce(spark):
    pdf = (
        QUERIES["win_matrix_profile_1d"](spark, SF)
        .toPandas()
        .sort_values("start_day")
        .reset_index(drop=True)
    )
    m = _daily_means()
    n = len(m)
    w = 5
    days = sorted(_events().day.unique())
    wins = [m[i : i + w] for i in range(n - w + 1)]

    def zdist(a, b):
        ca, cb = a - a.mean(), b - b.mean()
        denom = math.sqrt((ca * ca).sum() * (cb * cb).sum())
        corr = (ca * cb).sum() / denom
        return math.sqrt(max(0.0, 2 * w * (1 - corr)))

    assert len(pdf) == n - w + 1
    for i in range(len(wins)):
        cands = [
            (round(zdist(wins[i], wins[j]), 9), j)
            for j in range(len(wins))
            if abs(i - j) >= 3
        ]
        dist, j = min(cands)
        row = pdf.iloc[i]
        assert row.start_day == days[i]
        assert row.nn_start_day == days[j]
        assert abs(row.nn_dist - dist) < 1e-5


def test_sax_matches_manual_paa(spark):
    pdf = (
        QUERIES["win_sax_symbolize"](spark, SF)
        .toPandas()
        .sort_values("block")
        .reset_index(drop=True)
    )
    m = _daily_means()
    z = (m - m.mean()) / m.std(ddof=1)
    z = np.round(z, 9)
    assert len(pdf) == math.ceil(len(m) / 5)
    days = sorted(_events().day.unique())
    for b in range(len(pdf)):
        blk = z[b * 5 : (b + 1) * 5]
        paa = round(blk.sum() / len(blk), 9)
        row = pdf.iloc[b]
        assert row.block == b + 1
        assert row.start_day == days[b * 5]
        assert row.n_days == len(blk)
        assert abs(row.paa - paa) < 1e-5
        want = (
            "a" if paa < -0.6745
            else "b" if paa < 0 else "c" if paa < 0.6745 else "d"
        )
        assert row.symbol == want


def test_lognormal_fit_matches_numpy(spark):
    pdf = (
        QUERIES["agg_lognormal_fit"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    for typ, grp in ev[ev.value > 0].groupby("event_type"):
        lv = np.round(np.log(grp.value.to_numpy()), 9)
        n = len(lv)
        mu = lv.mean()
        sd = lv.std(ddof=1)
        row = pdf.loc[typ]
        assert row.n == n
        assert abs(row.mu_ln - mu) < 1e-5
        assert abs(row.sigma_ln - sd) < 1e-5
        assert abs(row.fitted_median - math.exp(mu)) < 1e-3
        fm = math.exp(mu + sd * sd / 2)
        assert abs(row.fitted_mean - fm) < 1e-3
        sm = grp.vc.to_numpy().mean() / 100.0
        assert abs(row.sample_mean - sm) < 1e-5
        assert abs(row.mean_ratio - fm / sm) < 1e-4
        # exponential fixture: lognormal overstates the mean
        assert row.mean_ratio > 1.0


def test_closeness_seeds_match_python_bfs(spark):
    pdf = (
        QUERIES["graph_closeness_seeds"](spark, SF)
        .toPandas()
        .set_index("p_partkey")
    )
    edges = _copurchase_edges_py()
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    N = len(adj)
    seeds = sorted(adj, key=lambda n: (-len(adj[n]), n))[:3]
    assert set(pdf.index) == set(seeds)
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        row = pdf.loc[s]
        reached = len(dist) - 1
        sumd = sum(dist.values())
        harm = sum(round(1.0 / x, 9) for x in dist.values() if x > 0)
        assert row.degree == len(adj[s])
        assert row.n_reached == reached
        assert row.sum_dist == sumd
        assert abs(row.closeness - reached / sumd) < 1e-6
        assert (
            abs(row.wf_closeness - (reached / (N - 1)) * (reached / sumd))
            < 1e-6
        )
        assert abs(row.harmonic - harm) < 1e-4


def _daily_means_by_type(typ):
    ev = _events()
    g = (
        ev[ev.event_type == typ]
        .groupby("day")
        .vc.agg(["sum", "count"])
        .sort_index()
    )
    return pd.Series(
        [round(s / c / 100.0, 6) for s, c in zip(g["sum"], g["count"])],
        index=g.index,
    )


def test_hodges_lehmann_matches_numpy(spark):
    row = (
        QUERIES["agg_hodges_lehmann_shift"](spark, SF).toPandas().iloc[0]
    )
    x = _daily_means_by_type("click")
    y = _daily_means_by_type("view")
    diffs = np.sort(
        (x.to_numpy()[:, None] - y.to_numpy()[None, :]).ravel()
    )
    assert row.n_pairs == len(diffs)
    hl = (diffs[(len(diffs) - 1) // 2] + diffs[len(diffs) // 2]) / 2
    assert abs(row.hl_shift - hl) < 1e-6
    common = x.index.intersection(y.index)
    pd_diffs = np.sort((x[common] - y[common]).to_numpy())
    assert row.n_days == len(pd_diffs)
    pmed = (
        pd_diffs[(len(pd_diffs) - 1) // 2] + pd_diffs[len(pd_diffs) // 2]
    ) / 2
    assert abs(row.paired_median_shift - pmed) < 1e-6
    assert abs(row.mean_shift - (x.mean() - y.mean())) < 1e-5


def test_sign_test_exact_binomial(spark):
    row = QUERIES["agg_sign_test_paired"](spark, SF).toPandas().iloc[0]
    ev = _events()
    tots = (
        ev[ev.event_type.isin(["click", "view"])]
        .groupby(["day", "event_type"])
        .vc.sum()
        .unstack()
    )
    informative = tots[tots.click != tots.view]
    n = len(informative)
    s = int((informative.click > informative.view).sum())
    assert row.n_informative == n
    assert row.n_click_greater == s
    p = sum(math.comb(n, k) for k in range(s, n + 1)) / 2**n
    assert abs(row.p_one_sided - p) < 1e-6
    assert row.significant_05 == int(p < 0.05)


def test_anderson_darling_matches_midrank_formula(spark):
    row = (
        QUERIES["agg_anderson_darling_2samp"](spark, SF)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    x = ev.vc[ev.event_type == "click"].to_numpy()
    y = ev.vc[ev.event_type == "view"].to_numpy()
    n1, n2 = len(x), len(y)
    N = n1 + n2
    zstar = np.unique(np.concatenate([x, y]))
    a2 = 0.0
    for sample, ni in ((x, n1), (y, n2)):
        inner = 0.0
        for v in zstar:
            fij = (sample == v).sum()
            lj = (x == v).sum() + (y == v).sum()
            Mij = (sample < v).sum() + 0.5 * fij
            Bj = (x < v).sum() + (y < v).sum() + 0.5 * lj
            denom = Bj * (N - Bj) - N * lj / 4.0
            if denom > 0:
                inner += lj * (N * Mij - ni * Bj) ** 2 / denom
        a2 += inner / ni
    a2 *= (N - 1) / N**2
    assert row.n_click == n1 and row.n_view == n2
    assert row.n_blocks <= len(zstar)
    assert abs(row.a2_stat - a2) < 1e-3
    # standardization: Scholz-Stephens closed form, k=2
    H = 1 / n1 + 1 / n2
    h = sum(1 / i for i in range(1, N))
    hi = np.cumsum([1 / i for i in range(1, N)])
    g = sum((h - hi[i - 1]) / (N - i) for i in range(1, N - 1))
    k = 2
    a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * H
    b = (2 * g - 4) * k**2 + 8 * h * k + (2 * g - 14 * h - 4) * H - 8 * h + 4 * g - 6
    c = (6 * h + 2 * g - 2) * k**2 + (4 * h - 4 * g + 6) * k + (2 * h - 6) * H + 4 * h
    d = (2 * h + 6) * k**2 - 4 * h * k
    var = (a * N**3 + b * N**2 + c * N + d) / ((N - 1) * (N - 2) * (N - 3))
    t = (a2 - (k - 1)) / math.sqrt(var)
    assert abs(row.t_stat - t) < 1e-3
    assert row.significant_05 == int(round(t, 9) >= 1.960)


def test_roc_youden_matches_bruteforce(spark):
    row = QUERIES["agg_roc_youden"](spark, SF).toPandas().iloc[0]
    ev = _events()
    x = ev.vc[ev.event_type == "click"].to_numpy()  # positives
    y = ev.vc[ev.event_type == "view"].to_numpy()
    n1, n2 = len(x), len(y)
    assert (row.n_click, row.n_view) == (n1, n2)
    # exact AUC via the tie-corrected Mann-Whitney identity
    auc = sum(
        (y < c).sum() + 0.5 * (y == c).sum() for c in x
    ) / (n1 * n2)
    assert abs(row.auc - auc) < 1e-6
    # Youden over every distinct threshold (classify click if >= t)
    best = max(
        (
            ((x >= t).sum() * n2 - (y >= t).sum() * n1, -t)
            for t in np.unique(np.concatenate([x, y]))
        ),
    )
    jnum, negt = best
    t = -negt
    assert abs(row.best_threshold - t / 100.0) < 1e-9
    assert abs(row.youden_j - jnum / (n1 * n2)) < 1e-6
    assert abs(row.tpr - (x >= t).sum() / n1) < 1e-6
    assert abs(row.fpr - (y >= t).sum() / n2) < 1e-6
    assert row.youden_j >= 0


def test_discount_elasticity_matches_numpy(spark):
    pdf = (
        QUERIES["agg_discount_elasticity"](spark, SF)
        .toPandas()
        .sort_values("discount_pct")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    d = np.floor(li.l_discount * 100 + 0.5).astype(np.int64)
    q = np.floor(li.l_quantity + 0.5).astype(np.int64)
    slope, intercept = np.polyfit(d, q, 1)
    assert len(pdf) == len(np.unique(d))
    assert (pdf.qty_per_discount_pct - round(slope, 6)).abs().max() < 1e-4
    assert (pdf.intercept_qty - intercept).abs().max() < 1e-4
    for row in pdf.itertuples():
        sel = q[d == row.discount_pct]
        assert row.n_lines == len(sel)
        assert abs(row.mean_quantity - sel.mean()) < 1e-6
    assert (
        abs(pdf.elasticity_at_zero.iloc[0] - slope * 100 / intercept)
        < 1e-3
    )


def test_copurchase_components_match_python_cc(spark):
    pdf = QUERIES["graph_copurchase_components"](spark, SF).toPandas()
    edges = _copurchase_edges_py()
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seen = set()
    sizes = []
    for start in adj:
        if start in seen:
            continue
        comp = {start}
        frontier = [start]
        while frontier:
            n = frontier.pop()
            for m2 in adj[n]:
                if m2 not in comp:
                    comp.add(m2)
                    frontier.append(m2)
        seen |= comp
        sizes.append(len(comp))
    want = collections.Counter(sizes)
    got = dict(zip(pdf.component_size, pdf.n_components))
    assert got == dict(want)
    assert (pdf.total_components == len(sizes)).all()
    assert (pdf.largest_size == max(sizes)).all()
    assert (pdf.total_nodes == sum(sizes)).all()
    assert (
        pdf.n_nodes == pdf.component_size * pdf.n_components
    ).all()


def test_dtw_band_matches_bruteforce_dp(spark):
    row = QUERIES["agg_dtw_band_distance"](spark, SF).toPandas().iloc[0]
    x = _daily_means_by_type("click").to_numpy()
    y = _daily_means_by_type("view").to_numpy()
    n = len(x)
    assert row.n_days == n
    INF = float("inf")
    D = {(0, 0): 0.0}
    for i in range(1, n + 1):
        for j in range(max(1, i - 2), min(n, i + 2) + 1):
            prev = min(
                D.get((i - 1, j), INF),
                D.get((i - 1, j - 1), INF),
                D.get((i, j - 1), INF),
            )
            if i == 1 and j == 1:
                prev = 0.0
            D[(i, j)] = abs(x[i - 1] - y[j - 1]) + prev
    dtw = D[(n, n)]
    l1 = np.abs(x - y).sum()
    assert abs(row.dtw_distance - dtw) < 1e-5
    assert abs(row.diagonal_l1 - l1) < 1e-4
    assert row.dtw_distance <= row.diagonal_l1 + 1e-9
    assert abs(row.warp_gain - (l1 - dtw) / l1) < 1e-4


def test_partial_correlation_matches_numpy(spark):
    row = QUERIES["agg_partial_correlation"](spark, SF).toPandas().iloc[0]
    x = _daily_means_by_type("click")
    y = _daily_means_by_type("purchase")
    z = _daily_means_by_type("view")
    common = x.index.intersection(y.index).intersection(z.index)
    xv, yv, zv = (
        s[common].to_numpy() for s in (x, y, z)
    )
    assert row.n_days == len(common)
    rxy = np.corrcoef(xv, yv)[0, 1]
    rxz = np.corrcoef(xv, zv)[0, 1]
    ryz = np.corrcoef(yv, zv)[0, 1]
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert abs(row.r_click_purchase - rxy) < 1e-5
    assert abs(row.r_click_view - rxz) < 1e-5
    assert abs(row.r_purchase_view - ryz) < 1e-5
    assert abs(row.partial_r_given_view - part) < 1e-4


def test_granger_matches_numpy_lstsq(spark):
    row = (
        QUERIES["agg_granger_causality_1lag"](spark, SF)
        .toPandas()
        .iloc[0]
    )
    c = _daily_means_by_type("click").to_numpy()
    v = _daily_means_by_type("view").to_numpy()
    yv = c[1:]
    x1 = c[:-1]
    z1 = v[:-1]
    n = len(yv)
    assert row.n_obs == n

    def rss(X):
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        r = yv - X @ beta
        return (r * r).sum()

    ones = np.ones_like(x1)
    rss_r = rss(np.column_stack([ones, x1]))
    rss_f = rss(np.column_stack([ones, x1, z1]))
    f = (rss_r - rss_f) / (rss_f / (n - 3))
    assert abs(row.rss_restricted - rss_r) < 1e-3
    assert abs(row.rss_full - rss_f) < 1e-3
    assert abs(row.f_stat - f) < 1e-3
    assert row.view_causes_click_05 == int(f > 4.225)


def test_lmoments_match_direct_order_statistics(spark):
    pdf = (
        QUERIES["agg_lmoments_suite"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    for typ, grp in ev.groupby("event_type"):
        x = np.sort(grp.vc.to_numpy())
        n = len(x)
        # direct probability-weighted moments over sorted positions
        b = []
        for r in range(4):
            w = np.array([math.comb(i - 1, r) for i in range(1, n + 1)])
            b.append((w * x).sum() / (n * math.comb(n - 1, r)))
        b0, b1, b2, b3 = b
        l1 = b0
        l2 = 2 * b1 - b0
        l3 = 6 * b2 - 6 * b1 + b0
        l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
        row = pdf.loc[typ]
        assert row.n == n
        assert abs(row.l1_mean - l1 / 100) < 1e-4
        assert abs(row.l2_scale - l2 / 100) < 1e-4
        assert abs(row.l_cv - l2 / b0) < 1e-5
        assert abs(row.l_skewness - l3 / l2) < 1e-5
        assert abs(row.l_kurtosis - l4 / l2) < 1e-5
        # boundedness of the L-ratios
        assert -1 <= row.l_skewness <= 1
        assert -0.25 <= row.l_kurtosis <= 1


def test_adf_matches_numpy_regression(spark):
    row = QUERIES["agg_adf_unit_root"](spark, SF).toPandas().iloc[0]
    m = _daily_means()
    dy = np.diff(m)
    yv = dy[1:]
    x1 = m[1:-1]
    z1 = dy[:-1]
    n = len(yv)
    assert row.n_obs == n
    X = np.column_stack([np.ones_like(x1), x1, z1])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    resid = yv - X @ beta
    rss = (resid * resid).sum()
    s2 = rss / (n - 3)
    xtx_inv = np.linalg.inv(X.T @ X)
    se_rho = math.sqrt(s2 * xtx_inv[1, 1])
    tau = beta[1] / se_rho
    assert abs(row.rho - beta[1]) < 1e-4
    assert abs(row.lag_diff_coef - beta[2]) < 1e-4
    assert abs(row.tau_stat - tau) < 1e-3
    assert row.unit_root_rejected_05 == int(round(tau, 9) < -2.98)


def test_records_test_matches_manual(spark):
    row = QUERIES["agg_records_test"](spark, SF).toPandas().iloc[0]
    m = _daily_means()
    n = len(m)
    up = sum(
        1 for i in range(n) if i == 0 or m[i] > m[:i].max()
    )
    dn = sum(
        1 for i in range(n) if i == 0 or m[i] < m[:i].min()
    )
    h1 = sum(1 / i for i in range(1, n + 1))
    h2 = sum(1 / i**2 for i in range(1, n + 1))
    assert row.n_days == n
    assert row.upper_records == up
    assert row.lower_records == dn
    assert abs(row.expected_records - h1) < 1e-5
    assert abs(row.z_upper - (up - h1) / math.sqrt(h1 - h2)) < 1e-4
    assert abs(row.z_lower - (dn - h1) / math.sqrt(h1 - h2)) < 1e-4


def test_cointegration_matches_numpy(spark):
    row = QUERIES["agg_cointegration_test"](spark, SF).toPandas().iloc[0]
    y = _daily_means_by_type("click").to_numpy()
    x = _daily_means_by_type("view").to_numpy()
    n = len(y)
    assert row.n_days == n
    beta, alpha = np.polyfit(x, y, 1)
    assert abs(row.hedge_beta - beta) < 1e-4
    assert abs(row.intercept - alpha) < 1e-3
    e = np.round(y - alpha - beta * x, 9)
    ep, ec = e[:-1], e[1:]
    rho = (ep * (ec - ep)).sum() / (ep * ep).sum()
    resid = (ec - ep) - rho * ep
    se2 = (resid * resid).sum() / (len(ep) - 1) / (ep * ep).sum()
    tau = rho / math.sqrt(se2)
    assert abs(row.residual_rho - rho) < 1e-4
    assert abs(row.tau_stat - tau) < 1e-3
    assert row.cointegrated_05 == int(round(tau, 9) < -3.37)


def test_arch_lm_matches_numpy(spark):
    row = QUERIES["agg_arch_lm_test"](spark, SF).toPandas().iloc[0]
    m = _daily_means()
    s = np.round((m - m.mean()) ** 2, 6)
    yv, xv = s[1:], s[:-1]
    n = len(yv)
    assert row.n_obs == n
    r = np.corrcoef(xv, yv)[0, 1]
    r2 = r * r
    assert abs(row.arch_r2 - r2) < 1e-5
    assert abs(row.lm_stat - n * r2) < 1e-3
    assert row.volatility_clustering_05 == int(round(n * r2, 9) > 3.841)


def test_spectral_entropy_matches_numpy(spark):
    row = QUERIES["agg_spectral_entropy"](spark, SF).toPandas().iloc[0]
    m = _daily_means()
    n = len(m)
    x = m - m.mean()
    t = np.arange(1, n + 1)
    powers = []
    for k in range(1, 15):
        a = (x * np.cos(2 * np.pi * k * t / n)).sum()
        b = (x * np.sin(2 * np.pi * k * t / n)).sum()
        powers.append(2 * (a * a + b * b) / n)
    p = np.array(powers)
    q = p / p.sum()
    ent = -(q * np.log(q)).sum() / math.log(len(p))
    flat = math.exp(np.log(p).mean()) / p.mean()
    assert row.n_freqs == 14
    assert row.dominant_freq == int(np.argmax(np.round(p, 9))) + 1
    assert abs(row.spectral_entropy - ent) < 1e-4
    assert abs(row.spectral_flatness - flat) < 1e-4
    assert 0 <= row.spectral_entropy <= 1 + 1e-9
    assert 0 <= row.spectral_flatness <= 1 + 1e-9


def test_stratified_ate_matches_manual(spark):
    pdf = (
        QUERIES["agg_stratified_ate"](spark, SF)
        .toPandas()
        .sort_values("stratum")
        .reset_index(drop=True)
    )
    ev = _events()
    g = ev.groupby("user_id")
    n_ev = g.size()
    clicks = g.apply(
        lambda d: int((d.event_type == "click").sum()), include_groups=False
    )
    conv = g.apply(
        lambda d: int((d.event_type == "purchase").sum() >= 12),
        include_groups=False,
    )
    n = len(n_ev)
    # exact value-domain quintiles: stratum = least(4, 5*cum_less//n)
    order = np.sort(n_ev.unique())
    cum_less = {}
    acc = 0
    for v in order:
        cum_less[v] = acc
        acc += int((n_ev == v).sum())
    strat = n_ev.map(lambda v: min(4, 5 * cum_less[v] // n))
    treated = (clicks >= 15).astype(int)
    rows = {}
    used, ate_n = [], 0
    for s in sorted(strat.unique()):
        sel = strat == s
        t = treated[sel]
        c = conv[sel]
        if t.sum() == 0 or (1 - t).sum() == 0:
            continue
        p1 = c[t == 1].mean()
        p0 = c[t == 0].mean()
        rows[s] = (int(sel.sum()), int(t.sum()), p1, p0)
        used.append((s, sel.sum(), p1 - p0))
        ate_n += int(sel.sum())
    ate = sum(w * e for _, w, e in used) / ate_n
    assert list(pdf.stratum) == sorted(rows)
    for row in pdf.itertuples():
        n_s, n_t, p1, p0 = rows[row.stratum]
        assert (row.n_users, row.n_treated) == (n_s, n_t)
        assert abs(row.p_treated - p1) < 1e-6
        assert abs(row.p_control - p0) < 1e-6
        assert abs(row.stratum_effect - (p1 - p0)) < 1e-6
        assert abs(row.stratified_ate - ate) < 1e-4


def test_sprt_matches_manual_walk(spark):
    row = QUERIES["agg_sprt_ab_replay"](spark, SF).toPandas().iloc[0]
    ev = _events().sort_values(["ts", "event_id"])
    d0 = min(ev.day)
    d1 = ev[ev.day == d0]
    assert row.n_day1_events == len(d1)
    up = round(math.log(0.21 / 0.19), 12)
    dn = round(math.log(0.79 / 0.81), 12)
    s = 0.0
    stop_t, stop_s = None, None
    for t, is_p in enumerate(d1.event_type == "purchase", 1):
        s += up if is_p else dn
        if s >= 2.944439 or s <= -2.944439:
            stop_t, stop_s = t, s
            break
    if stop_t is None:
        stop_t, stop_s = len(d1), s
    assert row.n_steps_used == stop_t
    assert abs(row.llr_at_stop - stop_s) < 1e-5
    want = (
        "accept_h1"
        if stop_s >= 2.944439
        else "accept_h0" if stop_s <= -2.944439 else "inconclusive"
    )
    assert row.decision == want


def test_cohens_d_matches_numpy(spark):
    row = QUERIES["agg_cohens_d_family"](spark, SF).toPandas().iloc[0]
    ev = _events()
    x = ev.vc[ev.event_type == "click"].to_numpy() / 1.0
    y = ev.vc[ev.event_type == "view"].to_numpy() / 1.0
    n1, n2 = len(x), len(y)
    sp = math.sqrt(
        ((x.var(ddof=1) * (n1 - 1)) + (y.var(ddof=1) * (n2 - 1)))
        / (n1 + n2 - 2)
    )
    d = (x.mean() - y.mean()) / sp
    g = d * (1 - 3 / (4 * (n1 + n2) - 9))
    gl = (x.mean() - y.mean()) / y.std(ddof=1)
    assert (row.n_click, row.n_view) == (n1, n2)
    assert abs(row.mean_diff - (x.mean() - y.mean()) / 100) < 1e-5
    assert abs(row.cohens_d - d) < 1e-5
    assert abs(row.hedges_g - g) < 1e-5
    assert abs(row.glass_delta - gl) < 1e-5


def test_association_rules_match_bruteforce(spark):
    pdf = QUERIES["agg_association_rules"](spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    import itertools

    N = li.l_orderkey.nunique()
    singles = li.groupby("l_partkey").size()
    pairs = collections.Counter()
    for _, grp in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(grp.l_partkey)), 2):
            pairs[(u, v)] += 1
    cands = [
        (
            round(ns * N / (singles[u] * singles[v]), 9),
            u,
            v,
            ns,
        )
        for (u, v), ns in pairs.items()
        if ns >= 2
    ]
    cands.sort(key=lambda r: (-r[0], r[1], r[2]))
    assert len(pdf) == min(10, len(cands))
    for row, (lift, u, v, ns) in zip(pdf.itertuples(), cands[:10]):
        assert (row.part_a, row.part_b) == (u, v)
        assert row.n_baskets_both == ns
        assert abs(row.lift - lift) < 1e-5
        assert abs(row.support - ns / N) < 1e-6
        assert abs(row.conf_a_to_b - ns / singles[u]) < 1e-6
        assert abs(row.conf_b_to_a - ns / singles[v]) < 1e-6


def test_logrank_matches_manual(spark):
    row = QUERIES["agg_logrank_test"](spark, SF).toPandas().iloc[0]
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    conv = set(
        ev[ev.event_type == "purchase"]
        .groupby("user_id")
        .size()
        .loc[lambda s: s >= 12]
        .index
    )
    # sessionize: 30-min gaps
    sessions = []
    for uid, grp in ev.groupby("user_id"):
        ts = pd.to_datetime(grp.ts).astype("datetime64[us]").astype("int64")
        start = ts.iloc[0]
        prev = ts.iloc[0]
        for t in ts.iloc[1:]:
            if t - prev > 1_800_000_000:
                sessions.append((uid, start, prev))
                start = t
            prev = t
        sessions.append((uid, start, prev))
    ends = [e for _, _, e in sessions]
    horizon = max(ends) - 7_200_000_000
    lab = [
        (
            (e - s) // 60_000_000,
            1 if e > horizon else 0,
            1 if u in conv else 0,
        )
        for u, s, e in sessions
    ]
    s1 = sum(1 for *_ , g in lab if g == 1)
    s0 = len(lab) - s1
    assert (row.n_sessions_conv, row.n_sessions_non) == (s1, s0)
    times = sorted({d for d, c, g in lab})
    ome, var, ntimes = 0.0, 0.0, 0
    for t in times:
        d1 = sum(1 for d, c, g in lab if d == t and c == 0 and g == 1)
        d0 = sum(1 for d, c, g in lab if d == t and c == 0 and g == 0)
        n1 = sum(1 for d, c, g in lab if d >= t and g == 1)
        n0 = sum(1 for d, c, g in lab if d >= t and g == 0)
        dd, nn = d1 + d0, n1 + n0
        if dd > 0 and nn > 1:
            ntimes += 1
            ome += d1 - dd * n1 / nn
            var += dd * n1 * n0 * (nn - dd) / (nn**2 * (nn - 1))
    chi2 = ome * ome / var
    assert row.n_death_times == ntimes
    assert abs(row.o_minus_e - ome) < 1e-3
    assert abs(row.logrank_chi2 - chi2) < 1e-3
    assert row.survival_differs_05 == int(round(chi2, 9) > 3.841)


def test_referential_integrity_audit_matches_pandas(spark):
    pdf = QUERIES["maintenance_referential_integrity"](spark, SF).toPandas()
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
        ("embeddings", "vec_id", "documents", "doc_id"),
    ]
    assert len(pdf) == len(edges)
    got = pdf.set_index(["child_table", "fk_column"])
    for child, fk, parent, pk in edges:
        c = pd.read_parquet(f"{SF}/{child}.parquet")
        p = pd.read_parquet(f"{SF}/{parent}.parquet")
        orphan_mask = ~c[fk].isin(set(p[pk]))
        row = got.loc[(child, fk)]
        assert row.parent_table == parent
        assert row.n_child_rows == len(c)
        assert row.n_distinct_keys == c[fk].nunique()
        assert row.n_orphan_rows == int(orphan_mask.sum())
        assert row.n_orphan_keys == c[fk][orphan_mask].nunique()
        assert row.ri_ok == int(orphan_mask.sum() == 0)
    # the fixture generator is referentially clean — every edge holds
    assert (pdf.ri_ok == 1).all()


def test_wasserstein_matches_bruteforce(spark):
    row = (
        QUERIES["agg_wasserstein_distance"](spark, SF).toPandas().iloc[0]
    )
    ev = _events()
    x = np.sort(ev.vc[ev.event_type == "click"].to_numpy())
    y = np.sort(ev.vc[ev.event_type == "view"].to_numpy())
    assert (row.n_click, row.n_view) == (len(x), len(y))
    # integrate |F1 - F2| over the merged value grid
    grid = np.unique(np.concatenate([x, y]))
    w1 = 0.0
    for v, vn in zip(grid[:-1], grid[1:]):
        f1 = (x <= v).sum() / len(x)
        f2 = (y <= v).sum() / len(y)
        w1 += abs(f1 - f2) * (vn - v)
    assert abs(row.wasserstein_1 - w1 / 100.0) < 1e-6
    assert row.wasserstein_1 >= 0


def test_energy_distance_matches_bruteforce(spark):
    row = QUERIES["agg_energy_distance"](spark, SF).toPandas().iloc[0]
    ev = _events()
    x = ev.vc[ev.event_type == "click"].to_numpy().astype(float)
    y = ev.vc[ev.event_type == "view"].to_numpy().astype(float)
    exy = np.abs(x[:, None] - y[None, :]).mean()
    exx = np.abs(x[:, None] - x[None, :]).mean()
    eyy = np.abs(y[:, None] - y[None, :]).mean()
    d = 2 * exy - exx - eyy
    assert abs(row.e_between - exy / 100) < 1e-6
    assert abs(row.e_within_click - exx / 100) < 1e-6
    assert abs(row.e_within_view - eyy / 100) < 1e-6
    assert abs(row.energy_distance - d / 100) < 1e-5
    assert abs(row.e_coefficient - d / (2 * exy)) < 1e-5
    assert 0 <= row.e_coefficient <= 1


def test_permutation_entropy_matches_manual(spark):
    pdf = QUERIES["win_permutation_entropy"](spark, SF).toPandas()
    m = _daily_means()
    pats = collections.Counter()
    for i in range(len(m) - 2):
        tri = [(m[i + k], k) for k in range(3)]
        order = sorted(range(3), key=lambda k: tri[k])
        rank = [0] * 3
        for r, k in enumerate(order, 1):
            rank[k] = r
        pats[rank[0] * 100 + rank[1] * 10 + rank[2]] += 1
    n = sum(pats.values())
    h = -sum((c / n) * math.log(c / n) for c in pats.values())
    assert dict(zip(pdf.pattern, pdf.n_triples)) == dict(pats)
    assert (pdf.perm_entropy - round(h / math.log(6), 6)).abs().max() < 1e-4
    for rowp in pdf.itertuples():
        assert abs(rowp.freq - pats[rowp.pattern] / n) < 1e-6


def test_seasonal_mann_kendall_matches_manual(spark):
    row = (
        QUERIES["agg_seasonal_mann_kendall"](spark, SF).toPandas().iloc[0]
    )
    m = _daily_means()
    n = len(m)
    dows = [(t - 1) % 7 for t in range(1, n + 1)]
    S, npairs = 0, 0
    for d in range(7):
        vals = [m[i] for i in range(n) if dows[i] == d]
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                npairs += 1
                S += int(vals[j] > vals[i]) - int(vals[j] < vals[i])
    v0 = 0
    vtie = 0
    for d in range(7):
        vals = [m[i] for i in range(n) if dows[i] == d]
        nd = len(vals)
        v0 += nd * (nd - 1) * (2 * nd + 5)
        for _, c in collections.Counter(vals).items():
            if c > 1:
                vtie += c * (c - 1) * (2 * c + 5)
    var = (v0 - vtie) / 18
    z = (S - (1 if S > 0 else -1 if S < 0 else 0)) / math.sqrt(var)
    assert row.s_stat == S
    assert row.n_pairs == npairs
    assert abs(row.var_s - var) < 1e-6
    assert abs(row.z_stat - z) < 1e-4
    assert row.trend_05 == int(abs(round(z, 9)) > 1.959964)
