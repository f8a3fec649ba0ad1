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
