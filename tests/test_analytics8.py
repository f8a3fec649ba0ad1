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
