"""Plain-Python recompute tests for the round-11 wave
(operators/analytics10.py) — independent re-derivations from the raw
parquet, per the rule that a logic bug mirrored into the oracle
hash-matches cleanly and only a third path catches it."""

import pandas as pd


def test_markov_first_passage_matches_fraction_solve(spark, sf_dir):
    """Re-derive the mean first-passage times with exact Fractions:
    build the transition counts in pandas, solve the 4x4 linear
    system by Gaussian elimination over Q, compare at round(6)."""
    from fractions import Fraction

    from vectordb_agentic_rag_spark.operators.analytics10 import (
        _FP_STATES,
        _FP_TARGET,
        agg_markov_first_passage,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])
    c: dict[tuple, int] = {}
    for _, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    states = _FP_STATES
    n = {
        s: sum(c.get((s, j), 0) for j in states + [_FP_TARGET])
        for s in states
    }
    # n_i * m_i - sum_k c_ik * m_k = n_i
    k = len(states)
    A = [
        [
            Fraction(
                (n[si] - c.get((si, sj), 0))
                if si == sj
                else -c.get((si, sj), 0)
            )
            for sj in states
        ]
        for si in states
    ]
    b = [Fraction(n[si]) for si in states]
    # Gaussian elimination over exact rationals
    for col in range(k):
        piv = next(r for r in range(col, k) if A[r][col] != 0)
        A[col], A[piv] = A[piv], A[col]
        b[col], b[piv] = b[piv], b[col]
        for r in range(k):
            if r != col and A[r][col] != 0:
                f = A[r][col] / A[col][col]
                A[r] = [x - f * y for x, y in zip(A[r], A[col])]
                b[r] = b[r] - f * b[col]
    m = {states[i]: b[i] / A[i][i] for i in range(k)}

    got = {
        r.from_state: (r.n_from, r.mean_steps_to_purchase)
        for r in agg_markov_first_passage(spark, sf_dir).collect()
    }
    assert set(got) == set(states)
    for s in states:
        assert got[s][0] == n[s]
        assert got[s][1] == round(float(m[s]), 6), s
        # a first-passage time is at least one step
        assert got[s][1] >= 1.0


def test_woe_information_value_matches_python_recompute(spark, sf_dir):
    """Re-derive the WOE/IV table in plain Python: user scores and
    outcomes from the raw parquet, strict-less CDF deciles, Decimal
    IV accumulation."""
    import math
    from decimal import Decimal

    import numpy as np

    from vectordb_agentic_rag_spark.operators.analytics10 import (
        agg_woe_information_value,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = pd.to_datetime(ev["ts"]).dt.date
    pre = day < pd.Timestamp("2024-01-16").date()
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    score = (
        pd.Series(np.where(pre, cents, 0), index=ev.index)
        .groupby(ev["user_id"])
        .sum()
    )
    good_mask = (
        (ev["event_type"] == "purchase")
        & (~pre)
        & (ev["value"] * 100 >= 10000)
    )
    good = good_mask.groupby(ev["user_id"]).max().astype(int)
    n = len(score)
    less = {
        v: int((score < v).sum()) for v in score.unique()
    }
    decile = score.map(lambda v: min(9, 10 * less[v] // n))
    cells = {}
    for d in range(10):
        m = decile == d
        if m.any():
            g = int(good[m].sum())
            cells[d] = (int(m.sum()), g, int(m.sum()) - g)
    gt = sum(c[1] for c in cells.values())
    bt = sum(c[2] for c in cells.values())
    terms = {}
    for d, (nu, ng, nb) in cells.items():
        if ng and nb:
            terms[d] = Decimal(
                f"{round((ng / gt - nb / bt) * math.log((ng * bt) / (nb * gt)), 9):.9f}"
            )
    iv_total = round(float(sum(terms.values())), 6)

    got = {
        r.decile: r
        for r in agg_woe_information_value(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for d, (nu, ng, nb) in cells.items():
        r = got[d]
        assert (r.n_users, r.n_good, r.n_bad) == (nu, ng, nb), d
        if ng and nb:
            assert r.woe == round(math.log((ng * bt) / (nb * gt)), 6), d
            assert r.iv_term == round(float(terms[d]), 6), d
        else:
            assert r.woe is None and r.iv_term is None, d
        assert r.iv_total == iv_total
    assert iv_total >= 0  # IV is a sum of (p-q)*ln(p/q) >= 0 terms
