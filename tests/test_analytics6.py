"""Invariant tests for the round-8 second-session operators
(analytics6): independent numpy/pandas recomputes plus structural
identities."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vectordb_agentic_rag_spark import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def _cents(v):
    return np.floor(np.asarray(v) * 100 + 0.5).astype(np.int64)


def test_anova_matches_numpy(spark):
    row = QUERIES["agg_anova_oneway"](spark, SF).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["vc"] = _cents(ev.value)
    groups = [g.vc.to_numpy() for _, g in ev.groupby("event_type")]
    nn = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(g.sum() for g in groups) / nn
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups) / 1e4
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups) / 1e4
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert row.k_groups == k and row.n_events == nn
    assert abs(row.ss_between - ssb) < 1e-2
    assert abs(row.ss_within - ssw) < 1e-2
    assert abs(row.f_stat - f) < 1e-4


def test_cramers_v_matches_pandas_crosstab(spark):
    row = QUERIES["agg_cramers_v"](spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    ct = pd.crosstab(d.lang, d.source)
    obs = ct.to_numpy().astype(float)
    e = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    v = np.sqrt(chi2 / (obs.sum() * (min(obs.shape) - 1)))
    assert row.n_docs == len(d)
    assert abs(row.chi2_stat - chi2) < 1e-3
    assert abs(row.cramers_v - v) < 1e-5
    assert 0.0 <= row.cramers_v <= 1.0


def test_friedman_matches_pandas_ranks(spark):
    pdf = QUERIES["agg_friedman_test"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["vc"] = _cents(ev.value)
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    cell = ev.groupby(["day", "event_type"]).vc.sum().reset_index()
    k = ev.event_type.nunique()
    full = cell.groupby("day").size()
    cell = cell[cell.day.isin(full[full == k].index)]
    # row_number over (tot, event_type) == ordinal rank on the sorted pair
    cell = cell.sort_values(["day", "vc", "event_type"])
    cell["rk"] = cell.groupby("day").cumcount() + 1
    rs = cell.groupby("event_type").rk.sum()
    n = cell.day.nunique()
    q = 12.0 * (rs**2).sum() / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    got = dict(zip(pdf.event_type, pdf.rank_sum))
    assert got == rs.to_dict()
    # rank sums of a permutation per block must total n*k*(k+1)/2
    assert pdf.rank_sum.sum() == n * k * (k + 1) // 2
    assert abs(pdf.q_stat.iloc[0] - q) < 1e-6
    assert (pdf.n_blocks == n).all()


def test_entropy_rate_bounds_and_recompute(spark):
    pdf = QUERIES["agg_entropy_rate_markov"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    prev = ev.groupby("user_id").event_type.shift()
    pairs = pd.DataFrame({"pt": prev, "nt": ev.event_type}).dropna()
    c = pairs.groupby(["pt", "nt"]).size()
    ni = c.groupby("pt").sum()
    nn = c.sum()
    k = ev.event_type.nunique()
    h = {}
    for pt in ni.index:
        p = (c[pt] / ni[pt]).to_numpy()
        h[pt] = float(-(p * np.log2(p)).sum())
    rate = sum(ni[pt] / nn * h[pt] for pt in ni.index)
    for r in pdf.itertuples():
        assert 0.0 <= r.h_cond_bits <= np.log2(k) + 1e-9
        assert abs(r.h_cond_bits - h[r.prev_type]) < 1e-5
        assert r.n_from == ni[r.prev_type]
    assert abs(pdf.entropy_rate_bits.iloc[0] - rate) < 1e-5
    # occupancy sums to 1
    assert abs(pdf.pi_occupancy.sum() - 1.0) < 1e-5


def test_blocklist_filter_audit_consistency(spark):
    pdf = QUERIES["pipeline_blocklist_filter"](spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    blocked = {"src0", "src7", "src14"}
    assert (pdf.n_kept + pdf.n_dropped == pdf.n_docs).all()
    for r in pdf.itertuples():
        sub = d[d.lang == r.lang]
        keep = sub[~sub.source.isin(blocked)]
        assert r.n_docs == len(sub)
        assert r.n_kept == len(keep)
        assert r.chars_kept == keep.n_chars.sum()


def test_topk_margin_matches_bruteforce(spark):
    pdf = QUERIES["vec_topk_margin_stats"](spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    corpus = vecs[ids >= 10]
    cids = ids[ids >= 10]
    assert len(pdf) == 10
    for r in pdf.itertuples():
        q = vecs[ids == r.query_id][0]
        sims = corpus @ q / (
            np.linalg.norm(corpus, axis=1) * np.linalg.norm(q)
        )
        order = np.lexsort((cids, -np.round(sims, 6)))
        top = np.round(sims[order[:10]], 6)
        assert abs(r.top1 - top[0]) < 1e-5
        assert abs(r.top2 - top[1]) < 1e-5
        assert abs(r.margin - (r.top1 - r.top2)) < 1e-9
        assert r.margin >= 0.0
        assert r.mean_topk <= r.top1 + 1e-9
        assert abs(r.mean_topk - top.mean()) < 1e-5


def test_modularity_identities_and_recompute(spark):
    pdf = QUERIES["graph_modularity_partition"](spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    part = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    mm = li.merge(li, on="l_orderkey")
    mm = mm[mm.l_partkey_x < mm.l_partkey_y]
    sup = mm.groupby(["l_partkey_x", "l_partkey_y"]).size()
    edges = sup[sup >= 2].index.to_frame(index=False)
    brand = dict(zip(part.p_partkey, part.p_brand))
    m = len(edges)
    d: dict[str, int] = {}
    ew: dict[str, int] = {}
    for u, v in edges.itertuples(index=False):
        bu, bv = brand[u], brand[v]
        d[bu] = d.get(bu, 0) + 1
        d[bv] = d.get(bv, 0) + 1
        if bu == bv:
            ew[bu] = ew.get(bu, 0) + 1
    q = sum(
        ew.get(b, 0) / m - (d[b] / (2 * m)) ** 2 for b in d
    )
    # handshake identity: community degree sums cover every endpoint
    assert pdf.degree_sum.sum() == 2 * m
    assert pdf.edges_within.sum() == sum(ew.values())
    got = dict(zip(pdf.brand, pdf.term))
    for b in d:
        want = ew.get(b, 0) / m - (d[b] / (2 * m)) ** 2
        assert abs(got[b] - want) < 1e-6
    assert abs(pdf.modularity.iloc[0] - q) < 1e-5
    assert -0.5 <= pdf.modularity.iloc[0] <= 1.0


def test_entropy_rate_consistent_with_transition_matrix(spark):
    # H_i must be recomputable from agg_markov_transition's published
    # (round-6) matrix — pins the two ops to the same pair definition
    h = QUERIES["agg_entropy_rate_markov"](spark, SF).toPandas()
    tm = QUERIES["agg_markov_transition"](spark, SF).toPandas()
    for r in h.itertuples():
        rows = tm[tm.prev_type == r.prev_type]
        p = rows.n_trans.to_numpy() / rows.n_trans.sum()
        want = float(-(p * np.log2(p)).sum())
        assert abs(r.h_cond_bits - want) < 1e-4
        assert r.n_from == rows.n_trans.sum()
