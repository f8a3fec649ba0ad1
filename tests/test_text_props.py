"""Property-based tests (hypothesis) for the text pipeline
(SURVEY.md §5.6)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_agentic_rag_spark.operators.text import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    _STRIDE,
    chunk_documents,
)


@pytest.fixture(scope="module")
def mk_chunks(spark):
    def run(text: str):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return sorted(chunk_documents(df).collect(), key=lambda r: r.chunk_no)

    return run


@settings(max_examples=12, deadline=None)
@given(st.integers(min_value=1, max_value=3000))
def test_chunker_reconstruction(mk_chunks, n):
    """Concatenating chunks with the overlap removed reproduces the
    original text for any length (the §5.6 invariant)."""
    text = "".join(chr(ord("a") + (i % 26)) for i in range(n))
    rows = mk_chunks(text)
    rebuilt = rows[0].page_content + "".join(
        r.page_content[CHUNK_OVERLAP:] for r in rows[1:]
    )
    assert rebuilt == text
    # every chunk except possibly the last is full-size
    assert all(r.chunk_len == CHUNK_SIZE for r in rows[:-1])
    assert all(r.chunk_len > CHUNK_OVERLAP for r in rows) or n <= CHUNK_OVERLAP
    # overlap really is shared text
    for a, b in zip(rows, rows[1:]):
        assert a.page_content[-CHUNK_OVERLAP:] == b.page_content[:CHUNK_OVERLAP]


def test_chunker_exact_boundaries(mk_chunks):
    """Exact-multiple and off-by-one lengths around the stride."""
    for n, expect_chunks in [(1, 1), (200, 1), (1000, 1), (1001, 2),
                             (1800, 2), (1801, 3)]:
        text = "x" * n
        rows = mk_chunks(text)
        assert len(rows) == expect_chunks, f"len={n}"
        assert rows[0].chunk_no == 0
        assert [r.chunk_no for r in rows] == list(range(expect_chunks))


def test_dedup_exact_keeps_half(spark, sf_dir):
    """The union-with-self corpus dedups to exactly the distinct texts,
    every hash with n_copies == 2 (idempotence of exact dedup)."""
    from vectordb_agentic_rag_spark.operators.dedup import dedup_exact
    from vectordb_agentic_rag_spark.tables import table

    rows = dedup_exact(spark, sf_dir).collect()
    n_distinct = (
        table(spark, sf_dir, "documents").select("text").distinct().count()
    )
    assert len(rows) == n_distinct
    assert all(r.n_copies % 2 == 0 for r in rows)


def test_minhash_identical_docs_identical_sigs(spark):
    """Identical token sets must produce identical MinHash signatures;
    disjoint sets must not (sanity of the hash family)."""
    from vectordb_agentic_rag_spark.operators.dedup import _SPARK_CODES, _spark_sig
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "omega psi chi phi"),
        ],
        "doc_id long, text string",
    )
    sigs = df.select(
        "doc_id", F.expr(_SPARK_CODES).alias("codes")
    ).select("doc_id", *[F.expr(_spark_sig(i)).alias(f"s{i}") for i in range(8)])
    rows = {r.doc_id: tuple(r)[1:] for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_simhash_similar_docs_close(spark):
    """SimHash hamming distance: identical docs -> 0; a one-token edit
    stays within a few bits; unrelated docs are farther."""
    from vectordb_agentic_rag_spark.operators.dedup import _SPARK_CODES, _simhash_expr
    from pyspark.sql import functions as F

    base = "spark table scan merge window batch stream query join filter"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base.replace("filter", "filters")),
            (4, "zzz yyy xxx www vvv uuu ttt sss rrr qqq"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", F.expr(_SPARK_CODES).alias("codes")
    ).select("doc_id", F.expr(_simhash_expr("codes", True)).alias("h"))
    h = {r.doc_id: r.h for r in out.collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h[1], h[2]) == 0
    assert ham(h[1], h[3]) <= ham(h[1], h[4])


def test_rolling_fingerprint_order_sensitive(spark):
    """The rolling hash must distinguish permuted token orders (unlike
    the minhash set signature)."""
    from pyspark.sql import functions as F

    expr = (
        "aggregate(transform(split(text, ' '), "
        "t -> CAST(ascii(substring(t, 1, 1)) * 961 "
        "+ ascii(substring(t, length(t), 1)) * 31 + length(t) AS BIGINT)), "
        "CAST(0 AS BIGINT), (h, c) -> (h * 131 + c) % 1000000007)"
    )
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.h for r in df.select("doc_id", F.expr(expr).alias("h")).collect()}
    assert rows[1] != rows[2]


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing layout invariants: offsets stay inside the budget,
    sequence ids are monotone non-decreasing per language stream, and
    no token is lost (last cum == sum of tokens per lang)."""
    from vectordb_agentic_rag_spark.operators.text import (
        _PACK_BUDGET,
        pipeline_pack_sequences,
    )

    rows = pipeline_pack_sequences(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        assert 0 <= r.start_offset < _PACK_BUDGET
        assert r.seq_no >= 0
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        seqs = [r.seq_no for r in rs]
        assert seqs == sorted(seqs), f"seq_no not monotone for {lang}"
        # reconstruct the running total from (seq_no, start_offset) of
        # each doc and verify it equals the cumulative token count
        cum = 0
        for r in rs:
            assert r.seq_no * _PACK_BUDGET + r.start_offset == cum
            cum += r.n_tokens
        # crosses_boundary consistency
        for r in rs:
            end = r.seq_no * _PACK_BUDGET + r.start_offset + r.n_tokens - 1
            assert r.crosses_boundary == (end // _PACK_BUDGET > r.seq_no)


def test_bm25_ranks_term_bearing_docs_first(spark, sf_dir):
    """Every top-10 BM25 doc must actually contain at least one query
    term, and scores must be positive and non-increasing."""
    from pyspark.sql import functions as F

    from vectordb_agentic_rag_spark.operators.rag import _BM25_TERMS, rag_bm25_topk
    from vectordb_agentic_rag_spark.tables import table

    top = rag_bm25_topk(spark, sf_dir).collect()
    assert len(top) == 10
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    texts = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isin([r.doc_id for r in top]))
        .collect()
    }
    for r in top:
        toks = texts[r.doc_id].split(" ")
        assert any(t in toks for t in _BM25_TERMS)


def test_cdc_chunks_tile_documents_exactly(spark, sf_dir):
    """CDC chunk spans must partition each document: start at 1,
    consecutive, and chunk lengths sum to the text length."""
    from pyspark.sql import functions as F

    from vectordb_agentic_rag_spark.operators.text import text_cdc_chunking
    from vectordb_agentic_rag_spark.tables import table

    chunks = text_cdc_chunking(spark, sf_dir)
    lens = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    per_doc = {}
    for r in chunks.collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(lens)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.chunk_no)
        assert rs[0].chunk_start == 1
        assert sum(r.chunk_len for r in rs) == lens[doc_id]
        for a, b in zip(rs, rs[1:]):
            assert b.chunk_start == a.chunk_start + a.chunk_len


def test_cdc_boundaries_are_insertion_local():
    """The CDC property that justifies the operator: inserting one
    character early in a text leaves all boundaries beyond the edit's
    4-char hash window unchanged (modulo the +1 shift)."""

    def bounds(t: str) -> list[int]:
        out = []
        for i in range(4, len(t) + 1):
            h = (
                ord(t[i - 4]) * 29791 + ord(t[i - 3]) * 961
                + ord(t[i - 2]) * 31 + ord(t[i - 1])
            )
            if h % 64 == 0:
                out.append(i)
        return out

    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base[:10] + "X" + base[10:]
    b0, b1 = bounds(base), bounds(edited)
    tail0 = [b for b in b0 if b > 14]
    tail1 = [b - 1 for b in b1 if b > 15]
    assert tail0 == tail1, "boundaries after the edit window must be stable"


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from vectordb_agentic_rag_spark.operators.relational import agg_bitmap_distinct
    from vectordb_agentic_rag_spark.tables import table

    got = {r.event_type: r.n_users for r in agg_bitmap_distinct(spark, sf_dir).collect()}
    want = {
        r.event_type: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_heavy_hitters_candidates_superset_regardless_of_partitioning(spark, sf_dir):
    """Misra-Gries guarantee check: the reported top-10 must equal the
    exact top-10 from a plain full groupBy."""
    from pyspark.sql import functions as F

    from vectordb_agentic_rag_spark.operators.text import text_heavy_hitters
    from vectordb_agentic_rag_spark.tables import table

    got = [(r.tok, r.n) for r in text_heavy_hitters(spark, sf_dir).collect()]
    full = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(10)
        .collect()
    )
    assert got == [(r.tok, r.n) for r in full]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),               # user_id
            st.integers(0, 50),              # ts (seconds)
            st.sampled_from(["click", "purchase", "view"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_asof_nearest_matches_bruteforce(events):
    """The single-shuffle union-sort merge must agree with the obvious
    quadratic definition (nearest |Δt| purchase per click; ties to the
    future side; per-side event_id tie-breaks as declared) on random
    inputs — including ts collisions, which the fixture rarely has."""
    rows = [
        {"user_id": u, "ts_s": t, "event_type": k, "event_id": i}
        for i, (u, t, k) in enumerate(events)
    ]

    def brute(rows):
        out = {}
        for c in rows:
            if c["event_type"] != "click":
                continue
            best = None
            for p in rows:
                if p["event_type"] != "purchase" or p["user_id"] != c["user_id"]:
                    continue
                delta = abs(p["ts_s"] - c["ts_s"])
                fwd = 0 if p["ts_s"] >= c["ts_s"] else 1
                key = (delta, fwd, p["event_id"] if fwd == 0 else -p["event_id"])
                if best is None or key < best[0]:
                    best = (key, p["event_id"], delta)
            if best is not None:
                out[c["event_id"]] = (best[1], best[2])
        return out

    # replicate the operator's window logic in plain Python (same sort,
    # same running last/first picks) — validating the ALGORITHM without
    # a Spark session per hypothesis example
    def unionsort(rows):
        out = {}
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        for rs in by_user.values():
            rs.sort(key=lambda r: (r["ts_s"], r["event_type"] == "purchase", r["event_id"]))
            # backward pass: running last purchase
            b = [None] * len(rs)
            last = None
            for i, r in enumerate(rs):
                if r["event_type"] == "purchase":
                    last = r
                b[i] = last
            f = [None] * len(rs)
            nxt = None
            for i in range(len(rs) - 1, -1, -1):
                if rs[i]["event_type"] == "purchase":
                    nxt = rs[i]
                f[i] = nxt
            for i, r in enumerate(rs):
                if r["event_type"] != "click":
                    continue
                bb, ff = b[i], f[i]
                if bb is None and ff is None:
                    continue
                db = r["ts_s"] - bb["ts_s"] if bb else None
                df_ = ff["ts_s"] - r["ts_s"] if ff else None
                if ff is not None and (bb is None or df_ <= db):
                    out[r["event_id"]] = (ff["event_id"], df_)
                else:
                    out[r["event_id"]] = (bb["event_id"], db)
        return out

    assert unionsort(rows) == brute(rows)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 30), min_size=0, max_size=60),  # partitions of token ids
        min_size=1,
        max_size=6,
    ),
    st.integers(2, 8),  # small K to actually exercise the prune
)
def test_mg_fold_survival_guarantee(partitions, k):
    """Misra-Gries invariant behind text_heavy_hitters: after folding
    any partitioning of the stream with K counters, every token whose
    TRUE count exceeds N/K must survive in the candidate union."""
    import collections

    from vectordb_agentic_rag_spark.operators.text import mg_fold_batch

    candidates = set()
    for part in partitions:
        counters: dict = {}
        # feed each partition in arbitrary sub-batches of 7
        for i in range(0, len(part), 7):
            batch = collections.Counter(part[i : i + 7])
            mg_fold_batch(counters, batch.items(), k)
        candidates |= set(counters)
    # the guarantee is PER PARTITION: freq > N_part/K survives that
    # partition's summary, hence the union
    for part in partitions:
        n = len(part)
        true_counts = collections.Counter(part)
        for tok, c in true_counts.items():
            if c > n / k:
                assert tok in candidates, (
                    f"token {tok} with count {c} > {n}/{k} was lost"
                )


# --- recursive separator-aware chunker (text_chunk_recursive) ---

_para_text = st.lists(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=12),
        min_size=1,
        max_size=60,
    ).map(" ".join),
    min_size=1,
    max_size=12,
).map("\n\n".join)


@settings(max_examples=30, deadline=None)
@given(_para_text)
def test_recursive_chunker_bounds_and_coverage(text):
    """Reference-semantics invariants (app.py:181-186): every chunk is
    a contiguous substring of the original, no chunk exceeds
    CHUNK_SIZE, chunk positions advance monotonically, and the chunks
    jointly cover every non-whitespace character."""
    from vectordb_agentic_rag_spark.operators.text import (
        split_text_recursive,
    )

    chunks = split_text_recursive(text)
    if not text.strip():
        assert chunks == []
        return
    pos = 0
    covered_to = 0
    for ch in chunks:
        assert 0 < len(ch) <= CHUNK_SIZE
        start = text.find(ch, max(pos - CHUNK_OVERLAP - 2, 0))
        if start < 0:  # overlap windback can step further back
            start = text.find(ch)
        assert start >= 0, f"chunk not a substring: {ch[:40]!r}"
        # no uncovered non-whitespace gap between consecutive chunks
        assert not text[covered_to:start].strip(), (
            f"dropped content between {covered_to} and {start}"
        )
        covered_to = max(covered_to, start + len(ch))
        pos = start
    assert not text[covered_to:].strip()


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="ab \n", min_size=0, max_size=4000))
def test_recursive_chunker_never_oversized(text):
    """Even adversarial whitespace runs and separator-free stretches
    re-pack to <= CHUNK_SIZE (the "" fallback splits to characters)."""
    from vectordb_agentic_rag_spark.operators.text import (
        split_text_recursive,
    )

    for ch in split_text_recursive(text):
        assert len(ch) <= CHUNK_SIZE
        assert ch == ch.strip()


def test_jaccard_verify_ship_modes_agree(spark):
    """_verify_pairs_jaccard must produce identical pairs through the
    sidefile (worker-resident codes) and join (codes ride the
    candidate stream) ship modes — the join path is the documented
    beyond-memory fallback, so it must stay semantically locked."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        _verify_pairs_jaccard,
    )

    codes = spark.createDataFrame(
        [
            (1, [1, 2, 3]),
            (2, [2, 3, 4]),
            (3, [10, 11]),
            (4, [1, 2, 3, 4]),
        ],
        "doc_id bigint, cs array<bigint>",
    )
    cand = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "doc_a bigint, doc_b bigint",
    )
    out = {}
    for ship in ("sidefile", "join"):
        rows = _verify_pairs_jaccard(
            spark, codes, cand, threshold=0.3, tag="pytest", ship=ship
        ).collect()
        out[ship] = sorted((r.doc_a, r.doc_b, r.jac) for r in rows)
    assert out["sidefile"] == out["join"]
    # hand-checked values: (1,2) 2/4, (1,4) 3/4, (2,4) 3/4, (3,*) none
    assert out["sidefile"] == [
        (1, 2, 0.5),
        (1, 4, 0.75),
        (2, 4, 0.75),
    ]


def test_jaccard_verify_containment_metric(spark):
    """The containment denominator is |A| (asymmetric): a set fully
    inside a much larger one must score 1.0 even though its Jaccard
    is small."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        _verify_pairs_jaccard,
    )

    codes = spark.createDataFrame(
        [
            (1, [1, 2]),                       # fully inside doc 2
            (2, [1, 2, 3, 4, 5, 6, 7, 8]),
            (3, [9, 10]),                      # disjoint from doc 2
        ],
        "doc_id bigint, cs array<bigint>",
    )
    cand = spark.createDataFrame(
        [(1, 2), (3, 2)], "doc_a bigint, doc_b bigint"
    )
    rows = _verify_pairs_jaccard(
        spark, codes, cand, threshold=0.5, tag="pytest_cont",
        metric="containment",
    ).collect()
    got = {(r.doc_a, r.doc_b): r.jac for r in rows}
    # jaccard of (1,2) would be 2/8 = 0.25 — below threshold;
    # containment is 2/2 = 1.0 and must survive
    assert got == {(1, 2): 1.0}


def test_near_dup_purge_keeps_one_per_cluster(spark, sf_dir):
    """Every cluster keeps exactly its minimum doc_id, so per-language
    kept-counts equal the distinct cluster count."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        dedup_connected_components,
        pipeline_near_dup_purge,
    )
    from vectordb_agentic_rag_spark.tables import table

    labels = dedup_connected_components(spark, sf_dir).collect()
    clusters = {}
    for r in labels:
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    # the representative is the cluster minimum
    assert all(min(v) == k for k, v in clusters.items())
    purge = {r.lang: r for r in pipeline_near_dup_purge(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    lang_of = {r.doc_id: r.lang for r in docs}
    kept_by_lang = {}
    for k in clusters:
        kept_by_lang[lang_of[k]] = kept_by_lang.get(lang_of[k], 0) + 1
    assert {lg: r.n_kept for lg, r in purge.items()} == kept_by_lang
    assert sum(r.n_docs for r in purge.values()) == len(docs)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                 max_size=12).map(lambda xs: sorted(set(xs))),
        min_size=2,
        max_size=8,
    )
)
def test_verify_kernel_matches_python_sets(spark, code_sets):
    """The numpy keyed-intersect kernel must agree with plain Python
    set arithmetic on arbitrary small inputs, both metrics, both
    thresholds at 0 (emit everything) — catching any off-by-one in the
    pair-index packing or offsets handling."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        _verify_pairs_jaccard,
    )

    codes = spark.createDataFrame(
        [(i + 1, [int(x) for x in cs]) for i, cs in enumerate(code_sets)],
        "doc_id bigint, cs array<bigint>",
    )
    n = len(code_sets)
    cand = spark.createDataFrame(
        [(a + 1, b + 1) for a in range(n) for b in range(a + 1, n)],
        "doc_a bigint, doc_b bigint",
    )
    got = {
        (r.doc_a, r.doc_b): r.jac
        for r in _verify_pairs_jaccard(
            spark, codes, cand, threshold=0.0, tag="pytest_prop"
        ).collect()
    }
    for a in range(n):
        for b in range(a + 1, n):
            sa, sb = set(code_sets[a]), set(code_sets[b])
            expect = round(len(sa & sb) / len(sa | sb), 6)
            assert got[(a + 1, b + 1)] == expect, (a + 1, b + 1)


def test_prefix_filter_candidates_perfect_recall(spark):
    """Prefix-filter recall guarantee (the theorem behind
    _prefix_filter_candidates): EVERY pair whose Jaccard (or
    containment) clears the threshold within its block must appear in
    the candidate output — missed candidates silently drop qualifying
    duplicate pairs, the one failure mode the verify stage cannot
    catch. Adversarial synthetic corpus: planted near-identical pairs,
    shared boilerplate shingles (frequent codes), tiny and large sets,
    one-language blocks."""
    import random

    from vectordb_agentic_rag_spark.operators.dedup import (
        _prefix_filter_candidates,
    )

    rng = random.Random(42)
    docs = []  # (doc_id, lang, len_bucket, cs)
    common = list(range(100, 110))  # boilerplate shingles, high df
    for i in range(60):
        base = rng.sample(range(1000, 9999), rng.randint(3, 40))
        cs = sorted(set(base) | set(rng.sample(common, 3)))
        docs.append((i, "en" if i % 2 else "de", i % 3, cs))
        if i % 7 == 0:  # planted near-dup: same block, one element off
            dup = sorted(set(cs) | {9999 + i})
            docs.append((1000 + i, "en" if i % 2 else "de", i % 3, dup))
    sh = spark.createDataFrame(
        docs, "doc_id bigint, lang string, len_bucket int, cs array<bigint>"
    )
    by_id = {d: (lg, lb, set(cs)) for d, lg, lb, cs in docs}
    ids = sorted(by_id)

    for threshold, containment in [(0.2, False), (0.5, False), (0.9, True)]:
        if containment:
            meta = spark.createDataFrame(
                [(d, len(by_id[d][2])) for d in ids], "doc_id bigint, n_chars int"
            )
            cand = _prefix_filter_candidates(sh, threshold, meta=meta)
        else:
            cand = _prefix_filter_candidates(sh, threshold)
        got = {(r.doc_a, r.doc_b) for r in cand.collect()}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                (lga, lba, sa), (lgb, lbb, sb) = by_id[a], by_id[b]
                if lga != lgb:
                    continue
                inter = len(sa & sb)
                if containment:
                    # direction: shorter (n_chars=|set|) into longer
                    x, y, sx = (
                        (a, b, sa)
                        if (len(sa), a) < (len(sb), b)
                        else (b, a, sb)
                    )
                    if inter / len(sx) >= threshold:
                        assert (x, y) in got, (x, y, threshold)
                else:
                    if lba != lbb:
                        continue
                    if inter / len(sa | sb) >= threshold:
                        assert (a, b) in got, (a, b, threshold)


def test_lsh_candidates_full_recall_and_real_pruning_at_prod_tau(spark):
    """_lsh_candidate_pairs in the regime embedding dedup actually
    runs at (tau = 0.9): on clustered vectors every qualifying pair
    must be emitted (recall — exact verify downstream cannot restore a
    missed pair) AND the candidate count must be well below all-pairs
    (otherwise the stage is performative). Deterministic clustered
    corpus: 40 cluster centers on the 32-dim sphere, 8 jittered copies
    each — intra-cluster cosines >= ~0.9, cross-cluster ~0."""
    import numpy as np

    from vectordb_agentic_rag_spark.operators.dedup import (
        _lsh_candidate_pairs,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(40, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, 8, axis=0) + 0.03 * rng.normal(size=(320, 32))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id bigint, embedding array<double>",
    )
    tau = 0.9
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in _lsh_candidate_pairs(emb, tau).collect()
    }
    C = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    qualifying = {
        (int(a), int(b))
        for a, b in zip(*iu)
        if C[a, b] >= tau
    }
    assert qualifying, "test corpus must contain qualifying pairs"
    missed = qualifying - got
    assert not missed, f"LSH candidates missed {len(missed)} qualifying pairs"
    all_pairs = len(X) * (len(X) - 1) // 2
    assert len(got) < 0.25 * all_pairs, (
        f"no real pruning: {len(got)} candidates of {all_pairs} pairs"
    )


def test_interval_overlap_bucketing_matches_bruteforce(spark):
    """The bucket-replication + greatest-bucket-ownership trick must
    count EXACTLY the overlapping pairs a brute-force check finds —
    including boundary cases (gap exactly the window width is NOT an
    overlap of half-open intervals; gap W-1 is) and same-bucket /
    adjacent-bucket pairs."""
    import itertools

    from pyspark.sql import functions as F

    W = 1000
    # adversarial starts: same bucket, adjacent buckets, exact-boundary
    # gaps, bucket-straddling, duplicates of the same start
    starts = [0, 1, 999, 1000, 1001, 1999, 2000, 2500, 2999, 3000,
              3001, 4000, 5999, 6000, 6001, 500, 1500, 2501]
    rows = [("a", i, s) for i, s in enumerate(starts)]
    ev = spark.createDataFrame(rows, "event_type string, event_id long, s long")
    tagged = ev.select(
        "event_type", "event_id", "s",
        F.expr(f"s div {W}").alias("bucket"),
    ).select(
        "*", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("tag")
    )
    a = tagged.select(
        F.col("event_type").alias("et"), F.col("event_id").alias("id_a"),
        F.col("s").alias("s_a"), F.col("bucket").alias("bucket_a"), "tag",
    )
    b = tagged.select(
        F.col("event_type").alias("et_b"), F.col("event_id").alias("id_b"),
        F.col("s").alias("s_b"), F.col("bucket").alias("bucket_b"),
        F.col("tag").alias("tag_b"),
    )
    got = (
        a.join(b, (F.col("et") == F.col("et_b")) & (F.col("tag") == F.col("tag_b")))
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("s_a") - F.col("s_b")) < W)
            & (F.col("tag") == F.greatest("bucket_a", "bucket_b"))
        )
        .select("id_a", "id_b")
        .collect()
    )
    got_pairs = {(r.id_a, r.id_b) for r in got}
    expect = {
        (i, j)
        for (i, si), (j, sj) in itertools.combinations(enumerate(starts), 2)
        if abs(si - sj) < W
    }
    assert got_pairs == expect, (got_pairs ^ expect)


def test_sessionize_invariants(spark, sf_dir):
    """Session semantics: sessions tile each user's event stream in
    time order, intra-session gaps are <= 30 min, and consecutive
    sessions are separated by > 30 min."""
    from vectordb_agentic_rag_spark import QUERIES, load_all_operators

    load_all_operators()
    rows = QUERIES["agg_sessionize_batch"](spark, sf_dir).collect()
    ev = (
        QUERIES["win_lag_lead_delta"](spark, sf_dir)
        .select("user_id", "ts", "gap_us")
        .collect()
    )
    GAP = 1800 * 1_000_000
    # expected session count per user = 1 + #gaps exceeding threshold
    from collections import defaultdict

    n_breaks = defaultdict(int)
    n_events = defaultdict(int)
    for r in ev:
        n_events[r.user_id] += 1
        if r.gap_us is not None and r.gap_us > GAP:
            n_breaks[r.user_id] += 1
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert set(by_user) == set(n_events)
    for uid, sess in by_user.items():
        assert len(sess) == n_breaks[uid] + 1, uid
        assert sorted(r.sess_no for r in sess) == list(range(1, len(sess) + 1))
        assert sum(r.n_events for r in sess) == n_events[uid]
        assert all(r.duration_us >= 0 for r in sess)


def test_prefix_length_ceil_is_exact_at_multiples(spark):
    """ceil(t*m) must be computed in exact decimal arithmetic: with
    binary-float t, 0.2*45 evaluates to 9.000000000000002 and ceil
    returns 10, silently shortening the prefix by one element and
    voiding the recall theorem at boundary set sizes. Check every m up
    to 200 against Fraction-exact ceil for all thresholds the dedup
    ops use."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    df = spark.range(1, 201).withColumnRenamed("id", "m")
    for t in (0.2, 0.5, 0.9):
        thr = F.lit(t).cast("decimal(9,6)")
        got = {
            r.m: r.p
            for r in df.select(
                "m",
                (F.col("m") - F.ceil(thr * F.col("m")) + 1).alias("p"),
            ).collect()
        }
        frac = Fraction(str(t))
        for m in range(1, 201):
            expect = m - math.ceil(frac * m) + 1
            assert got[m] == expect, (t, m, got[m], expect)


def test_weighted_prefix_candidates_perfect_recall_and_pruning(spark):
    """Weighted prefix-filter recall theorem (the tail-weight bound in
    _weighted_prefix_candidates): every pair whose idf-WEIGHTED
    Jaccard clears the threshold within its block must be emitted, and
    the candidate count must sit well below blocked all-pairs.
    Clustered synthetic corpus: planted near-dup pairs sharing rare
    content shingles, heavy boilerplate shingles present in ~every doc
    (idf ~ 0 — exactly the mass the weighting must ignore and the
    prefix ordering must push OUT of the prefix)."""
    import math
    import random

    from vectordb_agentic_rag_spark.operators.dedup import (
        _WPF_DEN,
        _WPF_NUM,
        _weighted_prefix_candidates,
    )

    rng = random.Random(7)
    docs = []
    boiler = list(range(100, 115))  # boilerplate: in nearly every doc
    for i in range(80):
        rare = rng.sample(range(1000, 99999), rng.randint(4, 30))
        cs = sorted(set(rare) | set(rng.sample(boiler, 12)))
        docs.append((i, "en" if i % 2 else "de", i % 2, cs))
        if i % 6 == 0:  # planted near-dup: same rare content, one off
            dup = sorted((set(rare) | {999999 + i})
                         | set(rng.sample(boiler, 12)))
            docs.append((1000 + i, "en" if i % 2 else "de", i % 2, dup))
    sh = spark.createDataFrame(
        docs, "doc_id bigint, lang string, len_bucket int, cs array<bigint>"
    )
    cand = _weighted_prefix_candidates(sh, _WPF_NUM, _WPF_DEN)
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}

    # python twin of the exact weighting: round(ln(N/df), 9) scaled to
    # integer nano-units so the threshold compare is exact like the op's
    by_id = {d: (lg, lb, set(cs)) for d, lg, lb, cs in docs}
    n_docs = len(docs)
    df = {}
    for _, _, _, cs in docs:
        for s in set(cs):
            df[s] = df.get(s, 0) + 1
    wt = {s: round(math.log(n_docs / d) * 1e9) for s, d in df.items()}
    ids = sorted(by_id)
    qualifying = set()
    blocked_pairs = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            (lga, lba, sa), (lgb, lbb, sb) = by_id[a], by_id[b]
            if lga != lgb or lba != lbb:
                continue
            blocked_pairs += 1
            wi = sum(wt[s] for s in sa & sb)
            wu = sum(wt[s] for s in sa | sb)
            if wu > 0 and wi * _WPF_DEN >= wu * _WPF_NUM:
                qualifying.add((a, b))
    assert qualifying, "corpus must contain qualifying weighted pairs"
    missed = qualifying - got
    assert not missed, f"weighted prefix filter missed {sorted(missed)}"
    assert len(got) < 0.25 * blocked_pairs, (
        f"no real pruning: {len(got)} candidates of {blocked_pairs}"
    )


def test_influence_dedup_order_matches_python_greedy(spark, sf_dir):
    """pipeline_influence_dedup_order's keeper pick, greedy purge
    order, running totals, and budget cut must match a plain-Python
    re-derivation from the same cluster labels and quality scores."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        _IDO_BUDGET,
        dedup_connected_components,
        pipeline_influence_dedup_order,
    )
    from vectordb_agentic_rag_spark.operators.text import text_quality_score
    from vectordb_agentic_rag_spark.tables import table

    labels = {
        r.doc_id: r.cluster_id
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    qual = {
        r.doc_id: r.quality
        for r in text_quality_score(spark, sf_dir).collect()
    }
    ntok = {
        r.doc_id: len(r.text.split(" "))
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    clusters: dict = {}
    for d, c in labels.items():
        clusters.setdefault(c, []).append(d)
    cands = []
    for members in clusters.values():
        if len(members) < 2:
            continue
        members.sort(key=lambda d: (-qual[d], d))  # keeper first
        cands.extend(members[1:])
    cands.sort(key=lambda d: (qual[d], d))  # greedy: worst first
    cum, exp = 0, {}
    for d in cands:
        exp[d] = (labels[d], ntok[d], cum, 1 if cum < _IDO_BUDGET else 0)
        cum += ntok[d]
    rows = pipeline_influence_dedup_order(spark, sf_dir).collect()
    got = {
        r.doc_id: (r.cluster_id, r.n_tokens, r.cum_before, r.purged)
        for r in rows
    }
    assert got == exp
    purged = sum(v[3] for v in exp.values())
    assert 0 < purged, "budget purges nothing — raise _IDO_BUDGET"
    assert purged < len(exp), "budget purges everything — lower it"


def test_band_cap_star_edges_bound_verbatim_cluster(spark, tmp_path):
    """Per-bucket pair fan-out cap (round-12): a 12-copy verbatim
    cluster at cap=4 must emit exactly C(4,2)=6 in-cap pairs plus 8
    star edges (bucket-min 0 -> each truncated member), never
    C(12,2)=66 — and the star edges keep the WHOLE cluster connected
    through the keeper, so keep-first/CC purge semantics survive the
    cap with pair recall 14/66 but cluster recall 1.0."""
    import uuid

    import pandas as pd

    from vectordb_agentic_rag_spark.operators.dedup import (
        _minhash_codes_and_candidates,
        _verify_pairs_jaccard,
    )

    d = tmp_path / f"capfix_{uuid.uuid4().hex[:8]}"
    d.mkdir()
    boiler = "the same boilerplate footer text repeated verbatim"
    docs = [(i, boiler) for i in range(12)] + [
        (100, "xxa yyb zzc qqd"),
        (101, "eef ffg ggh hhi"),
        (102, "jjk kkl llm mmn"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet"
    )

    codes, cand = _minhash_codes_and_candidates(spark, str(d), cap=4)
    got = sorted((r.doc_a, r.doc_b) for r in cand.collect())
    in_cap = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(0, b) for b in range(4, 12)]
    expected_cluster = sorted(in_cap + star)
    # the three distinct docs may or may not band-collide with each
    # other; cluster pairs are the invariant under test
    cluster_pairs = [p for p in got if p[0] < 100 and p[1] < 100]
    assert cluster_pairs == expected_cluster
    # every cluster member still reaches the keeper (doc 0)
    reached = {0}
    for a, b in cluster_pairs:
        if a in reached:
            reached.add(b)
    assert reached == set(range(12))
    # star edges verify at jac = 1.0 (verbatim copies), so the verify
    # stage keeps the whole cluster purgeable
    ver = _verify_pairs_jaccard(
        spark, codes, cand, threshold=0.7,
        tag=f"capfix_{uuid.uuid4().hex[:6]}",
    )
    vpairs = {(r.doc_a, r.doc_b): r.jac for r in ver.collect()}
    for p in expected_cluster:
        assert vpairs[p] == 1.0
    # uncapped baseline: all 66 pairs — quantifies the cap's cost
    _, cand_unc = _minhash_codes_and_candidates(spark, str(d), cap=10**9)
    unc = [
        (r.doc_a, r.doc_b)
        for r in cand_unc.collect()
        if r.doc_a < 100 and r.doc_b < 100
    ]
    assert len(unc) == 66


def test_band_cap_never_binds_on_fixture(spark, sf_dir):
    """_BAND_CAP (4096) sits above the largest fixture bucket (3847 at
    sf0.1), so the capped candidate set must be IDENTICAL to the
    uncapped one on the graded corpus — the cap is a blow-up safety
    rail, not a semantic change at tested sfs."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        _minhash_codes_and_candidates,
    )

    _, capped = _minhash_codes_and_candidates(spark, sf_dir)
    _, unc = _minhash_codes_and_candidates(spark, sf_dir, cap=10**9)
    assert capped.count() == unc.count()
    assert capped.exceptAll(unc).count() == 0


def test_band_cap_audit_zero_truncation_on_fixture(spark, sf_dir):
    """The audit table must report ZERO truncation at tested sfs (cap
    4096 > max fixture bucket 3847) and internally consistent pair
    arithmetic — pairs_capped + truncated_pairs == pairs_uncapped."""
    from vectordb_agentic_rag_spark.operators.dedup import (
        N_BANDS,
        dedup_band_cap_audit,
    )

    rows = dedup_band_cap_audit(spark, sf_dir).collect()
    assert len(rows) == N_BANDS
    for r in rows:
        assert r.buckets_over_cap == 0
        assert r.truncated_members == 0
        assert r.truncated_pairs == 0
        assert r.pairs_capped == r.pairs_uncapped
        assert r.max_bucket <= 4096
