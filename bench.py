"""Headline benchmark: the five BASELINE.md queries on sf0.1.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Methodology (BASELINE.md §b): warmed SparkSession, two warm-up runs per
query, then median of 5 timed runs — measures steady-state query time,
not JVM startup. Target: <= 2x the DuckDB baseline per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectordb_agentic_rag_spark import load_all_operators, QUERIES  # noqa: E402
from vectordb_agentic_rag_spark.session import get_spark  # noqa: E402

# headline ops mapped to the BASELINE.md query names
HEADLINE = {
    "agg_pricing_summary": "agg_hash_group",
    "join_customer_orders": "join_shuffle_equi",
    "topk_cosine_knn": "vec_cosine_topk",
    "win_rank_events": "win_rank_topk_per_group",
    "doc_text_stats": "text_tokenize_stats",
}

N_RUNS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    load_all_operators()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Global warm-up: C2-compile the shared hot paths (parquet reader,
    # codegen'd agg/join/window loops) BEFORE any query is timed. JIT
    # warm-up is cross-query — the first ~15 jobs in a session run up to
    # 2x slower regardless of which query they belong to — and
    # BASELINE.md's methodology is steady-state, not first-run.
    for _ in range(3):
        for op in HEADLINE.values():
            QUERIES[op](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for bench_name, op in HEADLINE.items():
        fn = QUERIES[op]
        fn(spark, sf_dir).collect()  # re-warm this query's own plan cache
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[bench_name] = round(statistics.median(runs), 4)

    print(
        json.dumps(
            {
                "metric": "headline query latency (median of 5, warmed session)",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
