"""Capture .explain('formatted') output for the round-14 optimization
round into plans/r15/<name>_<tag>.txt (tag = before|after).

    python tools/dump_plans_r15.py before [names...]
    python tools/dump_plans_r15.py after  [names...]

Default names = the five headline bench queries (bench.py HEADLINE
values). The judge checks plan claims in OPTIMIZATION_r15.md against
these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    # default = the five headline bench ops, imported from bench.py so
    # this tool cannot drift from what the bench actually times
    from bench import HEADLINE

    names = sys.argv[2:] or list(HEADLINE.values())

    from vectordb_agentic_rag_spark import QUERIES, load_all_operators
    from vectordb_agentic_rag_spark.session import get_spark

    load_all_operators()
    spark = get_spark("dump-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    out_dir = os.path.join("/root/repo", "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
