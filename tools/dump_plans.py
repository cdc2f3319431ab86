"""Dump ``.explain("formatted")`` for named queries to files.

Usage::

    python tools/dump_plans.py OUTDIR SUFFIX q121_pagerank [q...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` per query — the optimization-round
evidence files (plans/r15/<query>_before.txt / _after.txt). Plans are
captured WITHOUT executing the query (AdaptiveSparkPlan prints
isFinalPlan=false), which is exactly what the plan-shape claims in
OPTIMIZATION_r{N}.md are about: Exchange count, join strategy,
PushedFilters/ReadSchema, WholeStageCodegen spans, Python eval nodes.

Iterative operators (pagerank, HITS, stores) EXECUTE jobs while
building their result frame (localCheckpoint rounds); for those the
dumped plan is the final round's plan over checkpointed inputs — still
the per-round shape the scale argument is about.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit("usage: dump_plans.py OUTDIR SUFFIX QUERY [QUERY ...]")
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from albedo_spark.queries import QUERIES
    from albedo_spark.session import get_spark

    unknown = [q for q in names if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {', '.join(unknown)}")

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
