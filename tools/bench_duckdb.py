"""DuckDB-side timing of the bench headline queries' oracle SQL — the
in-repo context for BENCH_r{N}.json (BASELINE.md has no absolute numbers,
so this single-node columnar engine is the falsifiable comparison point
for the "within 2x of a single-node baseline" gate).

Methodology mirrors bench.py: same scale factor, best-of-2 per query,
32 DuckDB threads (local[32] analogue). Headline entries with no oracle
(approx sketches, Spark-specific RNG) are skipped and listed.

As of round 10 the paired leg is folded into bench.py itself (VERDICT r9
item 3) via :func:`time_oracles`, so BENCH_r{N}.json is self-contained for
the 2x gate; this CLI remains for standalone re-runs.

Usage: python tools/bench_duckdb.py [sf_dir]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def time_oracles(
    sf_dir: str, names: list[str], runs: int = 2
) -> tuple[dict[str, float], list[str]]:
    """Time each named query's DuckDB oracle at ``sf_dir`` (best-of-``runs``).

    Returns ``(timings, skipped)`` where ``skipped`` lists names with no
    registered oracle (rows-only keys).  One connection, 32 threads, views
    over the same parquet files Spark reads — the sequential single-node
    proxy for the bench gate.
    """
    from fits2db_spark.registry import all_oracles

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = all_oracles()
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            skipped.append(name)
            continue
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    con.close()
    return timings, skipped


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from bench import HEADLINE

    timings, skipped = time_oracles(sf_dir, HEADLINE)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "skipped_no_oracle": skipped,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
