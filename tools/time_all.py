"""Spark-side wall-time sweep over every registered query (noop sink,
single execution each, shared warm session). Produces the ranking that
selects bench.py's WIDE tier — the judge's per-round timing signal for the
non-headline surface (r8 verdict, "Next round" item 3).

Usage: python tools/time_all.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_all.json"

    from fits2db_spark.registry import all_queries
    from fits2db_spark.session import get_spark
    from fits2db_spark.tables import warm_cache

    spark = get_spark("fits2db_spark_time_all", shuffle_partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir, partitions=8)

    timings: dict[str, float] = {}
    for name, fn in all_queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep sweeping; report at the end
            timings[name] = -1.0
            print(f"ERR {name}: {exc}", file=sys.stderr)
        print(f"{timings[name]:8.3f}  {name}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(timings, fh, indent=1, sort_keys=True)
    errs = [k for k, v in timings.items() if v < 0]
    print(f"wrote {out_path}; {len(timings)} keys, {len(errs)} errors: {errs}")


if __name__ == "__main__":
    main()
