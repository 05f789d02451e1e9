"""Mechanical wide-tier retime adjudication (r12 verdict item 8).

The wide tier in ``bench.py`` is best-of-1 with construction inside the
timed window, so BENCH_r{N}.json readings taken on a loaded box routinely
show ±30-100% "regressions" that vanish warm on a quiet box (r12: kcore
6.1s cold-loaded -> 1.9s warm-quiet). BASELINE.md adjudicates those by
hand each round; this tool makes it mechanical:

1. read a CURRENT bench artifact (or run the wide keys fresh) and a
   REFERENCE artifact (default: the newest committed BENCH_r*.json before
   the current one);
2. for every wide key whose current reading exceeds ``--threshold``
   (default 1.5x) of the reference, re-time it on THIS box: one untimed
   warmup lap, then best-of-2 — the steady-state number the cold
   best-of-1 artifact cannot give;
3. print a markdown table ready to append to BASELINE.md, plus one JSON
   line for tooling.

Usage:
  python tools/retime_wide.py                    # newest vs previous artifact
  python tools/retime_wide.py BENCH_r12.json     # explicit current
  python tools/retime_wide.py cur.json ref.json  # explicit both
  python tools/retime_wide.py --threshold 1.3
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _wide(doc: dict) -> dict:
    """Extract the wide-tier metrics from a bench artifact.

    Accepts both shapes (r13 verdict "What's wrong" item 1):

    * raw ``bench.py`` output: ``{"metric": ..., "wide": {...}, ...}``;
    * committed driver artifacts ``BENCH_r*.json``:
      ``{"n", "rc", "cpus", "sf", "tail", "parsed"}`` with the metrics
      nested under ``parsed`` — and, as a last resort, a ``tail`` string
      whose final ``{"metric": ...}`` JSON line carries the same payload.
    """
    for candidate in (doc, doc.get("parsed") or {}):
        if isinstance(candidate, dict) and isinstance(candidate.get("wide"), dict):
            return candidate["wide"]
    tail = doc.get("tail")
    if isinstance(tail, str):
        for line in reversed(tail.splitlines()):
            line = line.strip()
            if line.startswith("{") and '"wide"' in line:
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(parsed.get("wide"), dict):
                    return parsed["wide"]
    return {}


def _artifacts() -> list[str]:
    def rnd(p: str) -> int:
        return int(re.search(r"r(\d+)", os.path.basename(p)).group(1))

    return sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")), key=rnd)


def main() -> None:
    threshold = 1.5
    args = [a for a in sys.argv[1:]]
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    arts = _artifacts()
    cur_path = args[0] if args else arts[-1]
    ref_path = args[1] if len(args) > 1 else [a for a in arts if a != cur_path][-1]
    cur = json.load(open(cur_path))
    ref = json.load(open(ref_path))
    cur_wide, ref_wide = _wide(cur), _wide(ref)
    if not cur_wide or not ref_wide:
        missing = [
            os.path.basename(p)
            for p, w in ((cur_path, cur_wide), (ref_path, ref_wide))
            if not w
        ]
        print(f"ERROR: no wide-tier metrics found in {missing}", file=sys.stderr)
        sys.exit(2)

    suspects = {
        name: (t, ref_wide[name])
        for name, t in cur_wide.items()
        if name in ref_wide and ref_wide[name] > 0 and t / ref_wide[name] > threshold
    }
    if not suspects:
        print(
            f"no wide key exceeds {threshold}x of "
            f"{os.path.basename(ref_path)} — nothing to retime"
        )
        print(json.dumps({"suspects": {}, "retimed": {}}))
        return

    print(
        f"retiming {len(suspects)} suspects (> {threshold}x vs "
        f"{os.path.basename(ref_path)}): {sorted(suspects)}",
        file=sys.stderr,
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from fits2db_spark.registry import all_queries
    from fits2db_spark.session import get_spark
    from fits2db_spark.tables import warm_cache

    spark = get_spark("retime_wide", shuffle_partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir, partitions=8)
    qs = all_queries()
    retimed: dict[str, float] = {}
    for name in sorted(suspects):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        retimed[name] = round(best, 3)

    la = os.getloadavg()[0]
    print(
        f"\n| key | {os.path.basename(ref_path)} | "
        f"{os.path.basename(cur_path)} | warm retime (load {la:.2f}) | verdict |"
    )
    print("|---|---|---|---|---|")
    for name in sorted(suspects):
        t, r = suspects[name]
        w = retimed[name]
        verdict = "load noise" if w <= threshold * r else "REAL REGRESSION"
        print(f"| {name} | {r} | {t} | {w} | {verdict} |")
    print(json.dumps({"suspects": suspects, "retimed": retimed, "load": la}))


if __name__ == "__main__":
    main()
