"""Optimization-round measurement harness (guide §1).

For each named query (default: all): run N timed passes against the noop
sink (same methodology as bench.py), record per-pass wall seconds and the
number of Spark jobs the pass launched (statusTracker delta — job count
is the fixed-overhead multiplier at local scale), and optionally dump
``explain("formatted")`` to plans/r14/<query>_<tag>.txt.

Usage:
  python scripts/opt_measure.py [--sf DIR] [--passes N] [--plans TAG] [q ...]

Output: one JSON line per query on stdout +
/tmp/opt_measure_<tag>.json with the full record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain(formatted) to plans/r14/<q>_<TAG>.txt")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from swiftlake_spark.config import EngineConfig
    from swiftlake_spark.session import build_session
    from swiftlake_spark.queries import all_queries
    from swiftlake_spark.queries.base import TABLES, load

    spark = build_session(EngineConfig(app_name="swiftlake-opt-measure"))
    sc = spark.sparkContext
    qs = all_queries()
    names = args.names or sorted(qs)

    # same warm as bench.py: scan every table once, decimal-agg JIT warm
    from pyspark.sql import functions as F

    for t in TABLES:
        load(spark, args.sf, t).write.format("noop").mode("overwrite").save()
    (
        load(spark, args.sf, "lineitem")
        .limit(10_000)
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    plans_dir = os.path.join(_REPO, "plans", "r14")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        rec: dict = {"passes": [], "jobs": []}
        try:
            for i in range(args.passes):
                sc.setJobDescription(f"{name} pass {i}")
                j0 = sc.statusTracker().getJobIdsForGroup(None)
                n0 = len(j0) if j0 is not None else 0
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                j1 = sc.statusTracker().getJobIdsForGroup(None)
                n1 = len(j1) if j1 is not None else 0
                rec["passes"].append(round(dt, 3))
                rec["jobs"].append(n1 - n0)
                sc.setJobDescription(None)
            if args.plans:
                df = qs[name](spark, args.sf)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                    fh.write(plan)
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
        rec["min"] = round(min(rec["passes"]), 3) if rec["passes"] else None
        results[name] = rec
        print(json.dumps({name: rec}, separators=(",", ":")))
        sys.stdout.flush()

    tag = args.plans or "run"
    with open(f"/tmp/opt_measure_{tag}.json", "w") as fh:
        json.dump(results, fh, indent=1)
    total_min = sum(r["min"] for r in results.values() if r.get("min") is not None)
    print(f"TOTAL(min-of-{args.passes}) = {total_min:.2f}s over {len(results)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
