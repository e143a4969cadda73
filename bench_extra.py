"""Round-6 optimization helper: time a SUBSET of headline queries and/or
capture their .explain("formatted") plans, without touching the frozen
bench.py.  Methodology matches bench.py (noop sink, best-of-N trials,
clearCache between trials, job descriptions per guide §1.5).

Usage:
  python bench_extra.py q1_pricing_summary dedup_minhash_lsh   # time listed
  python bench_extra.py --plans plans/r06 --suffix before q5_local_supplier_volume
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...

Prints one JSON line {"queries": {...}, "sf": ...} for the timed subset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from scheduler_spark import queries as q  # noqa: E402
from scheduler_spark.session import get_spark  # noqa: E402

TRIALS = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "3")))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--no-time", action="store_true", help="plans only")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", parallelism=cpus)
    queries = q.all_queries()

    # warm up JVM/codegen outside the timed region, as bench.py does
    _force(queries["q1_pricing_summary"](spark, sf_dir))

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.names:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = Path(args.plans) / f"{name}_{args.suffix}.txt"
            out.write_text(plan)
            print(f"wrote {out}", file=sys.stderr)

    per_query: dict[str, float] = {}
    spreads: dict[str, float] = {}
    if not args.no_time:
        for name in args.names:
            times = []
            for _ in range(TRIALS):
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.perf_counter()
                _force(queries[name](spark, sf_dir))
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
            per_query[name] = round(min(times), 3)
            spreads[name] = round(max(times) / min(times), 2)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "queries": per_query,
                "spreads": spreads,
                "trials": TRIALS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
