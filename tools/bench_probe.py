"""Round-12 optimization probe: per-query explain capture + timing.

Usage:
    python tools/bench_probe.py [--plans-dir plans/r12] [--suffix before]
        [--queries q_a,q_b] [--reps 5] [--sf-dir DIR] [--no-explain]

For every bench=True spec (or the --queries list, which may name ANY
registered query), saves ``<plans-dir>/<name>_<suffix>.txt`` with the
``explain("formatted")`` output and times the query via the noop sink
(interleaved reps, min + median reported). Purely a measurement tool —
never on any query path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catenae_kafka_spark.registry import all_specs
from catenae_kafka_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--no-explain", action="store_true")
    args = ap.parse_args()

    spark = get_spark("bench_probe")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    specs = all_specs()
    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        names = sorted(n for n, s in specs.items() if s.bench and not n.startswith("q_stream"))

    os.makedirs(args.plans_dir, exist_ok=True)
    if not args.no_explain:
        for n in names:
            df = specs[n].fn(spark, args.sf_dir)
            # _explain_string: capture instead of print
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{n}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
            print(f"explain saved: {n}", file=sys.stderr)

    runs: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t0 = time.perf_counter()
            specs[n].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        n: {
            "min": round(min(r), 3),
            "med": round(sorted(r)[len(r) // 2], 3),
            "all": [round(x, 3) for x in r],
        }
        for n, r in runs.items()
    }
    print(json.dumps({"sf_dir": args.sf_dir, "timings": out}, indent=1))


if __name__ == "__main__":
    main()
