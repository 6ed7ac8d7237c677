"""Measure driver-side plan-BUILD time vs execution per bench query.

Usage:
    python tools/build_probe.py [--reps 5] [--queries q_a,q_b] [--sf-dir DIR]

For each query: time spec.fn(spark, sf_dir) alone (pure Python/py4j
plan construction — no action), then time the noop-sink execution of
the built DataFrame. Interleaved reps, min reported. Measurement tool
only; never on a query path.
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--queries", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("build_probe")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    specs = all_specs()
    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        names = sorted(
            n for n, s in specs.items() if s.bench and not n.startswith("q_stream")
        )

    build: dict[str, list[float]] = {n: [] for n in names}
    execu: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for n in names:
            t0 = time.perf_counter()
            df = specs[n].fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build[n].append(t1 - t0)
            execu[n].append(t2 - t1)
    out = {
        n: {
            "build_min": round(min(build[n]), 3),
            "exec_min": round(min(execu[n]), 3),
            "build_all": [round(x, 3) for x in build[n]],
        }
        for n in names
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
