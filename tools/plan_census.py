"""Registry-wide physical-plan census: build every batch query and
count parquet scans / Exchange nodes / plan-string size.

Finds subtree-duplication offenders mechanically (optimization r13):
Catalyst does not common-subexpression-eliminate repeated DataFrame
subtrees, so a reused edge/pair table re-plans and re-executes its
build pipeline per reference — a query whose plan carries 50+ scans of
the same fact table is re-running its base pipeline that many times
(modulo runtime AQE stage reuse). Sorted worst-first.

Usage:  python tools/plan_census.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catenae_kafka_spark.registry import all_specs
from catenae_kafka_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("plan_census")

    def census(item):
        name, spec = item
        if "streaming" in spec.tags:
            return None
        try:
            df = spec.fn(spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
            return (p.count("Scan parquet"), p.count("Exchange"), len(p), name)
        except Exception as ex:  # noqa: BLE001 — censused, not asserted
            return (0, 0, 0, f"{name} ERROR {str(ex)[:60]}")

    with ThreadPoolExecutor(max_workers=8) as pool:
        rows = [r for r in pool.map(census, sorted(all_specs().items())) if r]
    rows.sort(reverse=True)
    print("scans exchanges planchars name")
    for scans, ex, chars, name in rows[:top_n]:
        print(scans, ex, chars, name)


if __name__ == "__main__":
    main()
