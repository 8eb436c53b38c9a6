#!/usr/bin/env python
"""Isolated steady-state re-measure for bench adjudication.

The driver's per-round ``BENCH_r{N}.json`` is the number of record, but
it is a single pass on a shared host — VERDICT r10 requires every name
it shows >2x the r1 baseline to get an ISOLATED x3 steady-state
re-measure before the grade moves (noise confirmed vs root-caused).
This script is that protocol, mechanized (it produced the round-9 and
round-10 adjudication tables in SCALE.md by hand before):

  fresh local[32] session -> per query: 1 untimed warmup (codegen/JIT)
  -> clearCache -> 3 timed cache-cleared passes -> report each pass and
  the min (the steady state; the min is what SCALE.md records).

Usage:
  python scripts/adjudicate.py q1,q2,... [--passes 3] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_group4_app_spark.registry import QUERY_REGISTRY  # noqa: E402
from bigdata_group4_app_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated registry names")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]
    unknown = [n for n in names if n not in QUERY_REGISTRY]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark(app_name="adjudicate")
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERY_REGISTRY[name]
        # warmup: pays plan-shape codegen + JIT, untimed
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        runs = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"runs": runs, "min": min(runs)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"adjudication": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
