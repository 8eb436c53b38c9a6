#!/usr/bin/env python
"""Measure this host's per-job scheduling floor (VERDICT r13 item 6).

The ML-fit family's walls are defended as rounds × the environment's
per-job floor (job launch + AQE planning latency, not compute). That
floor was measured on the r13 builder host; this script makes the
number reproducible on ANY host so the defense is checkable:

  1. raw RDD job: sc.parallelize(1 partition).count()      — scheduler only
  2. trivial DataFrame agg over a checkpointed 1-partition
     15k-row frame (the gbdt/logreg loop shape)            — + AQE/codegen reuse
  3. full per-round gradient-shaped agg (sum of arithmetic
     over 4 columns) on the same frame                     — + expression eval

Each timed as min over N repeats after a warmup. Prints one JSON line.

Usage: python scripts/job_floor_probe.py [--repeats 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_group4_app_spark.session import get_spark  # noqa: E402


def _min_wall(fn, repeats: int) -> float:
    fn()  # warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()
    spark = get_spark(app_name="job-floor-probe")
    sc = spark.sparkContext

    feats = (
        spark.range(0, 15000)
        .select(
            (F.col("id") % 97).cast("double").alias("x1"),
            (F.col("id") % 53).cast("double").alias("x2"),
            (F.col("id") % 29).cast("double").alias("x3"),
            ((F.col("id") % 2)).cast("double").alias("y"),
        )
        .repartition(1)
        .localCheckpoint()
    )

    out = {
        "raw_rdd_1part_count": _min_wall(
            lambda: sc.parallelize([1], 1).count(), args.repeats
        ),
        "trivial_agg_ckpt_1part": _min_wall(
            lambda: feats.agg(F.sum("x1")).collect(), args.repeats
        ),
        "gradient_shaped_agg": _min_wall(
            lambda: feats.agg(
                F.sum(F.col("x1") * (F.col("y") - 0.5)),
                F.sum(F.col("x2") * (F.col("y") - 0.5)),
                F.sum(F.col("x3") * (F.col("y") - 0.5)),
                F.count(F.lit(1)),
            ).collect(),
            args.repeats,
        ),
    }
    print(json.dumps({"job_floor_probe": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
