#!/usr/bin/env python
"""Extreme-span evidence for the day-chunked gap-fill spine (round 8,
the r7 verdict's optional item 8 — the code landed in r7, this is the
measurement that didn't).

The claim (plans/timeseries_plans.py chunked_hour_spine): generating a
dense hourly spine for users whose spans run MULTI-YEAR must never
materialize the whole span as one sequence() array in a single row
buffer — the day-chunked form bounds every generated array (span-days
outer, <= 24 hours inner) while producing the identical row set.

Sweep: n_users synthetic users, span lengths drawn 1..max_years years
(minute-grain endpoints, so clamping is exercised), measuring

  * chunked — chunked_hour_spine wall time + row count
  * naive   — the single sequence(lo, hi, INTERVAL 1 HOUR) explode
              (one span-sized array per user row) wall time + count
  * equal   — row-set equality on a deterministic sample of users
              (full anti-join equality at the smallest scale)

Usage: python tools/spine_scaling.py [--users 500,2000] [--max-years 4]
Prints one JSON line per scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", default="500,2000")
    ap.add_argument("--max-years", type=int, default=4)
    args = ap.parse_args()
    scales = [int(s) for s in args.users.split(",")]

    from pyspark.sql import functions as F

    from etl_pipe_spark.plans.timeseries_plans import chunked_hour_spine
    from etl_pipe_spark.session import get_spark

    spark = get_spark("spine-scaling")
    hours_per_year = 365 * 24
    for n_users in scales:
        # deterministic spans: user u starts u*37 minutes past epoch+30y
        # and spans 1..max_years years plus a sub-hour tail, so both
        # ends exercise the clamp
        span = spark.range(n_users).select(
            F.col("id").alias("user_id"),
            (F.to_timestamp(F.lit("2000-01-01 00:00:00"))
             + F.make_interval(mins=(F.col("id") * 37) % 1440)
             ).alias("lo"),
        ).select(
            "user_id", "lo",
            (F.col("lo") + F.make_interval(
                hours=(F.lit(hours_per_year)
                       * (1 + F.col("user_id") % args.max_years)),
                mins=(F.col("user_id") * 13) % 60)
             ).alias("hi"),
        ).persist()
        span.count()
        row: dict = {
            "n_users": n_users, "max_years": args.max_years,
            "total_span_hours": span.select(
                F.sum((F.col("hi").cast("long") - F.col("lo").cast("long"))
                      / 3600).cast("long")).first()[0],
        }

        t0 = time.time()
        row["chunked_rows"] = chunked_hour_spine(span).count()
        row["chunked"] = round(time.time() - t0, 2)

        naive = span.select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
            .alias("bucket"))
        t0 = time.time()
        row["naive_rows"] = naive.count()
        row["naive"] = round(time.time() - t0, 2)

        # identity: the chunked spine IS the naive row set
        t0 = time.time()
        diff = (chunked_hour_spine(span).exceptAll(naive).count()
                + naive.exceptAll(chunked_hour_spine(span)).count())
        row["rowset_diff"] = diff
        row["equality_check"] = round(time.time() - t0, 2)
        span.unpersist()
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
