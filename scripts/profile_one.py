#!/usr/bin/env python3
"""Time a single contract query at a given sf_dir, warmed, mirroring
bench.py's session config.  Usage::

    python scripts/profile_one.py d09_dedup_survivors [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from dfsql_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # the engine's session factory — the SAME dialect + scale confs
    # bench.py and the driver run with (ansi off, UTC, 64MB broadcast
    # threshold, AQE); a hand-built session profiles different plans.
    spark = get_spark(app_name="profile_one")
    spark.sparkContext.setLogLevel("ERROR")
    q = {**entry.queries(), **entry.bench_extras()}[name]
    for i in range(reps):
        t0 = time.monotonic()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"rep{i}: {time.monotonic() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
