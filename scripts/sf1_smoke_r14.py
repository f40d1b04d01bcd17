#!/usr/bin/env python3
"""Targeted sf1 (10x) smoke for the round-14 promotions and the
operators whose code changed this round: the three new contract
entries (x08 distribution drift, t28 vocab coverage, t29 packing
report) and the connected-components consumers (d06 directly; d09/d16
through the shared pair graph).  Full-suite sf1 coverage ran in round
13; this re-proves only what round 14 touched, printing each timing as
it completes.

Usage::

    python scripts/sf1_smoke_r14.py [sf1_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# on-disk shuffle scratch at sf1 (the round-11 tmpfs OOM lesson)
os.environ.pop("SPARK_GRAFT_LOCAL_DIR", None)

import __spark_entry__ as em  # noqa: E402
from dfsql_spark.session import get_spark  # noqa: E402

TARGETS = [
    "x08_distribution_drift",
    "t28_vocab_coverage",
    "t29_packing_report",
    "d06_dedup_connected",
    "d09_dedup_survivors",
    "d16_dedup_report",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    warm_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir  # no small warm corpus on this box: warm in place
    spark = get_spark(app_name="sf1-smoke-r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(em.queries())
    # d09 left the contract in round 15; keep the archived target runnable
    qs.setdefault("d09_dedup_survivors", em.d09_dedup_survivors)
    # warm at the smoke scale so codegen/JIT cost stays out of the row
    for name in TARGETS:
        qs[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    results = {}
    for name in TARGETS:
        em.release_caches()
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        results[name] = round(time.monotonic() - t0, 2)
        print(f"{name}: {results[name]}s", flush=True)
    print("SF1_SMOKE_R14_OK", results, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
