#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing one by K-fold
replication with deterministic key offsets.

The driver provides sf0.001/0.01/0.1 only; scale-validation runs (e.g.
the sf1 check that per-row cost stays flat) need a 10x corpus.  Usage::

    python scripts/make_scale_data.py [--src /root/testdata/sf0.1] \
        [--dst .benchdata/sf1] [--copies 10]

Replication rules (copy i of K, i=0 is the identity so src ⊂ dst):

* fact keys get disjoint per-copy offsets (orderkey/custkey/event_id/
  user_id/doc_id/vec_id), so joins and per-key aggregations see K× the
  key cardinality with unchanged per-key volume — the realistic way a
  corpus grows.
* dimension tables (region/nation/supplier/part) are NOT replicated:
  dims grow sublinearly in real warehouses, and keeping them fixed
  preserves the broadcast-ability the plans rely on.
* document text is perturbed per copy with a character substitution
  (``translate``): vowels map to copy-specific digits, which rewrites
  most k-shingles, so copies of a document are NOT near-duplicates of
  each other and the near-dup pair structure scales ~linearly (as a
  real corpus does) instead of quadratically in K.  Within one copy the
  planted duplicate clusters transform identically, so dedup semantics
  per copy are preserved exactly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dfsql_spark.session import get_spark  # noqa: E402

DIMS = ("region", "nation", "supplier", "part")

# per-copy key offsets, disjoint well past any source key range
OFF = {
    "orderkey": 100_000_000,
    "custkey": 10_000_000,
    "event_id": 1_000_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _vowel_subst(i: int) -> tuple[str, str]:
    """Deterministic per-copy char substitution: rewrites most shingles
    so cross-copy Jaccard falls far below near-dup thresholds."""
    return "eaou", f"{i % 10}{(i + 3) % 10}{(i + 7) % 10}{(i + 1) % 10}"


def replicate(spark, src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    def fan(name: str, transform):
        base = spark.read.parquet(f"{src}/{name}.parquet")
        parts = [transform(base, i) for i in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    fan(
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + i * OFF["orderkey"]
        ).withColumn("o_custkey", F.col("o_custkey") + i * OFF["custkey"]),
    )
    fan(
        "lineitem",
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + i * OFF["orderkey"]
        ),
    )
    fan(
        "customer",
        lambda df, i: df.withColumn(
            "c_custkey", F.col("c_custkey") + i * OFF["custkey"]
        ),
    )
    # legacy events parquet is TIMESTAMP(NANOS); read it as long (the
    # same conf the streaming module uses) so the replica stores plain
    # INT64 nanos.  On native timestamp[us] data the conf is a no-op
    # and the replica keeps timestamp[us].  Both the batch reader and
    # read_events_stream accept the replica: the stream detects that
    # events.parquet is a directory of part files and streams from it
    # directly (a leaf-name pathGlobFilter would exclude them).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fan(
        "events",
        lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + i * OFF["event_id"]
        ).withColumn("user_id", F.col("user_id") + i * OFF["user_id"]),
    )

    def doc_copy(df, i):
        df = df.withColumn("doc_id", F.col("doc_id") + i * OFF["doc_id"])
        if i:
            frm, to = _vowel_subst(i)
            df = df.withColumn("text", F.translate("text", frm, to))
        return df

    fan("documents", doc_copy)
    fan(
        "embeddings",
        lambda df, i: df.withColumn("vec_id", F.col("vec_id") + i * OFF["vec_id"]),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".benchdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="make-scale-data")
    replicate(spark, args.src, args.dst, args.copies)
    for t in DIMS + ("orders", "lineitem", "customer", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{args.dst}/{t}.parquet").count()
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
