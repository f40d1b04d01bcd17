"""Sink tests: write_table + COPY TO command, with readback checks."""

import os

import pandas as pd
import pytest

from dfsql_spark import DataSource
from dfsql_spark.sources.writers import write_table


@pytest.fixture()
def ds(spark):
    ds = DataSource(spark=spark)
    ds.add_table(
        "sink_src",
        pd.DataFrame(
            {"k": ["a", "a", "b", "b", "c"], "v": [1, 2, 3, 4, 5]}
        ),
    )
    yield ds
    spark.catalog.dropTempView("sink_src")


def test_write_parquet_roundtrip(ds, tmp_path):
    out = str(tmp_path / "plain")
    write_table(ds.spark.table("sink_src"), out)
    back = ds.spark.read.parquet(out)
    assert back.count() == 5
    assert set(back.columns) == {"k", "v"}


def test_write_partitioned(ds, tmp_path):
    out = str(tmp_path / "parts")
    write_table(ds.spark.table("sink_src"), out, partition_by="k")
    assert sorted(
        d for d in os.listdir(out) if d.startswith("k=")
    ) == ["k=a", "k=b", "k=c"]
    # partition pruning: reading one partition sees only its rows
    one = ds.spark.read.parquet(out).filter("k = 'b'")
    assert one.count() == 2


def test_write_csv_has_header(ds, tmp_path):
    out = str(tmp_path / "csv")
    write_table(ds.spark.table("sink_src"), out, fmt="csv", repartition=1)
    back = ds.spark.read.options(header=True, inferSchema=True).csv(out)
    assert back.count() == 5


def test_write_rejects_unknown_format(ds, tmp_path):
    with pytest.raises(ValueError):
        write_table(ds.spark.table("sink_src"), str(tmp_path / "x"), fmt="xlsx")


def test_copy_table_command(ds, tmp_path):
    out = str(tmp_path / "copy_table")
    assert ds.query(f"COPY sink_src TO '{out}'") == "OK"
    assert ds.spark.read.parquet(out).count() == 5


def test_copy_query_command_with_partition(ds, tmp_path):
    out = str(tmp_path / "copy_query")
    status = ds.query(
        f"COPY (SELECT k, SUM(v) AS total FROM sink_src GROUP BY k) "
        f"TO '{out}' FORMAT parquet PARTITION BY (k)"
    )
    assert status == "OK"
    back = ds.spark.read.parquet(out).toPandas().sort_values("k")
    assert list(back["total"]) == [3, 7, 5]


def test_bucketed_join_has_no_shuffle(ds, tmp_path):
    import pandas as pd
    from dfsql_spark.sources.writers import write_bucketed_table

    spark = ds.spark
    facts = spark.createDataFrame(
        pd.DataFrame({"k": list(range(100)) * 2, "v": range(200)})
    )
    dims = spark.createDataFrame(
        pd.DataFrame({"k": range(100), "w": range(100)})
    )
    write_bucketed_table(facts, "b_facts", bucket_by="k", n_buckets=8)
    write_bucketed_table(dims, "b_dims", bucket_by="k", n_buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed on the join key: no Exchange in the plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 200
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")
