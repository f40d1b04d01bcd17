"""Mirror of the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` entry must match DuckDB on the same parquet
tables (row count + sorted-column + order-insensitive values)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from .conftest import SF_DIR, assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_bench_extras_stay_out_of_the_contract(spark):
    """bench_extras() entries are timing-only: they must never leak
    into queries()/oracle_sql() (the driver would grade them without
    an oracle), and each must still run."""
    extras = entry_mod.bench_extras()
    assert extras
    overlap = set(extras) & (set(QUERIES) | set(ORACLES))
    assert not overlap, f"bench-only names inside the contract: {overlap}"
    for name, fn in extras.items():
        assert fn(spark, SF_DIR).count() >= 0, name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    duck_df = duck.sql(ORACLES[name]).df()
    assert_matches_oracle(spark_df, duck_df, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
