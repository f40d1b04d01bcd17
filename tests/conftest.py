"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata views registered, and an oracle-compare
helper mirroring the driver's row-count + schema + order-insensitive
value check."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(autouse=True)
def _restore_configuration_attrs():
    """Snapshot/restore ``Configuration`` class attributes around every
    test: a test that assigns onto the class (the documented override
    pattern) can no longer leak global state into later tests — the
    pattern behind round 5's order-dependent failure."""
    from dfsql_spark.config import Configuration

    saved = {
        k: v for k, v in vars(Configuration).items() if not k.startswith("__")
    }
    yield
    for k in list(vars(Configuration)):
        if not k.startswith("__") and k not in saved:
            delattr(Configuration, k)
    for k, v in saved.items():
        if vars(Configuration).get(k) is not v:
            setattr(Configuration, k, v)


@pytest.fixture(scope="session")
def spark():
    from dfsql_spark.session import get_spark

    # test-harness opt-in: shuffle volumes here are known-small, and
    # tmpfs beats the (virtualized) disk ~15× on small block files;
    # deliberately NOT a library default (see session.py)
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/dfsql-spark-local")
    spark = get_spark(app_name="dfsql-spark-tests")
    yield spark


@pytest.fixture(scope="module", autouse=True)
def _cache_clean_between_modules(request):
    """Every module must leave the Spark cache empty: a leaked cached
    plan gets substituted (as an unpruned InMemoryRelation) into any
    later plan over the same file, breaking pushdown/pruning audits in
    OTHER files (round 6's default-order failure)."""
    yield
    import sys as _sys

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:
        return
    # Operator-internal persists are a tracked, releasable mechanism —
    # drain them first so only untracked leaks (fixtures, ad-hoc
    # .cache() calls) trip the assert.
    entry = _sys.modules.get("__spark_entry__")
    if entry is not None and hasattr(entry, "release_caches"):
        entry.release_caches()
    else:
        from dfsql_spark.operators.dedup import release_persists

        release_persists()
    try:
        empty = active._jsparkSession.sharedState().cacheManager().isEmpty()
    except Exception:
        return
    assert empty, (
        f"module {request.module.__name__} left cached plans behind; "
        "add `yield df; df.unpersist()` to its cache fixtures"
    )


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns; round floats —
    approximates the driver's order-insensitive value-hash."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")  # unify int32/int64/uint
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("object")
    if len(pdf) and len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="last")
    return pdf.reset_index(drop=True)


def assert_off_round_boundary(values, ndigits: int, min_dist: float = 1e-9):
    """Boundary audit for rounded float contracts (the r14 x06
    lesson): every pre-rounding value must sit at least ``min_dist``
    away from a half-way boundary at scale ``ndigits``, else
    ``round(x, ndigits)`` is engine/order-dependent and the entry must
    grade exact arithmetic instead.  Distances are computed on the
    EXACT rational of each double (fractions.Fraction), so the audit
    itself has no float error."""
    from fractions import Fraction

    import math

    scale = 10**ndigits
    bad = []
    for v in values:
        if v is None or (isinstance(v, float) and not math.isfinite(v)):
            continue
        scaled = Fraction(float(v)) * scale
        frac = scaled - (scaled.__floor__())
        dist = abs(frac - Fraction(1, 2)) / scale
        if dist < Fraction(min_dist):
            bad.append((float(v), float(dist)))
    assert not bad, (
        f"values within {min_dist} of a .5*10^-{ndigits} rounding "
        f"boundary (round({ndigits}) is not cross-engine stable for "
        f"them): {bad[:5]}"
    )


def assert_matches_oracle(
    spark_df,
    duck_df: pd.DataFrame,
    name: str = "query",
    float_atol: float = 1e-9,
):
    """Driver-gate mirror.  Float columns compare EXACTLY after
    normalize()'s 6-dp round (atol 1e-9 absorbs only sub-rounding
    representation noise) — the r14 x06 lesson: the old atol=1e-6
    masked precisely a one-unit flip in the 6th decimal, the ONLY
    difference the rounding can leave, so a driver-red entry survived
    a green suite.  Contract entries must pass at the default;
    ``float_atol`` exists ONLY for operator-level tests that
    deliberately compare order-dependent double accumulations."""
    got = normalize(spark_df.toPandas())
    want = normalize(duck_df)
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            ok = np.isclose(
                g.to_numpy(dtype=float),
                w.to_numpy(dtype=float),
                rtol=0.0,
                atol=float_atol,
                equal_nan=True,
            ).all()
            assert ok, f"{name}: column {c} values differ\n{g.head()}\nvs\n{w.head()}"
        else:
            ga = g.astype(str).where(~g.isna(), "<NA>")
            wa = w.astype(str).where(~w.isna(), "<NA>")
            diff = (ga != wa)
            assert not diff.any(), (
                f"{name}: column {c} differs at {int(diff.sum())} rows, e.g.\n"
                f"{pd.DataFrame({'got': g[diff].head(), 'want': w[diff].head()})}"
            )
