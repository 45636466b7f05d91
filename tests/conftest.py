"""Shared pytest fixtures: one SparkSession per test session (local mode),
plus oracle-comparison helpers mirroring the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from entity_linking_spark.session import get_spark

    s = get_spark(
        app_name="els-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the testdata tables registered as views —
    the same environment the driver's oracle harness builds."""
    import duckdb

    con = duckdb.connect()
    from entity_linking_spark.sources.tables import TPCH_TABLES

    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def rows_key(rows, cols):
    """Canonical sortable representation of a result set (order-free)."""
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def assert_spark_matches_duck(spark_df, duck_con, sql):
    """Value-level parity check: same columns (sorted by name), same
    multiset of rows. This mirrors CORRECTNESS_r{N}.json's comparison."""
    cols = sorted(spark_df.columns)
    s_rows = [tuple(r[c] for c in cols) for r in spark_df.collect()]
    d = duck_con.sql(sql)
    d_cols = [c.lower() for c in d.columns]
    idx = [d_cols.index(c) for c in cols]
    d_rows = [tuple(r[i] for i in idx) for r in d.fetchall()]

    def canon(rows):
        out = []
        for r in rows:
            vals = []
            for v in r:
                if isinstance(v, float):
                    v = round(v, 6)
                if hasattr(v, "isoformat"):
                    v = v.replace(tzinfo=None).isoformat()
                if isinstance(v, list):
                    v = tuple(v)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    sc, dc = canon(s_rows), canon(d_rows)
    assert len(sc) == len(dc), f"row count {len(sc)} vs oracle {len(dc)}"
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[0]}"
