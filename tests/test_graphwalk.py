"""PageRank operator tests (reference G4/G5/G7 analogs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import graphwalk as GW


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [(k,) for k in ["a", "b", "c", "d", "e"]], "rec_key string"
    )
    # a-b-c triangle; d-e pair (two components)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e")], "a_key string, b_key string"
    )
    return nodes, edges


def test_pagerank_mass_conserved(graph):
    """G7 invariant: Σ rank = 1 (self-loops make the chain stochastic)."""
    nodes, edges = graph
    pr = GW.pagerank(nodes, edges, iters=8)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-4)


def test_pagerank_symmetry_and_components(graph):
    """Symmetric positions get equal rank; larger component carries more
    total mass than the smaller one."""
    nodes, edges = graph
    pr = {r["rec_key"]: r["rank"] for r in GW.pagerank(nodes, edges, iters=8).collect()}
    # triangle is vertex-transitive → equal ranks
    assert pr["a"] == pytest.approx(pr["b"], abs=1e-6)
    assert pr["b"] == pytest.approx(pr["c"], abs=1e-6)
    assert pr["d"] == pytest.approx(pr["e"], abs=1e-6)
    assert pr["a"] + pr["b"] + pr["c"] > pr["d"] + pr["e"]


def test_pagerank_matches_oracle_sql(spark, graph):
    """Spark driver-loop PR equals the unrolled-CTE DuckDB oracle."""
    import duckdb

    nodes, edges = graph
    pr = sorted(
        (r["rec_key"], r["rank"]) for r in GW.pagerank(nodes, edges, iters=6).collect()
    )
    con = duckdb.connect()
    nodes_rel = "SELECT unnest(['a','b','c','d','e']) AS rec_key"
    edges_rel = (
        "SELECT 'a' AS a_key, 'b' AS b_key UNION ALL SELECT 'b','c' "
        "UNION ALL SELECT 'a','c' UNION ALL SELECT 'd','e'"
    )
    got = sorted(
        (r[0], r[1])
        for r in con.execute(GW.pagerank_sql(nodes_rel, edges_rel, iters=6)).fetchall()
    )
    assert [(k, pytest.approx(v, abs=2e-6)) for k, v in pr] == got
