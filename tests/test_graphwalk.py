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


@pytest.fixture(scope="module")
def wgraph(spark):
    """Star around 'a' with asymmetric weights, plus a zero-weight pair
    (exercises the all-zero uniform-1/k fallback) and an isolated node."""
    nodes = spark.createDataFrame(
        [(k,) for k in ["a", "b", "c", "d", "e", "f"]], "rec_key string"
    )
    edges_w = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("d", "e", 0.0)],
        "a_key string, b_key string, weight double",
    )
    return nodes, edges_w


def test_pagerank_weighted_out_shares_sum_to_one(spark, wgraph):
    """G7 for G4 weights: per-source transition shares sum to 1 — both on
    weighted nodes (w/Σw) and on all-zero-fallback nodes (1/outdeg),
    mirroring RandomGraphWalk.java:203-279's two normalization paths."""
    nodes, edges_w = wgraph
    sym = edges_w.select(
        F.col("a_key").alias("src"), F.col("b_key").alias("dst"), "weight"
    ).union(
        edges_w.select(F.col("b_key").alias("src"), F.col("a_key").alias("dst"), "weight")
    ).union(
        nodes.select(
            F.col("rec_key").alias("src"), F.col("rec_key").alias("dst"),
            F.lit(0.0).alias("weight"),
        )
    )
    outw = sym.groupBy("src").agg(
        F.sum("weight").alias("sw"), F.count("*").alias("outdeg")
    )
    shares = (
        sym.join(outw, "src")
        .select(
            "src",
            F.when(F.col("sw") > 0, F.col("weight") / F.col("sw"))
            .otherwise(F.lit(1.0) / F.col("outdeg"))
            .alias("share"),
        )
        .groupBy("src")
        .agg(F.sum("share").alias("s"))
        .collect()
    )
    for r in shares:
        assert r["s"] == pytest.approx(1.0, abs=1e-9), r


def test_pagerank_weighted_mass_and_ordering(wgraph):
    """Σ rank = 1; the heavier neighbor of the hub out-ranks the lighter
    one (weight 3 vs 1 edge), which uniform PageRank cannot distinguish."""
    nodes, edges_w = wgraph
    pr = {
        r["rec_key"]: r["rank"]
        for r in GW.pagerank_weighted(nodes, edges_w, iters=8).collect()
    }
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-4)
    assert pr["b"] > pr["c"]  # 'a' sends 3/4 of its walk mass to b, 1/4 to c
    # all-zero pair: uniform fallback splits d's mass between loop and e
    assert pr["d"] == pytest.approx(pr["e"], abs=1e-6)
    # uniform PR sees b and c identically
    upr = {
        r["rec_key"]: r["rank"]
        for r in GW.pagerank(
            nodes, edges_w.select("a_key", "b_key"), iters=8
        ).collect()
    }
    assert upr["b"] == pytest.approx(upr["c"], abs=1e-6)


def test_pagerank_weighted_matches_oracle_sql(spark, wgraph):
    import duckdb

    nodes, edges_w = wgraph
    pr = sorted(
        (r["rec_key"], r["rank"])
        for r in GW.pagerank_weighted(nodes, edges_w, iters=6).collect()
    )
    con = duckdb.connect()
    nodes_rel = "SELECT unnest(['a','b','c','d','e','f']) AS rec_key"
    edges_rel = (
        "SELECT 'a' AS a_key, 'b' AS b_key, 3.0 AS weight "
        "UNION ALL SELECT 'a','c',1.0 UNION ALL SELECT 'd','e',0.0"
    )
    body, final = GW.pagerank_weighted_ctes(nodes_rel, edges_rel, iters=6)
    got = sorted(
        (r[0], r[1]) for r in con.execute(f"WITH {body} {final}").fetchall()
    )
    assert [(k, pytest.approx(v, abs=2e-6)) for k, v in pr] == got
