"""Operator-level tests: blocking caps, pair generation, salting, and
connected components verified against a driver-side union-find oracle
(the invariant-check style of `baseline/RandomGraphWalk.java:281-320`)."""

from __future__ import annotations

import pyspark.sql.functions as F

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import clustering as C
from entity_linking_spark.operators import pairs as P


def _blocked(spark, rows):
    return spark.createDataFrame(rows, "rec_key string, block_key string")


def test_cap_blocks_drops_oversized(spark):
    rows = [(f"r{i:02d}", "big") for i in range(10)] + [("a", "ok"), ("b", "ok")]
    out = P.cap_blocks(_blocked(spark, rows), cap=5).collect()
    assert {r["block_key"] for r in out} == {"ok"}


def test_block_pairs_ordering_and_dedup(spark):
    rows = [("r1", "k1"), ("r2", "k1"), ("r3", "k1"), ("r1", "k2"), ("r2", "k2")]
    got = {(r["a_key"], r["b_key"]) for r in P.block_pairs(_blocked(spark, rows)).collect()}
    # (r1,r2) appears in both blocks but is emitted once; always a<b
    assert got == {("r1", "r2"), ("r1", "r3"), ("r2", "r3")}


def test_salt_blocks_splits_hot_key(spark):
    rows = [(f"r{i:03d}", "hot") for i in range(100)] + [("x", "cold"), ("y", "cold")]
    out = B.salt_blocks(_blocked(spark, rows), n_salt=4, hot_threshold=50).collect()
    hot_keys = {r["block_key"] for r in out if r["block_key"].startswith("hot#")}
    cold = [r for r in out if r["block_key"] == "cold"]
    assert 1 < len(hot_keys) <= 4
    assert len(cold) == 2  # cold key untouched


def union_find_clusters(edges, nodes):
    """Driver-side oracle: textbook union-find, cluster id = min member."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_connected_components_matches_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = set()
    # several chains + a star + random noise — shapes that stress both stars
    for i in range(0, 40, 1):
        edges.add((f"n{i:03d}", f"n{i + 1:03d}"))
    for i in range(60, 80):
        edges.add(("n050", f"n{i:03d}"))
    for _ in range(30):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    want = union_find_clusters(edges, nodes)

    edf = spark.createDataFrame(sorted(edges), "a_key string, b_key string")
    ndf = spark.createDataFrame([(n,) for n in nodes], "rec_key string")
    got = {
        r["rec_key"]: r["cluster_id"]
        for r in C.clusters_with_singletons(ndf, edf).collect()
    }
    assert got == want


def test_golden_records_survivorship(spark):
    # cluster A: "bob" wins by frequency; cluster B: 1-1 tie between
    # "amy" and "amy b" -> lexicographically smaller text wins;
    # singleton C keeps its own text
    recs = spark.createDataFrame(
        [
            ("r1", "c1", 1, "bob", ["bob"]),
            ("r2", "c1", 2, "bob", ["bob"]),
            ("r3", "c2", 1, "robert", ["robert"]),
            ("r4", "c2", 2, "amy b", ["amy", "b"]),
            ("r5", "c3", 1, "amy", ["amy"]),
            ("r6", "c3", 2, "solo", ["solo"]),
        ],
        "rec_key string, conv_id string, turn_idx int, norm_text string,"
        " tokens array<string>",
    )
    clu = spark.createDataFrame(
        [("r1", "r1"), ("r2", "r1"), ("r3", "r1"),
         ("r4", "r4"), ("r5", "r4"), ("r6", "r6")],
        "rec_key string, cluster_id string",
    )
    out = {r["cluster_id"]: r for r in C.golden_records(recs, clu).collect()}
    assert set(out) == {"r1", "r4", "r6"}
    a = out["r1"]
    assert (a["canonical_text"], a["n_members"], a["n_convs"],
            a["total_tokens"]) == ("bob", 3, 2, 3)
    assert out["r4"]["canonical_text"] == "amy"  # tie -> smaller text
    assert out["r4"]["n_convs"] == 2 and out["r4"]["total_tokens"] == 3
    assert out["r6"]["canonical_text"] == "solo" and out["r6"]["n_members"] == 1


def test_connected_components_empty_edges(spark):
    ndf = spark.createDataFrame([("a",), ("b",)], "rec_key string")
    edf = spark.createDataFrame([], "a_key string, b_key string")
    got = {r["rec_key"]: r["cluster_id"] for r in C.clusters_with_singletons(ndf, edf).collect()}
    assert got == {"a": "a", "b": "b"}  # all singletons


def test_minhash_lsh_same_text_same_blocks(spark):
    """Identical normalized text ⇒ identical signature ⇒ all bands collide."""
    rows = [("a", "c1", 0, "the quick brown fox jumps", ["x"]),
            ("b", "c2", 0, "the quick brown fox jumps", ["x"])]
    df = spark.createDataFrame(
        rows, "rec_key string, conv_id string, turn_idx int, norm_text string, tokens array<string>"
    )
    sigs = B.minhash_signatures(df, 16, 5, 42)
    blocks = B.lsh_blocks(sigs, 16, 4)
    by_key = {}
    for r in blocks.collect():
        by_key.setdefault(r["rec_key"], set()).add(r["block_key"])
    assert by_key["a"] == by_key["b"]
    assert len(by_key["a"]) == 4  # 16/4 bands


def test_minhash_determinism(spark):
    rows = [("a", "c1", 0, "some sample transcript text here", ["x"])]
    df = spark.createDataFrame(
        rows, "rec_key string, conv_id string, turn_idx int, norm_text string, tokens array<string>"
    )
    s1 = B.minhash_signatures(df, 8, 5, 42).collect()[0].asDict()
    s2 = B.minhash_signatures(df, 8, 5, 42).collect()[0].asDict()
    assert s1 == s2


def test_clustering_agreement_identity_and_known_split(spark):
    """Rand index from contingency counts: identical clusterings score
    1.0; a hand-computed split scores its exact value."""
    from entity_linking_spark.operators import evaluation as E2

    ca = spark.createDataFrame(
        [("r1", "c1"), ("r2", "c1"), ("r3", "c2"), ("r4", "c2")],
        "rec_key string, cluster_id string",
    )
    same = E2.clustering_agreement(ca, ca).collect()[0]
    assert same["rand_index"] == 1.0
    assert same["only_a"] == 0 and same["only_b"] == 0
    assert same["agree_both"] == 2  # C(2,2) pairs within each of 2 clusters

    # B splits c2: pairs = 6 total; agree_both = 1 (r1r2);
    # only_a = 1 (r3r4 same in A, split in B); only_b = 0; neither = 4
    cb = spark.createDataFrame(
        [("r1", "c1"), ("r2", "c1"), ("r3", "x"), ("r4", "y")],
        "rec_key string, cluster_id string",
    )
    split = E2.clustering_agreement(ca, cb).collect()[0]
    assert (split["agree_both"], split["only_a"], split["only_b"]) == (1, 1, 0)
    assert split["agree_neither"] == 4
    assert split["rand_index"] == round(5 / 6, 6)
