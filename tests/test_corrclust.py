"""Round-4 late additions — semantic known-answer tests:

* corrclust.pivot_clusters — verified against a pure-Python replay of the
  deterministic parallel-pivot rounds on a seeded random graph, plus the
  structural KwikCluster properties (partition validity, pivot membership,
  star adjacency, chain-split behavior vs transitive closure).
* clustering.cluster_cohesion — closed-form density / bridge-risk on a
  planted triangle + chain.
* blocking.suffix_blocks — exact suffix key sets, short-key fallback.
* conversations.boilerplate_turns — distinct-conversation (not turn)
  threshold, strip-all semantics.
* metablocking.progressive_pairs — budget + ordering + the
  TakeOrderedAndProject plan shape (no global sort).
"""

from __future__ import annotations

import hashlib
import os
import random
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import clustering as C
from entity_linking_spark.operators import conversations as CONV
from entity_linking_spark.operators import corrclust as KC
from entity_linking_spark.operators import metablocking as MB


def _pk(u: str) -> str:
    return hashlib.md5(u.encode()).hexdigest() + "|" + u


def _pivot_reference(edges: set[tuple[str, str]], rounds: int = 6) -> dict[str, str]:
    """Pure-Python replay of the deterministic parallel pivot rounds —
    the independent reference implementation the Spark operator must
    reproduce node-for-node."""
    e = {(a, b) for a, b in edges if a != b}
    asg: dict[str, str] = {}
    for _ in range(rounds):
        if not e:
            break
        nbrs: dict[str, set[str]] = {}
        for a, b in e:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        pivots = {u for u, ns in nbrs.items() if all(_pk(u) < _pk(v) for v in ns)}
        for u, ns in nbrs.items():
            pvs = [v for v in ns if v in pivots]
            if u in pivots:
                asg[u] = u
            elif pvs:
                asg[u] = min(pvs, key=_pk)
        e = {(a, b) for a, b in e if a not in asg and b not in asg}
    for a, b in e:
        asg.setdefault(a, a)
        asg.setdefault(b, b)
    return asg


def _edges_df(spark, edges):
    return spark.createDataFrame(
        sorted(edges), "a_key string, b_key string"
    )


def test_pivot_clusters_match_python_reference(spark):
    """Seeded Erdős–Rényi graph, 40 nodes: the Spark operator reproduces
    the pure-Python deterministic-pivot replay exactly."""
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(40)]
    edges = {
        (a, b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        if rng.random() < 0.08
    }
    got = {
        r["rec_key"]: r["cluster_id"]
        for r in KC.pivot_clusters(_edges_df(spark, edges)).collect()
    }
    assert got == _pivot_reference(edges)


def test_pivot_clusters_is_valid_star_partition(spark):
    """Every node appears exactly once; every cluster id is a member of
    its own cluster; every non-pivot member is ADJACENT to its pivot
    (KwikCluster clusters are stars of the positive graph, never
    chains)."""
    rng = random.Random(11)
    nodes = [f"m{i:02d}" for i in range(30)]
    edges = {
        (a, b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        if rng.random() < 0.12
    }
    rows = KC.pivot_clusters(_edges_df(spark, edges)).collect()
    seen = [r["rec_key"] for r in rows]
    assert len(seen) == len(set(seen))  # exactly-once assignment
    asg = {r["rec_key"]: r["cluster_id"] for r in rows}
    adj = edges | {(b, a) for a, b in edges}
    for u, c in asg.items():
        assert asg[c] == c  # the pivot itself is in its cluster
        if u != c:
            assert (u, c) in adj  # star: member adjacent to pivot


def test_pivot_clusters_split_chain_closure_merges(spark):
    """A 12-node path: transitive closure yields ONE cluster (the
    over-merge failure mode); KwikCluster splits it into several
    star-shaped clusters — the operator's reason to exist."""
    nodes = [f"p{i:02d}" for i in range(12)]
    edges = {(nodes[i], nodes[i + 1]) for i in range(11)}
    df = _edges_df(spark, edges)
    cc = C.connected_components(df)
    kc = KC.pivot_clusters(df)
    assert cc.select("cluster_id").distinct().count() == 1
    n_kc = kc.select("cluster_id").distinct().count()
    assert n_kc > 1
    # and it still covers every node exactly once
    assert kc.count() == 12


def test_pivot_clusters_with_singletons_covers_all_records(spark):
    records = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("z",)], "rec_key string"
    )
    out = KC.pivot_clusters_with_singletons(
        records, _edges_df(spark, {("a", "b")})
    )
    asg = {r["rec_key"]: r["cluster_id"] for r in out.collect()}
    assert set(asg) == {"a", "b", "c", "z"}
    assert asg["c"] == "c" and asg["z"] == "z"
    assert asg["a"] == asg["b"]


def _features_df(spark, rows):
    return spark.createDataFrame(
        rows, "a_key string, b_key string, inter long, uni long"
    )


def test_cluster_cohesion_triangle_vs_chain(spark):
    """Planted triangle {t1,t2,t3} (3 edges) and chain {c1,c2,c3}
    (2 edges): density 1e6 vs 666666, bridge_risk 0 vs 1, min/mean
    jacc from the planted integer features."""
    clusters = spark.createDataFrame(
        [("t1", "T"), ("t2", "T"), ("t3", "T"), ("c1", "X"), ("c2", "X"), ("c3", "X")],
        "rec_key string, cluster_id string",
    )
    feats = _features_df(
        spark,
        [
            ("t1", "t2", 1, 2),  # jacc 500000
            ("t1", "t3", 1, 4),  # jacc 250000
            ("t2", "t3", 3, 4),  # jacc 750000
            ("c1", "c2", 1, 1),  # jacc 1000000
            ("c2", "c3", 1, 2),  # jacc 500000
        ],
    )
    out = {r["cluster_id"]: r for r in C.cluster_cohesion(clusters, feats).collect()}
    t, x = out["T"], out["X"]
    assert (t["n_members"], t["n_edges"], t["density_micro"]) == (3, 3, 1_000_000)
    assert (t["min_jacc_micro"], t["mean_jacc_micro"], t["bridge_risk"]) == (
        250_000,
        500_000,
        0,
    )
    assert (x["n_members"], x["n_edges"], x["density_micro"]) == (3, 2, 666_666)
    assert (x["min_jacc_micro"], x["bridge_risk"]) == (500_000, 1)


def test_suffix_blocks_exact_keys(spark):
    """'jonathan' (len 8, min 4) → 5 suffix keys; a leading-typo variant
    'onathan' co-blocks on all 4 of its suffixes; short token 'ab' emits
    itself whole."""
    recs = spark.createDataFrame(
        [("r1", ["jonathan"]), ("r2", ["onathan"]), ("r3", ["ab"])],
        "rec_key string, tokens array<string>",
    )
    got = {
        (r["rec_key"], r["block_key"])
        for r in B.suffix_blocks(recs).collect()
    }
    j = {f"sx:{'jonathan'[i:]}" for i in range(5)}
    o = {f"sx:{'onathan'[i:]}" for i in range(4)}
    assert {k for rk, k in got if rk == "r1"} == j
    assert {k for rk, k in got if rk == "r2"} == o
    assert {k for rk, k in got if rk == "r3"} == {"sx:ab"}
    assert j & o == o  # every suffix of the typo'd key co-blocks


def _turn_records(spark, rows):
    return spark.createDataFrame(
        rows, "rec_key string, conv_id string, turn_idx int, norm_text string"
    )


def test_boilerplate_counts_distinct_conversations_not_turns(spark):
    """'hi' in 3 convs → boilerplate; 'rare' repeated 5× inside ONE conv
    → not boilerplate (the threshold is cross-conversation spread)."""
    rows = [(f"a#{i}", "a", i, "rare") for i in range(5)]
    rows += [(f"{c}#9", c, 9, "hi") for c in ("a", "b", "c")]
    rows += [("b#1", "b", 1, "keep me")]
    recs = _turn_records(spark, rows)
    boiler = {r["norm_text"]: r for r in CONV.boilerplate_turns(recs).collect()}
    assert set(boiler) == {"hi"}
    assert (boiler["hi"]["n_convs"], boiler["hi"]["n_turns"]) == (3, 3)
    kept = {r["rec_key"] for r in CONV.strip_boilerplate_turns(recs).collect()}
    # ALL occurrences of boilerplate drop; everything else survives
    assert kept == {f"a#{i}" for i in range(5)} | {"b#1"}


def test_progressive_pairs_budget_order_and_plan(spark):
    """Top-budget selection honors (js, cbs, keys) order, and the plan is
    TakeOrderedAndProject — a per-task bounded heap, not a global Sort
    exchange."""
    rows = [
        (f"a{i:03d}", f"b{i:03d}", (i * 7) % 5 + 1, (i * 13) % 1000 + 1)
        for i in range(500)
    ]
    w = spark.createDataFrame(rows, "a_key string, b_key string, cbs long, js_micro long")
    out = MB.progressive_pairs(w, budget=50)
    got = [(r["js_micro"], r["cbs"], r["a_key"]) for r in out.collect()]
    want = sorted(
        [(r[3], r[2], r[0]) for r in rows], key=lambda t: (-t[0], -t[1], t[2])
    )[:50]
    assert sorted(got, key=lambda t: (-t[0], -t[1], t[2])) == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


from entity_linking_spark.functions.jaro import jaro_winkler_py
from entity_linking_spark.operators import evaluation as EVAL
from entity_linking_spark.operators import scoring as S


def test_monge_elkan_known_answer(spark):
    """ME vs a hand-computed reference: token-reordered + typo'd record
    pair where whole-string JW collapses but ME stays high."""
    recs = spark.createDataFrame(
        [("r1", ["peter", "christen"]), ("r2", ["christen", "pedro"])],
        "rec_key string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("r1", "r2")], "a_key string, b_key string")
    row = S.monge_elkan(pairs, recs).collect()[0]

    def me(frm, to):
        return sum(max(jaro_winkler_py(a, b) for b in to) for a in frm) / len(frm)

    ab = me(["peter", "christen"], ["christen", "pedro"])
    ba = me(["christen", "pedro"], ["peter", "christen"])
    assert row["me_ab"] == round(ab, 6)
    assert row["me_ba"] == round(ba, 6)
    assert row["me_sym"] == round((ab + ba) / 2, 6)


def test_monge_elkan_asymmetry_subset(spark):
    """A record whose tokens are a subset of the other's scores 1.0 from
    the short side and < 1.0 from the long side — the documented ME
    asymmetry, and why both directions are returned."""
    recs = spark.createDataFrame(
        [("s", ["alpha", "beta"]), ("l", ["alpha", "beta", "gamma"])],
        "rec_key string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("l", "s")], "a_key string, b_key string")
    row = S.monge_elkan(pairs, recs).collect()[0]
    assert row["me_ba"] == 1.0  # subset side: every token has an exact mate
    assert row["me_ab"] < 1.0  # superset side: 'gamma' has no good mate


def test_monge_elkan_counts_duplicate_token_occurrences(spark):
    """ME's outer sum is over token OCCURRENCES: a duplicated unmatched
    token drags the mean twice."""
    recs = spark.createDataFrame(
        [
            ("d1", ["match", "zzz", "zzz"]),
            ("d2", ["match"]),
        ],
        "rec_key string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("d1", "d2")], "a_key string, b_key string")
    row = S.monge_elkan(pairs, recs).collect()[0]
    z = jaro_winkler_py("zzz", "match")
    assert row["me_ab"] == round((1.0 + z + z) / 3, 6)


def test_transitivity_conflicts_known_answer(spark):
    """Path a-b-c-d with (a,c) a scored candidate and (b,d) never
    compared: 2 two-hop pairs, 0 closed, 1 conflict, 1 unscored; closing
    (a,c) with an edge moves it to n_closed and opens two new two-hop
    pairs (a,d via c and b,c... already an edge)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "a_key string, b_key string"
    )
    cands = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        "a_key string, b_key string",
    )
    row = EVAL.transitivity_conflicts(edges, cands).collect()[0]
    assert (
        row["n_two_hop"], row["n_closed"], row["n_conflict"], row["n_unscored"]
    ) == (2, 0, 1, 1)
    edges2 = edges.union(
        spark.createDataFrame([("a", "c")], "a_key string, b_key string")
    )
    row2 = EVAL.transitivity_conflicts(edges2, cands).collect()[0]
    # two-hop closed now: (b,c) via a, (a,c) via b, (a,b) via c — the new
    # edge makes c a shared midpoint for (a,b) too
    assert row2["n_closed"] == 3
    assert row2["n_two_hop"] == row2["n_closed"] + row2["n_conflict"] + row2["n_unscored"]


def test_soft_tfidf_known_answer_and_theta(spark):
    """Hand-computed SoftTFIDF on a 3-doc corpus: at θ=0.9 the typo pair
    smith/smyth (JW≈0.893) does NOT align and only 'john' contributes;
    lowering θ to 0.88 admits it with its JW factor. Weights are
    tf·ln(N/df), L2-normalized per doc."""
    import math

    from entity_linking_spark.operators import tfidf as TFI

    recs = spark.createDataFrame(
        [("d1", ["smith", "john"]), ("d2", ["smyth", "john"]), ("d3", ["apple"])],
        "doc_id string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("d1", "d2")], "a_id string, b_id string")

    w_rare = math.log(3.0 / 1.0)  # smith / smyth / apple
    w_john = math.log(3.0 / 2.0)
    nrm = math.sqrt(w_rare**2 + w_john**2)  # same for d1 and d2
    jw_typo = jaro_winkler_py("smith", "smyth")
    assert 0.88 < jw_typo < 0.9  # the planted θ boundary

    got_strict = TFI.pair_soft_tfidf(pairs, recs).collect()[0]["soft_tfidf"]
    want_strict = (w_john * w_john * 1.0) / (nrm * nrm)
    assert got_strict == round(want_strict, 6)

    got_loose = TFI.pair_soft_tfidf(pairs, recs, theta_e9=880_000_000).collect()[
        0
    ]["soft_tfidf"]
    want_loose = (w_john * w_john * 1.0 + w_rare * w_rare * jw_typo) / (nrm * nrm)
    assert got_loose == round(want_loose, 6)


def test_soft_tfidf_degenerates_to_cosine_on_exact_tokens(spark):
    """On a pair whose aligned tokens are all EXACT matches, SoftTFIDF
    equals the tfidf cosine (its θ=1 special case) — here the two docs
    share disjoint-vs-shared tokens chosen so no cross-token JW clears
    θ=0.9."""
    from entity_linking_spark.operators import tfidf as TFI

    recs = spark.createDataFrame(
        [
            ("d1", ["zebra", "quorum", "shared"]),
            ("d2", ["matrix", "shared", "puddle"]),
            ("d3", ["filler"]),
        ],
        "doc_id string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("d1", "d2")], "a_id string, b_id string")
    for a in ["zebra", "quorum", "shared"]:
        for b in ["matrix", "shared", "puddle"]:
            if a != b:
                assert jaro_winkler_py(a, b) < 0.9
    soft = TFI.pair_soft_tfidf(pairs, recs).collect()[0]["soft_tfidf"]
    cos = TFI.pair_tfidf_cosine(pairs, recs).collect()[0]["cosine"]
    assert soft == cos > 0


def test_block_family_stats_cap_audit(spark):
    """Planted two families: 'tk' with blocks of size 3 and 5 (cap 4 →
    the 5-block drops), 'mh0/mh1' collapsing to family 'mh'. Exact
    integer pair budgets."""
    rows = [(f"r{i}", "tk:a") for i in range(3)]
    rows += [(f"s{i}", "tk:b") for i in range(5)]
    rows += [("x1", "mh0:h1"), ("x2", "mh0:h1"), ("x3", "mh1:h2")]
    blocked = spark.createDataFrame(rows, "rec_key string, block_key string")
    out = {r["family"]: r for r in B.block_family_stats(blocked, cap=4).collect()}
    tk, mh = out["tk"], out["mh"]
    assert (tk["n_blocks"], tk["n_entries"], tk["max_block"]) == (2, 8, 5)
    assert (tk["n_blocks_over"], tk["entries_dropped"]) == (1, 5)
    assert (tk["pairs_kept"], tk["pairs_dropped"]) == (3, 10)  # C(3,2), C(5,2)
    assert (mh["n_blocks"], mh["n_entries"], mh["max_block"]) == (2, 3, 2)
    assert (mh["pairs_kept"], mh["pairs_dropped"]) == (1, 0)
