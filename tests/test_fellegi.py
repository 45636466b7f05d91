"""Fellegi–Sunter EM fit + ER evaluation metrics (ARI, B-cubed, blocking
quality) — semantic unit tests on hand-built fixtures with known answers,
plus plan pins for the module's scale claims (one exchange for the fit;
zero-extra-shuffle scoring under explicit params)."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_linking_spark.operators import evaluation as EVAL
from entity_linking_spark.operators import fellegi as FS

FEATURE_SCHEMA = (
    "a_key string, b_key string, a_norm string, b_norm string, "
    "inter int, uni int, lev int, maxlen int, exact int"
)


def _feat(a, b, inter, uni, lev, maxlen, exact):
    return (a, b, "x", "y", inter, uni, lev, maxlen, exact)


def _separable_features(spark, n_match=40, n_diff=160):
    """n_match clear matches (exact, full overlap, lev 0) and n_diff clear
    non-matches (no overlap, lev == maxlen)."""
    rows = [
        _feat(f"m{i}a", f"m{i}b", 5, 5, 0, 10, 1) for i in range(n_match)
    ] + [
        _feat(f"d{i}a", f"d{i}b", 0, 10, 10, 10, 0) for i in range(n_diff)
    ]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def test_em_separates_clear_mixture(spark):
    feats = _separable_features(spark)
    params = FS.fit_fs_em_spark(feats)
    # λ converges to the true match fraction (40/200 = 20%)
    assert abs(params["lam"] - 200_000) < 5_000
    # matches favor agreement levels, non-matches favor disagreement
    assert params["m1_1"] > 900_000 and params["u1_1"] < 100_000
    assert params["m2_2"] > 900_000 and params["u2_0"] > 900_000
    scored = FS.fs_match_scores(feats, params=params).collect()
    by_key = {r["a_key"]: r for r in scored}
    assert all(by_key[f"m{i}a"]["fs_match"] == 1 for i in range(40))
    assert all(by_key[f"d{i}a"]["fs_match"] == 0 for i in range(160))
    # posterior is the pinned-tree micro quantity
    r = by_key["m0a"]
    g = (r["g_exact"], r["g_jacc"], r["g_lev"])
    assert g == (1, 2, 2)
    expect = FS._posterior_micro(
        params["lam"], params["m1_1"], params["m2_2"], params["m3_2"],
        params["u1_1"], params["u2_2"], params["u3_2"],
    )
    assert r["posterior_micro"] == expect


def test_em_empty_input_returns_init(spark):
    feats = spark.createDataFrame([], FEATURE_SCHEMA)
    params = FS.fit_fs_em_spark(feats)
    init = FS._params_flat(FS.FS_INIT["lam"], FS.FS_INIT["m"], FS.FS_INIT["u"])
    assert params == init
    card = FS.fs_em_params(feats).collect()[0]
    assert card["n_pairs"] == 0 and card["lam"] == init["lam"]


def test_em_driver_fit_is_pure_function():
    """The driver fit is deterministic from the pattern multiset (order-free
    M-step) — permuting pattern rows cannot change the trajectory."""
    pats = [
        {"g_exact": 1, "g_jacc": 2, "g_lev": 2, "n": 37},
        {"g_exact": 0, "g_jacc": 0, "g_lev": 0, "n": 211},
        {"g_exact": 0, "g_jacc": 1, "g_lev": 1, "n": 13},
        {"g_exact": 1, "g_jacc": 1, "g_lev": 2, "n": 5},
    ]
    a = FS.fit_fs_em(pats)
    b = FS.fit_fs_em(list(reversed(pats)))
    assert a == b
    assert all(1 <= v <= FS.MICRO - 1 for v in a.values())


def test_fs_plan_shapes(spark):
    """Scale pins: the pattern table is ONE exchange over the pair set;
    scoring under explicit params adds ZERO exchanges and ZERO joins."""
    feats = _separable_features(spark)
    pat_plan = FS.gamma_patterns(feats)._jdf.queryExecution().executedPlan().toString()
    assert pat_plan.count("Exchange") == 1
    params = FS._params_flat(FS.FS_INIT["lam"], FS.FS_INIT["m"], FS.FS_INIT["u"])
    score_plan = (
        FS.fs_match_scores(feats, params=params)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in score_plan
    assert "Join" not in score_plan


def test_fs_tf_adjustment_demotes_common_promotes_rare(spark):
    """TF adjustment (Splink semantics): among exact-agreeing pairs under
    identical γ, the pair sharing a COMMON value scores strictly below
    the pair sharing a RARE value; non-exact pairs are untouched; the
    adjusted posterior is the pinned tree with u1 = clamped micro tf."""
    records = spark.createDataFrame(
        [(f"c{i}", "hello there") for i in range(10)]
        + [("r0", "zkx 9914 ledger"), ("r1", "zkx 9914 ledger")],
        "rec_key string, norm_text string",
    )
    n = 12
    feats = spark.createDataFrame(
        [
            ("c0", "c1", "hello there", "hello there", 5, 5, 0, 10, 1),
            ("r0", "r1", "zkx 9914 ledger", "zkx 9914 ledger", 5, 5, 0, 10, 1),
            ("c2", "r0", "hello there", "zkx 9914 ledger", 0, 10, 10, 10, 0),
        ],
        FEATURE_SCHEMA,
    )
    params = FS._params_flat(FS.FS_INIT["lam"], FS.FS_INIT["m"], FS.FS_INIT["u"])
    rows = {
        r["a_key"]: r
        for r in FS.fs_tf_match_scores(feats, records, params=params).collect()
    }
    common, rare, diff = rows["c0"], rows["r0"], rows["c2"]
    assert common["n_v"] == 10 and rare["n_v"] == 2
    assert common["posterior_tf_micro"] < rare["posterior_tf_micro"]
    # both demoted vs the global-u posterior here (init u1_1 is tiny)
    assert common["posterior_tf_micro"] < common["posterior_micro"]
    # non-exact pairs: adjustment is a no-op
    assert diff["posterior_tf_micro"] == diff["posterior_micro"]
    # exact replay of the pinned tree with u1 = (1e6 * n_v) div N
    for r in (common, rare):
        want = FS._posterior_micro(
            params["lam"], params["m1_1"], params["m2_2"], params["m3_2"],
            max(1, min(FS.MICRO - 1, (FS.MICRO * r["n_v"]) // n)),
            params["u2_2"], params["u3_2"],
        )
        assert r["posterior_tf_micro"] == want


def _clusters(spark, assign):
    return spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "rec_key string, cluster_id string"
    )


def test_adjusted_rand_identical_and_known(spark):
    a = _clusters(spark, {"r1": "x", "r2": "x", "r3": "y", "r4": "y"})
    ident = EVAL.adjusted_rand(a, a).collect()[0]
    assert ident["ari"] == 1.0
    # a = {r1,r2},{r3,r4}; b = {r1,r2,r3},{r4}:
    # agree_both=1, same_a=2, same_b=3, pairs_total=6
    # E = 2*3/6 = 1; num = 1-1 = 0; den = 2.5-1 = 1.5 → ARI 0
    b = _clusters(spark, {"r1": "p", "r2": "p", "r3": "p", "r4": "q"})
    r = EVAL.adjusted_rand(a, b).collect()[0]
    assert (r["agree_both"], r["same_a"], r["same_b"]) == (1, 2, 3)
    assert r["ari"] == 0.0
    # all-singleton vs all-singleton hits the den==0 convention
    s = _clusters(spark, {"r1": "1", "r2": "2", "r3": "3", "r4": "4"})
    assert EVAL.adjusted_rand(s, s).collect()[0]["ari"] == 1.0


def test_bcubed_identical_and_known(spark):
    truth = _clusters(spark, {"r1": "x", "r2": "x", "r3": "x", "r4": "y"})
    ident = EVAL.bcubed(truth, truth).collect()[0]
    assert ident["bcubed_precision_micro"] == 1_000_000
    assert ident["bcubed_recall_micro"] == 1_000_000
    assert ident["bcubed_f1_micro"] == 1_000_000
    # clusters = {r1,r2},{r3,r4}; truth = {r1,r2,r3},{r4}
    # precision: cells (a,b): {r1,r2}→x:2 ; {r3,r4}→x:1,y:1
    #   per a-cluster: 4/2=2.0 and (1+1)/2=1.0 → Σq = 2e6+1e6, P = 3e6/4
    # recall: per truth cluster x: (4+1)/3 ; y: 1/1 → floor(5e6/3)+1e6, /4
    pred = _clusters(spark, {"r1": "p", "r2": "p", "r3": "q", "r4": "q"})
    r = EVAL.bcubed(pred, truth).collect()[0]
    assert r["bcubed_precision_micro"] == 750_000
    assert r["bcubed_recall_micro"] == (math.floor(5_000_000 / 3) + 1_000_000) // 4
    p, rr = r["bcubed_precision_micro"], r["bcubed_recall_micro"]
    assert r["bcubed_f1_micro"] == math.floor((2.0 * p) * rr / float(p + rr))


def test_blocking_quality_known(spark):
    clusters = _clusters(
        spark, {"r1": "x", "r2": "x", "r3": "x", "r4": "y", "r5": "y"}
    )
    # intra-total = C(3,2)+C(2,2) = 3+1 = 4; candidates enumerate 3 of the
    # 4 intra pairs plus one cross pair
    pairs = spark.createDataFrame(
        [("r1", "r2"), ("r2", "r3"), ("r4", "r5"), ("r1", "r4")],
        "a_key string, b_key string",
    )
    r = EVAL.blocking_quality(pairs, clusters).collect()[0]
    assert r["n_records"] == 5
    assert r["n_candidate_pairs"] == 4
    assert r["n_intra_candidates"] == 3
    assert r["n_intra_total"] == 4
    assert r["pairs_completeness_micro"] == 750_000
    # reduction ratio = 1 - 4/C(5,2) = 1 - 0.4 = 0.6
    assert r["reduction_ratio_micro"] == 600_000


def test_blocking_family_quality_grouped_known(spark):
    """The grouped audit reproduces the ungrouped metrics per family and
    keeps families independent (a family absent from the join output
    simply has no row)."""
    clusters = _clusters(
        spark, {"r1": "x", "r2": "x", "r3": "x", "r4": "y", "r5": "y"}
    )
    labeled = spark.createDataFrame(
        # family A == the ungrouped known-answer case above; family B
        # enumerates one intra pair only
        [("A", "r1", "r2"), ("A", "r2", "r3"), ("A", "r4", "r5"),
         ("A", "r1", "r4"), ("B", "r4", "r5")],
        "family string, a_key string, b_key string",
    )
    rows = {
        r["family"]: r
        for r in EVAL.blocking_family_quality(labeled, clusters).collect()
    }
    assert set(rows) == {"A", "B"}
    a, b = rows["A"], rows["B"]
    assert (a["n_candidate_pairs"], a["n_intra_candidates"]) == (4, 3)
    assert a["pairs_completeness_micro"] == 750_000
    assert a["reduction_ratio_micro"] == 600_000
    assert (b["n_candidate_pairs"], b["n_intra_candidates"]) == (1, 1)
    assert b["pairs_completeness_micro"] == 250_000
    # 1 - 1/10 = 0.9
    assert b["reduction_ratio_micro"] == 900_000
    assert a["n_intra_total"] == b["n_intra_total"] == 4
