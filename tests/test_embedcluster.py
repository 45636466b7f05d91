"""k-means + SemDeDup: exactness vs an independent numpy Lloyd's,
partition invariance, dedup semantics, and the zero-join scan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import embedcluster as EC

DIM = 8
K = 3
ITERS = 3


def _numpy_kmeans(vecs: np.ndarray, k: int, iters: int):
    """Independent integer Lloyd's reference (same init / tie / floor-div
    semantics, written against numpy not DataFrames)."""
    x = np.floor(vecs.astype(np.float64) * EC.SCALE).astype(np.int64)
    cents = {i: x[i].copy() for i in range(k)}

    def assign(cents):
        cells = sorted(cents)
        d = np.stack([((x - cents[c]) ** 2).sum(axis=1) for c in cells], axis=1)
        return np.array([cells[j] for j in d.argmin(axis=1)])  # argmin → first (lowest cell) on ties

    a = assign(cents)
    for _ in range(iters - 1):
        cents = {
            int(c): np.array([int(s) // int((a == c).sum()) for s in x[a == c].sum(axis=0)])
            for c in np.unique(a)
        }
        a = assign(cents)
    return a, cents, x


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    # three planted blobs, interleaved round-robin (vec i → blob i % 3) so
    # the first-k init seeds one centroid per blob; plus one exact dup pair
    per_blob = [rng.normal(loc=m, scale=0.05, size=(12, DIM)) for m in (-0.5, 0.25, 0.5)]
    blobs = np.stack([per_blob[i % 3][i // 3] for i in range(36)])
    blobs[6] = blobs[3]  # exact dup pair (3,6), both blob 0
    blobs = np.clip(blobs, -1, 1)
    rows = [(i, [float(v) for v in blobs[i]], 0) for i in range(len(blobs))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return df, blobs


def test_kmeans_matches_numpy_reference(spark, emb_df):
    df, blobs = emb_df
    assigned, cents = EC.kmeans_fit(df, k=K, iters=ITERS, dim=DIM)
    # float32 storage round-trip: quantize from the float32 values
    vecs32 = np.array(blobs, dtype=np.float32)
    ref_a, ref_c, _ = _numpy_kmeans(vecs32, K, ITERS)
    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert got == {i: int(ref_a[i]) for i in range(len(blobs))}
    assert set(cents) == set(int(c) for c in ref_c)
    for c in cents:
        assert cents[c] == [int(v) for v in ref_c[c]]


def test_kmeans_partition_invariant(spark, emb_df):
    df, _ = emb_df
    s1 = EC.kmeans_stats(df, k=K, iters=ITERS, dim=DIM).collect()
    s2 = EC.kmeans_stats(df.repartition(7), k=K, iters=ITERS, dim=DIM).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(s1) == key(s2)


def test_kmeans_separates_planted_blobs(spark, emb_df):
    df, _ = emb_df
    assigned, _ = EC.kmeans_fit(df, k=K, iters=ITERS, dim=DIM)
    cells = [r["cell"] for r in assigned.orderBy("vec_id").collect()]
    # each planted blob lands in one cell, three distinct cells
    for blob in range(3):
        assert len({cells[i] for i in range(blob, 36, 3)}) == 1
    assert len(set(cells)) == 3


def test_semdedup_flags_planted_duplicate(spark, emb_df):
    df, _ = emb_df
    out = {
        r["vec_id"]: r["is_dup"]
        for r in EC.semdedup_drops(df, k=K, iters=ITERS, tau=0.999, dim=DIM).collect()
    }
    assert len(out) == 36
    # exact dup pair (3,6): keeper = lower id, drop = higher id
    assert out[3] == 0
    assert out[6] == 1
    # at tau≈1 nothing else in the scattered blobs is a duplicate
    assert sum(out.values()) == 1


def test_semdedup_never_pairs_across_cells(spark, emb_df):
    df, _ = emb_df
    # tau = -1 makes every within-cell pair a hit: exactly one keeper
    # (the min id) survives per cell — pairs are provably cell-local,
    # because a cross-cell pair would let a foreign lower id flag a
    # cell's keeper
    out = EC.semdedup_drops(df, k=K, iters=ITERS, tau=-1.0, dim=DIM)
    per_cell = (
        out.groupBy("cell")
        .agg(F.sum("is_dup").alias("drops"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["drops"] == r["n"] - 1 for r in per_cell)


def test_semdedup_hot_cell_pair_count_is_bounded(spark):
    """VERDICT r3 item 1: one hot cell (200 near-identical vectors) must
    cost O(cell·window) comparisons, not O(cell²) — the bound is enforced
    by the explode+equi-join plan shape, so the enumerated pair count is
    exactly Σ min(rnk−1, window) regardless of how hot the cell runs."""
    n_hot, n_cold, w = 200, 8, 4
    rng = np.random.RandomState(11)
    hot = np.tile(np.full(DIM, 0.5), (n_hot, 1)) + rng.normal(0, 1e-4, (n_hot, DIM))
    cold = rng.normal(loc=-0.5, scale=0.05, size=(n_cold, DIM))
    # interleave so the first-k init seeds one centroid per blob
    vecs = np.clip(np.concatenate([hot[:1], cold[:1], hot[1:], cold[1:]]), -1, 1)
    rows = [(i, [float(v) for v in vecs[i]], 0) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    pairs = EC.semdedup_pairs(df, k=2, iters=2, dim=DIM, window=w)
    per_cell = {
        r["cell"]: r["n"]
        for r in pairs.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    expected = lambda n: sum(min(r - 1, w) for r in range(1, n + 1))
    assert sorted(per_cell.values()) == sorted([expected(n_hot), expected(n_cold)])
    assert pairs.count() <= (n_hot + n_cold) * w

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan  # the window is an equi-join on (cell, rank)

    # the hot cell still deduplicates: identical vectors are rank-adjacent,
    # so everything except the rank-1 representative is dropped
    out = EC.semdedup_drops(df, k=2, iters=2, tau=0.999, dim=DIM, window=w)
    hot_ids = {0} | set(range(2, n_hot + 1))
    drops = {r["vec_id"] for r in out.filter(F.col("is_dup") == 1).collect()}
    assert len(hot_ids - drops) == 1  # exactly one kept representative
    assert drops <= hot_ids  # the scattered cold blob has no 0.999-dups


def test_semdedup_window_limits_comparisons(spark, emb_df):
    """window=1 compares only rank-adjacent members: with tau=-1 every
    comparison is a hit, so drops per cell are still n−1 (each rank>1
    member is flagged by its immediate predecessor)."""
    df, _ = emb_df
    out = EC.semdedup_drops(df, k=K, iters=ITERS, tau=-1.0, dim=DIM, window=1)
    per_cell = (
        out.groupBy("cell")
        .agg(F.sum("is_dup").alias("drops"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["drops"] == r["n"] - 1 for r in per_cell)


def test_kmeans_assignment_plan_has_no_join(spark, emb_df):
    df, _ = emb_df
    assigned, _ = EC.kmeans_fit(df, k=K, iters=ITERS, dim=DIM)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # centroids are literal expressions, not a table
    assert "Exchange" not in plan  # assignment is a pure per-row scan
