"""Feature-hashed embedding invariants: self-cosine 1, empty-text 0,
symmetry, and the zero-shuffle plan for embedding construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.functions.embed import hashed_embedding_col
from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import scoring as S


@pytest.fixture(scope="module")
def recs(spark):
    rows = [
        ("a", 0, "user", "alpha beta beta gamma", None, None),
        ("b", 0, "user", "alpha beta gamma", None, None),
        ("c", 0, "user", "", None, None),
        ("d", 0, "user", "zeta", None, None),
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    return B.prepare_records(tdf)


def _pairs(spark, keys):
    return spark.createDataFrame(keys, "a_key string, b_key string")


def _cos(spark, recs, a, b, **kw):
    out = S.pair_embedding_cosine(
        _pairs(spark, [(f"{a}#000000", f"{b}#000000")]), recs, **kw
    ).collect()
    return out[0]["emb_cos"]


@pytest.mark.parametrize("mode", ["portable", "fast"])
def test_self_and_empty_cosine(spark, recs, mode):
    assert _cos(spark, recs, "a", "a", hash_mode=mode) == 1.0
    # empty text embeds to the zero vector -> guarded 0.0, not NaN/NULL
    assert _cos(spark, recs, "c", "a", hash_mode=mode) == 0.0
    assert _cos(spark, recs, "c", "c", hash_mode=mode) == 0.0


def test_symmetry_and_range(spark, recs):
    ab = _cos(spark, recs, "a", "b")
    ba = _cos(spark, recs, "b", "a")
    assert ab == ba and -1.0 <= ab <= 1.0
    # near-identical texts should score far above unrelated ones
    assert ab > _cos(spark, recs, "a", "d")


def test_embedding_projection_is_shuffle_free(spark, recs):
    embs = recs.select(
        "rec_key", hashed_embedding_col(F.col("tokens")).alias("emb")
    )
    plan = embs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
