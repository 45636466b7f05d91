"""DSIR importance scoring: target-likeness semantics, integer
exactness / partition invariance, and the zero-shuffle scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import dsir as DSIR


@pytest.fixture(scope="module")
def corpus(spark):
    # two vocabularies: target docs speak "alpha", others speak "zeta"
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta alpha beta", "en", "src0", 30))
    for i in range(30, 60):
        rows.append((i, "zeta eta theta iota zeta eta", "zh", "src1", 30))
    # one mixed doc: half target vocabulary
    rows.append((60, "alpha beta zeta eta", "fr", "src2", 20))
    # one empty doc
    rows.append((61, "", "fr", "src2", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_target_docs_score_highest(spark, corpus):
    out = {r["doc_id"]: r["dsir_score_micro"] for r in DSIR.dsir_scores(corpus).collect()}
    en = [out[i] for i in range(30)]
    zh = [out[i] for i in range(30, 60)]
    assert min(en) > out[60] > max(zh)  # target > mixed > off-target
    assert all(v > 0 for v in en) and all(v < 0 for v in zh)


def test_empty_doc_scores_zero(spark, corpus):
    row = DSIR.dsir_scores(corpus).filter(F.col("doc_id") == 61).collect()[0]
    assert row["n_feats"] == 0
    assert row["dsir_score_micro"] == 0


def test_partition_invariant_and_model_reuse(spark, corpus):
    model = DSIR.dsir_model(corpus, F.col("lang") == "en")
    s1 = sorted(tuple(r) for r in DSIR.dsir_scores(corpus, model=model).collect())
    s2 = sorted(
        tuple(r)
        for r in DSIR.dsir_scores(corpus.repartition(13), model=model).collect()
    )
    assert s1 == s2
    assert len(model) == DSIR.DSIR_BUCKETS
    assert all(isinstance(v, int) for v in model)


def test_model_matches_python_recount(spark, corpus):
    """The driver-built model equals an independent python recount of the
    hashed features (uses the portable md5 bucket directly)."""
    import hashlib

    def bucket(feat: str) -> int:
        h = hashlib.md5((feat + "\x1f77").encode()).hexdigest()
        return int(h[:15], 16) % DSIR.DSIR_BUCKETS

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for r in corpus.collect():
        toks = [t for t in r["text"].lower().split(" ") if t]
        feats = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        for f_ in feats:
            b = bucket(f_)
            raw[b] = raw.get(b, 0) + 1
            if r["lang"] == "en":
                tgt[b] = tgt.get(b, 0) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    expect = [
        DSIR._log_ratio_micro(tgt.get(b, 0), nt, raw.get(b, 0), nr, DSIR.DSIR_BUCKETS)
        for b in range(DSIR.DSIR_BUCKETS)
    ]
    assert DSIR.dsir_model(corpus, F.col("lang") == "en") == expect


def test_scoring_plan_zero_shuffle(spark, corpus):
    model = DSIR.dsir_model(corpus, F.col("lang") == "en")
    df = DSIR.dsir_scores(corpus, model=model)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_resample_biases_toward_target(spark, corpus):
    out = DSIR.dsir_resample(corpus, k=20).collect()
    assert len(out) == 20
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 21))
    # en docs carry ~+200k micronat scores vs ~-200k for zh: with Gumbel
    # noise of O(1) nats the selection must be essentially all-target
    langs = [r["lang"] for r in out]
    assert langs.count("en") >= 18


def test_resample_partition_invariant(spark, corpus):
    model = DSIR.dsir_model(corpus, F.col("lang") == "en")
    s1 = [tuple(r) for r in DSIR.dsir_resample(corpus, k=15, model=model).collect()]
    s2 = [
        tuple(r)
        for r in DSIR.dsir_resample(corpus.repartition(11), k=15, model=model).collect()
    ]
    assert s1 == s2


def test_resample_keys_are_descending_and_distinct_docs(spark, corpus):
    out = DSIR.dsir_resample(corpus, k=25).orderBy("rank").collect()
    keys = [r["gumbel_key"] for r in out]
    assert keys == sorted(keys, reverse=True)
    assert len({r["doc_id"] for r in out}) == len(out)
