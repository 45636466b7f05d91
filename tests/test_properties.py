"""Property-based tests (hypothesis) for the scalar function layer, plus
calibration-sweep tests.

The reference has no property tests (SURVEY.md §5.1: golden asserts run
from main); these pin the algebraic invariants the pipeline depends on.
Pure-Python properties run without Spark (fast, hundreds of cases); the
Spark expressions are separately proven equal to DuckDB by the parity
suite, so testing the shared semantics once here suffices.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_linking_spark.operators.scoring import jaro_winkler_py

# the normalizer semantics, replicated in pure python from the same spec
# the Spark/DuckDB templates implement (functions/normalize.py)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def normalize_py(s: str) -> str:
    for _ in range(2):
        for ent, ch in _ENTITIES:
            s = s.replace(ent, ch)
    s = s.lower()
    s = re.sub(r"<[^>]*>", " ", s)
    s = re.sub(r"[^a-z0-9]+", " ", s)
    return s.strip()


texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=80
)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(s):
    """normalize(normalize(x)) == normalize(x) — blocking keys must be a
    fixpoint or two engines normalizing different numbers of times would
    diverge."""
    once = normalize_py(s)
    assert normalize_py(once) == once


@given(texts)
@settings(max_examples=300, deadline=None)
def test_normalize_output_charset(s):
    """Output is lowercase alphanumeric words separated by single
    spaces — the contract the tokenizer's whitespace split relies on."""
    out = normalize_py(s)
    assert re.fullmatch(r"([a-z0-9]+( [a-z0-9]+)*)?", out), out


short = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30)


@given(short, short)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_bounds_and_symmetry_axioms(a, b):
    v = jaro_winkler_py(a, b)
    assert 0.0 <= v <= 1.0
    assert jaro_winkler_py(a, a) == 1.0 or a == ""
    # jaro is symmetric; winkler prefix bonus uses the common prefix,
    # also symmetric
    assert jaro_winkler_py(a, b) == pytest.approx(jaro_winkler_py(b, a), abs=1e-12)


# ---------------------------------------------------------------------------
# calibration sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_counts(spark):
    from entity_linking_spark.operators.calibration import (
        best_threshold,
        threshold_sweep,
    )

    # 4 gold pairs scoring high, 4 non-gold scoring low, 2 hard non-gold
    # scoring high (FP band), 1 gold scoring low (FN band)
    rows = (
        [(0.95, 1)] * 4
        + [(0.10, 0)] * 4
        + [(0.90, 0)] * 2
        + [(0.15, 1)]
    )
    df = spark.createDataFrame(rows, "score double, gold_match int")
    sweep = {r["threshold"]: r for r in threshold_sweep(df, grid=20).collect()}
    assert len(sweep) == 20
    # at t=0.5: predicted = 6 (4 tp + 2 fp), fn = 1
    mid = sweep[0.5]
    assert (mid["tp"], mid["fp"], mid["fn"]) == (4, 2, 1)
    # at t=0.05: everything predicted
    low = sweep[0.05]
    assert (low["tp"], low["fp"], low["fn"]) == (5, 6, 0)
    # monotone: tp non-increasing in threshold
    tps = [sweep[t]["tp"] for t in sorted(sweep)]
    assert tps == sorted(tps, reverse=True)
    best = best_threshold(threshold_sweep(df, grid=20))
    assert best["f1"] >= mid["f1"]


def test_threshold_sweep_on_pipeline_scores(spark):
    """End-to-end: sweep the logistic scorer on a seeded fixture; the
    best threshold must reach high F1 (the calibration target the
    north_star's 'calibrated logistic combiner' refers to)."""
    from entity_linking_spark.operators import blocking as B
    from entity_linking_spark.operators import evaluation as E
    from entity_linking_spark.operators import pairs as P
    from entity_linking_spark.operators import scoring as S
    from entity_linking_spark.operators.calibration import (
        best_threshold,
        threshold_sweep,
    )
    from entity_linking_spark.plans.pipeline import LinkingConfig, build_blocks
    from entity_linking_spark.sources.transcripts import synth_transcripts

    cfg = LinkingConfig()
    tdf, gold = synth_transcripts(spark, n_convs=40, n_entities=8, seed=17)
    records = B.prepare_records(tdf)
    prs = P.block_pairs(build_blocks(records, cfg), cfg.block_cap)
    scored = S.scored_pairs(S.pair_features(prs, records))
    labeled = E.pair_labels(
        scored.select("a_key", "b_key"), gold, records
    ).join(scored.select("a_key", "b_key", "score"), ["a_key", "b_key"])
    best = best_threshold(threshold_sweep(labeled))
    assert best["f1"] >= 0.97, best


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef 01é", max_size=90),
            st.text(alphabet="abcdef 01é", max_size=90),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_jaro_batch_kernel_equals_scalar(pairs):
    """Property: the numpy bit-parallel batch kernel is bit-identical to
    the scalar reference on arbitrary inputs, including the non-ascii
    fallback path (é forces UTF-8 byte semantics)."""
    import numpy as np

    from entity_linking_spark.functions.jaro import (
        jaro_winkler_batch,
        jaro_winkler_py,
    )

    got = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    want = np.array([jaro_winkler_py(a, b) for a, b in pairs])
    assert got.shape == want.shape
    if len(pairs):
        assert np.max(np.abs(got - want)) == 0.0
