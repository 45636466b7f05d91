"""BPE merge learning: hand-computed merge sequence (the HF tutorial
corpus), learn+apply conservation, tie rules, and repeat semantics."""

from __future__ import annotations

import pytest

from entity_linking_spark.operators import bpe as BPE


def _records(spark, words: dict[str, int]):
    toks = [w for w, c in sorted(words.items()) for _ in range(c)]
    return spark.createDataFrame([(1, toks)], "doc_id long, tokens array<string>")


@pytest.fixture(scope="module")
def corpus(spark):
    return _records(
        spark, {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}
    )


def test_merge_sequence_matches_hand_computation(spark, corpus):
    merges, _ = BPE.learn_merges(corpus, n_merges=6)
    assert [(p, m, f) for _, p, m, f in merges] == [
        ("u g", "ug", 20),
        ("u n", "un", 16),
        ("h ug", "hug", 15),
        ("p un", "pun", 12),
        ("hug s", "hugs", 5),  # tie at 5 with 'p ug': 'h' < 'p' wins
        ("p ug", "pug", 5),
    ]


def test_token_counts_after_full_merge(spark, corpus):
    out = {
        r["token"]: (r["n_words"], r["n_occurrences"])
        for r in BPE.bpe_token_counts(corpus, n_merges=6).collect()
    }
    # every word except bun merges whole; bun stops at ' b un '
    assert out == {
        "hug": (1, 10),
        "pug": (1, 5),
        "pun": (1, 12),
        "hugs": (1, 5),
        "b": (1, 4),
        "un": (1, 4),
    }


def test_character_mass_is_conserved(spark, corpus):
    """Σ occurrences·len(token) is invariant under merging (tokens only
    concatenate, never drop characters)."""
    before = BPE.bpe_token_counts(corpus, n_merges=0).collect()
    after = BPE.bpe_token_counts(corpus, n_merges=6).collect()
    mass = lambda rows: sum(len(r["token"]) * r["n_occurrences"] for r in rows)
    assert mass(before) == mass(after)


def test_doc_tokens_budget(spark, corpus):
    """Per-doc token accounting under a vocab learned elsewhere: bun is
    2 subwords (' b un ') after 6 merges, everything else merges whole."""
    _, vocab = BPE.learn_merges(corpus, n_merges=6)
    docs = spark.createDataFrame(
        [(1, ["hug", "hug", "pun"]), (2, ["bun", "hugs"])],
        "doc_id long, tokens array<string>",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in BPE.bpe_doc_tokens(docs, vocab=vocab).collect()
    }
    assert out == {1: (3, 3), 2: (2, 3)}


def test_learning_stops_when_no_pairs_remain(spark, corpus):
    # 6 merges exhaust every multi-symbol word except bun's final pair;
    # asking for 20 learns exactly one more ('b un') then stops
    merges, _ = BPE.learn_merges(corpus, n_merges=20)
    assert len(merges) == 7
    assert merges[-1][1:] == ("b un", "bun", 4)


def test_adjacent_repeat_merges_alternate_occurrences(spark):
    """' a a a a ' under merge 'a a': the string-replace scan consumes
    the shared boundary space, so one round merges alternating pairs and
    the next round finishes — deterministic and engine-consistent (the
    documented deviation from greedy in-round BPE)."""
    recs = _records(spark, {"aaaa": 1})
    m1, v1 = BPE.learn_merges(recs, n_merges=1)
    assert m1 == [(1, "a a", "aa", 3)]
    assert v1.collect()[0]["sym"] == " aa a a "
    m2, v2 = BPE.learn_merges(recs, n_merges=2)
    assert m2[1][1:] == ("a a", "aa", 1)
    assert v2.collect()[0]["sym"] == " aa aa "


def test_doc_tokens_oov_falls_back_to_characters(spark, corpus):
    """ADVICE r3: with a PRE-TRAINED vocab, out-of-vocabulary words are
    not silently dropped — they tokenize at the character level (no
    learned merge applies), and an all-OOV document still appears."""
    _, vocab = BPE.learn_merges(corpus, n_merges=6)
    probe = spark.createDataFrame(
        [(1, ["hug", "zebra"]), (2, ["qq"])],
        "doc_id long, tokens array<string>",
    )
    out = {r["doc_id"]: r for r in BPE.bpe_doc_tokens(probe, vocab=vocab).collect()}
    # doc 1: "hug" merges to 1+1 tokens ("hug" + end marker handling per
    # the learned sym), "zebra" is OOV → its base char symbolization
    base_zebra = len("zebra")
    hug_len = next(
        len(r["sym"].split()) for r in vocab.collect() if r["word"] == "hug"
    )
    assert out[1]["n_words"] == 2
    assert out[1]["n_tokens"] == hug_len + base_zebra
    # doc 2 is ALL OOV and still present, at character granularity
    assert out[2]["n_words"] == 1 and out[2]["n_tokens"] == len("qq")
