"""Unit tests for stage-0 scalar functions — the analog of the reference's
tokenizer/ngram golden tests (`/root/reference/tests/UnitTests.java:91-138`),
but CI-runnable and engine-portable (every function is checked against its
DuckDB SQL twin so the oracle can never drift from the engine)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from entity_linking_spark.functions import hashing as H
from entity_linking_spark.functions import normalize as N
from entity_linking_spark.functions import tokenize as Tk


def one_col(spark, col, value: str):
    return spark.range(1).select(col(F.lit(value)).alias("v")).collect()[0]["v"]


GOLDEN_NORM = [
    # (raw, normalized) — double-unescape, tag strip, delimiter fold
    ("Hello, World!", "hello world"),
    ("  A&amp;amp;B <b>bold</b> &nbsp;x ", "a b bold x"),
    ("Café-Bar: 42", "caf bar 42"),
    # unescape runs BEFORE tag strip (reference order, Normalizer.java:36-63)
    ("&lt;tag&gt; becomes markup", "becomes markup"),
    ("", ""),
    ("___", ""),
]


@pytest.mark.parametrize("raw,want", GOLDEN_NORM)
def test_normalize_golden(spark, raw, want):
    assert one_col(spark, N.normalize_text_col, raw) == want


@pytest.mark.parametrize("raw,want", GOLDEN_NORM)
def test_normalize_duck_parity(duck, raw, want):
    sql = N.normalize_text_sql("?")
    got = duck.execute(f"SELECT {sql}", [raw]).fetchone()[0]
    assert got == want


def test_tokens_golden(spark):
    got = one_col(spark, lambda c: Tk.tokens_col(N.normalize_text_col(c)),
                  "The  quick, brown fox!")
    assert got == ["the", "quick", "brown", "fox"]


def test_tokens_empty(spark):
    assert one_col(spark, Tk.tokens_col, "") == []


def test_word_ngrams_golden(spark):
    toks = F.split(F.lit("a b c d"), " ")
    got = spark.range(1).select(Tk.word_ngrams_col(toks, 2).alias("v")).collect()[0]["v"]
    assert got == ["a b", "b c", "c d"]
    got3 = spark.range(1).select(Tk.word_ngrams_col(toks, 5).alias("v")).collect()[0]["v"]
    assert got3 == []  # fewer tokens than n → empty, not reversed-sequence junk


def test_char_ngrams_golden(spark):
    got = one_col(spark, lambda c: Tk.char_ngrams_col(c, 3), "abcd")
    assert got == ["abc", "bcd"]
    assert one_col(spark, lambda c: Tk.char_ngrams_col(c, 5), "abc") == []


def test_char_ngrams_duck_parity(duck):
    # the template repeats its argument; bind it once via a derived table
    got = duck.execute(
        f"SELECT {Tk.char_ngrams_sql('s', 3)} FROM (SELECT ? AS s)", ["abcdef"]
    ).fetchone()[0]
    assert got == ["abc", "bcd", "cde", "def"]


def test_regex_token_count(spark, duck):
    s = "hello world-42 x!"
    want = 6  # hello, world, -, 42, x, !
    assert one_col(spark, Tk.regex_token_count_col, s) == want
    assert duck.execute(
        f"SELECT {Tk.regex_token_count_sql('?')}", [s]
    ).fetchone()[0] == want


def test_portable_hash_parity(spark, duck):
    """The blocking hash must be bit-identical across engines."""
    vals = ["", "a", "abc", "café", "the quick brown fox", "123"]
    for v in vals:
        s = one_col(spark, H.portable_hash_col, v)
        d = duck.execute(f"SELECT {H.portable_hash_sql('?')}", [v]).fetchone()[0]
        assert s == d, v
        assert 0 <= s < H.MERSENNE_P


def test_minhash_perm_parity(spark, duck):
    (a, b), *_ = H.perm_constants(1, seed=7)
    x = 123456789
    s = (
        spark.range(1)
        .select(H.minhash_perm_col(F.lit(x).cast("long"), a, b).alias("v"))
        .collect()[0]["v"]
    )
    d = duck.execute(f"SELECT {H.minhash_perm_sql(str(x), a, b)}").fetchone()[0]
    assert s == d


def test_perm_constants_deterministic():
    assert H.perm_constants(8, 42) == H.perm_constants(8, 42)
    assert H.perm_constants(8, 42) != H.perm_constants(8, 43)
    for a, b in H.perm_constants(64, 42):
        assert a % 2 == 1 and 1 <= a < H.MERSENNE_P and 0 <= b < H.MERSENNE_P


def test_jaro_winkler_known_values():
    from entity_linking_spark.operators.scoring import jaro_winkler_py

    # public golden values (Winkler 1990 examples)
    assert jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.8400, abs=1e-4)
    assert jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert jaro_winkler_py("same", "same") == 1.0
    assert jaro_winkler_py("", "x") == 0.0


def test_link_normalize_golden(spark, duck):
    """T4 processTargetLink golden cases + Spark/DuckDB parity."""
    from entity_linking_spark.functions.normalize import (
        link_normalize_col,
        link_normalize_sql,
    )
    import pyspark.sql.functions as F

    cases = [
        ("anarchism", "Anarchism"),
        ("Foo_bar#History", "Foo bar"),
        ("a%20b%2Cc", "A b,c"),
        ("x<ref name=a>junk</ref>y_z", "Xy z"),
        ("&amp;amp;co", "&co"),
        ("  spaced   out ", "Spaced out"),
    ]
    sdf = spark.createDataFrame([(c[0],) for c in cases], "s string")
    got = [r[0] for r in sdf.select(link_normalize_col(F.col("s"))).collect()]
    assert got == [c[1] for c in cases]
    for raw, want in cases:
        esc = raw.replace("'", "''")
        d = duck.execute(f"SELECT {link_normalize_sql(repr(raw))}").fetchone()[0]
        assert d == want, (raw, d, want)


def test_jaro_winkler_batch_matches_scalar_and_duckdb(duck):
    """The numpy bit-parallel batch kernel (functions/jaro.py) must be
    bit-identical to both the scalar reference implementation and DuckDB's
    jaro_winkler_similarity (the oracle for the pair_jaro_winkler query)."""
    import random

    import numpy as np

    from entity_linking_spark.functions.jaro import (
        JW_MAXLEN,
        jaro_winkler_batch,
        jaro_winkler_py,
    )

    rng = random.Random(1234)
    chars = "abcdef 012"
    pairs = []
    for _ in range(3000):
        a = "".join(rng.choice(chars) for _ in range(rng.randint(0, 90)))
        b = "".join(rng.choice(chars) for _ in range(rng.randint(0, 90)))
        if rng.random() < 0.3:  # force near-duplicates + exacts
            b = a[: max(0, len(a) - rng.randint(0, 4))] + b[:4]
        if rng.random() < 0.05:
            b = a
        pairs.append((a, b))
    pairs += [("", ""), ("", "x"), ("martha", "marhta"), ("dwayne", "duane"),
              ("ünïcode", "ünicode"), ("ünïcode", "unicode")]  # fallback path
    got = jaro_winkler_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([jaro_winkler_py(a, b) for a, b in pairs])
    assert np.max(np.abs(got - want)) == 0.0

    duck.execute("CREATE OR REPLACE TABLE _jwf(a VARCHAR, b VARCHAR)")
    duck.executemany("INSERT INTO _jwf VALUES (?, ?)", pairs)
    ref = np.array(
        duck.execute(
            f"SELECT jaro_winkler_similarity(substr(a,1,{JW_MAXLEN}),"
            f" substr(b,1,{JW_MAXLEN})) FROM _jwf"
        ).fetchall()
    ).ravel()
    assert np.max(np.abs(got - ref)) == 0.0


def test_md5_batch_matches_hashlib_and_engines(spark, duck):
    """The vectorized numpy MD5 kernel (functions/md5np.py) is
    bit-identical to hashlib, to Spark's conv(substr(md5,1,15),16,10)
    and to DuckDB's ('0x'||substr(md5,1,15))::bigint — the portable-hash
    contract the qualclf bucket kernel relies on. Covers empty strings,
    unicode, and multi-block (>55-byte) messages."""
    import hashlib

    from entity_linking_spark.functions.md5np import hash60_batch, md5_h60_batch

    msgs = [b"", b"a", b"abc", "héllo wörld β".encode(),
            b"x" * 55, b"x" * 56, b"x" * 63, b"x" * 64, b"x" * 119,
            b"x" * 120, b"x" * 300]
    got = md5_h60_batch(msgs)
    for m, g in zip(msgs, got):
        assert int(g) == int(hashlib.md5(m).hexdigest()[:15], 16)

    toks = ["alpha", "beta gamma", "", "café", "t" * 80]
    seed = 131
    h = hash60_batch(toks, seed)
    rows = spark.createDataFrame([(t,) for t in toks], "t string").select(
        F.conv(
            F.substring(F.md5(F.concat(F.col("t"), F.lit("\x1f" + str(seed)))), 1, 15),
            16, 10,
        ).cast("long").alias("h")
    ).collect()
    assert [int(r["h"]) for r in rows] == [int(x) for x in h]
    for t, x in zip(toks, h):
        (dv,) = duck.execute(
            "SELECT (('0x' || substr(md5(? || chr(31) || ?), 1, 15))::bigint)",
            [t, str(seed)],
        ).fetchone()
        assert int(dv) == int(x)
