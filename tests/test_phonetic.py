"""Phonetic (Soundex-variant) key — known-answer values pinning the
documented variant, engine-parity between the Spark column and the
DuckDB SQL template over adversarial inputs, and the blocking operator's
co-blocking / dedup semantics."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyspark.sql.functions as F

from entity_linking_spark.functions import phonetic as PH
from entity_linking_spark.operators import blocking as B

# Classic Soundex values that our variant reproduces (the variant drops
# only the H/W-separation refinement, which none of these exercise).
KNOWN = {
    "robert": "r163",
    "rupert": "r163",
    "tymczak": "t522",
    "pfister": "p236",  # head absorbs adjacent same-code 'f'
    "smith": "s530",
    "smyth": "s530",
    "jon": "j500",
    "john": "j500",
    "bob": "b100",
    "a": "a000",
    "aeiou": "a000",
    "42nd": "4253",  # literal digits carry themselves through the map
    "zzzzzzzz": "z000",  # long same-code run collapses into the head
}


def test_known_answer_values(spark):
    df = spark.createDataFrame([(t,) for t in KNOWN], "tok string")
    got = {
        r["tok"]: r["key"]
        for r in df.select(
            "tok", PH.phonetic_key_col(F.col("tok")).alias("key")
        ).collect()
    }
    assert got == KNOWN


def test_spark_duckdb_parity_exhaustive_short_tokens(spark):
    """Every 1-2 char alnum token plus the known set: byte-identical keys
    in both engines (the blocking-key invariant)."""
    alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
    toks = (
        [c for c in alnum]
        + [a + b for a in "abcz159" for b in alnum]
        + list(KNOWN)
    )
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got_spark = {
        r["tok"]: r["key"]
        for r in df.select(
            "tok", PH.phonetic_key_col(F.col("tok")).alias("key")
        ).collect()
    }
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            f"SELECT tok, {PH.phonetic_key_sql('tok')} AS key "
            "FROM (SELECT unnest(?) AS tok)",
            [toks],
        ).fetchall()
    )
    assert got_spark == got_duck


def test_phonetic_blocks_coblock_soundalikes_and_dedup(spark):
    recs = spark.createDataFrame(
        [
            ("r1", ["smith", "called"]),
            ("r2", ["smyth", "called"]),
            ("r3", ["schmidt"]),
            # two distinct tokens with the SAME code: one block row only
            ("r4", ["robert", "rupert"]),
        ],
        "rec_key string, tokens array<string>",
    )
    rows = B.phonetic_blocks(recs).collect()
    keys = {(r["rec_key"], r["block_key"]) for r in rows}
    assert len(rows) == len(keys)  # dedup enforced
    smith_blocks = {b for k, b in keys if k == "r1"}
    assert {b for k, b in keys if k == "r2"} == smith_blocks
    assert ("r4", "ph:r163") in keys
    assert sum(1 for k, _ in keys if k == "r4") == 1
