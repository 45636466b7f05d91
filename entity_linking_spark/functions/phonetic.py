"""Phonetic (Soundex-variant) key — misspelling-tolerant blocking keys.

Classic record-linkage blocking families in this engine: key-equality
(`blocking.first_token_blocks` / `token_blocks`), LSH (`lsh_blocks`),
sorted-neighborhood (`operators/snm.py`), and — here — phonetic coding
(Russell 1918 / Odell-Russell Soundex, the standard ER treatment per
Christen 2012 §4.3): tokens that SOUND alike get the same 4-char key, so
"robert"/"rupert" or "smith"/"smyth" become candidates even though every
key-equality and prefix scheme separates them.

The code is the classic Soundex digit map and adjacent-run collapse,
WITHOUT the H/W-separation refinement (two same-code consonants split by
h or w stay distinct runs here). The variant is pinned by tests with
known-answer values; what matters for the engine is that the Spark
column expression and the DuckDB SQL template below implement the
IDENTICAL chain byte-for-byte — blocking keys derived from text must
agree across engines or block equality silently breaks (the same
invariant `functions/normalize.py` pins).

Input tokens are the engine's normalized alnum tokens (lowercase a-z0-9,
non-empty). Digits carry themselves through the digit map (a literal
'4' in "42nd" behaves as code 4); runs still collapse; for a BLOCKING
key that only merges blocks, never splits them, so recall is unaffected.

Chain (identical in both dialects, no UDF, whole-stage-codegen'd):

  coded     = translate(tok, 'abcdefghijklmnopqrstuvwxyz',
                              '01230120022455012623010202')
  collapsed = for d in 0..9: regexp_replace(coded, 'dd+', 'd')
              (RE2-safe: no backreferences — DuckDB's regex engine has
              none, so the per-digit patterns are spelled out)
  key       = tok[0] || rpad(replace(substr(collapsed, 2), '0', ''),
                             3, '0')[:3]

Collapsing BEFORE dropping the head position implements Soundex's
"first letter absorbs adjacent same-code letters" rule (pfister → p236).

Reference analog: none — the 2013 reference probes exact dictionary
n-grams (`md/MentionDetection.java:166-194`); phonetic keys generalize
its "same surface form" notion to "same sound class".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_CODES = "01230120022455012623010202"


def phonetic_key_col(col: Column) -> Column:
    """Soundex-variant code of one normalized token (see module doc)."""
    coded = F.translate(col, _ALPHA, _CODES)
    for d in "0123456789":
        coded = F.regexp_replace(coded, f"{d}{d}+", d)
    tail = F.replace(F.substring(coded, 2, 2_000_000), F.lit("0"), F.lit(""))
    return F.concat(
        F.substring(col, 1, 1), F.substring(F.rpad(tail, 3, "0"), 1, 3)
    )


def phonetic_key_sql(expr: str) -> str:
    """DuckDB twin of `phonetic_key_col` — the identical chain."""
    coded = f"translate({expr}, '{_ALPHA}', '{_CODES}')"
    for d in "0123456789":
        coded = f"regexp_replace({coded}, '{d}{d}+', '{d}', 'g')"
    tail = f"replace(substring({coded}, 2), '0', '')"
    return (
        f"substring({expr}, 1, 1) || substring(rpad({tail}, 3, '0'), 1, 3)"
    )
