"""Portable hashing: identical integer hashes in Spark SQL and DuckDB.

The engine's MinHash / SimHash / fingerprint operators need a hash that the
DuckDB correctness oracle can reproduce bit-for-bit. Engine-native hashes
(Spark xxhash64, DuckDB hash()) differ, so we derive a 60-bit integer from
the md5 hex prefix — md5 is identical everywhere — and build universal
hashing `h_i(x) = (a_i * x + b_i) mod p` on top with pre-seeded constants.

At 100 TB scale md5-per-shingle is heavier than xxhash64; the pipeline
accepts a `hash_mode` switch ('portable' for oracle parity, 'fast' for
xxhash64 in production). Both modes share every other code path.

MinHash math follows Broder (1997); band/row LSH follows Mining of Massive
Datasets ch.3 (public). Reference analog: the mention-dictionary n-gram
probe (`/root/reference/src/md/MentionDetection.java:166-194`) — the
reference blocks on exact dictionary surface forms; we block on n-gram
signatures because transcripts have no dictionary.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61 - 1: multiplication of two < 2^61 values overflows
# int64, so we do (a*x+b) % p in two steps with a and x reduced mod p and
# the product computed via 128-bit-safe decomposition — OR simply keep
# a,b < 2^31 and x < 2^31 so a*x < 2^62 fits signed int64. We take the
# second route: x is folded to 31 bits, a,b are 31-bit constants.
MERSENNE_P = (1 << 31) - 1  # 2147483647, prime


def perm_constants(n_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs, a odd, 1 <= a,b < 2^31-1."""
    rng = random.Random(seed)
    out = []
    for _ in range(n_perm):
        a = rng.randrange(1, MERSENNE_P) | 1
        b = rng.randrange(0, MERSENNE_P)
        out.append((a, b))
    return out


def portable_hash_col(s: Column) -> Column:
    """31-bit integer hash of a string, identical in Spark and DuckDB:
    first 15 hex chars of md5 → int64 → mod (2^31-1)."""
    h60 = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return F.pmod(h60, F.lit(MERSENNE_P))


def portable_hash_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint % {MERSENNE_P})"


def fast_hash_col(s: Column) -> Column:
    """Production-mode 31-bit hash (xxhash64, JVM-native, no md5 cost)."""
    return F.pmod(F.xxhash64(s), F.lit(MERSENNE_P))


def minhash_perm_col(x: Column, a: int, b: int) -> Column:
    """(a*x + b) mod p for a 31-bit x — fits int64, no overflow."""
    return (x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr} * {a}::bigint + {b}::bigint) % {MERSENNE_P})"
