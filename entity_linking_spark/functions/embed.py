"""Deterministic feature-hashed text embeddings — portable Spark/DuckDB.

The north_star's pairwise scorer names "embedding similarity" as a
feature next to Jaro-Winkler / Levenshtein / TF-IDF cosine. Transcript
turns carry no model embeddings in this sandbox, so the embedder is the
classic feature-hashing trick (Weinberger et al. 2009, "Feature Hashing
for Large Scale Multitask Learning" — public): each token hashes to one
of `dim` signed buckets, the embedding is the per-bucket signed count.
On a production corpus the same `pair_embedding_cosine` join consumes a
real encoder's `array<float>` column unchanged — only this builder is
the stand-in (same slot-design as the multimodal decoder stub).

Everything is a pure expression chain (tokens → hash → fixed-width
integer array): zero shuffle, stays in whole-stage codegen, and the
integer-valued vectors make the cosine bit-reproducible against the
DuckDB twin (products and sums are exact in double; only the final
cosine is rounded).

Hash-mode follows `functions/hashing.py`: 'portable' (md5-derived, the
oracle can replay it) vs 'fast' (xxhash64, the production path).

Bucket/sign derivation: r = hash(token) mod 2·dim; bucket = r mod dim;
sign = +1 if r < dim else −1 — one hash per token, no second salt pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import fast_hash_col, portable_hash_col, portable_hash_sql

EMB_DIM = 16


def hashed_embedding_col(
    tokens: Column, dim: int = EMB_DIM, hash_mode: str = "portable"
) -> Column:
    """array<bigint> of length `dim`: signed token-count sketch."""
    h = {"portable": portable_hash_col, "fast": fast_hash_col}[hash_mode]
    rs = F.transform(tokens, lambda t: h(t) % F.lit(2 * dim))
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(
        dims,
        lambda d: F.aggregate(
            rs,
            F.lit(0).cast("long"),
            lambda acc, r: acc
            + F.when(
                r % dim == d,
                F.when(r < dim, F.lit(1)).otherwise(F.lit(-1)),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        ),
    )


def hashed_embedding_sql(tokens_expr: str, dim: int = EMB_DIM) -> str:
    """DuckDB twin (portable hash mode). `coalesce(list_sum, 0)`: DuckDB's
    list_sum of an empty list is NULL where Spark's aggregate returns the
    0 init — empty texts must embed to the zero vector on both engines."""
    rs = (
        f"list_transform({tokens_expr}, "
        f"t -> {portable_hash_sql('t')} % {2 * dim})"
    )
    return (
        f"list_transform(range(0, {dim}), d -> "
        f"coalesce(list_sum(list_transform({rs}, r -> "
        f"CASE WHEN r % {dim} = d THEN "
        f"(CASE WHEN r < {dim} THEN 1 ELSE -1 END) ELSE 0 END)), 0))"
    )
