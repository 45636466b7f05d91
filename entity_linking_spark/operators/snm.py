"""Sorted-neighborhood blocking (Hernández & Stolfo 1995).

The third classic blocking family next to key-equality blocking
(`blocking.first_token_blocks` / `token_blocks`) and LSH
(`blocking.lsh_blocks`): sort all records by a fuzzy key and compare each
record only against its w−1 successors in the sorted order. Where
key-equality blocking misses matches whose keys differ in the FIRST
character and LSH needs set overlap, SNM catches "almost-sorted-together"
variants (shared prefixes, padded ids) at a guaranteed linear candidate
budget: exactly (w−1)·N − (w−1)·w/2 pairs per pass, no cap needed.
Multi-pass SNM (several sort keys, union of pairs) is the standard recall
recovery for the key's weak spot, per Christen 2012 §4.5. The reference
has no analog (its dictionary probe is J3); this generalizes its
"candidates only near the surface form" idea to an order-based notion of
near.

100 TB shape — the two classic scale traps are both avoided:

  * NO GLOBAL-ORDER WINDOW over the corpus. The global rank is the
    bucket-spine prefix sum (the `positional_index` / `pack_sequences`
    decomposition): bucket = fixed-length PREFIX of the sort key, which
    is an order-preserving partition (x ≤ y ⟹ prefix(x) ≤ prefix(y)),
    so per-bucket counts → one bounded window over the tiny spine →
    broadcast offsets → per-bucket `row_number` gives the exact
    global-sort rank with every corpus-sized sort running bucket-local.
    A hot prefix bucket degrades gracefully (one big bucket sort, still
    no single global reducer); lengthen `prefix_len` to split it.
  * NO rank-range join. Neighbor pairs are generated block-locally:
    each record lands in rank-chunk c = (rnk−1) div w and ALSO c−1, so
    every pair with rank distance < w shares ≥ 1 chunk; the chunk
    equi-join with the distance filter is an ordinary shuffled
    equi-join on a perfectly balanced synthetic key (≤ 2w rows per
    chunk by construction — blocking whose skew bound is structural,
    not enforced by a cap).

The DuckDB twin keeps the semantics, not the topology: a plain
`row_number() OVER (ORDER BY key, rec_key)` plus a rank-distance join —
affordable at oracle scale, bit-identical output because both engines
compare ASCII `norm_text` bytewise and `rec_key` breaks all ties.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SNM_WINDOW = 8
SNM_PREFIX_LEN = 2


def snm_ranks(
    records: DataFrame, sort_expr: Column, prefix_len: int = SNM_PREFIX_LEN
) -> DataFrame:
    """(rec_key, rnk): the exact 1-based rank of every record under
    ORDER BY (sort_expr, rec_key), computed without a global-order window
    (bucket-spine prefix sum; see module docstring)."""
    keyed = records.select("rec_key", sort_expr.alias("snm_key")).withColumn(
        "snm_bucket", F.substring("snm_key", 1, prefix_len)
    )
    spine = Window.orderBy("snm_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        keyed.groupBy("snm_bucket")
        .agg(F.count("*").alias("bn"))
        .select(
            "snm_bucket",
            (F.sum("bn").over(spine) - F.col("bn")).alias("bucket_offset"),
        )
    )
    local = Window.partitionBy("snm_bucket").orderBy("snm_key", "rec_key")
    return keyed.join(F.broadcast(offsets), "snm_bucket").select(
        "rec_key",
        (F.col("bucket_offset") + F.row_number().over(local))
        .cast("long")
        .alias("rnk"),
    )


def snm_pass_pairs(ranks: DataFrame, window: int = SNM_WINDOW) -> DataFrame:
    """(a_key, b_key) pairs with rank distance < window, a_key < b_key —
    one SNM pass over a rank frame. Chunked equi-join, never a range
    join: each record joins under its own chunk and its predecessor's."""
    w = int(window)
    sides = ranks.select(
        "rec_key", "rnk", F.expr(f"(rnk - 1) div {w}").alias("c")
    )
    dup = sides.select(
        "rec_key",
        "rnk",
        F.explode(F.array(F.col("c"), F.col("c") - 1)).alias("chunk"),
    ).filter(F.col("chunk") >= 0)
    a, b = dup.alias("a"), dup.alias("b")
    return (
        a.join(b, "chunk")
        .filter(
            (F.col("b.rnk") > F.col("a.rnk"))
            & (F.col("b.rnk") - F.col("a.rnk") < w)
        )
        .select(
            F.least("a.rec_key", "b.rec_key").alias("a_key"),
            F.greatest("a.rec_key", "b.rec_key").alias("b_key"),
        )
        .distinct()
    )


def snm_pairs(
    records: DataFrame,
    sort_exprs: list[Column] | None = None,
    window: int = SNM_WINDOW,
    prefix_len: int = SNM_PREFIX_LEN,
) -> DataFrame:
    """Multi-pass sorted-neighborhood candidate pairs: the distinct union
    of `snm_pass_pairs` over every sort key. Default passes: norm_text
    and reverse(norm_text) — the standard front/back key pairing, so a
    variant that breaks the head of the key still sorts together on the
    tail."""
    if sort_exprs is None:
        sort_exprs = [F.col("norm_text"), F.reverse(F.col("norm_text"))]
    passes = [
        snm_pass_pairs(snm_ranks(records, e, prefix_len), window)
        for e in sort_exprs
    ]
    return reduce(lambda x, y: x.unionByName(y), passes).distinct()


def snm_pairs_sql(
    records_rel: str,
    sort_sqls: list[str] | None = None,
    window: int = SNM_WINDOW,
) -> str:
    """DuckDB twin of `snm_pairs` (default passes: norm_text and
    reverse(norm_text))."""
    if sort_sqls is None:
        sort_sqls = ["norm_text", "reverse(norm_text)"]
    ranked = [
        f"snm_r{i} AS MATERIALIZED (SELECT rec_key, row_number() OVER "
        f"(ORDER BY {s}, rec_key) AS rnk FROM snm_recs)"
        for i, s in enumerate(sort_sqls)
    ]
    unions = " UNION ALL ".join(
        f"SELECT least(a.rec_key, b.rec_key) AS a_key, "
        f"greatest(a.rec_key, b.rec_key) AS b_key "
        f"FROM snm_r{i} a JOIN snm_r{i} b "
        f"ON b.rnk > a.rnk AND b.rnk - a.rnk < {int(window)}"
        for i in range(len(sort_sqls))
    )
    return (
        f"WITH snm_recs AS MATERIALIZED ({records_rel}),\n    "
        + ",\n    ".join(ranked)
        + f"\n    SELECT DISTINCT a_key, b_key FROM ({unions})"
    )
