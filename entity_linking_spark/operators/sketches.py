"""Cardinality sketches: HyperLogLog distinct-count as pure DataFrame
expressions, with a bit-exact DuckDB oracle.

Exact `count(distinct key)` over 10^12 rows shuffles every distinct key;
an HLL sketch reduces the state to m integer registers per group —
map-side combinable (`max` per register is associative+commutative, so
partial aggregation collapses each partition's contribution to ≤ m rows
before any shuffle) and mergeable across partitions, days, or tables by
the same `max`. That merge property is what makes the sketch a *state*
you can persist per Iceberg partition and fold incrementally — the same
reason the incremental-linking fold keeps star edges instead of
re-clustering (`operators/incremental.py`).

Algorithm: Flajolet-Fourier-Gandouet-Meunier, "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard linear-counting small-range correction. p = 8 → m = 256
registers (≈ 6.5% standard error). Everything is integer arithmetic until
one final literal-by-integer division, so Spark and DuckDB agree
bit-for-bit:

  * 60-bit portable hash (md5-prefix, `functions/hashing.py`); low 8 bits
    pick the register, the remaining 52 bits feed rho.
  * rho = 53 - bitlength(w) via `length(bin(w))` — both engines print
    binary without leading zeros; zero floating point involved.
  * The register sum Σ 2^-M_j is kept scaled by 2^53: each term
    `1 << (53 - M_j)` is an exact int64 and the 256-term sum ≤ 2^61, so
    `reg_sum` is an exact integer on both engines.
  * raw estimate = (alpha_m · m² · 2^53) / reg_sum — one double literal
    divided by an exact integer, IEEE-correctly-rounded identically
    everywhere.

The one engine-risk is `ln()` in the linear-counting branch (libm vs JVM
may differ in the last ulp); the estimate is therefore rounded to the
nearest integer — a 1-ulp divergence cannot move the rounded value except
exactly at a .5 boundary, and the exact-integer columns
(`reg_sum`, `n_zero_registers`) anchor the value-hash regardless.

Reference analog: none — the reference counts exactly (e.g. the
keyphraseness denominator, `knowledgebase/KeyphrasenessMap.java`); a
sketch is what replaces those global exact counts at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

P_BITS = 8
M_REG = 1 << P_BITS  # 256 registers
W_BITS = 60 - P_BITS  # 52 suffix bits feeding rho
RHO_MAX = W_BITS + 1  # 53: rho when the suffix is all zeros
# alpha_m * m^2 * 2^53 (the register sum is kept scaled by 2^53)
HLL_SCALE = (
    0.7213 / (1.0 + 1.079 / M_REG) * M_REG * M_REG * float(1 << RHO_MAX)
)
LINEAR_COUNT_CUTOFF = 2.5 * M_REG  # below this, linear counting is used


def _hash60_col(s, hash_mode: str):
    if hash_mode == "portable":
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    # production: xxhash64 masked to the same 60-bit width
    return F.xxhash64(s).bitwiseAND(F.lit((1 << 60) - 1))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    hash_mode: str = "portable",
) -> DataFrame:
    """Per-group HLL register table: group_cols + (reg_idx, reg_rho).

    This IS the sketch state: ≤ m rows per group, mergeable with any
    other register table over the same key domain by max(reg_rho) per
    (group, reg_idx) — see `merge_registers`."""
    h = _hash60_col(F.col(key_col).cast("string"), hash_mode)
    w = F.shiftright(h, P_BITS)
    rho = F.when(w == 0, F.lit(RHO_MAX)).otherwise(
        F.lit(RHO_MAX) - F.length(F.bin(w))
    )
    hashed = df.select(
        *[F.col(c) for c in group_cols],
        h.bitwiseAND(F.lit(M_REG - 1)).alias("reg_idx"),
        rho.cast("int").alias("_rho"),
    )
    return hashed.groupBy(*group_cols, "reg_idx").agg(
        F.max("_rho").alias("reg_rho")
    )


def merge_registers(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold register tables down to a coarser grouping (or global, with
    group_cols=[]): max per register. Exactly the sketch-union property —
    merging per-partition/per-day sketches equals sketching the union."""
    return registers.groupBy(*group_cols, "reg_idx").agg(
        F.max("reg_rho").alias("reg_rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """group_cols + (n_zero_registers, reg_sum, hll_distinct).

    `reg_sum` = Σ_j 2^(53 - M_j) over all m registers (absent register →
    M_j = 0 → term 2^53), an exact int64. `hll_distinct` = the FFGM
    estimator with linear-counting small-range correction, rounded to the
    nearest integer."""
    with_term = registers.withColumn(
        "_term",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_MAX} - reg_rho AS INT))"),
    )
    agg = with_term.groupBy(*group_cols).agg(
        (F.lit(M_REG) - F.count("*")).alias("n_zero_registers"),
        (
            F.sum("_term")
            + (F.lit(M_REG) - F.count("*")) * F.lit(1 << RHO_MAX)
        ).alias("reg_sum"),
    )
    raw = F.lit(HLL_SCALE) / F.col("reg_sum")
    v = F.col("n_zero_registers")
    est = F.when(
        (v > 0) & (raw <= F.lit(LINEAR_COUNT_CUTOFF)),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG)) / v),
    ).otherwise(raw)
    return agg.withColumn("hll_distinct", F.round(est, 0).cast("long"))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    hash_mode: str = "portable",
) -> DataFrame:
    """Approximate count(distinct key_col) per group_cols (global when
    empty): two partial-agg'd groupBys, no distinct shuffle."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, hash_mode), group_cols
    )


def hll_distinct_sql(rel: str, key_expr: str, group_cols: list[str]) -> str:
    """DuckDB twin of `hll_distinct` (portable hash mode), same integer
    pipeline, same single-literal division, same rounding."""
    gsel = ", ".join(group_cols)
    gpfx = f"{gsel}, " if group_cols else ""
    gby_reg = f"GROUP BY {gpfx}reg_idx" if group_cols else "GROUP BY reg_idx"
    gby_agg = f"GROUP BY {gsel}" if group_cols else ""
    h60 = f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))::bigint)"
    return f"""
    WITH hashed AS (
      SELECT {gpfx}({h60} & {M_REG - 1}) AS reg_idx,
             CASE WHEN ({h60} >> {P_BITS}) = 0 THEN {RHO_MAX}
                  ELSE {RHO_MAX} - length(bin({h60} >> {P_BITS}))
             END AS rho
      FROM ({rel})
    ), reg AS (
      SELECT {gpfx}reg_idx, max(rho) AS reg_rho FROM hashed {gby_reg}
    ), agg AS (
      SELECT {gpfx}({M_REG} - count(*))::bigint AS n_zero_registers,
             (sum((1::bigint << ({RHO_MAX} - reg_rho)))::bigint
              + ({M_REG} - count(*))::bigint * (1::bigint << {RHO_MAX})
             ) AS reg_sum
      FROM reg {gby_agg}
    )
    SELECT {gpfx}n_zero_registers, reg_sum,
           round(CASE WHEN n_zero_registers > 0
                       AND ({HLL_SCALE!r}::double / reg_sum) <= {LINEAR_COUNT_CUTOFF!r}::double
                      THEN {float(M_REG)!r}::double
                           * ln({float(M_REG)!r}::double / n_zero_registers)
                      ELSE {HLL_SCALE!r}::double / reg_sum
                 END, 0)::bigint AS hll_distinct
    FROM agg
    """
