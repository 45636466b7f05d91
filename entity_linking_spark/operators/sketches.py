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


# ---------------------------------------------------------------------------
# Count-Min sketch — frequency estimation in d×w bounded integer state
# ---------------------------------------------------------------------------
#
# Cormode-Muthukrishnan, "An improved data stream summary: the count-min
# sketch and its applications" (J. Algorithms 2005). Exact per-key counts
# over 10^12 rows shuffle every distinct key; a CMS keeps d×w int64
# counters per group — SUM is the combiner, so map-side partial
# aggregation collapses each partition to ≤ d×w rows before the shuffle,
# and counter tables merge across partitions/days by element-wise sum.
# Estimates never undercount (cms ≥ exact always) and overcount by
# ≤ 2N/w with prob ≥ 1 - 2^-d. Pure integer arithmetic end to end, so
# the DuckDB twin is bit-exact.

CMS_DEPTH = 4
CMS_WIDTH = 1024
_CMS_CONST = H.perm_constants(CMS_DEPTH, seed=11)


def _cms_x(key, hash_mode: str):
    """31-bit base hash the d universal hash rows are derived from."""
    if hash_mode == "portable":
        return H.portable_hash_col(key.cast("string"))
    return H.fast_hash_col(key.cast("string"))


def _cms_buckets(key, hash_mode: str):
    x = _cms_x(key, hash_mode)
    return F.array(
        *[
            (H.minhash_perm_col(x, a, b) % F.lit(CMS_WIDTH)).cast("int")
            for a, b in _CMS_CONST
        ]
    )


def cms_counters(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    hash_mode: str = "portable",
) -> DataFrame:
    """Per-group CMS counter table: group_cols + (depth, bucket, cnt) —
    ≤ d×w rows per group regardless of the key cardinality. Merge two
    counter tables (days, partitions, tables) by summing cnt per
    (group, depth, bucket)."""
    exploded = df.select(
        *[F.col(c) for c in group_cols],
        F.posexplode(_cms_buckets(F.col(key_col), hash_mode)).alias(
            "depth", "bucket"
        ),
    )
    return exploded.groupBy(*group_cols, "depth", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_lookup(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    group_cols: list[str],
    hash_mode: str = "portable",
) -> DataFrame:
    """Estimate the count of each probe key: min over the d rows of the
    counter its buckets hit (absent counter row → 0). One equi-join on
    (group, depth, bucket) against the bounded counter table — the
    counter side broadcasts whenever d×w×|groups| is small."""
    p = probes.select(
        *[F.col(c) for c in group_cols],
        F.col(key_col),
        F.posexplode(_cms_buckets(F.col(key_col), hash_mode)).alias(
            "depth", "bucket"
        ),
    )
    joined = p.join(
        F.broadcast(counters), [*group_cols, "depth", "bucket"], "left"
    )
    return joined.groupBy(*group_cols, key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count")
    )


def _cms_buckets_sql_terms(x_expr: str) -> list[str]:
    return [
        f"({H.minhash_perm_sql(x_expr, a, b)} % {CMS_WIDTH})"
        for a, b in _CMS_CONST
    ]


def cms_token_counts_sql(tokens_rel: str, token_col: str = "token") -> str:
    """DuckDB twin of the global (no group) CMS build + self-probe used
    by the `cms_token_counts` query: every distinct token estimated
    against the sketch of the full token stream, exact count alongside."""
    x = f"({H.portable_hash_sql(f'CAST({token_col} AS VARCHAR)')})"
    arms = " UNION ALL ".join(
        f"SELECT {token_col}, {i} AS depth, {t} AS bucket FROM toks"
        for i, t in enumerate(_cms_buckets_sql_terms(x))
    )
    return f"""
    WITH toks AS ({tokens_rel}),
    hashed AS ({arms}),
    counters AS (
      SELECT depth, bucket, count(*)::bigint AS cnt
      FROM hashed GROUP BY depth, bucket
    ),
    probes AS (SELECT DISTINCT {token_col}, depth, bucket FROM hashed),
    est AS (
      SELECT p.{token_col}, min(coalesce(c.cnt, 0)) AS cms_count
      FROM probes p LEFT JOIN counters c
        ON p.depth = c.depth AND p.bucket = c.bucket
      GROUP BY p.{token_col}
    ),
    exact AS (
      SELECT {token_col}, count(*)::bigint AS exact_count
      FROM toks GROUP BY {token_col}
    )
    SELECT e.{token_col} AS token, x.exact_count, e.cms_count
    FROM est e JOIN exact x ON e.{token_col} = x.{token_col}
    """


# ---------------------------------------------------------------------------
# Bloom filter — semi-join pruning without shuffling the big side
# ---------------------------------------------------------------------------
#
# Bloom (CACM 1970). The 100 TB use: filter a fact table by key
# existence in a dim WITHOUT shuffling the fact — build an m-bit filter
# from the dim (m/32 words via bit_or partial agg; 32 bits per int64 word
# keeps every shift below the sign bit, which DuckDB's checked << rejects), broadcast it,
# and probe as a map-side expression. Spark's own InjectRuntimeFilter
# does this invisibly for some joins; exposing it as an operator makes
# the pruning explicit, tunable, and reusable across stages (build once,
# probe many). No false negatives; false-positive rate ≈ (1-e^{-kn/m})^k.

BLOOM_BITS = 1 << 14  # m = 16384 bits = 512 32-bit words (in int64 cells)
BLOOM_K = 5
_BLOOM_CONST = H.perm_constants(BLOOM_K, seed=13)


def _bloom_positions(key, hash_mode: str):
    x = _cms_x(key, hash_mode)
    return F.array(
        *[
            (H.minhash_perm_col(x, a, b) % F.lit(BLOOM_BITS)).cast("int")
            for a, b in _BLOOM_CONST
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, hash_mode: str = "portable"
) -> DataFrame:
    """(word_idx, word): the filter as ≤ m/32 rows of OR-ed bit words.
    bit_or is associative+commutative → map-side partial agg; the result
    is tiny and broadcast by `bloom_probe`."""
    bits = df.select(
        F.explode(_bloom_positions(F.col(key_col), hash_mode)).alias("pos")
    )
    words = bits.select(
        (F.col("pos") / F.lit(32)).cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), pos % 32)").alias("w"),
    )
    return words.groupBy("word_idx").agg(F.expr("bit_or(w)").alias("word"))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    hash_mode: str = "portable",
    out_col: str = "might_contain",
) -> DataFrame:
    """df + a boolean `might_contain` column, ZERO shuffle on df: the
    word table collapses to a single-row int→word map, broadcast-joined
    in (1-row nested loop), and the k bit tests run as a map-side
    expression over each row's position array. The fact side is never
    exploded, grouped, or re-partitioned — this is the runtime-filter
    shape (probe first, expensive join only on survivors)."""
    wmap = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("_bloom_words")
    )
    probed = df.crossJoin(F.broadcast(wmap)).withColumn(
        "_bpos", _bloom_positions(F.col(key_col), hash_mode)
    )
    hit = F.expr(
        "array_min(transform(_bpos, p -> "
        "  (shiftright(coalesce(element_at(_bloom_words, CAST(p DIV 32 AS INT)),"
        "              CAST(0 AS BIGINT)), CAST(p % 32 AS INT))"
        "   & CAST(1 AS BIGINT)))) = 1"
    )
    return probed.withColumn(out_col, hit).drop("_bloom_words", "_bpos")


def bloom_semijoin_audit_sql(fact_rel: str, fact_key: str, dim_rel: str, dim_key: str) -> str:
    """DuckDB twin of the `bloom_prune_orders` query: replay the exact
    bit arithmetic, report (n_probe, n_pass, n_exact, n_false_pos)."""
    xf = f"({H.portable_hash_sql(f'CAST({fact_key} AS VARCHAR)')})"
    xd = f"({H.portable_hash_sql(f'CAST({dim_key} AS VARCHAR)')})"
    dim_arms = " UNION ALL ".join(
        f"SELECT ({H.minhash_perm_sql(xd, a, b)} % {BLOOM_BITS}) AS pos FROM dim"
        for a, b in _BLOOM_CONST
    )
    fact_arms = " UNION ALL ".join(
        f"SELECT _rid, {fact_key}, ({H.minhash_perm_sql(xf, a, b)} % {BLOOM_BITS}) AS pos FROM fact"
        for a, b in _BLOOM_CONST
    )
    return f"""
    WITH dim AS ({dim_rel}),
    fact AS (SELECT row_number() OVER () AS _rid, * FROM ({fact_rel})),
    dbits AS ({dim_arms}),
    words AS (
      SELECT (pos // 32)::int AS word_idx,
             bit_or(1::bigint << (pos % 32)) AS word
      FROM dbits GROUP BY (pos // 32)::int
    ),
    fbits AS ({fact_arms}),
    probed AS (
      SELECT f._rid, f.{fact_key},
             min(((coalesce(w.word, 0) >> (f.pos % 32)) & 1)::int) AS hit
      FROM fbits f LEFT JOIN words w ON (f.pos // 32)::int = w.word_idx
      GROUP BY f._rid, f.{fact_key}
    )
    SELECT count(*)::bigint AS n_probe,
           sum(hit)::bigint AS n_pass,
           sum(CASE WHEN {fact_key} IN (SELECT {dim_key} FROM dim)
                    THEN 1 ELSE 0 END)::bigint AS n_exact,
           sum(CASE WHEN hit = 1 AND {fact_key} NOT IN (SELECT {dim_key} FROM dim)
                    THEN 1 ELSE 0 END)::bigint AS n_false_pos
    FROM probed
    """


# ---------------------------------------------------------------------------
# Histogram quantiles — percentiles in n_bins bounded state
# ---------------------------------------------------------------------------
#
# Exact `percentile(v, q)` materializes each group's full sorted value
# list — unbounded per-group state, the same single-task pathology as an
# uncapped window. The equi-width histogram is the bounded-state path:
# per-group (min, max, count) → bin counts (both partial-agg'd, ≤ n_bins
# rows per group) → cumulative walk over the ≤ n_bins rows → linear
# interpolation inside the target bin (uniform-within-bin assumption,
# the classic textbook estimator). The estimate lies in the bin where
# the cumulative count crosses q·n, i.e. within one bin width of the
# order statistic at that rank (value-space distance to the
# interpolated exact percentile can exceed that in sparse tails — the
# guarantee is rank-accurate, like every fixed-width histogram).
# Bin counts merge
# across partitions/days by element-wise sum given shared bounds.
# Deterministic double arithmetic expressed identically in both engines;
# estimates rounded to 6dp like every float column in the oracle scheme.

HIST_BINS = 128


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[float],
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """group_cols + (q, hist_q): the histogram estimate of each quantile
    q ∈ qs per group. Two partial-agg'd groupBys + one window over
    ≤ n_bins rows per group — no per-group sorted-value state."""
    v = F.col(value_col)
    bounds = df.groupBy(*group_cols).agg(
        F.min(v).alias("_mn"),
        F.max(v).alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    binned = df.join(bounds, group_cols).withColumn(
        "_bin",
        F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    ((v - F.col("_mn")) / (F.col("_mx") - F.col("_mn")))
                    * F.lit(n_bins)
                ),
            )
        )
        .cast("int"),
    )
    bins = binned.groupBy(*group_cols, "_bin", "_mn", "_mx", "_n").agg(
        F.count(F.lit(1)).alias("_cnt")
    )

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("_cum", F.sum("_cnt").over(w))
    probes = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).withColumn("_t", F.col("q") * F.col("_n"))
    hit = probes.filter(
        (F.col("_t") > F.col("_cum") - F.col("_cnt"))
        & (F.col("_t") <= F.col("_cum"))
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(n_bins)
    est = (
        F.col("_mn")
        + F.col("_bin") * width
        + ((F.col("_t") - (F.col("_cum") - F.col("_cnt"))) / F.col("_cnt"))
        * width
    )
    return hit.select(
        *group_cols, "q", F.round(est, 6).alias("hist_q")
    )


def histogram_quantiles_sql(
    rel: str,
    value_col: str,
    group_cols: list[str],
    qs: list[float],
    n_bins: int = HIST_BINS,
) -> str:
    """DuckDB twin: the identical expression tree (same parenthesization
    so the doubles round identically)."""
    g = ", ".join(group_cols)
    qlist = ", ".join(repr(float(q)) for q in qs)
    return f"""
    WITH b AS (
      SELECT {g}, min({value_col}) AS _mn, max({value_col}) AS _mx,
             count(*)::bigint AS _n
      FROM ({rel}) GROUP BY {g}
    ),
    wb AS (
      SELECT e.{g.replace(', ', ', e.')}, _mn, _mx, _n,
             (CASE WHEN _mx = _mn THEN 0
                   ELSE least({n_bins - 1},
                        floor((({value_col} - _mn) / (_mx - _mn)) * {n_bins}))
              END)::int AS _bin
      FROM ({rel}) e JOIN b USING ({g})
    ),
    bc AS (
      SELECT {g}, _bin, _mn, _mx, _n, count(*)::bigint AS _cnt
      FROM wb GROUP BY {g}, _bin, _mn, _mx, _n
    ),
    cum AS (
      SELECT *, sum(_cnt) OVER (
        PARTITION BY {g} ORDER BY _bin
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS _cum FROM bc
    ),
    probes AS (
      SELECT c.*, q, q * _n AS _t
      FROM cum c CROSS JOIN (SELECT unnest([{qlist}]::double[]) AS q) qq
    )
    SELECT {g}, q,
           round(_mn + _bin * ((_mx - _mn) / {n_bins})
                 + ((_t - (_cum - _cnt)) / _cnt) * ((_mx - _mn) / {n_bins}),
                 6) AS hist_q
    FROM probes
    WHERE _t > _cum - _cnt AND _t <= _cum
    """


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
