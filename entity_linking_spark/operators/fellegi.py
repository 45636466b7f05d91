"""Fellegi–Sunter probabilistic record linkage — EM-trained match weights.

The reference combines hand-set compatibility scores (`loopybeliefpropagation/
ScorerFull.java:95-119`) and our engine adds a calibrated logistic combiner
(`operators/scoring.py`); this module supplies the canonical UNSUPERVISED
alternative: the Fellegi–Sunter model (Fellegi & Sunter 1969, JASA; the
model behind Splink and most production record-linkage stacks), fitted with
EM (Winkler 1988) under the usual conditional-independence assumption.

Model: each candidate pair has a discrete agreement vector γ =
(g_exact, g_jacc, g_lev) over the engine's existing integer-exact pair
features (`scoring.pair_features`). Pairs are a latent mixture of matches
(weight λ) and non-matches; per field k, m_k[l] = P(γ_k = l | match) and
u_k[l] = P(γ_k = l | non-match). EM alternates posterior computation
(E-step) with frequency re-estimation (M-step).

100 TB shape — the corpus crosses ONE exchange, total:

  * the pair set is reduced to its γ-PATTERN CONTINGENCY TABLE (≤ 18 rows:
    2·3·3 levels) by one partial-agg'd groupBy — the only shuffle;
  * the whole EM trajectory runs on the DRIVER over those ≤ 18 rows
    (the driver-held-model topology of `embedcluster.py` / `qualclf.py` /
    `dsir.py`), so iteration cost is independent of pair count;
  * scoring is a zero-extra-shuffle scan: the fitted parameters ride as
    literal expressions over the features frame.

Bit-reproducible fit (the qualclf/dsir discipline): parameters live as
exact int64 MICRO-units. The E-step per pattern is a fixed expression
tree of IEEE correctly-rounded double ops (convert, ·, +, /, floor) — no
variable-order float summation anywhere — and posteriors are floor-
quantized to micro ints BEFORE the M-step, whose sums are therefore exact
integers (order-free). The DuckDB twin replays the identical trajectory
as unrolled per-step CTEs over the same pattern table and matches
bit-for-bit. Counts stay in int64: Σ n·p_micro ≤ 10^12 pairs · 10^6 <
2^63; the two places a product would exceed int64 (1e6·S over S) divide
in double with a pinned operation order instead, which both engines
evaluate identically.

γ levels (integer-exact, engine-portable — same style as
`scoring.match_condition`):

  g_exact ∈ {0,1}:  a_norm == b_norm
  g_jacc  ∈ {0,1,2}: 2 if 2·|∩| ≥ |∪|, 1 if 4·|∩| ≥ |∪|, else 0
  g_lev   ∈ {0,1,2}: 2 if 5·lev ≤ maxlen, 1 if 2·lev ≤ maxlen, else 0
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FS_STEPS = 16
MICRO = 1_000_000
# level cardinality per field (g_exact, g_jacc, g_lev)
FS_LEVELS = (2, 3, 3)

# fixed EM init (micro units): matches favor agreement, non-matches favor
# disagreement; λ0 = 10%. Any reasonable init works — EM is deterministic
# from it, and the oracle replays the same trajectory.
FS_INIT = {
    "lam": 100_000,
    "m": (
        (300_000, 700_000),
        (100_000, 200_000, 700_000),
        (100_000, 200_000, 700_000),
    ),
    "u": (
        (999_000, 1_000),
        (700_000, 250_000, 50_000),
        (700_000, 250_000, 50_000),
    ),
}

_PARAM_COLS = [
    "lam",
    "m1_0", "m1_1",
    "m2_0", "m2_1", "m2_2",
    "m3_0", "m3_1", "m3_2",
    "u1_0", "u1_1",
    "u2_0", "u2_1", "u2_2",
    "u3_0", "u3_1", "u3_2",
]


def _params_flat(lam: int, m, u) -> dict[str, int]:
    vals = [lam] + list(m[0]) + list(m[1]) + list(m[2]) \
        + list(u[0]) + list(u[1]) + list(u[2])
    return dict(zip(_PARAM_COLS, vals))


# ---------------------------------------------------------------------------
# γ agreement vector
# ---------------------------------------------------------------------------

def gamma_cols() -> tuple[Column, Column, Column]:
    """(g_exact, g_jacc, g_lev) int columns over a pair_features frame."""
    g1 = F.col("exact").cast("int")
    g2 = (
        F.when(F.col("inter") * 2 >= F.col("uni"), F.lit(2))
        .when(F.col("inter") * 4 >= F.col("uni"), F.lit(1))
        .otherwise(F.lit(0))
    )
    g3 = (
        F.when(F.col("lev") * 5 <= F.col("maxlen"), F.lit(2))
        .when(F.col("lev") * 2 <= F.col("maxlen"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return g1, g2.cast("int"), g3.cast("int")


GAMMA_SQL = (
    "CAST(exact AS INT) AS g_exact, "
    "CAST(CASE WHEN inter * 2 >= uni THEN 2 "
    "WHEN inter * 4 >= uni THEN 1 ELSE 0 END AS INT) AS g_jacc, "
    "CAST(CASE WHEN lev * 5 <= maxlen THEN 2 "
    "WHEN lev * 2 <= maxlen THEN 1 ELSE 0 END AS INT) AS g_lev"
)


def gamma_patterns(features: DataFrame) -> DataFrame:
    """The γ-pattern contingency table: (g_exact, g_jacc, g_lev, n).
    ONE partial-agg'd groupBy over the pair set; ≤ 18 output rows."""
    g1, g2, g3 = gamma_cols()
    return (
        features.select(
            g1.alias("g_exact"), g2.alias("g_jacc"), g3.alias("g_lev")
        )
        .groupBy("g_exact", "g_jacc", "g_lev")
        .agg(F.count("*").alias("n"))
    )


def gamma_patterns_sql(features_rel: str) -> str:
    return (
        f"SELECT g_exact, g_jacc, g_lev, count(*) AS n FROM "
        f"(SELECT {GAMMA_SQL} FROM ({features_rel})) "
        f"GROUP BY g_exact, g_jacc, g_lev"
    )


# ---------------------------------------------------------------------------
# EM — driver side (exact replay of the SQL twin; see module docstring)
# ---------------------------------------------------------------------------

def _clamp(v: int) -> int:
    return max(1, min(MICRO - 1, v))


def _posterior_micro(lam, m1, m2, m3, u1, u2, u3) -> int:
    """floor(1e6 · w/(w+v)) with the pinned double expression tree
    ((dbl(λ)·m1)·m2)·m3 — mirrored verbatim by `_POST_SQL`."""
    w = ((float(lam) * m1) * m2) * m3
    v = ((float(MICRO - lam) * u1) * u2) * u3
    return int(math.floor((w * 1_000_000.0) / (w + v)))


def fit_fs_em(patterns: list[dict], n_steps: int = FS_STEPS) -> dict[str, int]:
    """EM over γ-pattern counts (list of dicts with g_exact/g_jacc/g_lev/n).
    Returns the flat micro-int parameter dict (17 entries, `_PARAM_COLS`).
    Pure driver-side integer/pinned-double arithmetic — bit-identical to
    the unrolled-CTE DuckDB replay (`fs_em_params_sql`)."""
    lam = FS_INIT["lam"]
    m = [list(x) for x in FS_INIT["m"]]
    u = [list(x) for x in FS_INIT["u"]]
    n_total = sum(p["n"] for p in patterns)
    if n_total == 0:
        return _params_flat(lam, m, u)
    for _ in range(n_steps):
        s = 0  # Σ n·p_micro            (exact int)
        sm = [[0] * c for c in FS_LEVELS]  # Σ n·p per field level
        su = [[0] * c for c in FS_LEVELS]  # Σ n·(1e6−p) per field level
        for p in patterns:
            g = (p["g_exact"], p["g_jacc"], p["g_lev"])
            pm = _posterior_micro(
                lam, m[0][g[0]], m[1][g[1]], m[2][g[2]],
                u[0][g[0]], u[1][g[1]], u[2][g[2]],
            )
            qm = MICRO - pm
            s += p["n"] * pm
            for k in range(3):
                sm[k][g[k]] += p["n"] * pm
                su[k][g[k]] += p["n"] * qm
        s_safe = max(s, 1)
        t_safe = max(n_total * MICRO - s, 1)
        lam = _clamp(s // n_total)
        for k in range(3):
            for lv in range(FS_LEVELS[k]):
                m[k][lv] = _clamp(int(math.floor((1_000_000.0 * sm[k][lv]) / s_safe)))
                u[k][lv] = _clamp(int(math.floor((1_000_000.0 * su[k][lv]) / t_safe)))
    return _params_flat(lam, m, u)


def fit_fs_em_spark(features: DataFrame, n_steps: int = FS_STEPS) -> dict[str, int]:
    """Collect the ≤18-row pattern table (the module's single exchange)
    and fit on the driver."""
    rows = gamma_patterns(features).collect()
    return fit_fs_em([r.asDict() for r in rows], n_steps)


def _collect_patterns(features: DataFrame) -> list[dict]:
    return [r.asDict() for r in gamma_patterns(features).collect()]


# ---------------------------------------------------------------------------
# Output frames
# ---------------------------------------------------------------------------

def fs_em_params(features: DataFrame, n_steps: int = FS_STEPS) -> DataFrame:
    """One-row DataFrame of the fitted parameters (all int64 micro-units)
    plus n_pairs — the machine-readable model card. n_pairs comes from the
    already-collected pattern table, so the pair corpus is scanned ONCE."""
    pats = _collect_patterns(features)
    params = fit_fs_em(pats, n_steps)
    spark = features.sparkSession
    n_pairs = sum(p["n"] for p in pats)
    row = {"n_pairs": n_pairs, **params}
    return spark.createDataFrame(
        [tuple(row[c] for c in ["n_pairs"] + _PARAM_COLS)],
        "n_pairs long, " + " long, ".join(_PARAM_COLS) + " long",
    )


def _pick(prefix: str, field: int, g: Column, params: dict[str, int]) -> Column:
    """CASE g WHEN l THEN <literal param> — levels are literal ints so the
    whole scoring expression stays inside codegen."""
    col = None
    for lv in range(FS_LEVELS[field - 1]):
        lit = F.lit(params[f"{prefix}{field}_{lv}"])
        col = F.when(g == lv, lit) if col is None else col.when(g == lv, lit)
    return col


def fs_match_scores(
    features: DataFrame, params: dict[str, int] | None = None,
    n_steps: int = FS_STEPS,
) -> DataFrame:
    """(a_key, b_key, g_exact, g_jacc, g_lev, posterior_micro, fs_match):
    FS posterior under the fitted model, as a zero-extra-shuffle scan with
    the parameters inlined as literals. fs_match = posterior ≥ 1/2."""
    if params is None:
        params = fit_fs_em_spark(features, n_steps)
    g1, g2, g3 = gamma_cols()
    base = features.select("a_key", "b_key", g1.alias("g_exact"),
                           g2.alias("g_jacc"), g3.alias("g_lev"))
    lam = params["lam"]
    w = (
        (F.lit(float(lam)) * _pick("m", 1, F.col("g_exact"), params))
        * _pick("m", 2, F.col("g_jacc"), params)
    ) * _pick("m", 3, F.col("g_lev"), params)
    v = (
        (F.lit(float(MICRO - lam)) * _pick("u", 1, F.col("g_exact"), params))
        * _pick("u", 2, F.col("g_jacc"), params)
    ) * _pick("u", 3, F.col("g_lev"), params)
    pm = F.floor((w * F.lit(1_000_000.0)) / (w + v)).cast("long")
    return base.select(
        "a_key", "b_key", "g_exact", "g_jacc", "g_lev",
        pm.alias("posterior_micro"),
        (pm >= F.lit(MICRO // 2)).cast("int").alias("fs_match"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins — unrolled-CTE replay (the qualclf/embedcluster pattern)
# ---------------------------------------------------------------------------

def _w0_sql() -> str:
    init = _params_flat(FS_INIT["lam"], FS_INIT["m"], FS_INIT["u"])
    cols = ", ".join(f"CAST({init[c]} AS BIGINT) AS {c}" for c in _PARAM_COLS)
    return f"SELECT {cols}"


def _post_sql(src: str = "w") -> str:
    """Posterior expression per pattern row joined to param row `w` —
    the pinned tree of `_posterior_micro`."""
    m1 = f"(CASE g_exact WHEN 0 THEN {src}.m1_0 ELSE {src}.m1_1 END)"
    m2 = f"(CASE g_jacc WHEN 0 THEN {src}.m2_0 WHEN 1 THEN {src}.m2_1 ELSE {src}.m2_2 END)"
    m3 = f"(CASE g_lev WHEN 0 THEN {src}.m3_0 WHEN 1 THEN {src}.m3_1 ELSE {src}.m3_2 END)"
    u1 = f"(CASE g_exact WHEN 0 THEN {src}.u1_0 ELSE {src}.u1_1 END)"
    u2 = f"(CASE g_jacc WHEN 0 THEN {src}.u2_0 WHEN 1 THEN {src}.u2_1 ELSE {src}.u2_2 END)"
    u3 = f"(CASE g_lev WHEN 0 THEN {src}.u3_0 WHEN 1 THEN {src}.u3_1 ELSE {src}.u3_2 END)"
    w = f"(((CAST({src}.lam AS DOUBLE) * {m1}) * {m2}) * {m3})"
    v = f"(((CAST({MICRO} - {src}.lam AS DOUBLE) * {u1}) * {u2}) * {u3})"
    return f"CAST(floor(({w} * 1000000.0) / ({w} + {v})) AS BIGINT)"


def _mstep_sql(step: int) -> str:
    """fs_w{step+1} from fs_e{step} (pattern rows + pm) — exact int sums,
    pinned-double divisions, clamped; mirrors the fit loop verbatim."""
    clamp = lambda e: f"greatest(1, least({MICRO - 1}, {e}))"  # noqa: E731
    s = "CAST(sum(n * pm) AS BIGINT)"
    n = "CAST(sum(n) AS BIGINT)"
    s_safe = f"greatest({s}, 1)"
    t_safe = f"greatest({n} * {MICRO} - {s}, 1)"
    parts = [f"{clamp(f'{s} // {n}')} AS lam"]
    fields = {1: ("g_exact", 2), 2: ("g_jacc", 3), 3: ("g_lev", 3)}
    for k, (gcol, n_levels) in fields.items():
        for lv in range(n_levels):
            num_m = f"CAST(sum(CASE WHEN {gcol} = {lv} THEN n * pm ELSE 0 END) AS BIGINT)"
            num_u = (
                f"CAST(sum(CASE WHEN {gcol} = {lv} "
                f"THEN n * ({MICRO} - pm) ELSE 0 END) AS BIGINT)"
            )
            parts.append(
                clamp(f"CAST(floor((1000000.0 * {num_m}) / {s_safe}) AS BIGINT)")
                + f" AS m{k}_{lv}"
            )
            parts.append(
                clamp(f"CAST(floor((1000000.0 * {num_u}) / {t_safe}) AS BIGINT)")
                + f" AS u{k}_{lv}"
            )
    return "SELECT " + ", ".join(parts) + f" FROM fs_e{step}"


def _em_ctes(features_rel: str, n_steps: int = FS_STEPS) -> str:
    """CTE chain fs_pat, fs_w0, fs_e0, fs_w1, … fs_w{n_steps}. MATERIALIZED
    pattern table (≤18 rows) so each step re-reads rows, not the plan —
    the bpe.py MATERIALIZED lesson."""
    ctes = [
        f"fs_pat AS MATERIALIZED ({gamma_patterns_sql(features_rel)})",
        f"fs_w0 AS ({_w0_sql()})",
    ]
    for s in range(n_steps):
        ctes.append(
            f"fs_e{s} AS (SELECT p.g_exact, p.g_jacc, p.g_lev, p.n, "
            f"{_post_sql('w')} AS pm FROM fs_pat p CROSS JOIN fs_w{s} w)"
        )
        ctes.append(f"fs_w{s + 1} AS ({_mstep_sql(s)})")
    return ",\n    ".join(ctes)


def fs_em_params_sql(
    features_rel: str, n_steps: int = FS_STEPS, prefix_ctes: str = ""
) -> str:
    """DuckDB twin of `fs_em_params`: replays the EM trajectory and emits
    the one-row parameter card. Empty pair set → init params (the guard
    mirrored from `fit_fs_em`). `prefix_ctes` lets the caller prepend the
    pipeline CTE chain that defines `features_rel` (single WITH clause —
    SQL forbids stacking two)."""
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
    WITH {pre} {_em_ctes(features_rel, n_steps)},
    fs_n AS (SELECT coalesce(CAST(sum(n) AS BIGINT), 0) AS n_pairs FROM fs_pat)
    SELECT n.n_pairs,
           {", ".join(
        f"CASE WHEN n.n_pairs = 0 THEN w0.{c} ELSE w.{c} END AS {c}"
        for c in _PARAM_COLS
    )}
    FROM fs_n n CROSS JOIN fs_w{n_steps} w CROSS JOIN fs_w0 w0
    """


def fs_edges_ctes(features_rel: str, n_steps: int = FS_STEPS) -> str:
    """CTE chain ending in `fs_edges(a_key, b_key)` — the pairs the
    fitted model calls matches (posterior ≥ 1/2). Lets callers compose
    the FS decision into a larger query (e.g. the unsupervised
    clustering tail `fs_clusters`)."""
    return (
        _em_ctes(features_rel, n_steps)
        + f""",
    fs_g AS (SELECT a_key, b_key, {GAMMA_SQL} FROM ({features_rel})),
    fs_edges AS (SELECT g.a_key, g.b_key FROM fs_g g CROSS JOIN fs_w{n_steps} w
                 WHERE {_post_sql('w')} >= {MICRO // 2})"""
    )


def fs_match_scores_sql(
    features_rel: str, n_steps: int = FS_STEPS, prefix_ctes: str = ""
) -> str:
    """DuckDB twin of `fs_match_scores` (model refit in-query, then pairs
    scored under the final param row)."""
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
    WITH {pre} {_em_ctes(features_rel, n_steps)},
    fs_g AS (SELECT a_key, b_key, {GAMMA_SQL} FROM ({features_rel}))
    SELECT g.a_key, g.b_key, g.g_exact, g.g_jacc, g.g_lev,
           {_post_sql('w')} AS posterior_micro,
           CAST({_post_sql('w')} >= {MICRO // 2} AS INT) AS fs_match
    FROM fs_g g CROSS JOIN fs_w{n_steps} w
    """


# ---------------------------------------------------------------------------
# Term-frequency adjustment (Splink's term_frequency_adjustments)
# ---------------------------------------------------------------------------
#
# The global u1_1 is the probability two random NON-matches agree exactly
# — an average over all values. Agreement on a COMMON value ("ok",
# "thanks") is far weaker evidence than agreement on a rare identifier,
# and the classical fix (Winkler 1988; Splink's term_frequency_adjustments)
# replaces u for the exact-agreement level with the term frequency of the
# shared value itself: u1' = n_v / N, clamped to [1, 1e6-1] micro-units.
# m, λ and the other fields' parameters are untouched, so common-value
# pairs are demoted and rare-value pairs promoted by exactly their
# frequency ratio.
#
# 100 TB shape: the value-frequency table is ONE partial-agg'd groupBy
# over records; pairs LEFT-join it on the shared value (an ordinary
# shuffled equi-join — hot values are bounded because the block cap
# already bounds how many pairs can share one value); the fitted
# parameters ride as literals, so scoring adds exactly one exchange over
# `fs_match_scores`. N (total records) is a 1-row driver probe, same
# discipline as the module's pattern-table collect.


def _tf_u1_micro(n_records: int):
    """Clamped micro term-frequency: greatest(1, least(1e6-1,
    (1e6 * n_v) div N)) — exact int64 arithmetic in both engines."""
    return F.greatest(
        F.lit(1),
        F.least(
            F.lit(MICRO - 1),
            F.expr(f"(cast({MICRO} as bigint) * n_v) div {int(n_records)}"),
        ),
    )


def fs_tf_match_scores(
    features: DataFrame,
    records: DataFrame,
    params: dict[str, int] | None = None,
    n_steps: int = FS_STEPS,
) -> DataFrame:
    """(a_key, b_key, g_exact, g_jacc, g_lev, n_v, posterior_micro,
    posterior_tf_micro, fs_match_tf): FS posterior with and without the
    term-frequency adjustment on the exact-agreement level. n_v is the
    corpus frequency of the pair's left normalized text (the shared value
    whenever g_exact = 1 — the only rows whose posterior it affects)."""
    if params is None:
        params = fit_fs_em_spark(features, n_steps)
    n_records = records.count()
    vf = records.groupBy("norm_text").agg(F.count("*").alias("n_v"))
    g1, g2, g3 = gamma_cols()
    base = features.select(
        "a_key", "b_key", "a_norm", g1.alias("g_exact"),
        g2.alias("g_jacc"), g3.alias("g_lev"),
    ).join(vf, F.col("a_norm") == F.col("norm_text"), "left")
    lam = params["lam"]

    def _post(u1: Column) -> Column:
        w = (
            (F.lit(float(lam)) * _pick("m", 1, F.col("g_exact"), params))
            * _pick("m", 2, F.col("g_jacc"), params)
        ) * _pick("m", 3, F.col("g_lev"), params)
        v = (
            (F.lit(float(MICRO - lam)) * u1)
            * _pick("u", 2, F.col("g_jacc"), params)
        ) * _pick("u", 3, F.col("g_lev"), params)
        return F.floor((w * F.lit(1_000_000.0)) / (w + v)).cast("long")

    u1_base = _pick("u", 1, F.col("g_exact"), params)
    u1_tf = F.when(
        F.col("g_exact") == 1, _tf_u1_micro(n_records)
    ).otherwise(F.lit(params["u1_0"]))
    pm_tf = _post(u1_tf)
    return base.select(
        "a_key", "b_key", "g_exact", "g_jacc", "g_lev",
        F.coalesce(F.col("n_v"), F.lit(0)).alias("n_v"),
        _post(u1_base).alias("posterior_micro"),
        pm_tf.alias("posterior_tf_micro"),
        (pm_tf >= F.lit(MICRO // 2)).cast("int").alias("fs_match_tf"),
    )


def fs_tf_match_scores_sql(
    features_rel: str,
    records_rel: str,
    n_steps: int = FS_STEPS,
    prefix_ctes: str = "",
) -> str:
    """DuckDB twin of `fs_tf_match_scores`: EM replay, value-frequency
    CTE, and the identical pinned posterior expressions with u1 swapped
    for the clamped micro term frequency on exact-agreement rows."""
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    u1_tf = (
        f"(CASE WHEN g.g_exact = 1 THEN greatest(1, least({MICRO - 1}, "
        f"(CAST({MICRO} AS BIGINT) * vf.n_v) // n.nr)) ELSE w.u1_0 END)"
    )
    u2 = "(CASE g_jacc WHEN 0 THEN w.u2_0 WHEN 1 THEN w.u2_1 ELSE w.u2_2 END)"
    u3 = "(CASE g_lev WHEN 0 THEN w.u3_0 WHEN 1 THEN w.u3_1 ELSE w.u3_2 END)"
    m1 = "(CASE g_exact WHEN 0 THEN w.m1_0 ELSE w.m1_1 END)"
    m2 = "(CASE g_jacc WHEN 0 THEN w.m2_0 WHEN 1 THEN w.m2_1 ELSE w.m2_2 END)"
    m3 = "(CASE g_lev WHEN 0 THEN w.m3_0 WHEN 1 THEN w.m3_1 ELSE w.m3_2 END)"
    wtree = f"(((CAST(w.lam AS DOUBLE) * {m1}) * {m2}) * {m3})"
    vtree_tf = f"(((CAST({MICRO} - w.lam AS DOUBLE) * {u1_tf}) * {u2}) * {u3})"
    pm_tf = (
        f"CAST(floor(({wtree} * 1000000.0) / ({wtree} + {vtree_tf})) AS BIGINT)"
    )
    return f"""
    WITH {pre} {_em_ctes(features_rel, n_steps)},
    fs_vf AS (SELECT norm_text, count(*) AS n_v FROM ({records_rel})
              GROUP BY norm_text),
    fs_nr AS (SELECT count(*) AS nr FROM ({records_rel})),
    fs_g AS (SELECT a_key, b_key, a_norm, {GAMMA_SQL} FROM ({features_rel}))
    SELECT g.a_key, g.b_key, g.g_exact, g.g_jacc, g.g_lev,
           coalesce(vf.n_v, 0) AS n_v,
           {_post_sql('w')} AS posterior_micro,
           {pm_tf} AS posterior_tf_micro,
           CAST({pm_tf} >= {MICRO // 2} AS INT) AS fs_match_tf
    FROM fs_g g
    LEFT JOIN fs_vf vf ON g.a_norm = vf.norm_text
    CROSS JOIN fs_w{n_steps} w CROSS JOIN fs_nr n
    """
