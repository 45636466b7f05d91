"""Stage 2 — batched pairwise scoring.

The reference scores a mention-candidate pair with local compatibility
(TF-IDF cosine, `md/MentionDetection.java:264-288`), a popularity prior
(`data/NameEntry.java:32-36`), and graph relatedness folded in by loopy BP
(`loopybeliefpropagation/Scorer*.java`). Our engine replaces the BP
coupling with a calibrated logistic combiner over string/set-similarity
features, per the north_star.

Two scorer layers:

  * `pair_features` / `match_edges` — pure Spark SQL expressions
    (levenshtein, token Jaccard, exact-equality). The MATCH DECISION is
    integer-exact (2*|∩| >= |∪|, 10*lev <= 3*maxlen) so the DuckDB oracle
    reproduces it bit-for-bit — no float-threshold flakiness.
  * `jaro_winkler` pandas UDF + `logistic_score` — the full feature set for
    quality-sensitive deployments; Arrow-vectorized, never per-row Python
    (input_hint requirement).

Scale notes: the features join `pairs × records` twice on rec_key — two
shuffle joins whose build side is the (much smaller) capped pair list; AQE
picks broadcast when pairs fit. Levenshtein cost is bounded by truncating
to LEV_PREFIX chars (O(L²) per pair otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEV_PREFIX = 100  # bound O(L^2) edit-distance cost per pair

# integer-exact decision thresholds: jaccard >= 1/2, lev <= 0.2*maxlen
JACC_NUM, JACC_DEN = 1, 2
LEV_NUM, LEV_DEN = 1, 5

# calibrated logistic weights (fixed; calibration harness in tests sweeps
# the threshold the way VerifyBaseline.java:90-137 sweeps its grid)
LOGIT_BIAS = -6.0
LOGIT_W_JACC = 6.0
LOGIT_W_LEV = 5.0
LOGIT_W_EXACT = 4.0


def pair_features(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """Attach per-pair similarity features. Output: a_key, b_key, inter,
    uni, lev, maxlen, exact (+ norm texts for downstream UDF features)."""
    ra = records.select(
        F.col("rec_key").alias("a_key"),
        F.col("norm_text").alias("a_norm"),
        F.col("tokens").alias("a_tokens"),
    )
    rb = records.select(
        F.col("rec_key").alias("b_key"),
        F.col("norm_text").alias("b_norm"),
        F.col("tokens").alias("b_tokens"),
    )
    df = pairs.join(ra, "a_key").join(rb, "b_key")
    return df.select(
        "a_key",
        "b_key",
        "a_norm",
        "b_norm",
        F.size(F.array_intersect("a_tokens", "b_tokens")).alias("inter"),
        F.size(F.array_union("a_tokens", "b_tokens")).alias("uni"),
        F.levenshtein(
            F.substring("a_norm", 1, LEV_PREFIX), F.substring("b_norm", 1, LEV_PREFIX)
        ).alias("lev"),
        F.greatest(
            F.least(F.length("a_norm"), F.lit(LEV_PREFIX)),
            F.least(F.length("b_norm"), F.lit(LEV_PREFIX)),
        ).alias("maxlen"),
        (F.col("a_norm") == F.col("b_norm")).cast("int").alias("exact"),
    )


def pair_features_sql(pairs_rel: str, records_rel: str) -> str:
    return f"""
    SELECT p.a_key, p.b_key, ra.norm_text AS a_norm, rb.norm_text AS b_norm,
           len(list_intersect(ra.tokens, rb.tokens)) AS inter,
           len(list_distinct(list_concat(ra.tokens, rb.tokens))) AS uni,
           levenshtein(substr(ra.norm_text, 1, {LEV_PREFIX}),
                       substr(rb.norm_text, 1, {LEV_PREFIX})) AS lev,
           greatest(least(length(ra.norm_text), {LEV_PREFIX}),
                    least(length(rb.norm_text), {LEV_PREFIX})) AS maxlen,
           CAST(ra.norm_text = rb.norm_text AS INT) AS exact
    FROM ({pairs_rel}) p
    JOIN ({records_rel}) ra ON p.a_key = ra.rec_key
    JOIN ({records_rel}) rb ON p.b_key = rb.rec_key
    """


def match_condition():
    """Integer-exact match rule (engine-portable). OR-of-evidence form:
    exact normalized text, OR high token-set overlap (Jaccard >= 1/2 —
    strong for attribute-style records where shared rare tokens dominate),
    OR small edit distance (<= 20% of the longer string — catches token
    reorderings and typos that depress Jaccard). Disjunction because each
    clause alone has near-1 precision on record-shaped text while
    covering a different error mode; the conjunction form failed exactly
    the typo+reorder pairs the reference's alias dictionary absorbed."""
    return (
        (F.col("exact") == 1)
        | (F.col("inter") * JACC_DEN >= F.col("uni") * JACC_NUM)
        | (F.col("lev") * LEV_DEN <= F.col("maxlen") * LEV_NUM)
    )


MATCH_CONDITION_SQL = (
    f"(exact = 1 OR inter * {JACC_DEN} >= uni * {JACC_NUM} "
    f"OR lev * {LEV_DEN} <= maxlen * {LEV_NUM})"
)


def match_edges(features: DataFrame) -> DataFrame:
    """(a_key, b_key) edges that pass the match rule."""
    return features.filter(match_condition()).select("a_key", "b_key")


def match_edges_sql(features_rel: str) -> str:
    return f"SELECT a_key, b_key FROM ({features_rel}) WHERE {MATCH_CONDITION_SQL}"


# ---------------------------------------------------------------------------
# Vectorized pandas-UDF features (the full scorer; Arrow-batched, no per-row
# Python). Jaro-Winkler: numpy bit-parallel batch kernel (functions/jaro.py),
# bit-identical to DuckDB jaro_winkler_similarity on 64-char-truncated input.
# ---------------------------------------------------------------------------

from ..functions.jaro import (  # noqa: E402  (re-export for tests)
    JW_MAXLEN,
    jaro_winkler_batch,
    jaro_winkler_py,
)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    # One numpy bit-parallel kernel call per Arrow batch — no per-row
    # Python anywhere (input_hint requirement); ~87k pairs/s/core vs ~25k
    # for the round-1 interpreted loop (tools/bench_scoring.py).
    return pd.Series(jaro_winkler_batch(a.tolist(), b.tolist()), dtype="float64")


def jaro_winkler_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin of `jaro_winkler_udf` (same 64-char truncation)."""
    return (
        f"jaro_winkler_similarity(substr({a_expr}, 1, {JW_MAXLEN}), "
        f"substr({b_expr}, 1, {JW_MAXLEN}))"
    )


LOGISTIC_SCORE_SQL = (
    f"1.0 / (1.0 + exp(-({LOGIT_BIAS} "
    f"+ {LOGIT_W_JACC} * (inter / CAST(greatest(uni, 1) AS DOUBLE)) "
    f"+ {LOGIT_W_LEV} * (1.0 - lev / CAST(greatest(maxlen, 1) AS DOUBLE)) "
    f"+ {LOGIT_W_EXACT} * exact)))"
)


def logistic_score_col(jacc, lev_sim, exact):
    """sigmoid(b + w·x) as a Spark column; weights module-level constants."""
    z = (
        F.lit(LOGIT_BIAS)
        + F.lit(LOGIT_W_JACC) * jacc
        + F.lit(LOGIT_W_LEV) * lev_sim
        + F.lit(LOGIT_W_EXACT) * exact
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def scored_pairs(features: DataFrame, with_jw: bool = False) -> DataFrame:
    """Full scorer output: features + continuous logistic score + decision.
    `with_jw=True` adds the pandas-UDF Jaro-Winkler column."""
    jacc = F.col("inter") / F.greatest(F.col("uni"), F.lit(1))
    lev_sim = F.lit(1.0) - F.col("lev") / F.greatest(F.col("maxlen"), F.lit(1))
    out = features.withColumn(
        "score", logistic_score_col(jacc, lev_sim, F.col("exact"))
    ).withColumn("is_match", match_condition())
    if with_jw:
        out = out.withColumn("jw", jaro_winkler_udf(F.col("a_norm"), F.col("b_norm")))
    return out


# ---------------------------------------------------------------------------
# T9/T10/T11 — popularity, candidate prior, and log-PMI compatibility (λ)
# over block co-membership statistics
# ---------------------------------------------------------------------------
#
# The reference's full scorer combines a candidate prior p(e|m) =
# freq(e,m)/freq(m) (`/root/reference/src/data/NameEntry.java:32-36`,
# consumed at `loopybeliefpropagation/ScorerFull.java:45,95`), popularity
# 1+|inlinks| (T9, `index/EntityLinksIndex.java:58-61`), and a log-PMI
# link-compatibility term λ = log(cocit) − log(pop1) − log(pop2) floored
# at the anticorrelation constant log(PAIRS) − 2·log(LINKS)
# (`ScorerFull.java:19-21,100-119`). Transcripts have no link graph, so
# the *block co-membership graph* plays its role — the same statistical
# object (how often two records are attested together vs how promiscuous
# each is), derived from data the pipeline already computed:
#   pop(r)      = 1 + #blocks(r)                     (T9 analog)
#   prior(a,b)  = co(a,b) / min(#blocks a, #blocks b) (T11 analog)
#   λ(a,b)      = ln co − ln pop_a − ln pop_b,
#                 floored at ln Σco − 2·ln Σmemberships (T10 analog)

W_PRIOR = 2.0
W_LAM = 1.0


def pair_block_stats(pairs: DataFrame, capped_blocks: DataFrame) -> DataFrame:
    """(a_key, b_key, co, nb_a, nb_b): shared-block count per pair and
    distinct-block count per side, over the capped block table the pairs
    were generated from. One groupBy per side + one pair-keyed groupBy —
    all shuffles on bounded keys (the cap bounds block size; block count
    per record is bounded by the number of block families + LSH bands)."""
    nb = capped_blocks.groupBy("rec_key").agg(
        F.countDistinct("block_key").alias("nb")
    )
    ba = capped_blocks.select(F.col("rec_key").alias("a_key"), "block_key")
    bb = capped_blocks.select(F.col("rec_key").alias("b_key"), "block_key")
    co = (
        pairs.join(ba, "a_key")
        .join(bb, ["b_key", "block_key"])
        .groupBy("a_key", "b_key")
        .agg(F.countDistinct("block_key").alias("co"))
    )
    na = nb.select(F.col("rec_key").alias("a_key"), F.col("nb").alias("nb_a"))
    nbb = nb.select(F.col("rec_key").alias("b_key"), F.col("nb").alias("nb_b"))
    return (
        pairs.join(co, ["a_key", "b_key"], "left")
        .join(na, "a_key")
        .join(nbb, "b_key")
        .select(
            "a_key", "b_key", F.coalesce("co", F.lit(0)).alias("co"), "nb_a", "nb_b"
        )
    )


def pair_block_stats_sql(pairs_rel: str, capped_rel: str) -> str:
    return f"""
    SELECT p.a_key, p.b_key, coalesce(c.co, 0) AS co, na.nb AS nb_a, nbb.nb AS nb_b
    FROM ({pairs_rel}) p
    LEFT JOIN (
      SELECT ba.rec_key AS a_key, bb.rec_key AS b_key,
             count(DISTINCT ba.block_key) AS co
      FROM ({capped_rel}) ba
      JOIN ({capped_rel}) bb USING (block_key)
      JOIN ({pairs_rel}) pp ON pp.a_key = ba.rec_key AND pp.b_key = bb.rec_key
      GROUP BY ba.rec_key, bb.rec_key
    ) c ON p.a_key = c.a_key AND p.b_key = c.b_key
    JOIN (SELECT rec_key, count(DISTINCT block_key) AS nb FROM ({capped_rel}) GROUP BY rec_key) na
      ON p.a_key = na.rec_key
    JOIN (SELECT rec_key, count(DISTINCT block_key) AS nb FROM ({capped_rel}) GROUP BY rec_key) nbb
      ON p.b_key = nbb.rec_key
    """


def scored_pairs_full(
    features: DataFrame, stats: DataFrame, capped_blocks: DataFrame
) -> DataFrame:
    """Full scorer row: similarity features + prior + λ + combined score.

    Output: (a_key, b_key, co, pop_a, pop_b, prior, lam, score_full), the
    float columns rounded to 6 dp for oracle hashing. The anticorrelation
    floor is computed from corpus totals (Σco over pairs, Σ block
    memberships), mirroring the reference's corpus constants."""
    totals = stats.agg(
        F.sum("co").alias("tot_co"),
    ).crossJoin(
        capped_blocks.agg(F.count("*").alias("tot_mem"))
    )
    df = features.join(stats, ["a_key", "b_key"]).crossJoin(F.broadcast(totals))
    pop_a = F.lit(1) + F.col("nb_a")
    pop_b = F.lit(1) + F.col("nb_b")
    prior = F.col("co") / F.least("nb_a", "nb_b")
    lam_floor = F.log(F.col("tot_co").cast("double")) - F.lit(2.0) * F.log(
        F.col("tot_mem").cast("double")
    )
    lam = F.greatest(
        F.log(F.col("co").cast("double"))
        - F.log(pop_a.cast("double"))
        - F.log(pop_b.cast("double")),
        lam_floor,
    )
    lam_norm = F.lit(1.0) - lam / lam_floor  # [0,1]: floor→0, λ=0→1
    jacc = F.col("inter") / F.greatest(F.col("uni"), F.lit(1))
    lev_sim = F.lit(1.0) - F.col("lev") / F.greatest(F.col("maxlen"), F.lit(1))
    z = (
        F.lit(LOGIT_BIAS)
        + F.lit(LOGIT_W_JACC) * jacc
        + F.lit(LOGIT_W_LEV) * lev_sim
        + F.lit(LOGIT_W_EXACT) * F.col("exact")
        + F.lit(W_PRIOR) * prior
        + F.lit(W_LAM) * lam_norm
    )
    return df.select(
        "a_key",
        "b_key",
        "co",
        pop_a.alias("pop_a"),
        pop_b.alias("pop_b"),
        F.round(prior, 6).alias("prior"),
        F.round(lam, 6).alias("lam"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score_full"),
    )


def scored_pairs_full_sql(
    features_rel: str, stats_rel: str, capped_rel: str
) -> str:
    lam_floor = "(ln(CAST(t.tot_co AS DOUBLE)) - 2.0 * ln(CAST(t.tot_mem AS DOUBLE)))"
    lam = (
        f"greatest(ln(CAST(s.co AS DOUBLE)) - ln(CAST(1 + s.nb_a AS DOUBLE)) "
        f"- ln(CAST(1 + s.nb_b AS DOUBLE)), {lam_floor})"
    )
    prior = "(CAST(s.co AS DOUBLE) / least(s.nb_a, s.nb_b))"
    z = (
        f"{LOGIT_BIAS} + {LOGIT_W_JACC} * (f.inter / CAST(greatest(f.uni, 1) AS DOUBLE)) "
        f"+ {LOGIT_W_LEV} * (1.0 - f.lev / CAST(greatest(f.maxlen, 1) AS DOUBLE)) "
        f"+ {LOGIT_W_EXACT} * f.exact "
        f"+ {W_PRIOR} * {prior} "
        f"+ {W_LAM} * (1.0 - {lam} / {lam_floor})"
    )
    return f"""
    SELECT f.a_key, f.b_key, s.co,
           1 + s.nb_a AS pop_a, 1 + s.nb_b AS pop_b,
           round({prior}, 6) AS prior,
           round({lam}, 6) AS lam,
           round(1.0 / (1.0 + exp(-({z}))), 6) AS score_full
    FROM ({features_rel}) f
    JOIN ({stats_rel}) s ON f.a_key = s.a_key AND f.b_key = s.b_key
    CROSS JOIN (
      SELECT (SELECT sum(co) FROM ({stats_rel})) AS tot_co,
             (SELECT count(*) FROM ({capped_rel})) AS tot_mem
    ) t
    """


# ---------------------------------------------------------------------------
# embedding-similarity pair feature (north_star scorer feature #4)
# ---------------------------------------------------------------------------


def pair_embedding_cosine(
    pairs: DataFrame,
    records: DataFrame,
    dim: int | None = None,
    hash_mode: str = "portable",
) -> DataFrame:
    """(a_key, b_key, emb_cos): cosine between the turns' feature-hashed
    token embeddings (`functions/embed.py`; a real encoder's
    `array<float>` column drops into the same join unchanged).

    Plan shape: embeddings are a pure expression over `records` (no
    shuffle), so this is exactly the two key-joins `pair_features` already
    pays — the cosine itself is a fixed-width `zip_with`/`aggregate` fold
    inside codegen. Zero-norm sides (empty texts) score 0.0."""
    from ..functions.embed import EMB_DIM, hashed_embedding_col
    from .simsearch import dot_col, norm_col

    dim = dim or EMB_DIM
    embs = records.select(
        "rec_key",
        hashed_embedding_col(F.col("tokens"), dim, hash_mode).alias("emb"),
    )
    ea = embs.select(F.col("rec_key").alias("a_key"), F.col("emb").alias("a_emb"))
    eb = embs.select(F.col("rec_key").alias("b_key"), F.col("emb").alias("b_emb"))
    na = norm_col(F.col("a_emb"), dim)
    nb = norm_col(F.col("b_emb"), dim)
    return (
        pairs.join(ea, "a_key")
        .join(eb, "b_key")
        .select(
            "a_key",
            "b_key",
            F.when(
                na * nb > 0,
                F.round(dot_col(F.col("a_emb"), F.col("b_emb"), dim) / (na * nb), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("emb_cos"),
        )
    )


def pair_embedding_cosine_sql(
    pairs_rel: str, records_rel: str, dim: int | None = None
) -> str:
    from ..functions.embed import EMB_DIM, hashed_embedding_sql
    from .simsearch import dot_sql, norm_sql

    dim = dim or EMB_DIM
    embs = (
        f"SELECT rec_key, {hashed_embedding_sql('tokens', dim)} AS emb "
        f"FROM ({records_rel})"
    )
    na = norm_sql("ea.emb", dim)
    nb = norm_sql("eb.emb", dim)
    return f"""
    SELECT p.a_key, p.b_key,
           CASE WHEN {na} * {nb} > 0
                THEN round({dot_sql('ea.emb', 'eb.emb', dim)} / ({na} * {nb}), 6)
                ELSE 0.0 END AS emb_cos
    FROM ({pairs_rel}) p
    JOIN ({embs}) ea ON p.a_key = ea.rec_key
    JOIN ({embs}) eb ON p.b_key = eb.rec_key
    """


@F.pandas_udf(T.DoubleType())
def jaro_winkler_max_udf(a: pd.Series, bs: pd.Series) -> pd.Series:
    # one flattened jaro_winkler_batch + np.maximum.reduceat segment-max
    # per Arrow batch (functions/jaro.py:jaro_winkler_max_batch) — no
    # per-comparison Python.
    from ..functions.jaro import jaro_winkler_max_batch

    return pd.Series(jaro_winkler_max_batch(a.tolist(), bs.tolist()), dtype="float64")


def monge_elkan(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """(a_key, b_key, me_ab, me_ba, me_sym): Monge-Elkan hybrid string
    similarity (Monge & Elkan 1996; Christen 2012 §5.5) with Jaro-Winkler
    as the internal measure — the classic ER scorer for token-REORDERED
    and per-token-typo'd records, where whole-string JW collapses and
    token Jaccard sees disjoint sets:

        me_ab = mean over A's token occurrences of max_b JW(a_tok, b_tok)

    It is asymmetric (a subset-titled record scores 1.0 against its
    superset from the short side), so both directions plus the
    symmetrized mean (Christen's recommended form) are returned. Each
    token OCCURRENCE counts — positions, not distinct values, are the
    ME outer sum (the SQL twin indexes by position for the same reason).

    Scale shape: two rec_key equi-joins attach the token arrays; the
    cross product lives INSIDE the Arrow kernel (posexplode of the outer
    side is narrow; only (pair-key, position, max) rows — never the
    arrays — cross the aggregation shuffle); one partial-agg'd
    groupBy(pair) closes each direction. round(·,6) on the mean: the sum
    order over bit-identical JW doubles differs between engines (the
    documented tfidf discipline).

    Reference analog: token-level soft matching generalizes the
    reference's per-token candidate probe
    (`md/MentionDetection.java:166-194`) from exact dictionary hits to
    fuzzy token alignment."""
    tok = records.select("rec_key", "tokens")
    pt = (
        pairs.join(tok.withColumnRenamed("rec_key", "a_key"), "a_key")
        .withColumnRenamed("tokens", "a_tokens")
        .join(tok.withColumnRenamed("rec_key", "b_key"), "b_key")
        .withColumnRenamed("tokens", "b_tokens")
    )

    def _dir(src: DataFrame, out_name: str) -> DataFrame:
        ex = src.select(
            "a_key",
            "b_key",
            F.posexplode("from_tokens").alias("ti", "tok"),
            F.col("to_tokens"),
        )
        mx = ex.select(
            "a_key",
            "b_key",
            "ti",
            jaro_winkler_max_udf(F.col("tok"), F.col("to_tokens")).alias("mx"),
        )
        # UNROUNDED directional mean: me_sym must be derived from the raw
        # means — a mean of two already-6dp-rounded values lands exactly
        # on .5 round boundaries half the time the last digits differ in
        # parity, where Spark (HALF_UP on the shortest decimal repr) and
        # DuckDB (scaled-double rounding) legitimately disagree. The raw
        # means hit such boundaries with ~0 probability (the standard
        # round(·,6) discipline).
        return mx.groupBy("a_key", "b_key").agg(F.avg("mx").alias(out_name))

    ab = _dir(
        pt.select(
            "a_key", "b_key",
            F.col("a_tokens").alias("from_tokens"),
            F.col("b_tokens").alias("to_tokens"),
        ),
        "me_ab",
    )
    ba = _dir(
        pt.select(
            "a_key", "b_key",
            F.col("b_tokens").alias("from_tokens"),
            F.col("a_tokens").alias("to_tokens"),
        ),
        "me_ba",
    )
    return ab.join(ba, ["a_key", "b_key"]).select(
        "a_key",
        "b_key",
        F.round("me_ab", 6).alias("me_ab"),
        F.round("me_ba", 6).alias("me_ba"),
        F.round((F.col("me_ab") + F.col("me_ba")) / 2, 6).alias("me_sym"),
    )


def monge_elkan_sql(pairs_rel: str, records_rel: str) -> str:
    """DuckDB twin: position-indexed unnest (range + array index — each
    token occurrence is its own outer term), jaro_winkler_similarity on
    the 64-char-truncated tokens, max per occurrence, round(avg,6) per
    direction."""
    jw = jaro_winkler_sql("f.from_tokens[t.i]", "b_tok")

    def one(frm: str, to: str, out: str) -> str:
        return f"""
        SELECT a_key, b_key, avg(mx) AS {out}
        FROM (
          SELECT f.a_key, f.b_key, t.i, max({jw}) AS mx
          FROM (SELECT p.a_key, p.b_key, ra.tokens AS from_tokens,
                       rb.tokens AS to_tokens
                FROM ({pairs_rel}) p
                JOIN ({records_rel}) ra ON p.{frm} = ra.rec_key
                JOIN ({records_rel}) rb ON p.{to} = rb.rec_key) f,
               unnest(range(1, len(f.from_tokens) + 1)) AS t(i),
               unnest(f.to_tokens) AS u(b_tok)
          GROUP BY f.a_key, f.b_key, t.i
        ) GROUP BY a_key, b_key
        """

    return f"""
    SELECT ab.a_key, ab.b_key,
           round(ab.me_ab, 6) AS me_ab, round(ba.me_ba, 6) AS me_ba,
           round((ab.me_ab + ba.me_ba) / 2, 6) AS me_sym
    FROM ({one('a_key', 'b_key', 'me_ab')}) ab
    JOIN ({one('b_key', 'a_key', 'me_ba')}) ba USING (a_key, b_key)
    """
