"""TF-IDF, keyphraseness, and relatedness operators.

The reference's statistical-index builders re-expressed relationally:

  * term_df            — A1 count-distinct docs per term
                         (`/root/reference/src/knowledgebase/DFTermIndexBuilder.java:54-99`)
  * token_tfidf        — A6 tf·idf per (doc, term) with T7 idf = ln(N/df)
                         (`EntityTFIDFBuilder.java:78-106`,
                          `index/TermDocumentFrequencyIndex.java:37-51`) and
                         T12 importance = tfidf / Σ_doc tfidf
                         (`md/MentionDetection.java:290-304`)
  * keyphrase_topk     — W1 top-k terms per doc, k = max(1, ⌈6%·tokens⌉),
                         W6 deterministic tie-break
                         (`md/MentionDetection.java:166-209`, `md/Mention.java:207-219`)
  * token_keyphraseness— A2/T13 linked/total ratio with the F3 min-support
                         filter (`KeyphrasenessIndexBuilder.java:87-178`,
                          `index/MentionIndex.java:21,36-41`)
  * source_candidate_cut — A3 frequency histogram + 2%-relative cut
                         (`EntityMentionFrequencyIndexBuilder.java:138-167`)
  * milne_witten_relatedness — T8 over token co-occurrence
                         (`index/EntityLinksIndex.java:42-56`), co-citation
                         via J4-style self-join intersection
  * pair_tfidf_cosine  — T6 sparse cosine between candidate-pair records
                         (`md/MentionDetection.java:264-288`)

Scale shape: all aggregations are partial-agg'd groupBys; the only
self-join (co-occurrence) is df-bounded on both sides (min-support + cap)
and per-doc top-k-bounded, which is the reference's own fanout-guard
precedent applied to pairs.
Float parity: ln/round(·,6) computed with identical operand order in both
engines. Known residual risk (documented, accepted): round(·,6) over sums
of doubles (importance, cosine dot) depends on summation order, which
Spark partial aggregation and DuckDB do not guarantee identically; a value
landing exactly on a 6-dp rounding boundary could hash-mismatch. Observed
never in practice on this corpus; the alternative (sort-then-sum in both
engines) would serialize the aggregation and is not worth it.

IDF deviation from the reference (T7): `token_tfidf` uses the textbook
unsmoothed idf = ln(N/df). The reference's exact semantics —
log10(N/(df+1)) smoothing on dictionary miss, 0 when df == N
(`/root/reference/src/index/TermDocumentFrequencyIndex.java:37-51`) — are
provided verbatim by `token_tfidf_ref` below (oracle-checked), so both
formulas are first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KP_PERCENT_NUM, KP_PERCENT_DEN = 6, 100  # reference percent=0.06
MIN_SUPPORT = 5  # F3: totalDocs >= 5
CUT_NUM, CUT_DEN = 2, 100  # A3: LIMIT_CANDIDATES = 0.02
# co-occurrence fanout guard (F4 analog), relative so it scales with the
# corpus: keep terms with df <= 3/4 · N (ubiquitous terms carry no signal
# and explode the self-join)
COOC_CAP_NUM, COOC_CAP_DEN = 3, 4
# per-doc co-occurrence contribution bound: each doc contributes pairs only
# among its MW_DOC_TOPK rarest terms (df asc, term asc tie-break). Without
# this one long document with many mid-df terms emits a quadratic partition
# at 100× scale; the reference's top-6% mention cut per doc
# (`md/MentionDetection.java:32,166-209`) is the precedent.
MW_DOC_TOPK = 32
ANCHOR_PREFIX = 3  # token counts as "linked" when in the doc's first 3 tokens


def term_df(records: DataFrame) -> DataFrame:
    """(term, df): number of distinct docs containing the term."""
    return (
        records.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def term_df_sql(records_rel: str) -> str:
    return f"""
    SELECT term, count(*) AS df
    FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM ({records_rel}))
    GROUP BY term
    """


def token_tfidf(records: DataFrame) -> DataFrame:
    """(doc_id, term, tf, df, tfidf, importance). tfidf = tf·ln(N/df);
    importance = tfidf / Σ_doc tfidf (both round(·,6))."""
    n_docs = records.agg(F.count("*").alias("n_docs"))
    tf = (
        records.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfd = term_df(records)
    raw = (
        tf.join(dfd, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("w"),
        )
    )
    wsum = Window.partitionBy("doc_id")
    return raw.select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("w"), 6).alias("tfidf"),
        F.round(
            F.col("w") / F.greatest(F.sum("w").over(wsum), F.lit(1e-12)), 6
        ).alias("importance"),
    )


def token_tfidf_sql(records_rel: str) -> str:
    return f"""
    SELECT doc_id, term, tf, df,
           round(w, 6) AS tfidf,
           round(w / greatest(sum(w) OVER (PARTITION BY doc_id), 1e-12), 6) AS importance
    FROM (
      SELECT t.doc_id, t.term, t.tf, d.df,
             CAST(t.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS w
      FROM (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(tokens) AS term FROM ({records_rel}))
        GROUP BY doc_id, term
      ) t
      JOIN ({term_df_sql(records_rel)}) d USING (term)
      CROSS JOIN (SELECT count(*) AS n_docs FROM ({records_rel})) n
    )
    """


def token_tfidf_ref(records: DataFrame) -> DataFrame:
    """T7 reference-parity idf (`TermDocumentFrequencyIndex.java:37-51`):
    idf10 = log10(N/df), exactly 0 when df == N; idf10_miss is the
    dictionary-miss smoothing path log10(N/(df+1)) the reference applies
    to unseen terms (no corpus term hits it — exposed as a column so the
    formula itself is oracle-checked). tfidf10 = tf·idf10."""
    n_docs = records.agg(F.count("*").alias("n_docs"))
    tf = (
        records.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n = F.col("n_docs").cast("double")
    idf10 = F.when(F.col("df") == F.col("n_docs"), F.lit(0.0)).otherwise(
        F.log10(n / F.col("df").cast("double"))
    )
    return (
        tf.join(term_df(records), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(idf10, 6).alias("idf10"),
            F.round(F.log10(n / (F.col("df").cast("double") + F.lit(1.0))), 6).alias(
                "idf10_miss"
            ),
            F.round(F.col("tf").cast("double") * idf10, 6).alias("tfidf10"),
        )
    )


def token_tfidf_ref_sql(records_rel: str) -> str:
    idf10 = (
        "CASE WHEN df = n_docs THEN 0.0 "
        "ELSE log10(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) END"
    )
    return f"""
    SELECT doc_id, term, tf, df,
           round({idf10}, 6) AS idf10,
           round(log10(CAST(n_docs AS DOUBLE) / (CAST(df AS DOUBLE) + 1.0)), 6) AS idf10_miss,
           round(CAST(tf AS DOUBLE) * ({idf10}), 6) AS tfidf10
    FROM (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(tokens) AS term FROM ({records_rel}))
      GROUP BY doc_id, term
    ) t
    JOIN ({term_df_sql(records_rel)}) d USING (term)
    CROSS JOIN (SELECT count(*) AS n_docs FROM ({records_rel})) n
    """


def keyphrase_topk(records: DataFrame, tfidf: DataFrame | None = None) -> DataFrame:
    """(doc_id, term, tfidf, rank): top-k terms per doc by tfidf,
    k = max(1, ceil(6% · n_distinct_terms)). Deterministic tie-break:
    (rounded tfidf desc, term asc) — the W6 comparator pattern.
    Pass a precomputed `token_tfidf(records)` to share the scan."""
    if tfidf is None:
        tfidf = token_tfidf(records)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    wn = Window.partitionBy("doc_id")
    return (
        tfidf.withColumn("rank", F.row_number().over(w))
        .withColumn("n_terms", F.count("*").over(wn))
        .filter(
            F.col("rank")
            <= F.greatest(
                F.lit(1),
                F.ceil(F.col("n_terms") * KP_PERCENT_NUM / F.lit(KP_PERCENT_DEN)),
            )
        )
        .select("doc_id", "term", "tfidf", "rank")
    )


def keyphrase_topk_sql(records_rel: str) -> str:
    return f"""
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank,
             count(*) OVER (PARTITION BY doc_id) AS n_terms
      FROM ({token_tfidf_sql(records_rel)})
    ) WHERE rank <= greatest(1, CAST(ceil(n_terms * {KP_PERCENT_NUM} / {KP_PERCENT_DEN}.0) AS BIGINT))
    """


def token_keyphraseness(records: DataFrame) -> DataFrame:
    """(term, linked_docs, total_docs, keyphraseness): linked = docs where
    the term appears in the first ANCHOR_PREFIX tokens ("anchor position");
    total = docs containing it; min-support totalDocs >= MIN_SUPPORT."""
    per_doc = records.select(
        "doc_id",
        F.explode(F.array_distinct("tokens")).alias("term"),
        F.slice("tokens", 1, ANCHOR_PREFIX).alias("head"),
    ).select(
        "doc_id",
        "term",
        F.array_contains("head", F.col("term")).cast("int").alias("linked"),
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("linked").alias("linked_docs"),
            F.count("*").alias("total_docs"),
        )
        .filter((F.col("total_docs") >= MIN_SUPPORT) & (F.col("linked_docs") > 0))
        .select(
            "term",
            "linked_docs",
            "total_docs",
            F.round(
                F.col("linked_docs").cast("double") / F.col("total_docs").cast("double"), 6
            ).alias("keyphraseness"),
        )
    )


def token_keyphraseness_sql(records_rel: str) -> str:
    return f"""
    SELECT term, linked_docs, total_docs,
           round(CAST(linked_docs AS DOUBLE) / CAST(total_docs AS DOUBLE), 6) AS keyphraseness
    FROM (
      SELECT term, CAST(sum(linked) AS BIGINT) AS linked_docs, count(*) AS total_docs
      FROM (
        SELECT doc_id, term,
               CAST(list_contains(head, term) AS INT) AS linked
        FROM (
          SELECT doc_id, unnest(list_distinct(tokens)) AS term,
                 list_slice(tokens, 1, {ANCHOR_PREFIX}) AS head
          FROM ({records_rel})
        )
      )
      GROUP BY term
    )
    WHERE total_docs >= {MIN_SUPPORT} AND linked_docs > 0
    """


def source_candidate_cut(records_with_source: DataFrame) -> DataFrame:
    """A3 analog: per (term, source) frequency histogram, keeping sources
    with freq >= 2% of the term total (integer-exact: cnt·CUT_DEN >=
    total·CUT_NUM). Input needs (doc_id, tokens, source)."""
    pairs = records_with_source.select(
        F.explode(F.array_distinct("tokens")).alias("term"), "source"
    )
    counts = pairs.groupBy("term", "source").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("term")
    return (
        counts.withColumn("total", F.sum("cnt").over(w))
        .filter(F.col("cnt") * CUT_DEN >= F.col("total") * CUT_NUM)
        .select("term", "source", "cnt", "total")
    )


def source_candidate_cut_sql(records_rel: str) -> str:
    return f"""
    SELECT term, source, cnt, total FROM (
      SELECT term, source, cnt, CAST(sum(cnt) OVER (PARTITION BY term) AS BIGINT) AS total
      FROM (
        SELECT term, source, count(*) AS cnt
        FROM (
          SELECT unnest(list_distinct(tokens)) AS term, source
          FROM ({records_rel})
        )
        GROUP BY term, source
      )
    ) WHERE cnt * {CUT_DEN} >= total * {CUT_NUM}
    """


def milne_witten_relatedness(
    records: DataFrame, doc_topk: int = MW_DOC_TOPK
) -> DataFrame:
    """(term_a, term_b, co, df_a, df_b, relatedness): Milne-Witten 2008
    semantic relatedness over token co-occurrence sets. Terms bounded to
    MIN_SUPPORT <= df <= 3/4·N before the self-join — the same two-sided
    guard the reference applies to its dictionaries (F3) and fanout (F4) —
    and each doc contributes only its `doc_topk` rarest terms, bounding the
    per-doc pair fanout to doc_topk²/2 regardless of document length.
    relatedness = 1 - (ln max - ln co) / (ln N - ln min), clamped [0,1]."""
    n_docs = records.agg(F.count("*").alias("n_docs"))
    dfd = (
        term_df(records)
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= MIN_SUPPORT)
            & (F.col("df") * COOC_CAP_DEN <= F.col("n_docs") * COOC_CAP_NUM)
        )
        .select("term", "df")
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    occ = (
        records.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .join(dfd, "term")
        .withColumn("_r", F.row_number().over(wdoc))
        .filter(F.col("_r") <= doc_topk)
        .drop("_r")
    )
    a = occ.select("doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = occ.select("doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count("*").alias("co"))
    )
    ln = F.log
    rel = F.lit(1.0) - (
        ln(F.greatest("df_a", "df_b").cast("double")) - ln(F.col("co").cast("double"))
    ) / (
        ln(F.col("n_docs").cast("double"))
        - ln(F.least("df_a", "df_b").cast("double"))
    )
    return (
        co.crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "co",
            "df_a",
            "df_b",
            F.round(F.least(F.greatest(rel, F.lit(0.0)), F.lit(1.0)), 6).alias(
                "relatedness"
            ),
        )
    )


def milne_witten_relatedness_sql(
    records_rel: str, doc_topk: int = MW_DOC_TOPK
) -> str:
    dfd = (
        f"SELECT term, df FROM ({term_df_sql(records_rel)}) "
        f"CROSS JOIN (SELECT count(*) AS n_docs FROM ({records_rel})) nn "
        f"WHERE df >= {MIN_SUPPORT} AND df * {COOC_CAP_DEN} <= nn.n_docs * {COOC_CAP_NUM}"
    )
    occ = f"""
    SELECT doc_id, term, df FROM (
      SELECT o.doc_id, o.term, d.df,
             row_number() OVER (PARTITION BY o.doc_id ORDER BY d.df ASC, o.term ASC) AS _r
      FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM ({records_rel})) o
      JOIN ({dfd}) d USING (term)
    ) WHERE _r <= {doc_topk}
    """
    return f"""
    SELECT term_a, term_b, co, df_a, df_b,
           round(least(greatest(
             1.0 - (ln(CAST(greatest(df_a, df_b) AS DOUBLE)) - ln(CAST(co AS DOUBLE)))
                 / (ln(CAST(n.n_docs AS DOUBLE)) - ln(CAST(least(df_a, df_b) AS DOUBLE))),
           0.0), 1.0), 6) AS relatedness
    FROM (
      SELECT a.term AS term_a, b.term AS term_b, a.df AS df_a, b.df AS df_b,
             count(*) AS co
      FROM ({occ}) a
      JOIN ({occ}) b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term, a.df, b.df
    )
    CROSS JOIN (SELECT count(*) AS n_docs FROM ({records_rel})) n
    """


def pair_tfidf_cosine(
    pairs: DataFrame, records: DataFrame, tfidf_in: DataFrame | None = None
) -> DataFrame:
    """T6: sparse TF-IDF cosine for candidate pairs. Join exploded tfidf
    vectors on term; cosine = Σ wa·wb / (‖a‖·‖b‖), round(·,6).
    records needs (doc_id/rec-style key in `doc_id`, tokens); pass a
    precomputed `token_tfidf(records)` as `tfidf_in` to share the scan."""
    if tfidf_in is None:
        tfidf_in = token_tfidf(records)
    tfidf = tfidf_in.select("doc_id", "term", F.col("tfidf").alias("w"))
    norms = tfidf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    ta = tfidf.select(
        F.col("doc_id").alias("a_id"), "term", F.col("w").alias("wa")
    )
    tb = tfidf.select(
        F.col("doc_id").alias("b_id"), "term", F.col("w").alias("wb")
    )
    dots = (
        pairs.join(ta, "a_id")
        .join(tb, ["b_id", "term"])
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("nb"))
    return (
        pairs.join(dots, ["a_id", "b_id"], "left")
        .join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)),
                6,
            ).alias("cosine"),
        )
    )


def pair_tfidf_cosine_sql(pairs_rel: str, records_rel: str) -> str:
    tfidf = (
        f"SELECT doc_id, term, tfidf AS w FROM ({token_tfidf_sql(records_rel)})"
    )
    return f"""
    SELECT p.a_id, p.b_id,
           round(coalesce(d.dot, 0.0) / greatest(na.nrm * nb.nrm, 1e-12), 6) AS cosine
    FROM ({pairs_rel}) p
    LEFT JOIN (
      SELECT ta.doc_id AS a_id, tb.doc_id AS b_id, sum(ta.w * tb.w) AS dot
      FROM ({tfidf}) ta
      JOIN ({tfidf}) tb ON ta.term = tb.term
      JOIN ({pairs_rel}) pp ON pp.a_id = ta.doc_id AND pp.b_id = tb.doc_id
      GROUP BY ta.doc_id, tb.doc_id
    ) d ON p.a_id = d.a_id AND p.b_id = d.b_id
    JOIN (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM ({tfidf}) GROUP BY doc_id) na
      ON p.a_id = na.doc_id
    JOIN (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM ({tfidf}) GROUP BY doc_id) nb
      ON p.b_id = nb.doc_id
    """


SOFT_TFIDF_THETA_E9 = 900_000_000  # θ = 0.90 as an exact integer (×1e9)


def pair_soft_tfidf(
    pairs: DataFrame,
    records: DataFrame,
    theta_e9: int = SOFT_TFIDF_THETA_E9,
    tfidf_in: DataFrame | None = None,
) -> DataFrame:
    """(a_id, b_id, soft_tfidf): SoftTFIDF (Cohen, Ravikumar, Fienberg
    2003, "A comparison of string distance metrics for name-matching
    tasks") — THE classic hybrid record-linkage measure, combining
    corpus-level token importance with character-level token alignment:

        soft(a,b) = Σ_{w ∈ a, maxJW(w,b) ≥ θ} V(w,a) · V(match(w),b) · maxJW

    where V is the L2-normalized tfidf weight and match(w) is b's
    best-JW token. `pair_tfidf_cosine` is exactly the θ=1 special case
    (only identical tokens align, JW factor 1); SoftTFIDF keeps the
    tfidf weighting while tolerating per-token typos.

    Engine-portable determinism: the alignment argmax never compares
    doubles — jw is quantized to an exact integer (⌊jw·1e9⌋, identical
    on the bit-identical JW doubles both engines compute) and the best
    match is `min_by` over the composite string key (1e9−jw_e9 zero-
    padded, then the token) — the golden_records tie-break discipline;
    θ is applied as an integer compare. Only the FINAL weighted sum is
    an order-dependent double accumulation, rounded per the module's
    documented round(·,6) policy (same as the cosine).

    Scale shape: two tfidf equi-joins fan each pair out to its |A|·|B|
    distinct-term cross product (the same expansion the exact cosine's
    term join performs, un-gated by term equality — bounded by the
    block cap × token counts); the JW pandas-UDF batches it through the
    Arrow kernel; ONE partial-agg'd groupBy per stage (argmax, then
    pair sum), no windows."""
    if tfidf_in is None:
        tfidf_in = token_tfidf(records)
    tfidf = tfidf_in.select("doc_id", "term", F.col("tfidf").alias("w"))
    norms = tfidf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    ta = tfidf.select(
        F.col("doc_id").alias("a_id"), F.col("term").alias("term_a"),
        F.col("w").alias("wa"),
    )
    tb = tfidf.select(
        F.col("doc_id").alias("b_id"), F.col("term").alias("term_b"),
        F.col("w").alias("wb"),
    )
    from .scoring import jaro_winkler_udf

    cross = (
        pairs.join(ta, "a_id")
        .join(tb, "b_id")
        .withColumn("jw", jaro_winkler_udf(F.col("term_a"), F.col("term_b")))
        .withColumn("jw_e9", F.floor(F.col("jw") * 1e9).cast("long"))
    )
    key = F.concat(
        F.lpad((F.lit(1_000_000_000) - F.col("jw_e9")).cast("string"), 10, "0"),
        F.lit("|"),
        F.col("term_b"),
    )
    best = (
        cross.groupBy("a_id", "b_id", "term_a")
        .agg(
            F.min("wa").alias("wa"),
            F.max("jw_e9").alias("mx_e9"),
            F.min_by("jw", key).alias("mx_jw"),
            F.min_by("wb", key).alias("wb_match"),
        )
        .filter(F.col("mx_e9") >= theta_e9)
    )
    dots = best.groupBy("a_id", "b_id").agg(
        F.sum(F.col("wa") * F.col("wb_match") * F.col("mx_jw")).alias("dot")
    )
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("nb"))
    return (
        pairs.join(dots, ["a_id", "b_id"], "left")
        .join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)),
                6,
            ).alias("soft_tfidf"),
        )
    )


def pair_soft_tfidf_sql(
    pairs_rel: str,
    records_rel: str,
    theta_e9: int = SOFT_TFIDF_THETA_E9,
    prefix_ctes: str = "",
) -> str:
    from .scoring import jaro_winkler_sql

    pre = f"{prefix_ctes}," if prefix_ctes else ""
    tfidf = (
        f"SELECT doc_id, term, tfidf AS w FROM ({token_tfidf_sql(records_rel)})"
    )
    jw = jaro_winkler_sql("ta.term", "tb.term")
    return f"""
    WITH {pre} st_w AS MATERIALIZED ({tfidf}),
    st_nrm AS MATERIALIZED (
      SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM st_w GROUP BY doc_id
    ),
    st_cross AS (
      SELECT p.a_id, p.b_id, ta.term AS term_a, ta.w AS wa,
             tb.term AS term_b, tb.w AS wb,
             {jw} AS jw,
             CAST(floor(({jw}) * 1e9) AS BIGINT) AS jw_e9
      FROM ({pairs_rel}) p
      JOIN st_w ta ON p.a_id = ta.doc_id
      JOIN st_w tb ON p.b_id = tb.doc_id
    ),
    st_best AS (
      SELECT a_id, b_id, term_a, min(wa) AS wa, max(jw_e9) AS mx_e9,
             arg_min(jw, lpad(CAST(1000000000 - jw_e9 AS VARCHAR), 10, '0')
                         || '|' || term_b) AS mx_jw,
             arg_min(wb, lpad(CAST(1000000000 - jw_e9 AS VARCHAR), 10, '0')
                         || '|' || term_b) AS wb_match
      FROM st_cross GROUP BY a_id, b_id, term_a
    ),
    st_dot AS (
      SELECT a_id, b_id, sum(wa * wb_match * mx_jw) AS dot
      FROM st_best WHERE mx_e9 >= {int(theta_e9)}
      GROUP BY a_id, b_id
    )
    SELECT p.a_id, p.b_id,
           round(coalesce(d.dot, 0.0) / greatest(na.nrm * nb.nrm, 1e-12), 6)
             AS soft_tfidf
    FROM ({pairs_rel}) p
    LEFT JOIN st_dot d ON p.a_id = d.a_id AND p.b_id = d.b_id
    JOIN st_nrm na ON p.a_id = na.doc_id
    JOIN st_nrm nb ON p.b_id = nb.doc_id
    """
