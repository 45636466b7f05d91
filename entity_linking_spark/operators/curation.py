"""Corpus-curation operators a pretraining pipeline runs before training:
benchmark decontamination and PII redaction.

Both are expressed as portable Spark/DuckDB twins like the rest of the
training-data layer (see `textanalysis.py`): the Spark form is the
production plan, the SQL form is the oracle replayed by the driver gate.

Decontamination follows the n-gram-overlap recipe published with GPT-3
(Brown et al. 2020, appendix C) and open reimplementations (e.g.
Dolma/OLMo decon): any training document sharing word n-grams with an
evaluation set is flagged, with the overlap ratio reported so the caller
can pick a threshold. 100 TB shape: the eval side is tiny (benchmarks are
thousands of documents, not billions) — its distinct n-gram set is
BROADCAST, so the training corpus is scanned once, exploded to n-grams
map-side, hash-joined against the broadcast set with no shuffle of the
corpus, and reduced by one partial-aggregated groupBy(doc_id). The only
exchange in the plan is the final doc-level aggregate.

PII redaction is a pure per-row expression chain (regexp_replace /
regexp_count) — zero shuffle, runs at scan speed with full column
pruning, exactly like `quality_filter`. Patterns are restricted to the
regex dialect subset Java (Spark) and RE2 (DuckDB) evaluate identically:
no lookaround, no backreferences, ASCII classes, `(?:...)` groups and
`\\b` boundaries only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import tokenize as Tk

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    flag_ratio: float = 0.05,
) -> DataFrame:
    """(doc_id, n_grams, contaminated, contamination_ratio, flagged) for
    every training document.

    `train` and `eval_set` are `dedup.doc_records` outputs
    (doc_id, tokens). `contaminated` counts training n-gram OCCURRENCES
    that appear anywhere in the eval set (occurrence-weighted, the GPT-3
    appendix-C convention); `contamination_ratio` = contaminated /
    n_grams (0 for docs shorter than n tokens); `flagged` marks documents
    at or above `flag_ratio`.

    Plan: eval n-grams → distinct → broadcast; train n-grams exploded
    (`explode_outer`, so a doc shorter than n tokens still emits its
    zero row), broadcast-LEFT-joined against the eval set with a hit
    marker, then ONE partial-agg'd groupBy(doc_id) computes both the
    total and the contaminated count — the training corpus crosses
    exactly one exchange and is never joined on doc_id at all.
    """
    grams = Tk.word_ngrams_col(F.col("tokens"), n)
    eval_grams = (
        eval_set.select(F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    marked = train.select("doc_id", F.explode_outer(grams).alias("gram")).join(
        F.broadcast(eval_grams), "gram", "left"
    )
    agg = marked.groupBy("doc_id").agg(
        F.count("gram").alias("n_grams"),
        F.count("hit").alias("contaminated"),
    )
    ratio = F.round(
        F.coalesce(
            F.try_divide(F.col("contaminated"), F.col("n_grams")), F.lit(0.0)
        ),
        6,
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "contaminated",
        ratio.alias("contamination_ratio"),
        (ratio >= F.lit(flag_ratio)).alias("flagged"),
    )


def decontaminate_sql(
    train_rel: str,
    eval_rel: str,
    n: int = 5,
    flag_ratio: float = 0.05,
) -> str:
    grams = Tk.word_ngrams_sql("tokens", n)
    return f"""
    SELECT t.doc_id,
           t.n_grams,
           coalesce(h.contaminated, 0) AS contaminated,
           round(CASE WHEN t.n_grams = 0 THEN 0.0 ELSE
               coalesce(h.contaminated / CAST(t.n_grams AS DOUBLE), 0.0) END, 6)
             AS contamination_ratio,
           round(CASE WHEN t.n_grams = 0 THEN 0.0 ELSE
               coalesce(h.contaminated / CAST(t.n_grams AS DOUBLE), 0.0) END, 6)
             >= {flag_ratio!r} AS flagged
    FROM (SELECT doc_id, CAST(len({grams}) AS BIGINT) AS n_grams
          FROM ({train_rel})) t
    LEFT JOIN (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS contaminated
      FROM (SELECT doc_id, unnest({grams}) AS gram FROM ({train_rel})) tg
      JOIN (SELECT DISTINCT unnest({grams}) AS gram FROM ({eval_rel})) eg
        USING (gram)
      GROUP BY doc_id
    ) h ON t.doc_id = h.doc_id
    """


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Dialect-portable patterns (identical match semantics in Java regex and
# RE2): greedy, no lookaround, ASCII classes only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
LONGNUM_RE = r"\b[0-9]{7,}\b"


def _redact(col: Column) -> tuple[Column, Column, Column, Column]:
    n_emails = F.regexp_count(col, F.lit(EMAIL_RE))
    n_ips = F.regexp_count(col, F.lit(IPV4_RE))
    n_longnums = F.regexp_count(col, F.lit(LONGNUM_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        LONGNUM_RE,
        "<NUM>",
    )
    return redacted, n_emails, n_ips, n_longnums


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted, n_emails, n_ips, n_longnums): scrub emails,
    IPv4 addresses, and standalone digit runs of 7+ (account/phone/card
    shaped), in that order — emails first so their local-part digits are
    gone before the digit-run pass, IPs before digit runs so octets are
    never half-eaten. Counts are measured on the ORIGINAL text.

    Pure narrow projection: no shuffle, no UDF; at 100 TB this runs at
    scan speed and the planner prunes every unused column.
    """
    redacted, n_emails, n_ips, n_longnums = _redact(F.col(text_col))
    return df.select(
        "doc_id",
        redacted.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_longnums.alias("n_longnums"),
    )


def redact_pii_sql(rel: str, text_col: str = "text") -> str:
    def q(pat: str) -> str:
        return pat.replace("'", "''")

    c = text_col
    return f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace({c},
               '{q(EMAIL_RE)}', '<EMAIL>', 'g'),
               '{q(IPV4_RE)}', '<IP>', 'g'),
               '{q(LONGNUM_RE)}', '<NUM>', 'g') AS redacted,
           len(regexp_extract_all({c}, '{q(EMAIL_RE)}')) AS n_emails,
           len(regexp_extract_all({c}, '{q(IPV4_RE)}')) AS n_ips,
           len(regexp_extract_all({c}, '{q(LONGNUM_RE)}')) AS n_longnums
    FROM ({rel})
    """


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

PACK_BUCKETS = 32


def pack_sequences(
    records: DataFrame, seq_len: int = 512, n_buckets: int = PACK_BUCKETS
) -> DataFrame:
    """Assign every document its span in a packed fixed-length training
    corpus: (doc_id, n_tokens, tok_start, seq_start, seq_end, seq_offset).

    The GPT-style pretraining data layout: documents are concatenated in a
    deterministic total order and the token stream is chunked into
    sequences of exactly `seq_len` tokens, so a document starting at
    global token offset `tok_start` lands in sequences
    `tok_start div L .. (tok_start + n_tokens - 1) div L` beginning at
    `tok_start % L` within the first. Empty documents contribute nothing
    to a packed corpus and are dropped.

    The packing order is (doc_id % n_buckets, doc_id) — any deterministic
    total order packs equally well, and this one makes the prefix sum
    distributed: a global `sum() OVER (ORDER BY ...)` is the classic
    1-reducer bottleneck (every row through one task's sort), so instead
    per-bucket token totals are aggregated map-side (tiny: n_buckets
    rows), cumulated in one bounded window, broadcast back, and each
    bucket computes its local running sum in parallel — the same
    spine-offset decomposition as the positional index. At 100 TB,
    `n_buckets` scales with the cluster (each bucket's window sorts
    ~corpus/n_buckets rows); all arithmetic is exact int64 (`div`/`%`,
    never float division, safe past 2^53 total tokens).
    """
    docs = (
        records.select(
            "doc_id", F.size("tokens").cast("long").alias("n_tokens")
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("pack_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)))
    )
    spine = Window.orderBy("pack_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        docs.groupBy("pack_bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .select(
            "pack_bucket",
            (F.sum("bucket_tokens").over(spine) - F.col("bucket_tokens"))
            .alias("bucket_offset"),
        )
    )
    local = Window.partitionBy("pack_bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tok_start = (
        F.col("bucket_offset") + F.sum("n_tokens").over(local) - F.col("n_tokens")
    )
    return (
        docs.join(F.broadcast(offsets), "pack_bucket")
        .withColumn("tok_start", tok_start)
        .select(
            "doc_id",
            "n_tokens",
            "tok_start",
            F.expr(f"tok_start div {seq_len}").alias("seq_start"),
            F.expr(f"(tok_start + n_tokens - 1) div {seq_len}").alias("seq_end"),
            F.pmod(F.col("tok_start"), F.lit(seq_len)).cast("long")
            .alias("seq_offset"),
        )
    )


def pack_sequences_sql(
    records_rel: str, seq_len: int = 512, n_buckets: int = PACK_BUCKETS
) -> str:
    """DuckDB twin: the oracle can afford the single global window —
    `ORDER BY (doc_id % n_buckets, doc_id)` reproduces the bucketed
    packing order exactly."""
    return f"""
    SELECT doc_id, n_tokens,
           tok_start,
           tok_start // {seq_len} AS seq_start,
           (tok_start + n_tokens - 1) // {seq_len} AS seq_end,
           tok_start % {seq_len} AS seq_offset
    FROM (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY doc_id % {n_buckets}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) - n_tokens AS tok_start
      FROM (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens
            FROM ({records_rel}))
      WHERE n_tokens > 0
    )
    """


def packing_stats(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """One-row packing audit over `pack_sequences` output: total tokens,
    number of `seq_len` sequences the corpus fills (ceil), tokens of tail
    padding wasted, and how many documents straddle a sequence boundary
    (the attention-masking cost of packing). Pure single aggregate —
    partial-agg'd, no extra shuffle beyond the one reduce."""
    total = F.sum("n_tokens")
    n_seq = F.expr(f"(sum(n_tokens) + {seq_len} - 1) div {seq_len}")
    return packed.agg(
        F.count("*").alias("n_docs"),
        total.alias("total_tokens"),
        n_seq.alias("n_sequences"),
        (n_seq * seq_len - total).alias("tail_padding"),
        F.sum((F.col("seq_end") > F.col("seq_start")).cast("long"))
        .alias("straddling_docs"),
    )


def packing_stats_sql(packed_rel: str, seq_len: int = 512) -> str:
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_tokens) + {seq_len} - 1) // {seq_len} AS BIGINT)
             AS n_sequences,
           CAST(((sum(n_tokens) + {seq_len} - 1) // {seq_len}) * {seq_len}
             - sum(n_tokens) AS BIGINT) AS tail_padding,
           CAST(sum(CASE WHEN seq_end > seq_start THEN 1 ELSE 0 END)
             AS BIGINT) AS straddling_docs
    FROM ({packed_rel})
    """


# ---------------------------------------------------------------------------
# URL / domain provenance analytics
# ---------------------------------------------------------------------------

# Java∩RE2-portable URL shape: scheme + host, optional path of unreserved
# chars. Greedy, no lookaround.
URL_RE = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._~%+/-]*)?"
_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, url, domain): every URL occurrence in every document,
    with its lowercased host. Narrow explode — no shuffle; the C4-style
    provenance pass that feeds per-domain curation decisions."""
    return df.select(
        "doc_id",
        F.explode(F.regexp_extract_all(text_col, F.lit(URL_RE), 0)).alias("url"),
    ).withColumn("domain", F.lower(F.regexp_extract("url", _HOST_RE, 1)))


def extract_urls_sql(rel: str, text_col: str = "text") -> str:
    return f"""
    SELECT doc_id, url,
           lower(regexp_extract(url, '{_HOST_RE}', 1)) AS domain
    FROM (SELECT doc_id, unnest(regexp_extract_all({text_col}, '{URL_RE}'))
            AS url
          FROM ({rel}))
    """


def domain_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(domain, n_urls, n_docs): per-domain URL occurrences and distinct
    documents — the table a curation pipeline ranks to allowlist/block
    domains. One partial-agg'd groupBy on domain; count(distinct doc_id)
    expands to the standard two-phase exact distinct."""
    return (
        extract_urls(df, text_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def domain_stats_sql(rel: str, text_col: str = "text") -> str:
    return f"""
    SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM ({extract_urls_sql(rel, text_col)})
    GROUP BY domain
    """


# ---------------------------------------------------------------------------
# composed curation verdict
# ---------------------------------------------------------------------------


def curated_docs(
    documents: DataFrame,
    records: DataFrame,
    neardup_pairs: DataFrame,
    eval_mod: int = 20,
    decon_n: int = 3,
    min_quality: float = 0.5,
    mix_group: str = "lang",
    hash_mode: str = "portable",
) -> DataFrame:
    """(doc_id, lang, source, quality_ok, exact_keep, neardup_keep,
    is_eval, decon_ok, mixture_keep, kept): the end-to-end curation
    verdict — every stage of the pipeline (quality filter, exact dedup,
    near-dup closure, benchmark decontamination, sqrt-temperature source
    mixing) as an audit flag per document, ANDed into the final `kept`.
    This is the lineage table a production pass writes next to the
    curated corpus: each drop is attributable to its stage.

    Plan shape: each flag source keeps its own operator's topology
    (zero-shuffle scans for quality/mixture, one groupBy for exact,
    bucketed LSH + CC for near-dup, broadcast n-grams for decon); the
    final assembly is doc_id equi-joins that co-partition after the
    first exchange. All flags are 0/1 ints so the verdict is hashable
    bit-for-bit. The doc_id % eval_mod slice stands in for the held-out
    benchmark: those rows are excluded (`is_eval`), matching the
    `docs_decontaminate` query's convention."""
    from . import dedup as D
    from . import sampling as SMP
    from . import textanalysis as TA

    quality = TA.doc_text_stats(documents).select(
        "doc_id", (F.col("quality") >= F.lit(min_quality)).cast("int").alias("quality_ok")
    )
    exact = D.exact_dup_groups(records).select(
        "doc_id",
        (F.col("doc_id") == F.col("keeper_id")).cast("int").alias("exact_keep"),
    )
    nd = D.dedup_clusters(records, neardup_pairs).select(
        "doc_id", (1 - F.col("is_dup")).cast("int").alias("neardup_keep")
    )
    is_eval = (F.col("doc_id") % eval_mod) == 0
    decon = decontaminate(
        records.filter(~is_eval), records.filter(is_eval), n=decon_n
    ).select("doc_id", (~F.col("flagged")).cast("int").alias("decon_ok"))
    mix = SMP.mixture_sample(
        documents, [mix_group], "doc_id", hash_mode=hash_mode
    ).select("doc_id", F.lit(1).alias("mixture_keep"))
    out = (
        documents.select("doc_id", "lang", "source", is_eval.cast("int").alias("is_eval"))
        .join(quality, "doc_id")
        .join(exact, "doc_id")
        .join(nd, "doc_id")
        .join(decon, "doc_id", "left")
        .join(mix, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "quality_ok",
            "exact_keep",
            "neardup_keep",
            "is_eval",
            F.coalesce(F.col("decon_ok"), F.lit(0)).alias("decon_ok"),
            F.coalesce(F.col("mixture_keep"), F.lit(0)).alias("mixture_keep"),
        )
    )
    kept = (
        (F.col("quality_ok") == 1)
        & (F.col("exact_keep") == 1)
        & (F.col("neardup_keep") == 1)
        & (F.col("is_eval") == 0)
        & (F.col("decon_ok") == 1)
        & (F.col("mixture_keep") == 1)
    )
    return out.withColumn("kept", kept.cast("int"))


def curated_docs_sql(
    documents_rel: str,
    records_rel: str,
    pairs_rel: str,
    eval_mod: int = 20,
    decon_n: int = 3,
    min_quality: float = 0.5,
    mix_group: str = "lang",
) -> str:
    from .dedup import dedup_clusters_sql, exact_dup_groups_sql
    from .sampling import mixture_sample_sql
    from .textanalysis import doc_text_stats_sql

    return f"""
    WITH cd_quality AS (
      SELECT doc_id, CAST(quality >= {min_quality!r} AS INT) AS quality_ok
      FROM ({doc_text_stats_sql(documents_rel)})
    ),
    cd_exact AS (
      SELECT doc_id, CAST(doc_id = keeper_id AS INT) AS exact_keep
      FROM ({exact_dup_groups_sql(records_rel)})
    ),
    cd_nd AS (
      SELECT doc_id, CAST(1 - is_dup AS INT) AS neardup_keep
      FROM ({dedup_clusters_sql(records_rel, pairs_rel)})
    ),
    cd_decon AS (
      SELECT doc_id, CAST(NOT flagged AS INT) AS decon_ok
      FROM ({decontaminate_sql(
          f"SELECT * FROM ({records_rel}) WHERE doc_id % {eval_mod} <> 0",
          f"SELECT * FROM ({records_rel}) WHERE doc_id % {eval_mod} = 0",
          decon_n,
      )})
    ),
    cd_mix AS (
      SELECT doc_id, 1 AS mixture_keep
      FROM ({mixture_sample_sql(documents_rel, [mix_group], "doc_id")})
    ),
    cd_base AS (
      SELECT doc_id, lang, source,
             CAST(doc_id % {eval_mod} = 0 AS INT) AS is_eval
      FROM ({documents_rel})
    )
    SELECT b.doc_id, b.lang, b.source,
           q.quality_ok, e.exact_keep, n.neardup_keep, b.is_eval,
           coalesce(d.decon_ok, 0) AS decon_ok,
           coalesce(m.mixture_keep, 0) AS mixture_keep,
           CAST(q.quality_ok = 1 AND e.exact_keep = 1 AND n.neardup_keep = 1
                AND b.is_eval = 0 AND coalesce(d.decon_ok, 0) = 1
                AND coalesce(m.mixture_keep, 0) = 1 AS INT) AS kept
    FROM cd_base b
    JOIN cd_quality q USING (doc_id)
    JOIN cd_exact e USING (doc_id)
    JOIN cd_nd n USING (doc_id)
    LEFT JOIN cd_decon d USING (doc_id)
    LEFT JOIN cd_mix m USING (doc_id)
    """
