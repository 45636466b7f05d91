"""Document-level text analysis queries (training-data quality layer).

Thin operator layer binding functions/textstats.py to the `documents`
table: language-ID, quality features + score, token counts. Everything is
a narrow projection over the scan — no shuffle at all, so at 100 TB these
run at I/O speed with full column pruning (only `doc_id`, `text` read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import normalize as N
from ..functions import textstats as TS
from ..functions import tokenize as Tk


def doc_text_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
    punct_ratio, alpha_ratio, uniq_token_ratio, ws_tokens, bpe_tokens,
    quality): the full per-document quality record."""
    base = documents.select(
        "doc_id",
        F.col("text"),
        N.normalize_text_col(F.col("text")).alias("norm_text"),
    ).withColumn("tokens", Tk.tokens_col(F.col("norm_text")))
    feats = TS.quality_features_col(F.col("text"), F.col("tokens"))
    out = base.select(
        "doc_id",
        TS.lang_id_col(F.col("tokens")).alias("lang_id"),
        *[c.alias(name) for name, c in feats.items()],
        TS.whitespace_token_count_col(F.col("text")).alias("ws_tokens"),
        Tk.regex_token_count_col(F.col("text")).alias("bpe_tokens"),
        TS.quality_score_col(feats).alias("quality"),
    )
    return out


def doc_text_stats_sql(documents_rel: str = "documents") -> str:
    norm = N.normalize_text_sql("text")
    toks = Tk.tokens_sql(norm)
    base = (
        f"SELECT doc_id, text, {norm} AS norm_text, {toks} AS tokens "
        f"FROM ({documents_rel})"
    )
    f = TS.quality_features_sql("text", "tokens")
    feat_cols = ", ".join(f"{expr} AS {name}" for name, expr in f.items())
    return f"""
    SELECT doc_id,
           {TS.lang_id_sql('tokens')} AS lang_id,
           {feat_cols},
           {TS.whitespace_token_count_sql('text')} AS ws_tokens,
           {Tk.regex_token_count_sql('text')} AS bpe_tokens,
           {TS.quality_score_sql(f)} AS quality
    FROM ({base})
    """


def quality_filter(documents: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The filter a pretraining pipeline actually applies: keep documents
    whose quality score clears the bar. Composes with the dedup operators
    downstream; predicate is pushed into the scan projection."""
    stats = doc_text_stats(documents)
    return stats.filter(F.col("quality") >= min_quality).select(
        "doc_id", "lang_id", "quality"
    )


def quality_filter_sql(documents_rel: str = "documents", min_quality: float = 0.5) -> str:
    return (
        f"SELECT doc_id, lang_id, quality FROM ({doc_text_stats_sql(documents_rel)}) "
        f"WHERE quality >= {min_quality!r}"
    )
