"""Text-analysis scalar functions for training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting
over the `documents` table — the per-document quality layer a 100 TB
pretraining-data pipeline runs before dedup/filtering. All pure Spark SQL
expression chains (whole-stage codegen, no Python in the hot path), each
with a DuckDB `*_sql` twin for the value-level correctness oracle.

Reference analogs: keyphraseness-style per-surface statistics
(`/root/reference/src/md/Mention.java:123-127`), the tokenizer
(`/root/reference/src/md/MentionDetection.java:82-115`), and TF-style
counting (`/root/reference/src/knowledgebase/EntityTFIDFBuilder.java:78-106`)
— recomposed as document-quality signals rather than mention features.

Float parity note: every floating-point output is `round(x, 6)` in BOTH
engines, computed with identical operand order, so IEEE-754 doubles agree
bit-for-bit and the driver's value hash matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compact English stopword list (public, standard). Kept small and fixed so
# both engines embed the identical constant.
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with as "
    "for on at by from not but what all we you he she they i"
).split()

# A few high-frequency non-English function words for the contrastive
# n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": STOPWORDS,
    "es": "el la los las de que y en un una es por con para como".split(),
    "fr": "le la les des de et en un une est que pour dans ce qui".split(),
    "de": "der die das und ist von zu mit den ein eine nicht auf für".split(),
}

PUNCT_RE = r"[^A-Za-z0-9\s]"
WORD_RE = r"[A-Za-z]+"


def _in_list_count_col(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))  # noqa: B023


def _in_list_count_sql(tokens_expr: str, words: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens_expr}, t -> t IN ({inlist})))"


def lang_scores_col(tokens: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over a token array."""
    return {lang: _in_list_count_col(tokens, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id_col(tokens: Column) -> Column:
    """Pick the language with the most marker hits; 'und' when no marker
    hits at all. Pure-integer argmax with deterministic tie-break (smallest
    language code wins): encode each candidate as hits*16 + (15 - idx) with
    idx the position in the sorted code list, take the greatest, decode."""
    langs = sorted(LANG_MARKERS)
    scores = lang_scores_col(tokens)
    encoded = [
        scores[lang].cast("long") * F.lit(16) + F.lit(15 - i)
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*encoded)
    idx = F.lit(15) - F.pmod(best, F.lit(16))
    decode = F.lit("und")
    for i, lang in reversed(list(enumerate(langs))):
        decode = F.when(idx == i, F.lit(lang)).otherwise(decode)
    return F.when((best / F.lit(16)).cast("long") > 0, decode).otherwise(F.lit("und"))


def lang_id_sql(tokens_expr: str) -> str:
    langs = sorted(LANG_MARKERS)
    encoded = [
        f"(CAST({_in_list_count_sql(tokens_expr, LANG_MARKERS[lang])} AS BIGINT) * 16 + {15 - i})"
        for i, lang in enumerate(langs)
    ]
    best = f"greatest({', '.join(encoded)})"
    idx = f"(15 - ({best}) % 16)"
    whens = " ".join(f"WHEN {i} THEN '{lang}'" for i, lang in enumerate(langs))
    decode = f"CASE {idx} {whens} ELSE 'und' END"
    return f"CASE WHEN ({best}) // 16 > 0 THEN {decode} ELSE 'und' END"


def whitespace_token_count_col(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def whitespace_token_count_sql(expr: str) -> str:
    return f"len(list_filter(regexp_split_to_array({expr}, '\\s+'), t -> t <> ''))"


def quality_features_col(text: Column, tokens: Column) -> dict[str, Column]:
    """Quality-signal columns per document (all round(·,6) doubles):
      n_chars, n_tokens, mean_token_len, stopword_ratio, punct_ratio,
      alpha_ratio, uniq_token_ratio.  The standard pretraining-quality
    heuristics (C4/Gopher-style rules, public)."""
    n_chars = F.length(text)
    n_tokens = F.size(tokens)
    n_tokens_d = F.greatest(n_tokens, F.lit(1)).cast("double")
    n_chars_d = F.greatest(n_chars, F.lit(1)).cast("double")
    n_stop = _in_list_count_col(tokens, STOPWORDS)
    n_punct = F.regexp_count(text, F.lit(PUNCT_RE))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_uniq = F.size(F.array_distinct(tokens))
    total_tok_chars = F.aggregate(
        tokens, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("double")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(total_tok_chars / n_tokens_d, 6),
        "stopword_ratio": F.round(n_stop.cast("double") / n_tokens_d, 6),
        "punct_ratio": F.round(n_punct.cast("double") / n_chars_d, 6),
        "alpha_ratio": F.round(n_alpha.cast("double") / n_chars_d, 6),
        "uniq_token_ratio": F.round(n_uniq.cast("double") / n_tokens_d, 6),
    }


def quality_features_sql(text_expr: str, tokens_expr: str) -> dict[str, str]:
    n_tokens_d = f"CAST(greatest(len({tokens_expr}), 1) AS DOUBLE)"
    n_chars_d = f"CAST(greatest(length({text_expr}), 1) AS DOUBLE)"
    n_stop = _in_list_count_sql(tokens_expr, STOPWORDS)
    n_punct = f"len(regexp_extract_all({text_expr}, '{PUNCT_RE}'))"
    n_alpha = f"length(regexp_replace({text_expr}, '[^A-Za-z]', '', 'g'))"
    n_uniq = f"len(list_distinct({tokens_expr}))"
    total_tok_chars = (
        f"CAST(list_sum(list_transform({tokens_expr}, t -> length(t))) AS DOUBLE)"
    )
    return {
        "n_chars": f"CAST(length({text_expr}) AS BIGINT)",
        "n_tokens": f"CAST(len({tokens_expr}) AS BIGINT)",
        "mean_token_len": f"round(coalesce({total_tok_chars}, 0) / {n_tokens_d}, 6)",
        "stopword_ratio": f"round(CAST({n_stop} AS DOUBLE) / {n_tokens_d}, 6)",
        "punct_ratio": f"round(CAST({n_punct} AS DOUBLE) / {n_chars_d}, 6)",
        "alpha_ratio": f"round(CAST({n_alpha} AS DOUBLE) / {n_chars_d}, 6)",
        "uniq_token_ratio": f"round(CAST({n_uniq} AS DOUBLE) / {n_tokens_d}, 6)",
    }


def quality_score_col(feats: dict[str, Column]) -> Column:
    """Single scalar quality score in [0,1]: product of clamped signal
    gates (Gopher-rule shape). Deterministic double math, round(·,6)."""
    def clamp01(c: Column) -> Column:
        return F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))

    length_gate = clamp01(feats["n_tokens"].cast("double") / F.lit(20.0))
    stop_gate = clamp01(feats["stopword_ratio"] * F.lit(4.0))
    alpha_gate = clamp01(feats["alpha_ratio"] * F.lit(1.25))
    uniq_gate = clamp01(feats["uniq_token_ratio"] * F.lit(1.25))
    return F.round(length_gate * stop_gate * alpha_gate * uniq_gate, 6)


def quality_score_sql(f: dict[str, str]) -> str:
    def clamp01(e: str) -> str:
        return f"least(greatest({e}, 0.0), 1.0)"

    length_gate = clamp01(f"CAST({f['n_tokens']} AS DOUBLE) / 20.0")
    stop_gate = clamp01(f"{f['stopword_ratio']} * 4.0")
    alpha_gate = clamp01(f"{f['alpha_ratio']} * 1.25")
    uniq_gate = clamp01(f"{f['uniq_token_ratio']} * 1.25")
    return f"round({length_gate} * {stop_gate} * {alpha_gate} * {uniq_gate}, 6)"
