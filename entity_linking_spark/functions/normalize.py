"""Text normalization — stage-0 of the pipeline.

Re-implements the *semantics* of the reference normalizer
(`/root/reference/src/normalizer/Normalizer.java:36-63`: double HTML
unescape, lowercase, strip markup tags, delimiters→space, whitespace
collapse) as a pure Spark SQL expression chain — no UDF, fully
whole-stage-codegen'd, and byte-identical to the DuckDB oracle template
below. Byte-identity matters because blocking keys are derived from this
text: two engines disagreeing on one byte silently breaks block equality
(the invariant the north_rule evaluates F1 at).

Each `*_col` function has a `*_sql` twin that renders the same computation
as DuckDB SQL. They are kept adjacent in this file so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Entity map applied twice = the reference's double-unescape
# (Normalizer.java:38-40 calls StringEscapeUtils.unescapeHtml twice because
# wiki markup is frequently double-escaped). We support the common entities
# that appear in transcript text rather than the full HTML4 table.
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last so "&amp;lt;" → "&lt;" on pass 1 → "<" on pass 2
]

_TAG_RE = "<[^>]*>"
_NON_ALNUM_RE = "[^a-z0-9]+"


def unescape_html_col(col: Column) -> Column:
    """Two unescape passes over the supported entity set."""
    for _ in range(2):
        for ent, ch in _HTML_ENTITIES:
            col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def unescape_html_sql(expr: str) -> str:
    for _ in range(2):
        for ent, ch in _HTML_ENTITIES:
            ch_sql = ch.replace("'", "''")
            expr = f"replace({expr}, '{ent}', '{ch_sql}')"
    return expr


def normalize_text_col(col: Column) -> Column:
    """Full normalization: unescape ×2 → lowercase → strip tags →
    non-alphanumeric runs → single space → trim.

    Reference parity: Normalizer.normalize (Normalizer.java:36-63) with the
    keep-delimiters variant dropped (our blocking keys never need kept
    punctuation; the reference only used it to preserve mention offsets).
    """
    c = unescape_html_col(col)
    c = F.lower(c)
    c = F.regexp_replace(c, _TAG_RE, " ")
    c = F.regexp_replace(c, _NON_ALNUM_RE, " ")
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    c = unescape_html_sql(expr)
    c = f"lower({c})"
    c = f"regexp_replace({c}, '{_TAG_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_NON_ALNUM_RE}', ' ', 'g')"
    return f"trim({c})"


def link_normalize_col(col: Column) -> Column:
    """T4 — link-target normalization (`normalizer/Normalizer.java:100-133`
    `processTargetLink`): unescape entities, strip <ref>…</ref> markup,
    drop the #fragment, underscores → spaces, collapse whitespace,
    capitalize the first letter. The reference's URL-decode step is
    reduced to the common percent-escapes (space/comma/parens) so the
    expression stays portable; full url_decode slots in on engines that
    have it."""
    c = unescape_html_col(col)
    c = F.regexp_replace(c, "<ref[^>]*>.*?</ref>", "")
    c = F.regexp_replace(c, "#.*$", "")
    for esc, ch in (("%20", " "), ("%2C", ","), ("%28", "("), ("%29", ")")):
        c = F.replace(c, F.lit(esc), F.lit(ch))
    c = F.regexp_replace(c, "_+", " ")
    c = F.trim(F.regexp_replace(c, "\\s+", " "))
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 1_000_000))


def link_normalize_sql(expr: str) -> str:
    c = unescape_html_sql(expr)
    c = f"regexp_replace({c}, '<ref[^>]*>.*?</ref>', '', 'g')"
    c = f"regexp_replace({c}, '#.*$', '', 'g')"
    for esc, ch in (("%20", " "), ("%2C", ","), ("%28", "("), ("%29", ")")):
        c = f"replace({c}, '{esc}', '{ch}')"
    c = f"regexp_replace({c}, '_+', ' ', 'g')"
    c = f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"
    return f"upper(substr({c}, 1, 1)) || substr({c}, 2)"
