"""Transcripts source.

The engine's primary input is an Iceberg table of multi-turn transcripts
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). The sandbox testdata has no such table, so two sources:

1. `derive_transcripts(documents_df)` — a *deterministic, SQL-expressible*
   derivation from the driver's `documents` table: each document becomes one
   conversation, its text split into fixed-width word windows as turns.
   Because the derivation is pure relational algebra, the DuckDB oracle
   reproduces it exactly (see `derive_transcripts_sql`), which lets every
   pipeline stage be value-checked end-to-end by the driver.

2. `synth_transcripts(spark, ...)` — a seeded generator with planted entity
   aliases, misspellings, a hot blocking key, and gold mention labels
   (FIXTURES.md schemas) used by pytest for F1/skew/resume tests.

Reference analog for (1): `BaselinePipeline.createSequenceFile`
(`/root/reference/src/baseline/BaselinePipeline.java:245-274`) — corpus
repack into the pipeline's record shape.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURN_WORDS = 12  # words per derived turn
_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def derive_transcripts(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) → transcripts(conv_id, turn_idx, role,
    text, tool, ts). One conversation per document; turn text = consecutive
    TURN_WORDS-word windows of the raw text; roles cycle
    user/assistant/user/tool; ts is a deterministic function of ids."""
    w = F.split(F.col("text"), " ")
    n_turns = F.greatest(
        F.ceil(F.size(w) / F.lit(TURN_WORDS)).cast("int"), F.lit(1)
    )
    out = (
        documents.select(
            F.col("doc_id"),
            w.alias("words"),
            F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
        )
        .select(
            F.concat(
                F.lit("conv-"), F.lpad(F.col("doc_id").cast("string"), 6, "0")
            ).alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("user"), F.lit("tool")),
                (F.col("turn_idx") % 4) + 1,
            ).alias("role"),
            F.array_join(
                F.slice(F.col("words"), F.col("turn_idx") * TURN_WORDS + 1, TURN_WORDS),
                " ",
            ).alias("text"),
            F.when((F.col("turn_idx") % 4) == 3, F.lit("search")).alias("tool"),
            F.timestamp_micros(
                (
                    F.lit(_BASE_EPOCH)
                    + F.col("doc_id") * 60
                    + F.col("turn_idx")
                ).cast("long")
                * F.lit(1_000_000)
            ).alias("ts"),
        )
    )
    return out


def derive_transcripts_sql(documents_rel: str = "documents") -> str:
    """DuckDB SQL producing byte-identical rows to `derive_transcripts`."""
    return f"""
    SELECT
      'conv-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS conv_id,
      CAST(turn_idx AS INT) AS turn_idx,
      CASE CAST(turn_idx % 4 AS INT)
        WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
        WHEN 2 THEN 'user' ELSE 'tool' END AS role,
      array_to_string(
        list_slice(words, turn_idx * {TURN_WORDS} + 1,
                   turn_idx * {TURN_WORDS} + {TURN_WORDS}), ' ') AS text,
      CASE WHEN turn_idx % 4 = 3 THEN 'search' END AS tool,
      make_timestamp(({_BASE_EPOCH} + doc_id * 60 + turn_idx) * 1000000) AS ts
    FROM (
      SELECT doc_id, words,
             unnest(range(0, greatest(CAST(ceil(len(words) / {TURN_WORDS}.0) AS BIGINT), 1))) AS turn_idx
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {documents_rel})
    )
    """


# ---------------------------------------------------------------------------
# Seeded synthetic fixture with gold labels (pytest-only; FIXTURES.md §1-5)
# ---------------------------------------------------------------------------

_ENTITY_STEMS = [
    "acme corp", "globex", "initech", "umbrella", "stark industries",
    "wayne enterprises", "tyrell", "cyberdyne", "weyland yutani", "aperture",
    "black mesa", "hooli", "pied piper", "massive dynamic", "oscorp",
    "wonka", "duff", "vandelay", "soylent", "monsters inc", "gringotts",
    "prestige world", "bluth company", "dunder mifflin", "sterling cooper",
]

_FILLER = (
    "please check the status of the order and report back with details "
    "thanks can you also look at the invoice from last week and confirm "
    "the shipment arrived on time we need an update for the meeting"
).split()


def _variants(name: str, rng: random.Random, hard: bool = False) -> list[str]:
    """Surface-form variants: case, punctuation, typo — the redirect/alias
    analog (`index/RedirectPagesIndex.java:12-47`). `hard=True` adds
    acronym/short forms that no text-similarity rule can recover (used for
    blocking-recall stress tests, never for the F1 gate — the reference
    resolved those through its alias dictionary, which transcripts lack)."""
    out = [name, name.title(), name.upper()]
    out.append(name.replace(" ", "-"))
    if len(name) > 4:  # one-char typo variants
        i = rng.randrange(1, len(name) - 1)
        if name[i] != " ":
            out.append(name[:i] + name[i + 1 :])
            out.append(name[:i] + name[i] + name[i:])
    if hard:
        toks = name.split()
        out.append(name.replace(" ", ""))
        if len(toks) > 1:
            out.append(toks[0])  # short form
            out.append("".join(t[0] for t in toks).upper())  # acronym
    return out


TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("entity_id", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
    ]
)


_CITIES = [
    "lisbon", "osaka", "bergen", "quito", "tallinn", "perth",
    "nairobi", "calgary", "hanoi", "zagreb", "tampere", "cusco",
]


def _attr_tokens(eid: int, stem: str) -> list[str]:
    """Five stable per-entity attribute tokens — the strong identifiers a
    real entity record carries (account id, mail handle, city, phone-ish,
    reference code). Deterministic in eid so every record of an entity
    shares them; unique across entities except the city."""
    flat = stem.replace(" ", "")[:8]
    return [
        f"acct{eid:04d}x",
        f"{flat}{eid}mailnet",
        _CITIES[eid % len(_CITIES)],
        f"ph{eid * 7919 % 100000:05d}",
        f"ref{eid * 104729 % 10000:04d}",
    ]


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    n_entities: int = 25,
    seed: int = 42,
    hot_alias_rate: float = 0.0,
    hard_variants: bool = False,
    include_attrs: bool = True,
):
    """Returns (transcripts_df, gold_df). Each turn is an entity *profile
    record*: an alias surface-form variant followed by the entity's stable
    attribute tokens plus a little noise — the canonical record-linkage
    input shape. Gold labels the entity. `hot_alias_rate` > 0 redirects
    that fraction of turns to entity 0, creating a hot blocking key (skew
    test, FIXTURES.md §6). `hard_variants` adds acronym/short aliases that
    only dictionary-based linking could resolve (blocking stress only).
    `include_attrs=False` drops the shared attribute tokens (replacing
    them with per-record noise), making the alias surface the ONLY
    linking signal — the regime where dictionary candidate generation is
    load-bearing (tests/test_dictionary.py)."""
    import datetime

    rng = random.Random(seed)
    entities = []
    for eid in range(n_entities):
        stem = _ENTITY_STEMS[eid % len(_ENTITY_STEMS)]
        if eid >= len(_ENTITY_STEMS):
            stem = f"{stem} {eid}"
        entities.append((eid, stem, _variants(stem, rng, hard=hard_variants)))

    t_rows, g_rows = [], []
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        n_turns = rng.randint(2, 8)
        for t in range(n_turns):
            if hot_alias_rate and rng.random() < hot_alias_rate:
                eid, stem, vs = entities[0]
            else:
                eid, stem, vs = entities[rng.randrange(n_entities)]
            alias = vs[rng.randrange(len(vs))]
            if include_attrs:
                attrs = " ".join(_attr_tokens(eid, stem))
            else:  # unique per-record tokens: no cross-record signal
                attrs = f"u{c:04d}{t}a u{c:04d}{t}b"
            noise = rng.choice(_FILLER)
            text = f"{alias} {attrs} {noise}"
            if rng.random() < 0.1:  # normalizer exercise
                text = text.replace(" ", " &nbsp;", 1) + " &amp;amp;"
            role = ["user", "assistant", "user", "tool"][t % 4]
            t_rows.append(
                (
                    conv_id,
                    t,
                    role,
                    text,
                    "search" if role == "tool" else None,
                    base + datetime.timedelta(minutes=c, seconds=t),
                )
            )
            g_rows.append((conv_id, t, eid, alias))
    tdf = spark.createDataFrame(t_rows, TRANSCRIPT_SCHEMA)
    gdf = spark.createDataFrame(g_rows, GOLD_SCHEMA)
    return tdf, gdf
