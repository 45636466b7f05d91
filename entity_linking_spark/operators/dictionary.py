"""Alias-dictionary candidate generation (reference J3 + S3).

The reference's single most-used operator class: probe document n-grams
against a mention→candidates dictionary and expand each hit into candidate
entities (`/root/reference/src/md/MentionDetection.java:166-194`
`extractMentions`, `/root/reference/src/index/MentionIndex.java:28-67`
load + probe; alias resolution precedent
`/root/reference/src/index/RedirectPagesIndex.java:12-47`). Round-1
blocked only on content signatures, which cannot recover acronym /
short-form / concatenated aliases ("AC" ↔ "acme corp" ↔ "acmecorp") —
only a dictionary join can. This module closes that gap.

Two halves, both pure relational algebra (DuckDB-oracle-checkable):

  * `alias_dictionary(records)` — S3 analog. The reference loads a TSV
    built offline from Wikipedia anchor text; transcripts have no such
    sidecar, so the dictionary is **derived from the corpus itself**: each
    record's leading surface form (first 1-2 normalized tokens) becomes a
    canonical surface once it clears a min-support threshold (F3 analog,
    `MentionIndex.java:21,36-41`), and each surface emits its alias
    *variant keys* — the surface, its space-free concatenation, its
    acronym, and its leading token — mapping variant → canonical. One key
    may map to several canonicals (candidate-list semantics, exactly the
    reference's mention → candidate-set shape); keys exceeding
    `max_candidates` canonicals are dropped (F4 fanout guard,
    `MentionDetection.java:23-24,178-181`). `load_alias_dictionary`
    accepts an external (alias, canonical) table in the same shape when
    one exists — the corpus derivation is the self-contained default, not
    the only source.

  * `dict_blocks(records, dictionary)` — J3 analog. Each record probes its
    leading unigram and bigram against the dictionary keys via a
    **broadcast hash join** (the DistributedCache-shipped in-JVM HashMap
    of `EntityMentionIndexBuilder.java:298-302`, S8, re-expressed) and
    lands in one block per hit canonical (`dc:<canonical>`). Downstream,
    these blocks union with the signature blocks and flow through the same
    capped block-local pair generation.

Scale shape (100 TB): the dictionary is bounded by distinct min-supported
leading surfaces — the 9.2M-mention reference dictionary fit one JVM heap
(`MentionIndex.java:19`), and ours is strictly smaller per corpus slice,
so `F.broadcast` is the right physical plan; if a corpus ever blows past
broadcast size, dropping the hint degrades gracefully to a shuffle join
with AQE choosing the strategy. Probes are map-side (2 narrow projections
per record); the only shuffles are the dictionary's own support groupBy
and the final distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SURFACE_TOKENS = 2  # leading tokens forming a record's surface form
DICT_MIN_SUPPORT = 2  # F3 analog: surfaces seen once are noise
DICT_MAX_CANDIDATES = 16  # F4 analog: drop wildly ambiguous alias keys
MIN_KEY_LEN = 2  # single-char keys match everything


def _surface_cols(records: DataFrame) -> DataFrame:
    """(rec_key, s1, s2): leading unigram and leading bigram (null when the
    record has too few tokens)."""
    return records.select(
        "rec_key",
        F.when(F.size("tokens") >= 1, F.element_at("tokens", 1)).alias("s1"),
        F.when(
            F.size("tokens") >= 2,
            F.concat_ws(" ", F.element_at("tokens", 1), F.element_at("tokens", 2)),
        ).alias("s2"),
    )


def alias_dictionary(
    records: DataFrame,
    min_support: int = DICT_MIN_SUPPORT,
    max_candidates: int = DICT_MAX_CANDIDATES,
) -> DataFrame:
    """(alias_key, canonical, support): corpus-derived alias dictionary.

    canonical = a leading bigram surface with >= min_support occurrences;
    alias_key ∈ {surface, concat(surface), acronym(surface), first token}.
    Keys mapping to > max_candidates canonicals are dropped entirely
    (the reference skips >2000-candidate mentions the same way)."""
    surfaces = (
        _surface_cols(records)
        .filter(F.col("s2").isNotNull())
        .groupBy(F.col("s2").alias("canonical"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    toks = F.split(F.col("canonical"), " ")
    variants = surfaces.select(
        "canonical",
        "support",
        F.array_distinct(
            F.array(
                F.col("canonical"),  # the surface itself
                F.array_join(toks, ""),  # concatenation: "acme corp"→"acmecorp"
                F.array_join(  # acronym: "acme corp"→"ac"
                    F.transform(toks, lambda t: F.substring(t, 1, 1)), ""
                ),
                F.element_at(toks, 1),  # short form: "acme corp"→"acme"
            )
        ).alias("keys"),
    ).select(
        F.explode("keys").alias("alias_key"), "canonical", "support"
    ).filter(F.length("alias_key") >= MIN_KEY_LEN)
    # F4 fanout guard: drop alias keys with too many candidate canonicals
    fanout = variants.groupBy("alias_key").agg(
        F.countDistinct("canonical").alias("n_cands")
    )
    return (
        variants.join(fanout, "alias_key")
        .filter(F.col("n_cands") <= max_candidates)
        .select("alias_key", "canonical", "support")
    )


def alias_dictionary_sql(
    records_rel: str,
    min_support: int = DICT_MIN_SUPPORT,
    max_candidates: int = DICT_MAX_CANDIDATES,
) -> str:
    surfaces = f"""
    SELECT canonical, count(*) AS support FROM (
      SELECT tokens[1] || ' ' || tokens[2] AS canonical
      FROM ({records_rel}) WHERE len(tokens) >= 2
    ) GROUP BY canonical HAVING count(*) >= {min_support}
    """
    variants = f"""
    SELECT unnest(list_distinct([
             canonical,
             array_to_string(string_split(canonical, ' '), ''),
             array_to_string(list_transform(string_split(canonical, ' '),
                                            t -> substr(t, 1, 1)), ''),
             string_split(canonical, ' ')[1]
           ])) AS alias_key,
           canonical, support
    FROM ({surfaces})
    """
    return f"""
    SELECT alias_key, canonical, support FROM (
      SELECT alias_key, canonical, support,
             count(DISTINCT canonical) OVER (PARTITION BY alias_key) AS n_cands
      FROM ({variants}) WHERE length(alias_key) >= {MIN_KEY_LEN}
    ) WHERE n_cands <= {max_candidates}
    """


def load_alias_dictionary(spark, path: str) -> DataFrame:
    """S3: load an external alias dictionary (TSV/parquet with columns
    alias_key, canonical[, support]) — the reference's
    `MentionIndex.load(path)` shape (`index/MentionIndex.java:28-52`).

    Missing support — a parquet without the column, or a short TSV row —
    defaults to 1, so downstream min-support filters and prior ratios
    never see NULL."""
    if path.endswith(".tsv") or path.endswith(".txt"):
        df = spark.read.csv(
            path, sep="\t", schema="alias_key string, canonical string, support long"
        )
    else:
        df = spark.read.parquet(path)
    if "support" not in df.columns:
        df = df.withColumn("support", F.lit(1).cast("long"))
    return df.select(
        "alias_key",
        "canonical",
        F.coalesce(F.col("support").cast("long"), F.lit(1).cast("long")).alias(
            "support"
        ),
    )


def dict_blocks(records: DataFrame, dictionary: DataFrame) -> DataFrame:
    """(rec_key, block_key): J3 dictionary-lookup join. Records probe their
    leading unigram + bigram against the broadcast dictionary; every hit
    canonical becomes one block `dc:<canonical>` (so the acronym record,
    the concatenated record, and the full-surface record all land in the
    same block and reach the scorer as candidate pairs)."""
    probes = (
        _surface_cols(records)
        .select(
            "rec_key", F.explode(F.array_distinct(F.array("s1", "s2"))).alias("probe")
        )
        .filter(F.col("probe").isNotNull() & (F.length("probe") >= MIN_KEY_LEN))
    )
    return (
        probes.join(
            F.broadcast(dictionary.select(F.col("alias_key").alias("probe"), "canonical")),
            "probe",
        )
        .select("rec_key", F.concat(F.lit("dc:"), F.col("canonical")).alias("block_key"))
        .distinct()
    )


def dict_blocks_sql(records_rel: str, dictionary_rel: str) -> str:
    probes = f"""
    SELECT rec_key, probe FROM (
      SELECT rec_key,
             unnest(list_distinct([
               CASE WHEN len(tokens) >= 1 THEN tokens[1] END,
               CASE WHEN len(tokens) >= 2 THEN tokens[1] || ' ' || tokens[2] END
             ])) AS probe
      FROM ({records_rel})
    ) WHERE probe IS NOT NULL AND length(probe) >= {MIN_KEY_LEN}
    """
    return f"""
    SELECT DISTINCT p.rec_key, 'dc:' || d.canonical AS block_key
    FROM ({probes}) p
    JOIN ({dictionary_rel}) d ON p.probe = d.alias_key
    """


# ---------------------------------------------------------------------------
# Fuzzy (typo-tolerant) dictionary blocks — deletion-neighborhood keys
# ---------------------------------------------------------------------------
#
# Exact alias keys cannot bridge typos ("tyrell" / "tyyrell" / "trell").
# The linear-time fix is the SymSpell deletion-neighborhood idea (public
# spell-correction technique): both dictionary surfaces and record probes
# emit the token itself plus every single-character deletion; two tokens
# within ~1 edit share a key. Cost is O(L) keys per token — the same
# fanout class as char-shingles — versus O(n²) pairwise edit distance.
# The reference achieves the same recall through its redirect/alias table
# (`index/RedirectPagesIndex.java:12-47`), which transcripts lack.

MIN_FUZZY_SURFACE = 4  # shorter tokens collide too promiscuously
MIN_FUZZY_DELETE = 5  # emit deletion variants only for tokens this long


def _deletion_keys_col(name: str):
    """Array column: the token in column `name` plus its 1-char-deletion
    variants (deletions only when the token is >= MIN_FUZZY_DELETE chars)."""
    col = F.col(name)
    return F.array_distinct(
        F.when(
            F.length(col) >= MIN_FUZZY_DELETE,
            F.concat(
                F.array(col),
                F.expr(
                    f"transform(sequence(1, length({name})), "
                    f"i -> concat(substr({name}, 1, i-1), "
                    f"substr({name}, i+1, 100000)))"
                ),
            ),
        ).otherwise(F.array(col))
    )


def fuzzy_dict_blocks(
    records: DataFrame,
    min_support: int = DICT_MIN_SUPPORT,
    max_candidates: int = DICT_MAX_CANDIDATES,
) -> DataFrame:
    """(rec_key, block_key): typo-tolerant unigram-surface dictionary join.

    Canonicals = leading tokens with >= min_support occurrences (and >=
    MIN_FUZZY_SURFACE chars); dictionary keys and record probes are each
    expanded with their 1-deletion neighborhoods, so records whose leading
    tokens are within ~1 edit land in the same `df:<canonical>` block.
    The same F4 fanout guard caps ambiguous keys."""
    firsts = records.filter(F.size("tokens") >= 1).select(
        "rec_key", F.element_at("tokens", 1).alias("t1")
    )
    surfaces = (
        firsts.groupBy(F.col("t1").alias("canonical"))
        .agg(F.count("*").alias("support"))
        .filter(
            (F.col("support") >= min_support)
            & (F.length("canonical") >= MIN_FUZZY_SURFACE)
        )
    )
    dkeys = surfaces.select(
        "canonical", F.explode(_deletion_keys_col("canonical")).alias("k")
    ).distinct()
    fanout = dkeys.groupBy("k").agg(F.countDistinct("canonical").alias("nc"))
    dkeys = dkeys.join(fanout, "k").filter(F.col("nc") <= max_candidates)
    probes = (
        firsts.filter(F.length("t1") >= MIN_FUZZY_SURFACE)
        .select("rec_key", F.explode(_deletion_keys_col("t1")).alias("k"))
        .distinct()
    )
    return (
        probes.join(F.broadcast(dkeys.select("k", "canonical")), "k")
        .select(
            "rec_key", F.concat(F.lit("df:"), F.col("canonical")).alias("block_key")
        )
        .distinct()
    )


def fuzzy_dict_blocks_sql(
    records_rel: str,
    min_support: int = DICT_MIN_SUPPORT,
    max_candidates: int = DICT_MAX_CANDIDATES,
) -> str:
    dels = (
        lambda c: f"""list_distinct(CASE WHEN length({c}) >= {MIN_FUZZY_DELETE}
          THEN list_concat([{c}], list_transform(range(1, length({c}) + 1),
               i -> substr({c}, 1, i - 1) || substr({c}, i + 1)))
          ELSE [{c}] END)"""
    )
    firsts = f"""
    SELECT rec_key, tokens[1] AS t1 FROM ({records_rel}) WHERE len(tokens) >= 1
    """
    surfaces = f"""
    SELECT t1 AS canonical, count(*) AS support FROM ({firsts})
    GROUP BY t1
    HAVING count(*) >= {min_support} AND length(t1) >= {MIN_FUZZY_SURFACE}
    """
    dkeys = f"""
    SELECT k, canonical FROM (
      SELECT DISTINCT unnest({dels('canonical')}) AS k, canonical
      FROM ({surfaces})
    )
    QUALIFY count(DISTINCT canonical) OVER (PARTITION BY k) <= {max_candidates}
    """
    probes = f"""
    SELECT DISTINCT rec_key, unnest({dels('t1')}) AS k
    FROM ({firsts}) WHERE length(t1) >= {MIN_FUZZY_SURFACE}
    """
    return f"""
    SELECT DISTINCT p.rec_key, 'df:' || d.canonical AS block_key
    FROM ({probes}) p JOIN ({dkeys}) d USING (k)
    """
