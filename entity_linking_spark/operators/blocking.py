"""Stage 1 — blocking / candidate generation.

The reference generates candidates by probing every document n-gram against
a 9.2M-entry mention dictionary (`md/MentionDetection.java:166-194`,
`index/MentionIndex.java:59-67`). Transcripts have no dictionary, so we
block on *content signatures* instead — the standard record-linkage move:

  * first-token key   — cheap, high-recall for shared leading surface form
  * MinHash-LSH bands — Jaccard-similar token/char-shingle sets land in the
                        same band bucket with high probability

Both produce `(rec_key, block_key)` rows; candidate pairs are generated
block-locally (operators/pairs.py), mirroring the reference's
"pairs only within one document" scoping (`CocitationMap.java:22-48`).

Scale design (100 TB):
  * signatures are one `groupBy(rec_key)` with n_perm min() aggregates —
    a single shuffle with map-side partial aggregation; no perm explosion.
  * every block inherits the reference's fan-out guard
    (`md/MentionDetection.java:23-24,178-181`: skip mentions with > 2000
    candidates): blocks larger than `cap` are dropped in pairs.py, and a
    salting helper splits hot keys when the cap must be avoided.
  * hash_mode='fast' switches md5-portable hashing to JVM xxhash64 for
    production (same topology, ~3× cheaper scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import normalize as N
from ..functions import phonetic as PH
from ..functions import tokenize as Tk

DEFAULT_N_PERM = 16
DEFAULT_BAND_ROWS = 4
DEFAULT_SHINGLE = 5  # char-shingle width for MinHash


def prepare_records(transcripts: DataFrame) -> DataFrame:
    """Stage 0 output: one record per turn with normalized text + tokens.
    rec_key is a single sortable string so `a < b` pair ordering and
    min-based cluster ids are portable across engines."""
    return transcripts.select(
        F.concat_ws("#", F.col("conv_id"), F.lpad(F.col("turn_idx").cast("string"), 6, "0")).alias(
            "rec_key"
        ),
        "conv_id",
        "turn_idx",
        N.normalize_text_col(F.col("text")).alias("norm_text"),
    ).withColumn("tokens", Tk.tokens_col(F.col("norm_text")))


def prepare_records_sql(transcripts_rel: str) -> str:
    norm = N.normalize_text_sql("text")
    return f"""
    SELECT conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 6, '0') AS rec_key,
           conv_id, turn_idx,
           {norm} AS norm_text,
           {Tk.tokens_sql(norm)} AS tokens
    FROM ({transcripts_rel})
    """


def first_token_blocks(records: DataFrame) -> DataFrame:
    """(rec_key, block_key) for the first-token blocking key. Empty texts
    produce no block (they can never match anything)."""
    return records.filter(F.size("tokens") > 0).select(
        "rec_key", F.concat(F.lit("t0:"), F.element_at("tokens", 1)).alias("block_key")
    )


def first_token_blocks_sql(records_rel: str) -> str:
    return f"""
    SELECT rec_key, 't0:' || tokens[1] AS block_key
    FROM ({records_rel}) WHERE len(tokens) > 0
    """


MIN_TOKEN_LEN = 2


def token_blocks(records: DataFrame, min_len: int = MIN_TOKEN_LEN) -> DataFrame:
    """(rec_key, block_key) — standard ER *token blocking*: every distinct
    token of a record is a blocking key. Recall is near-total (two records
    sharing any rare identifier token become candidates); precision is
    delegated to the scorer; cost is controlled by the block cap, which
    automatically drops ubiquitous tokens (a stop-word's block exceeds the
    cap and is discarded — the reference's 2%-frequency candidate cut,
    `EntityMentionFrequencyIndexBuilder.java:138-167`, inverted as a size
    cap). Reference analog of keying by surface form:
    `md/MentionDetection.java:166-194` (dictionary n-gram probe)."""
    return (
        records.select(
            "rec_key", F.explode(F.array_distinct("tokens")).alias("tok")
        )
        .filter(F.length("tok") >= min_len)
        .select("rec_key", F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"))
    )


def token_blocks_sql(records_rel: str, min_len: int = MIN_TOKEN_LEN) -> str:
    return f"""
    SELECT rec_key, 'tk:' || tok AS block_key
    FROM (
      SELECT rec_key, unnest(list_distinct(tokens)) AS tok
      FROM ({records_rel})
    ) WHERE length(tok) >= {min_len}
    """


PHONETIC_MIN_TOKEN_LEN = 3


def phonetic_blocks(
    records: DataFrame, min_len: int = PHONETIC_MIN_TOKEN_LEN
) -> DataFrame:
    """(rec_key, block_key) — *phonetic blocking*: every distinct token of
    a record keys a block by its Soundex-variant code
    (`functions/phonetic.py`), so misspelled / sound-alike variants
    ("smith"/"smyth", "jon"/"john") co-block where token blocking
    separates them. min_len=3 skips short tokens whose 4-char codes are
    mostly padding (near-useless blocks that only feed the cap).
    Ubiquitous sound classes are handled exactly like stop-word token
    blocks: the block cap (`pairs.cap_blocks`) drops them. Shape: one
    narrow explode + one dedup shuffle (unlike `token_blocks`, distinct
    tokens of one record can code to the SAME key, so (rec_key,
    block_key) needs a distinct or the cap double-counts members)."""
    return (
        records.select(
            "rec_key", F.explode(F.array_distinct("tokens")).alias("tok")
        )
        .filter(F.length("tok") >= min_len)
        .select(
            "rec_key",
            F.concat(
                F.lit("ph:"), PH.phonetic_key_col(F.col("tok"))
            ).alias("block_key"),
        )
        .distinct()
    )


def phonetic_blocks_sql(
    records_rel: str, min_len: int = PHONETIC_MIN_TOKEN_LEN
) -> str:
    return f"""
    SELECT DISTINCT rec_key, 'ph:' || {PH.phonetic_key_sql('tok')} AS block_key
    FROM (
      SELECT rec_key, unnest(list_distinct(tokens)) AS tok
      FROM ({records_rel})
    ) WHERE length(tok) >= {min_len}
    """


MIN_SUFFIX_LEN = 4


def suffix_blocks(records: DataFrame, min_suffix: int = MIN_SUFFIX_LEN) -> DataFrame:
    """(rec_key, block_key) — *suffix blocking* (Aizawa & Oyama 2005,
    "A fast linkage detection scheme for multi-source information
    integration"): the blocking key value (here the record's first
    token, the same BKV `first_token_blocks` uses) is expanded to every
    suffix of length ≥ `min_suffix`, so records whose keys differ only
    by a leading typo / truncation ("jonathan"/"onathan") still
    co-block. Keys shorter than `min_suffix` emit themselves whole. The
    classic companion knob — Aizawa's maxBlockSize — is exactly this
    engine's `pairs.cap_blocks`, so ubiquitous suffixes ("-tion") die
    at the cap like stop-word token blocks.

    Shape: a narrow per-record expression explode (≤ len−min_suffix+1
    keys per record, suffixes of one token are pairwise distinct so no
    dedup shuffle); the fifth key-generation family next to first-token,
    token, phonetic, and LSH."""
    tok = F.element_at("tokens", 1)
    n_suf = F.greatest(F.length(tok) - F.lit(min_suffix - 1), F.lit(1))
    sufs = F.transform(
        F.sequence(F.lit(1), n_suf),
        lambda i: F.concat(F.lit("sx:"), tok.substr(i, F.length(tok))),
    )
    return records.filter(F.size("tokens") > 0).select(
        "rec_key", F.explode(sufs).alias("block_key")
    )


def suffix_blocks_sql(records_rel: str, min_suffix: int = MIN_SUFFIX_LEN) -> str:
    return f"""
    SELECT rec_key, 'sx:' || substr(tok, i) AS block_key
    FROM (
      SELECT rec_key, tokens[1] AS tok FROM ({records_rel})
      WHERE len(tokens) > 0
    ),
    unnest(range(1, greatest(length(tok) - {min_suffix - 1}, 1) + 1)) AS t(i)
    """


def minhash_signatures(
    records: DataFrame,
    n_perm: int = DEFAULT_N_PERM,
    shingle: int = DEFAULT_SHINGLE,
    seed: int = 42,
    hash_mode: str = "portable",
) -> DataFrame:
    """(rec_key, sig_0..sig_{n-1}) MinHash signature over char shingles of
    the normalized text. One explode + one groupBy(rec_key) with n_perm
    min() columns — a single shuffle, partial-agg'd map-side."""
    hash_col = H.portable_hash_col if hash_mode == "portable" else H.fast_hash_col
    sh = records.select(
        "rec_key",
        F.explode(Tk.char_ngrams_col(F.col("norm_text"), shingle)).alias("shingle"),
    ).select("rec_key", hash_col(F.col("shingle")).alias("x"))
    aggs = [
        F.min(H.minhash_perm_col(F.col("x"), a, b)).alias(f"sig_{i}")
        for i, (a, b) in enumerate(H.perm_constants(n_perm, seed))
    ]
    return sh.groupBy("rec_key").agg(*aggs)


def minhash_signatures_sql(
    records_rel: str,
    n_perm: int = DEFAULT_N_PERM,
    shingle: int = DEFAULT_SHINGLE,
    seed: int = 42,
) -> str:
    x = H.portable_hash_sql("shingle")
    aggs = ", ".join(
        f"min({H.minhash_perm_sql('x', a, b)}) AS sig_{i}"
        for i, (a, b) in enumerate(H.perm_constants(n_perm, seed))
    )
    return f"""
    SELECT rec_key, {aggs}
    FROM (
      SELECT rec_key, {x} AS x
      FROM (
        SELECT rec_key, unnest({Tk.char_ngrams_sql('norm_text', shingle)}) AS shingle
        FROM ({records_rel})
      )
    )
    GROUP BY rec_key
    """


def lsh_blocks(
    signatures: DataFrame,
    n_perm: int = DEFAULT_N_PERM,
    band_rows: int = DEFAULT_BAND_ROWS,
) -> DataFrame:
    """(rec_key, block_key) — one block key per LSH band: md5 of the
    concatenated band rows. b = n_perm/band_rows bands; with 16/4 the
    match-probability S-curve crosses 0.5 near Jaccard ≈ 0.7."""
    assert n_perm % band_rows == 0
    bands = []
    for band in range(n_perm // band_rows):
        cols = [F.col(f"sig_{band * band_rows + r}") for r in range(band_rows)]
        bands.append(
            F.concat(
                F.lit(f"mh{band}:"),
                F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])),
            )
        )
    return signatures.select(
        "rec_key", F.explode(F.array(*bands)).alias("block_key")
    )


def lsh_blocks_sql(
    signatures_rel: str,
    n_perm: int = DEFAULT_N_PERM,
    band_rows: int = DEFAULT_BAND_ROWS,
) -> str:
    bands = []
    for band in range(n_perm // band_rows):
        cols = " || '_' || ".join(
            f"CAST(sig_{band * band_rows + r} AS VARCHAR)" for r in range(band_rows)
        )
        bands.append(f"'mh{band}:' || md5({cols})")
    arr = ", ".join(bands)
    return f"""
    SELECT rec_key, unnest([{arr}]) AS block_key
    FROM ({signatures_rel})
    """


def salt_blocks(
    blocked: DataFrame,
    n_salt: int = 8,
    hot_threshold: int = 1024,
    hash_mode: str = "fast",
) -> DataFrame:
    """Skew defense for keys that must NOT be dropped by the block cap:
    rows of a hot block_key (> hot_threshold members) are re-keyed to
    `key#s` with s = pmod(hash(rec_key), n_salt). Pairs are then generated
    within each salt shard — an intentional recall trade on pathological
    keys, the same trade the reference makes by skipping >2000-candidate
    mentions (`md/MentionDetection.java:178-181`) but keeping partial
    coverage instead of none. hash_mode='portable' uses the md5-derived
    hash the DuckDB oracle replays bit-for-bit; 'fast' uses xxhash64."""
    hash_col = H.portable_hash_col if hash_mode == "portable" else H.fast_hash_col
    counts = blocked.groupBy("block_key").agg(F.count("*").alias("bn"))
    return (
        blocked.join(counts, "block_key")
        .withColumn(
            "block_key",
            F.when(
                F.col("bn") > hot_threshold,
                F.concat_ws(
                    "#", F.col("block_key"), F.pmod(hash_col(F.col("rec_key")), F.lit(n_salt))
                ),
            ).otherwise(F.col("block_key")),
        )
        .drop("bn")
    )


def salt_blocks_sql(
    blocked_rel: str, n_salt: int = 8, hot_threshold: int = 1024
) -> str:
    """DuckDB twin of salt_blocks(hash_mode='portable')."""
    salted = H.portable_hash_sql("rec_key")
    return f"""
    SELECT rec_key,
           CASE WHEN bn > {hot_threshold}
                THEN block_key || '#' || CAST({salted} % {n_salt} AS VARCHAR)
                ELSE block_key END AS block_key
    FROM (
      SELECT rec_key, block_key, count(*) OVER (PARTITION BY block_key) AS bn
      FROM ({blocked_rel})
    )
    """


def block_family_stats(blocked: DataFrame, cap: int) -> DataFrame:
    """One row per blocking-key family over a (rec_key, block_key) table:
    the CAP AUDIT that justifies the fan-out guard's setting — what the
    reference hard-codes as MAX_CANDIDATES=2000
    (`md/MentionDetection.java:23-24`) chosen by inspection, made a
    measurable table:

      family           key prefix before ':' (mh0..mhN collapse to 'mh')
      n_blocks         distinct keys
      n_entries        (record, key) memberships
      max_block        largest block
      n_blocks_over    blocks the cap will drop
      entries_dropped  memberships lost to the cap
      pairs_kept       Σ C(n,2) over surviving blocks — the pair-generation
                       budget the self-join will actually pay
      pairs_dropped    Σ C(n,2) over dropped blocks — the quadratic work
                       the cap refused

    All exact integers. Scale shape: ONE partial-agg'd
    groupBy(block_key) for sizes (a hot key collapses map-side), then a
    family-keyed re-aggregation over one row per block — the distribution
    is never materialized per record."""
    fam = F.regexp_replace(
        F.regexp_extract(F.col("block_key"), r"^([a-z0-9]+):", 1),
        r"^mh[0-9]+$",
        "mh",
    )
    sizes = blocked.groupBy(fam.alias("family"), "block_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    c2 = F.shiftright((F.col("n") * (F.col("n") - 1)).cast("long"), 1)
    over = F.col("n") > cap
    return sizes.groupBy("family").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n").cast("long").alias("n_entries"),
        F.max("n").cast("long").alias("max_block"),
        F.sum(over.cast("long")).cast("long").alias("n_blocks_over"),
        F.sum(F.when(over, F.col("n")).otherwise(0)).cast("long").alias(
            "entries_dropped"
        ),
        F.sum(F.when(~over, c2).otherwise(0)).cast("long").alias("pairs_kept"),
        F.sum(F.when(over, c2).otherwise(0)).cast("long").alias("pairs_dropped"),
    )


def block_family_stats_sql(blocked_rel: str, cap: int) -> str:
    return f"""
    SELECT family,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(n) AS BIGINT) AS n_entries,
           CAST(max(n) AS BIGINT) AS max_block,
           CAST(sum(CASE WHEN n > {cap} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocks_over,
           CAST(sum(CASE WHEN n > {cap} THEN n ELSE 0 END) AS BIGINT)
             AS entries_dropped,
           CAST(sum(CASE WHEN n <= {cap} THEN (n * (n - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_kept,
           CAST(sum(CASE WHEN n > {cap} THEN (n * (n - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_dropped
    FROM (
      SELECT regexp_replace(regexp_extract(block_key, '^([a-z0-9]+):', 1),
                            '^mh[0-9]+$', 'mh') AS family,
             block_key, count(*) AS n
      FROM ({blocked_rel})
      GROUP BY 1, 2
    )
    GROUP BY family
    """
