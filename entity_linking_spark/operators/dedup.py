"""Deduplication operators for training-data pipelines.

Exact dedup, MinHash-LSH near-dup, SimHash near-dup, n-gram-Jaccard
verification, and mod-p document fingerprinting over the `documents` table.
At 100 TB these are the highest-volume jobs an analytics engine runs, so
every operator here is shaped as: one narrow scan → one (or two) shuffles
with map-side partial aggregation → capped block-local self-join. No
Python in any hot path; every float is avoided or rounded for oracle
parity.

Reference analogs: the candidate dictionary's frequency cut
(`/root/reference/src/knowledgebase/EntityMentionFrequencyIndexBuilder.java:138-167`)
is the same "drop ubiquitous keys" move as our block cap; set-dedup via
TreeSet (`/root/reference/src/knowledgebase/EntityMentionIndexBuilder.java:166-178`)
becomes `distinct()`/`collect_set`; the sorted-array intersection
(`/root/reference/src/index/EntityLinksIndex.java:70-85`) becomes
`array_intersect` inside the Jaccard verifier.

Algorithms are public: Broder 1997 (MinHash), Charikar 2002 (SimHash),
Manber 1994 (mod-p fingerprint sampling), MMDS ch.3 (banded LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import normalize as N
from ..functions import tokenize as Tk
from . import blocking as B
from . import pairs as P

SIMHASH_BITS = 24
SIMHASH_BANDS = 4  # 6 bits per band
SIMHASH_MAX_HAMMING = 3
FP_SHINGLE = 8  # char-shingle width for fingerprints
FP_MOD = 16  # keep shingle hashes ≡ 0 (mod FP_MOD): ~1/16 sampling rate
# integer-exact near-dup threshold: ngram-Jaccard >= 0.8
NEARDUP_NUM, NEARDUP_DEN = 4, 5


def doc_records(documents: DataFrame) -> DataFrame:
    """Stage-0 for the documents table: normalized text + token array.
    doc_key is zero-padded so lexicographic order == numeric order (same
    sortable-string convention as the transcripts rec_key)."""
    return documents.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("doc_key"),
        F.col("doc_id"),
        F.col("source"),
        N.normalize_text_col(F.col("text")).alias("norm_text"),
    ).withColumn("tokens", Tk.tokens_col(F.col("norm_text")))


def doc_records_sql(documents_rel: str = "documents") -> str:
    norm = N.normalize_text_sql("text")
    return f"""
    SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS doc_key, doc_id, source,
           {norm} AS norm_text, {Tk.tokens_sql(norm)} AS tokens
    FROM ({documents_rel})
    """


# ---------------------------------------------------------------------------
# Exact dedup — hash-groupBy on normalized text
# ---------------------------------------------------------------------------


def exact_dup_groups(records: DataFrame) -> DataFrame:
    """(doc_id, dup_key, keeper_id, group_size): every doc annotated with
    its content-hash group; keeper = min doc_id of the group. One shuffle
    (groupBy md5). At scale the md5 is computed in the scan projection so
    the shuffle carries (16-byte key, id) only — never the text."""
    keyed = records.select(
        "doc_id", F.md5(F.col("norm_text")).alias("dup_key")
    )
    groups = keyed.groupBy("dup_key").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("group_size")
    )
    return keyed.join(groups, "dup_key").select(
        "doc_id", "dup_key", "keeper_id", "group_size"
    )


def exact_dup_groups_sql(records_rel: str) -> str:
    return f"""
    SELECT k.doc_id, k.dup_key, g.keeper_id, g.group_size
    FROM (SELECT doc_id, md5(norm_text) AS dup_key FROM ({records_rel})) k
    JOIN (
      SELECT dup_key, min(doc_id) AS keeper_id, count(*) AS group_size
      FROM (SELECT doc_id, md5(norm_text) AS dup_key FROM ({records_rel}))
      GROUP BY dup_key
    ) g USING (dup_key)
    """


def exact_dedup(records: DataFrame) -> DataFrame:
    """Exact-dedup survivors: keep the min-doc_id row per content hash."""
    return (
        exact_dup_groups(records)
        .filter(F.col("doc_id") == F.col("keeper_id"))
        .select("doc_id", "dup_key", "group_size")
    )


def exact_dedup_sql(records_rel: str) -> str:
    return (
        f"SELECT doc_id, dup_key, group_size FROM ({exact_dup_groups_sql(records_rel)}) "
        f"WHERE doc_id = keeper_id"
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup with n-gram-Jaccard verification
# ---------------------------------------------------------------------------


def minhash_neardup_pairs(
    records: DataFrame,
    n_perm: int = 16,
    band_rows: int = 4,
    shingle: int = 5,
    seed: int = 42,
    block_cap: int = 256,
    ngram: int = 3,
    hash_mode: str = "portable",
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH, verified by word
    n-gram Jaccard >= NEARDUP_NUM/NEARDUP_DEN (integer-exact — the
    decision is engine-portable with no float threshold).

    Output: (a_id, b_id, inter, uni). Scale shape: shingle→minhash is one
    shuffle; band→bucket-join is the classic LSH pair generator with the
    same block cap/skew guard as the linking pipeline."""
    recs = records.select(
        F.col("doc_key").alias("rec_key"), "norm_text", "tokens"
    )
    sigs = B.minhash_signatures(recs, n_perm, shingle, seed, hash_mode)
    blocks = B.lsh_blocks(sigs, n_perm, band_rows)
    cand = P.block_pairs(blocks, block_cap)
    grams = recs.select(
        "rec_key", Tk.word_ngrams_col(F.col("tokens"), ngram).alias("grams")
    )
    ga = grams.select(F.col("rec_key").alias("a_key"), F.col("grams").alias("a_g"))
    gb = grams.select(F.col("rec_key").alias("b_key"), F.col("grams").alias("b_g"))
    verified = (
        cand.join(ga, "a_key")
        .join(gb, "b_key")
        .select(
            F.col("a_key").cast("long").alias("a_id"),
            F.col("b_key").cast("long").alias("b_id"),
            F.size(F.array_intersect(F.array_distinct("a_g"), F.array_distinct("b_g"))).alias("inter"),
            F.size(F.array_union("a_g", "b_g")).alias("uni"),
        )
        .filter(
            (F.col("uni") > 0)
            & (F.col("inter") * NEARDUP_DEN >= F.col("uni") * NEARDUP_NUM)
        )
    )
    return verified


def minhash_neardup_pairs_sql(
    records_rel: str,
    n_perm: int = 16,
    band_rows: int = 4,
    shingle: int = 5,
    seed: int = 42,
    block_cap: int = 256,
    ngram: int = 3,
) -> str:
    recs = (
        f"SELECT doc_key AS rec_key, norm_text, tokens FROM ({records_rel})"
    )
    sigs = B.minhash_signatures_sql(recs, n_perm, shingle, seed)
    blocks = B.lsh_blocks_sql(sigs, n_perm, band_rows)
    cand = P.block_pairs_sql(blocks, block_cap)
    grams = (
        f"SELECT rec_key, {Tk.word_ngrams_sql('tokens', ngram)} AS grams FROM ({recs})"
    )
    return f"""
    SELECT CAST(c.a_key AS BIGINT) AS a_id, CAST(c.b_key AS BIGINT) AS b_id,
           len(list_intersect(list_distinct(ga.grams), list_distinct(gb.grams))) AS inter,
           len(list_distinct(list_concat(ga.grams, gb.grams))) AS uni
    FROM ({cand}) c
    JOIN ({grams}) ga ON c.a_key = ga.rec_key
    JOIN ({grams}) gb ON c.b_key = gb.rec_key
    WHERE len(list_distinct(list_concat(ga.grams, gb.grams))) > 0
      AND len(list_intersect(list_distinct(ga.grams), list_distinct(gb.grams))) * {NEARDUP_DEN}
          >= len(list_distinct(list_concat(ga.grams, gb.grams))) * {NEARDUP_NUM}
    """


# ---------------------------------------------------------------------------
# Exact n-gram-Jaccard near-dup via prefix filtering (all-pairs / PPJoin
# candidate generation; Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06)
# ---------------------------------------------------------------------------


def jaccard_neardup_pairs(
    records: DataFrame,
    ngram: int = 3,
    num: int = NEARDUP_NUM,
    den: int = NEARDUP_DEN,
    block_cap: int = P.DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Exact word-n-gram-Jaccard near-dup pairs (J >= num/den) generated by
    PREFIX FILTERING, the deterministic alternative to MinHash-LSH: if
    J(x, y) >= t, then the first `|x| - ceil(t*|x|) + 1` elements of x
    under any global total order must share an element with y's prefix —
    so joining on prefix grams only loses nothing (Bayardo WWW'07 Lemma 1)
    while probing each record into O(0.2*|x|) buckets instead of all |x|.

    The global order is (document frequency ASC, gram ASC): prefixes are
    each record's RAREST grams, so the self-join buckets are small by
    construction — the frequency ordering is itself the skew guard, with
    the shared block cap as the backstop for adversarial corpora. Compare
    `minhash_neardup_pairs`: LSH is probabilistic recall at fixed cost;
    prefix filtering is exact recall at data-dependent cost. Both verify
    with the identical integer-exact Jaccard test, so the two operators
    agree on every pair both generate.

    Scale shape: one groupBy(gram) with map-side partial aggregation for
    the df counts, one per-record window (bounded by grams-per-doc, never
    by corpus size) to rank grams, then the capped block-local self-join
    shared with every other blocking path. Output: (a_id, b_id, inter, uni).
    """
    grams = records.select(
        F.col("doc_key").alias("rec_key"),
        F.array_distinct(Tk.word_ngrams_col(F.col("tokens"), ngram)).alias("grams"),
    ).filter(F.size("grams") > 0)
    tok = grams.select(
        "rec_key", F.size("grams").alias("sz"), F.explode("grams").alias("gram")
    )
    dfc = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("rec_key").orderBy("gdf", "gram")
    prefix = (
        tok.join(dfc, "gram")
        .withColumn("rk", F.row_number().over(w))
        # prefix length = sz - ceil(sz*num/den) + 1, integer-exact
        .filter(F.col("rk") <= F.expr(f"sz - ((sz * {num} + {den - 1}) DIV {den}) + 1"))
        .select("rec_key", F.col("gram").alias("block_key"))
    )
    cand = P.block_pairs(prefix, block_cap)
    ga = grams.select(F.col("rec_key").alias("a_key"), F.col("grams").alias("a_g"))
    gb = grams.select(F.col("rec_key").alias("b_key"), F.col("grams").alias("b_g"))
    return (
        cand.join(ga, "a_key")
        .join(gb, "b_key")
        .select(
            F.col("a_key").cast("long").alias("a_id"),
            F.col("b_key").cast("long").alias("b_id"),
            F.size(F.array_intersect("a_g", "b_g")).alias("inter"),
            F.size(F.array_union("a_g", "b_g")).alias("uni"),
        )
        .filter((F.col("uni") > 0) & (F.col("inter") * den >= F.col("uni") * num))
    )


def jaccard_neardup_pairs_sql(
    records_rel: str,
    ngram: int = 3,
    num: int = NEARDUP_NUM,
    den: int = NEARDUP_DEN,
    block_cap: int = P.DEFAULT_BLOCK_CAP,
) -> str:
    grams = (
        f"SELECT rec_key, list_distinct(grams) AS grams FROM ("
        f"SELECT doc_key AS rec_key, {Tk.word_ngrams_sql('tokens', ngram)} AS grams"
        f" FROM ({records_rel})) WHERE len(list_distinct(grams)) > 0"
    )
    tok = (
        f"SELECT rec_key, len(grams) AS sz, unnest(grams) AS gram FROM ({grams})"
    )
    prefix = f"""
    SELECT rec_key, gram AS block_key FROM (
      SELECT t.rec_key, t.gram, t.sz,
             row_number() OVER (PARTITION BY t.rec_key ORDER BY d.gdf, t.gram) AS rk
      FROM ({tok}) t
      JOIN (SELECT gram, count(*) AS gdf FROM ({tok}) GROUP BY gram) d USING (gram)
    ) WHERE rk <= sz - ((sz * {num} + {den - 1}) // {den}) + 1
    """
    cand = P.block_pairs_sql(prefix, block_cap)
    return f"""
    SELECT CAST(c.a_key AS BIGINT) AS a_id, CAST(c.b_key AS BIGINT) AS b_id,
           len(list_intersect(ga.grams, gb.grams)) AS inter,
           len(list_distinct(list_concat(ga.grams, gb.grams))) AS uni
    FROM ({cand}) c
    JOIN ({grams}) ga ON c.a_key = ga.rec_key
    JOIN ({grams}) gb ON c.b_key = gb.rec_key
    WHERE len(list_distinct(list_concat(ga.grams, gb.grams))) > 0
      AND len(list_intersect(ga.grams, gb.grams)) * {den}
          >= len(list_distinct(list_concat(ga.grams, gb.grams))) * {num}
    """


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_signatures(
    records: DataFrame, bits: int = SIMHASH_BITS, hash_mode: str = "portable"
) -> DataFrame:
    """(doc_id, simhash): Charikar-style token-multiset SimHash. One
    explode + one groupBy(doc) with `bits` conditional sums (partial-agg'd
    map-side — the exact shape of the reference's combiner aggregations,
    `/root/reference/src/knowledgebase/DFTermIndexBuilder.java:85-99`)."""
    hash_col = H.portable_hash_col if hash_mode == "portable" else H.fast_hash_col
    tok = records.select(
        "doc_id", F.explode("tokens").alias("tok")
    ).select("doc_id", hash_col(F.col("tok")).alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = bit * F.lit(1 << i)
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_signatures_sql(records_rel: str, bits: int = SIMHASH_BITS) -> str:
    h = H.portable_hash_sql("tok")
    sums = ", ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    sim = " + ".join(
        f"(CASE WHEN s{i} >= 0 THEN 1 ELSE 0 END)::BIGINT * {1 << i}"
        for i in range(bits)
    )
    return f"""
    SELECT doc_id, {sim} AS simhash
    FROM (
      SELECT doc_id, {sums}
      FROM (
        SELECT doc_id, {h} AS h
        FROM (SELECT doc_id, unnest(tokens) AS tok FROM ({records_rel}))
      )
      GROUP BY doc_id
    )
    """


def simhash_neardup_pairs(
    signatures: DataFrame,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    block_cap: int = 256,
) -> DataFrame:
    """(a_id, b_id, hamming): pairs within Hamming distance `max_hamming`.
    Candidate generation: a pair within distance d < bands must agree
    exactly on at least one of the `bands` bit-bands (pigeonhole) — so a
    band-equality self-join finds all of them without an all-pairs scan."""
    assert bits % bands == 0
    w = bits // bands
    mask = (1 << w) - 1
    band_cols = [
        F.concat(
            F.lit(f"sh{j}:"),
            F.shiftright(F.col("simhash"), j * w).bitwiseAND(F.lit(mask)).cast("string"),
        )
        for j in range(bands)
    ]
    blocked = signatures.select(
        F.col("doc_id").cast("string").alias("rec_key"),
        F.explode(F.array(*band_cols)).alias("block_key"),
    ).select(F.lpad("rec_key", 12, "0").alias("rec_key"), "block_key")
    cand = P.block_pairs(blocked, block_cap)
    sa = signatures.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("a_key"),
        F.col("simhash").alias("a_sh"),
    )
    sb = signatures.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("b_key"),
        F.col("simhash").alias("b_sh"),
    )
    return (
        cand.join(sa, "a_key")
        .join(sb, "b_key")
        .select(
            F.col("a_key").cast("long").alias("a_id"),
            F.col("b_key").cast("long").alias("b_id"),
            F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_neardup_pairs_sql(
    signatures_rel: str,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    block_cap: int = 256,
) -> str:
    w = bits // bands
    mask = (1 << w) - 1
    band_exprs = ", ".join(
        f"'sh{j}:' || CAST((simhash >> {j * w}) & {mask} AS VARCHAR)"
        for j in range(bands)
    )
    blocked = f"""
    SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS rec_key,
           unnest([{band_exprs}]) AS block_key
    FROM ({signatures_rel})
    """
    cand = P.block_pairs_sql(blocked, block_cap)
    keyed = (
        f"SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS k, simhash "
        f"FROM ({signatures_rel})"
    )
    return f"""
    SELECT CAST(c.a_key AS BIGINT) AS a_id, CAST(c.b_key AS BIGINT) AS b_id,
           bit_count(xor(sa.simhash, sb.simhash)) AS hamming
    FROM ({cand}) c
    JOIN ({keyed}) sa ON c.a_key = sa.k
    JOIN ({keyed}) sb ON c.b_key = sb.k
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Mod-p fingerprinting (Manber 1994) — rolling-window content fingerprints
# ---------------------------------------------------------------------------


def doc_fingerprints(
    records: DataFrame,
    shingle: int = FP_SHINGLE,
    mod: int = FP_MOD,
    hash_mode: str = "portable",
) -> DataFrame:
    """(doc_id, fp): deterministic sampled content fingerprints — the
    char-shingle rolling window hashed, keeping hashes ≡ 0 (mod `mod`).
    Two docs sharing text regions share fingerprints; the expected sample
    rate is 1/mod regardless of document length."""
    hash_col = H.portable_hash_col if hash_mode == "portable" else H.fast_hash_col
    return (
        records.select(
            "doc_id",
            F.explode(Tk.char_ngrams_col(F.col("norm_text"), shingle)).alias("sh"),
        )
        .select("doc_id", hash_col(F.col("sh")).alias("fp"))
        .filter(F.pmod(F.col("fp"), F.lit(mod)) == 0)
        .distinct()
    )


def doc_fingerprints_sql(
    records_rel: str, shingle: int = FP_SHINGLE, mod: int = FP_MOD
) -> str:
    h = H.portable_hash_sql("sh")
    return f"""
    SELECT DISTINCT doc_id, {h} AS fp
    FROM (
      SELECT doc_id, unnest({Tk.char_ngrams_sql('norm_text', shingle)}) AS sh
      FROM ({records_rel})
    )
    WHERE ({h}) % {mod} = 0
    """


def duplicated_spans(
    fingerprints: DataFrame, min_docs: int = 2
) -> DataFrame:
    """(fp, n_docs): sampled content fingerprints shared by ≥ `min_docs`
    distinct documents — the candidate set for exact-substring
    cross-document dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": duplicated spans are removed, not whole
    docs). Input is `doc_fingerprints` output, already distinct per
    (doc_id, fp), so one partial-agg'd groupBy on the hash finds every
    shared span sample; at 100 TB the shuffle carries (8-byte hash, count)
    pairs only. A span editor would join this back to the fingerprint
    table to locate the offending documents."""
    return (
        fingerprints.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def duplicated_spans_sql(fingerprints_rel: str, min_docs: int = 2) -> str:
    return f"""
    SELECT fp, CAST(count(*) AS BIGINT) AS n_docs
    FROM ({fingerprints_rel})
    GROUP BY fp
    HAVING count(*) >= {min_docs}
    """


def doc_fingerprints_pos(
    records: DataFrame,
    shingle: int = FP_SHINGLE,
    mod: int = FP_MOD,
    hash_mode: str = "portable",
) -> DataFrame:
    """(doc_id, pos, fp): positioned variant of `doc_fingerprints` — the
    1-based start offset of each sampled shingle is kept so a span editor
    can locate (not just count) duplicated regions. NOT distinct: the
    same shingle at two offsets is two rows, because both offsets may
    need excision. Same narrow explode-filter shape; the shuffle-free
    scan emits ~len/mod rows per document."""
    hash_col = H.portable_hash_col if hash_mode == "portable" else H.fast_hash_col
    return (
        records.select(
            "doc_id",
            F.posexplode(Tk.char_ngrams_col(F.col("norm_text"), shingle)).alias(
                "idx", "sh"
            ),
        )
        .select(
            "doc_id",
            (F.col("idx") + 1).alias("pos"),
            hash_col(F.col("sh")).alias("fp"),
        )
        .filter(F.pmod(F.col("fp"), F.lit(mod)) == 0)
    )


def strip_dup_spans(
    records: DataFrame,
    shingle: int = FP_SHINGLE,
    mod: int = FP_MOD,
    min_docs: int = 2,
    hash_mode: str = "portable",
) -> DataFrame:
    """(doc_id, clean_text, n_spans, n_removed): ExactSubstr-style span
    EXCISION (Lee et al. 2022 remove the duplicated substring, not the
    document). Sampled semantics: a span is a fingerprinted shingle
    (`doc_fingerprints_pos`) shared by >= `min_docs` distinct documents;
    the minimum doc_id holding it keeps its copy, every other document
    has [pos, pos+shingle-1] cut out. Overlapping cuts coalesce before
    excision (n_spans counts coalesced islands), so output text is the
    ordered concatenation of the complement segments. mod=1 makes the
    sample exhaustive (every offset fingerprinted) — the exact
    suffix-array semantics at explode-factor cost; the default mod keeps
    one row per ~mod chars, the production rate.

    Scale shape: two fp-keyed shuffles (the dup-fp aggregate is
    partial-agg'd so a ubiquitous span arrives as one row per map side),
    then everything is doc_id-local: the interval window partitions by
    doc_id and orders ~len/mod sampled offsets per doc — bounded by
    document length, never by corpus hotness. The complement rebuild is
    pure expressions (substr + array_sort fold), no Python, no explode
    of text. A sentinel interval at len+1 per document closes the tail
    segment so untouched documents flow through the same plan."""
    base = records.select(
        "doc_id", "norm_text", F.length("norm_text").alias("doc_len")
    )
    fps = doc_fingerprints_pos(records, shingle, mod, hash_mode)
    dup = (
        fps.groupBy("fp")
        .agg(
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    loc = (
        fps.join(dup, "fp")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + (shingle - 1)).alias("e"),
        )
    )
    sentinel = base.select(
        "doc_id",
        (F.col("doc_len") + 1).alias("s"),
        (F.col("doc_len") + 1).alias("e"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    iv = (
        loc.unionByName(sentinel)
        .withColumn("prev_e", F.coalesce(F.max("e").over(w_prev), F.lit(0)))
        .withColumn("island", (F.col("s") > F.col("prev_e")).cast("long"))
    )
    seg = iv.join(base, "doc_id").select(
        "doc_id",
        "island",
        (F.col("prev_e") + 1).alias("g"),
        F.col("norm_text")
        .substr(
            F.col("prev_e") + 1, F.greatest(F.col("s") - F.col("prev_e") - 1, F.lit(0))
        )
        .alias("seg"),
    )
    agg = seg.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("g", "seg"))),
                lambda x: x["seg"],
            ),
            "",
        ).alias("clean_text"),
        (F.sum("island") - 1).cast("long").alias("n_spans"),
    )
    return agg.join(base, "doc_id").select(
        "doc_id",
        "clean_text",
        "n_spans",
        (F.col("doc_len") - F.length("clean_text")).cast("long").alias("n_removed"),
    )


def strip_dup_spans_sql(
    records_rel: str,
    shingle: int = FP_SHINGLE,
    mod: int = FP_MOD,
    min_docs: int = 2,
) -> str:
    h = H.portable_hash_sql(f"substr(norm_text, i, {shingle})")
    return f"""
    WITH sds_base AS (
      SELECT doc_id, norm_text, length(norm_text) AS doc_len
      FROM ({records_rel})
    ),
    sds_fps AS (
      SELECT doc_id, i AS pos, {h} AS fp
      FROM sds_base,
           unnest(range(1, greatest(doc_len - {shingle - 1}, 0) + 1)) AS t(i)
      WHERE ({h}) % {mod} = 0
    ),
    sds_dup AS (
      SELECT fp, min(doc_id) AS keeper
      FROM sds_fps GROUP BY fp
      HAVING count(DISTINCT doc_id) >= {min_docs}
    ),
    sds_iv AS (
      SELECT f.doc_id, f.pos AS s, f.pos + {shingle - 1} AS e
      FROM sds_fps f JOIN sds_dup d USING (fp)
      WHERE f.doc_id <> d.keeper
      UNION ALL
      SELECT doc_id, doc_len + 1, doc_len + 1 FROM sds_base
    ),
    sds_iv2 AS (
      SELECT doc_id, s,
             coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_e
      FROM sds_iv
    ),
    sds_seg AS (
      SELECT i.doc_id,
             CASE WHEN i.s > i.prev_e THEN 1 ELSE 0 END AS island,
             i.prev_e + 1 AS g,
             substr(b.norm_text, i.prev_e + 1, greatest(i.s - i.prev_e - 1, 0)) AS seg
      FROM sds_iv2 i JOIN sds_base b USING (doc_id)
    ),
    sds_agg AS (
      SELECT doc_id, string_agg(seg, '' ORDER BY g) AS clean_text,
             CAST(sum(island) - 1 AS BIGINT) AS n_spans
      FROM sds_seg GROUP BY doc_id
    )
    SELECT b.doc_id, coalesce(a.clean_text, '') AS clean_text, a.n_spans,
           CAST(b.doc_len - length(coalesce(a.clean_text, '')) AS BIGINT)
             AS n_removed
    FROM sds_agg a JOIN sds_base b USING (doc_id)
    """


def dedup_clusters(
    records: DataFrame, pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(doc_id, keeper_id, is_dup): the output a curation pipeline
    actually consumes — near-dup pairs closed transitively into groups
    (the same large-star/small-star connected components as the linking
    pipeline, `operators/clustering.py`), keeper = min doc_id of the
    group, every other member flagged `is_dup` for dropping. Singletons
    keep themselves. Composes with any pair generator in this module
    (minhash / simhash / jaccard / embedding)."""
    from . import clustering as C

    edges = pairs.select(
        F.col("a_id").alias("a_key"), F.col("b_id").alias("b_key")
    )
    recs = records.select(F.col("doc_id").alias("rec_key"))
    cl = C.clusters_with_singletons(recs, edges, max_iter=max_iter)
    # is_dup as 0/1 long (not boolean): the oracle hash stringifies
    # values, and an integer renders identically in every engine
    return cl.select(
        F.col("rec_key").alias("doc_id"),
        F.col("cluster_id").alias("keeper_id"),
        (F.col("rec_key") != F.col("cluster_id")).cast("long").alias("is_dup"),
    )


def dedup_clusters_sql(records_rel: str, pairs_rel: str) -> str:
    from .clustering import clusters_sql

    recs = f"SELECT doc_id AS rec_key FROM ({records_rel})"
    edges = f"SELECT a_id AS a_key, b_id AS b_key FROM ({pairs_rel})"
    inner = clusters_sql(recs, edges)
    return f"""
    SELECT rec_key AS doc_id, cluster_id AS keeper_id,
           CAST(rec_key <> cluster_id AS BIGINT) AS is_dup
    FROM ({inner})
    """
