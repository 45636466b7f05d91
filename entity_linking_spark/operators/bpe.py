"""BPE vocabulary induction (Sennrich et al. 2016) at corpus scale.

Learns byte-pair-encoding merges from the documents corpus and applies
them back — the tokenizer-training step of an LLM data pipeline,
expressed with the shape that survives 100 TB:

  * The CORPUS is touched exactly once: one explode + partial-agg'd
    groupBy produces the (word, count) vocabulary table. Everything
    after runs on that table (|V| ~ 10^7 at web scale, ~10^2 here),
    never on the corpus again — the standard word-frequency
    factorization every BPE trainer uses.
  * Each merge round is ONE vocabulary-sized groupBy (adjacent symbol
    pairs weighted by word count, map-side combined) + a 1-row argmax
    collect, then a pure expression rewrite of the symbol strings. No
    joins, no corpus scans.

Determinism / oracle parity: pair frequencies are exact integer sums;
the argmax breaks ties (freq DESC, pair ASC); words are represented as
single-space-joined symbol strings with sentinel spaces at both ends,
so applying a merge is `replace(s, ' a b ', ' ab ')` — the identical
left-to-right non-overlapping scan in Spark and DuckDB. (Back-to-back
repeats of a pair share a boundary space, so only alternating
occurrences merge within one round; the remainder merges next round —
a documented, engine-consistent deviation from reference BPE trainers
that merge runs greedily within a round.)

Reference analog: none in the reference repo (2013-era entity linking
predates subword tokenizers); the two-phase corpus→vocabulary shape
mirrors its dictionary builders (`index/MentionIndex.java` builds a
surface-form table once, then all lookups hit the table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tokenize as Tk

BPE_MERGES = 6


# ---------------------------------------------------------------------------
# vocabulary table (the single corpus exchange)
# ---------------------------------------------------------------------------


def word_counts(records: DataFrame) -> DataFrame:
    """(word, cnt) from the normalized token arrays — one partial-agg'd
    groupBy; the corpus is never read again after this."""
    return (
        records.select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def word_counts_sql(records_rel: str) -> str:
    return (
        f"SELECT word, count(*) AS cnt FROM ({records_rel}) r, "
        f"unnest(r.tokens) AS t(word) GROUP BY word"
    )


def _sym0_col(word: Column) -> Column:
    chars = Tk.char_ngrams_col(word, 1)
    return F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))


def _sym0_sql(expr: str) -> str:
    return f"(' ' || array_to_string({Tk.char_ngrams_sql(expr, 1)}, ' ') || ' ')"


def _pairs_col(sym: Column) -> Column:
    toks = F.split(F.trim(sym), " ")
    return Tk.word_ngrams_col(toks, 2)


def _pairs_sql(sym: str) -> str:
    toks = f"string_split(trim({sym}), ' ')"
    return Tk.word_ngrams_sql(toks, 2)


# ---------------------------------------------------------------------------
# merge learning
# ---------------------------------------------------------------------------


def learn_merges(
    records: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Returns ([(step, pair, merged, freq)], final symbolized vocab DF).
    Driver state per round is one (pair, freq) row; the vocab table is
    checkpointed once and rewritten by expression only."""
    vocab = word_counts(records).select(
        "word", "cnt", _sym0_col(F.col("word")).alias("sym")
    ).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            vocab.select(F.explode(_pairs_col(F.col("sym"))).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, freq = best[0]["pair"], int(best[0]["freq"])
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, freq))
        vocab = vocab.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ),
        )
        # Bound the replace-layer lineage: each round stacks one more
        # expression over the checkpointed v0, so a real vocab run
        # (30k merges) would otherwise re-evaluate O(n²) replace layers
        # across the rounds' argmax jobs. Never triggers at the default
        # 6-merge setting (results are identical either way).
        if step % 8 == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def bpe_merge_table(
    records: DataFrame,
    n_merges: int = BPE_MERGES,
    merges: list[tuple[int, str, str, int]] | None = None,
) -> DataFrame:
    """(step, pair, merged, freq): the learned merge sequence."""
    if merges is None:
        merges, _ = learn_merges(records, n_merges)
    spark = records.sparkSession
    return spark.createDataFrame(
        merges, "step int, pair string, merged string, freq long"
    )


def bpe_token_counts(
    records: DataFrame,
    n_merges: int = BPE_MERGES,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(token, n_words, n_occurrences): the corpus token histogram under
    the learned merges — the learn+apply round trip. Runs entirely on
    the vocabulary table (the corpus already crossed its one exchange
    inside word_counts)."""
    if vocab is None:
        _, vocab = learn_merges(records, n_merges)
    return (
        vocab.select(
            F.explode(F.split(F.trim(F.col("sym")), " ")).alias("token"), "cnt"
        )
        .groupBy("token")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("cnt").alias("n_occurrences"),
        )
    )


def bpe_doc_tokens(
    records: DataFrame,
    n_merges: int = BPE_MERGES,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_words, n_tokens): per-document token-budget accounting
    under the learned merges — the input every packing / pricing /
    curriculum stage needs ("how many tokens is this document under OUR
    tokenizer", not whitespace words). The vocabulary table carries each
    word's subword length, so the corpus side is one explode + one join
    against that small dimension (broadcast: |V| rows vs corpus tokens;
    at a 10^7-word web vocab drop the hint and it is still a
    vocab-sized shuffle dim) + one groupBy on doc_id. Integer-exact."""
    if vocab is None:
        _, vocab = learn_merges(records, n_merges)
    lens = vocab.select(
        "word", F.size(F.split(F.trim(F.col("sym")), " ")).alias("tok_len")
    )
    # OOV policy (matters only when callers pass a PRE-TRAINED vocab
    # rather than learning from the same corpus): a word absent from the
    # vocab has no learned merges, so — exactly as BPE apply-time
    # behaves — it falls back to its base character symbolization,
    # contributing len(chars) tokens via the LEFT join's coalesce. No
    # word (hence no document) is ever silently dropped.
    oov_len = F.size(F.split(F.trim(_sym0_col(F.col("word"))), " "))
    return (
        records.select("doc_id", F.explode("tokens").alias("word"))
        .join(F.broadcast(lens), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.coalesce(F.col("tok_len"), oov_len)).cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (unrolled merge rounds as CTEs)
# ---------------------------------------------------------------------------


def _chain_sql(records_rel: str, n_merges: int) -> tuple[str, str]:
    """(WITH body, final vocab rel): bpe_v0 .. bpe_v{n}, with bpe_b{k}
    holding round k's argmax pair."""
    ctes = [
        f"bpe_v0 AS MATERIALIZED (SELECT word, cnt, {_sym0_sql('word')} AS sym "
        f"FROM ({word_counts_sql(records_rel)}))"
    ]
    for k in range(1, n_merges + 1):
        prev = f"bpe_v{k - 1}"
        # AS MATERIALIZED on every per-round CTE: DuckDB otherwise
        # re-inlines each round's CTEs into the next, growing plan cost
        # ~10x per merge round (ADVICE r3 — measured >100s at n=6 on a
        # 2-row table without it)
        ctes.append(
            f"bpe_b{k} AS MATERIALIZED (SELECT pair, sum(cnt) AS freq FROM "
            f"(SELECT unnest({_pairs_sql('v.sym')}) AS pair, v.cnt FROM {prev} v) "
            f"GROUP BY pair ORDER BY freq DESC, pair ASC LIMIT 1)"
        )
        ctes.append(
            f"bpe_v{k} AS MATERIALIZED (SELECT word, cnt, CASE WHEN EXISTS (SELECT 1 FROM bpe_b{k}) "
            f"THEN replace(sym, (SELECT ' ' || pair || ' ' FROM bpe_b{k}), "
            f"(SELECT ' ' || replace(pair, ' ', '') || ' ' FROM bpe_b{k})) "
            f"ELSE sym END AS sym FROM {prev})"
        )
    return ",\n".join(ctes), f"bpe_v{n_merges}"


def bpe_merge_table_sql(records_rel: str, n_merges: int = BPE_MERGES) -> str:
    chain, _ = _chain_sql(records_rel, n_merges)
    selects = " UNION ALL ".join(
        f"SELECT {k} AS step, pair, replace(pair, ' ', '') AS merged, "
        f"CAST(freq AS BIGINT) AS freq FROM bpe_b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {chain} {selects}"


def bpe_doc_tokens_sql(records_rel: str, n_merges: int = BPE_MERGES) -> str:
    chain, final = _chain_sql(records_rel, n_merges)
    return f"""
    WITH {chain},
    bpe_lens AS (SELECT word, len(string_split(trim(sym), ' ')) AS tok_len
                 FROM {final})
    SELECT r.doc_id, count(*) AS n_words,
           CAST(sum(coalesce(l.tok_len,
                len(string_split(trim({_sym0_sql('r.word')}), ' ')))) AS BIGINT) AS n_tokens
    FROM (SELECT d.doc_id, t.word
          FROM ({records_rel}) d, unnest(d.tokens) AS t(word)) r
    LEFT JOIN bpe_lens l USING (word)
    GROUP BY r.doc_id
    """


def bpe_token_counts_sql(records_rel: str, n_merges: int = BPE_MERGES) -> str:
    chain, final = _chain_sql(records_rel, n_merges)
    return f"""
    WITH {chain}
    SELECT token, count(*) AS n_words,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(string_split(trim(v.sym), ' ')) AS token, v.cnt
          FROM {final} v)
    GROUP BY token
    """
