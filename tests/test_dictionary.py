"""Alias-dictionary candidate generation (J3/S3) tests.

The round-1 engine blocked only on content signatures, so acronym /
short-form / concatenated aliases ("AC" / "acme" / "acmecorp" for
"acme corp") were unrecoverable — the fixture's `hard_variants` mode
plants exactly those. These tests prove the dictionary join recovers
them: blocking recall on the hard fixture improves strictly, and the
targeted variant pairs land in shared blocks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import dictionary as DICT
from entity_linking_spark.operators import evaluation as E
from entity_linking_spark.operators import pairs as P
from entity_linking_spark.plans.pipeline import LinkingConfig, build_blocks
from entity_linking_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def hard_fixture(spark):
    # include_attrs=False: the alias surface is the only linking signal,
    # so acronym/concat variants are unreachable without the dictionary
    tdf, gdf = synth_transcripts(
        spark, n_convs=60, n_entities=12, seed=7, hard_variants=True,
        include_attrs=False,
    )
    return tdf.cache(), gdf.cache()


def _recall(spark, tdf, gdf, use_dict: bool, use_fuzzy: bool) -> float:
    cfg = LinkingConfig(use_dict=use_dict, use_fuzzy_dict=use_fuzzy)
    records = B.prepare_records(tdf)
    prs = P.block_pairs(build_blocks(records, cfg), cfg.block_cap)
    return E.blocking_recall(prs, gdf, records)


def test_dict_blocks_improve_hard_variant_recall(spark, hard_fixture):
    """Acronym/short-form/concat aliases are invisible to signature
    blocking and typos defeat exact dictionary keys; together the alias
    dictionary + deletion-neighborhood blocks must lift blocking recall
    from ~0.59 to ~0.98 on the hard fixture (the round-1 recall-ceiling
    gap). Measured: 0.593 / 0.739 / 0.980."""
    tdf, gdf = hard_fixture
    rec_sig_only = _recall(spark, tdf, gdf, use_dict=False, use_fuzzy=False)
    rec_dict = _recall(spark, tdf, gdf, use_dict=True, use_fuzzy=False)
    rec_full = _recall(spark, tdf, gdf, use_dict=True, use_fuzzy=True)
    assert rec_dict > rec_sig_only + 0.05, (rec_sig_only, rec_dict)
    assert rec_full > rec_dict + 0.05, (rec_dict, rec_full)
    assert rec_full >= 0.95, rec_full


def test_acronym_and_concat_records_share_a_dict_block(spark):
    """Handcrafted corpus: full surface, acronym, short form, and
    concatenation of 'acme corp' all land in the block dc:'acme corp'."""
    rows = []
    # 5 full-surface records establish min-support for the surface
    for i in range(5):
        rows.append((f"c{i:02d}", 0, "user", f"acme corp acct{i} status", None))
    rows += [
        ("c90", 0, "user", "ac acct9 status", None),        # acronym
        ("c91", 0, "user", "acme acct9 status", None),      # short form
        ("c92", 0, "user", "acmecorp acct9 status", None),  # concatenation
        ("c93", 0, "user", "globex gx1 status", None),      # unrelated
    ]
    tdf = spark.createDataFrame(
        [(c, t, r, x, tool, __import__("datetime").datetime(2024, 1, 1)) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    records = B.prepare_records(tdf)
    d = DICT.alias_dictionary(records)
    keys = {(r["alias_key"], r["canonical"]) for r in d.collect()}
    assert ("acme corp", "acme corp") in keys
    assert ("acmecorp", "acme corp") in keys
    assert ("ac", "acme corp") in keys
    assert ("acme", "acme corp") in keys

    blocks = DICT.dict_blocks(records, d)
    members = {
        r["rec_key"]
        for r in blocks.filter(F.col("block_key") == "dc:acme corp").collect()
    }
    got_convs = {m.split("#")[0] for m in members}
    assert {"c90", "c91", "c92"} <= got_convs          # variants recovered
    assert {f"c{i:02d}" for i in range(5)} <= got_convs  # full surfaces too
    assert "c93" not in got_convs                       # unrelated excluded


def test_dictionary_min_support_and_fanout_guard(spark):
    """Singleton surfaces are dropped (F3 analog); alias keys mapping to
    more canonicals than the cap are dropped entirely (F4 analog)."""
    rows = []
    # 20 distinct surfaces all sharing the leading token "zeta" -> the
    # short-form key "zeta" exceeds the fanout cap and must vanish
    for i in range(20):
        for rep in range(2):  # meet min-support
            rows.append((f"z{i:02d}{rep}", 0, "user", f"zeta v{i:02d} body", None))
    # one singleton surface -> below min-support, absent from dictionary
    rows.append(("s00", 0, "user", "solo surface once", None))
    tdf = spark.createDataFrame(
        [(c, t, r, x, tool, __import__("datetime").datetime(2024, 1, 1)) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    d = DICT.alias_dictionary(
        B.prepare_records(tdf), min_support=2, max_candidates=4
    ).cache()
    assert d.filter(F.col("canonical") == "solo surface").count() == 0
    assert d.filter(F.col("alias_key") == "zeta").count() == 0  # fanout-capped
    # but each full surface key survives (maps to exactly one canonical)
    assert d.filter(F.col("alias_key") == "zeta v00").count() == 1


def test_load_external_alias_dictionary(spark, sf_dir, tmp_path_factory):
    """S3 external load path (`index/MentionIndex.java:28-52` analog,
    VERDICT r2 item 6): a TSV dictionary loads with the declared schema
    and produces the same dict_blocks as the corpus-derived dictionary it
    was exported from; a parquet dictionary lacking the support column
    gets the default support=1."""
    from entity_linking_spark.sources.tables import load_table
    from entity_linking_spark.sources.transcripts import derive_transcripts

    recs = B.prepare_records(
        derive_transcripts(load_table(spark, sf_dir, "documents"))
    )
    ad = DICT.alias_dictionary(recs)
    rows = ad.collect()
    assert rows, "corpus-derived dictionary unexpectedly empty"
    base = tmp_path_factory.mktemp("extdict")

    tsv = str(base / "aliases.tsv")
    with open(tsv, "w") as f:
        for r in rows:
            f.write(f"{r['alias_key']}\t{r['canonical']}\t{r['support']}\n")
    loaded = DICT.load_alias_dictionary(spark, tsv)
    assert loaded.columns == ["alias_key", "canonical", "support"]
    got = {(r["alias_key"], r["canonical"], r["support"]) for r in loaded.collect()}
    want = {(r["alias_key"], r["canonical"], r["support"]) for r in rows}
    assert got == want

    blk_ext = {
        (r["rec_key"], r["block_key"])
        for r in DICT.dict_blocks(recs, loaded).collect()
    }
    blk_corp = {
        (r["rec_key"], r["block_key"])
        for r in DICT.dict_blocks(recs, ad).collect()
    }
    assert blk_ext == blk_corp

    pq = str(base / "aliases_nosupport.parquet")
    ad.select("alias_key", "canonical").write.mode("overwrite").parquet(pq)
    loaded2 = DICT.load_alias_dictionary(spark, pq)
    assert loaded2.columns == ["alias_key", "canonical", "support"]
    assert loaded2.filter(F.col("support") != 1).count() == 0
    assert loaded2.count() == len(rows)


def test_load_external_dictionary_malformed_tsv_rows(spark, tmp_path_factory):
    """A short (2-column) TSV row must not silently produce a null-support
    dictionary entry downstream code divides/filters on: the loader
    defaults missing support to 1."""
    base = tmp_path_factory.mktemp("maldict")
    tsv = str(base / "bad.tsv")
    with open(tsv, "w") as f:
        f.write("ac\tacme corp\t5\n")
        f.write("acme\tacme corp\n")  # no support column
    loaded = DICT.load_alias_dictionary(spark, tsv)
    got = {(r["alias_key"], r["canonical"], r["support"]) for r in loaded.collect()}
    assert got == {("ac", "acme corp", 5), ("acme", "acme corp", 1)}
