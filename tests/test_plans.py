"""Physical-plan regression tests: the scale-critical plan properties the
explain audit checks, pinned in CI so they cannot silently regress.

These only call `explain` — no jobs run — so they are cheap, and they
encode the 100 TB design contract: dictionaries broadcast, filters reach
the parquet scan, scans prune columns, partial aggregation precedes the
group-by shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import dictionary as DICT
from entity_linking_spark.operators import relational as REL
from entity_linking_spark.sources.tables import load_table
from entity_linking_spark.sources.transcripts import derive_transcripts


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dict_blocks_use_broadcast_join(spark, sf_dir):
    records = B.prepare_records(
        derive_transcripts(load_table(spark, sf_dir, "documents"))
    )
    plan = _plan(DICT.dict_blocks(records, DICT.alias_dictionary(records)))
    assert "BroadcastHashJoin" in plan  # S8: dictionary ships to every task
    assert "SortMergeJoin" not in plan


def test_fuzzy_dict_blocks_use_broadcast_join(spark, sf_dir):
    records = B.prepare_records(
        derive_transcripts(load_table(spark, sf_dir, "documents"))
    )
    plan = _plan(DICT.fuzzy_dict_blocks(records))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(REL.q1_pricing_summary(load_table(spark, sf_dir, "lineitem")))
    # date filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unused columns (l_orderkey etc.) absent from ReadSchema
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    # partial + final aggregation pair around the single shuffle
    assert plan.count("HashAggregate") >= 2


def test_q5_broadcasts_dimension_tables(spark, sf_dir):
    plan = _plan(
        REL.q5_local_supplier_volume(
            load_table(spark, sf_dir, "region"),
            load_table(spark, sf_dir, "nation"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
    )
    assert "BroadcastHashJoin" in plan  # nation ⋈ region forced broadcast


def test_records_prepare_is_scan_plus_project_only(spark, sf_dir):
    """Stage 0 must stay narrow: no Exchange (shuffle) anywhere."""
    records = B.prepare_records(
        derive_transcripts(load_table(spark, sf_dir, "documents"))
    )
    plan = _plan(records)
    assert "Exchange" not in plan


def test_bucketed_cocolated_join_has_zero_exchange(spark, sf_dir, tmp_path_factory):
    """Bucketed storage is the 100 TB shuffle eliminator: two tables
    written bucketed by the same key with the same bucket count join with
    ZERO Exchange — the shuffle was amortized into the writes. (With only
    one side bucketed Spark still shuffles both — the co-location
    contract needs both writers to agree, which is exactly what the
    Iceberg `bucket(N, rec_key)` partition spec encodes.)"""
    import re

    from entity_linking_spark.sources.bucketed import bucketed_records, write_bucketed

    records = B.prepare_records(
        derive_transcripts(load_table(spark, sf_dir, "documents"))
    )
    base = str(tmp_path_factory.mktemp("bucketed"))
    t1 = bucketed_records(
        spark, records, table="bk_recs", n_buckets=8, path=base + "/r"
    )
    t2 = write_bucketed(
        records.select("rec_key", "conv_id"), "bk_keys", "rec_key", 8, base + "/k"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(t1.join(t2, "rec_key"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0, plan[:2000]


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path_factory):
    """Hive-style partitioned layout (lang=…/) + a lang filter must show
    partition pruning in the scan: the filter appears as a
    PartitionFilter and the scan reads only the matching directory —
    at 100 TB this is the difference between scanning one partition and
    the whole table (Iceberg partition spec = same contract)."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path_factory.mktemp("parts")) + "/docs"
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter("lang = 'en'")
    plan = _plan(back)
    scan = "\n".join(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "lang" in scan and "en" in scan, plan[:1500]
    # the data filter did NOT degrade to a post-scan Filter on all rows
    assert back.count() == docs.filter("lang = 'en'").count()


def test_cap_blocks_partial_agg_no_window(spark):
    """VERDICT r2 #2: the block cap must not route a hot block through a
    single task's window sort. Plan contract: block sizes come from a
    groupBy with MAP-SIDE partial aggregation (partial_count before the
    Exchange) joined back; no Window operator anywhere. A stop-word block
    key then collapses to one row per map partition instead of
    materializing whole in one task."""
    from entity_linking_spark.operators import pairs as P

    rows = [(f"r{i:03d}", "hot") for i in range(100)] + [
        ("a1", "cold"), ("a2", "cold")
    ]
    blocked = spark.createDataFrame(rows, "rec_key string, block_key string")
    capped = P.cap_blocks(blocked, cap=10)
    plan = _plan(capped)
    assert "partial_count" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    # semantics unchanged vs the window form: hot block dropped whole
    out = {(r["rec_key"], r["block_key"]) for r in capped.collect()}
    assert out == {("a1", "cold"), ("a2", "cold")}


def test_incremental_pairs_never_enumerates_old_x_old(spark, tmp_path_factory):
    """VERDICT r2 #1: the incremental join's probe side must be new rows
    only, so the old×old quadrant is never produced. Two checks:

    1. semantics — pair output equals the declared set {(min,max): a,b
       share a capped block, a≠b, at least one side new};
    2. plan — the probe side's old-branch scan is pruned (the is_new
       literal filter folds the union branch away), so the old parquet
       file is scanned strictly fewer times than the new one (symmetric
       all×all enumeration scans them equally often).
    """
    from entity_linking_spark.operators import incremental as INC

    base = tmp_path_factory.mktemp("incblocks")
    old_rows = [(f"o{i}", "shared") for i in range(5)] + [
        ("o7", "oldonly"), ("o8", "oldonly"), ("o9", "hot")
    ] + [(f"oh{i}", "hot") for i in range(10)]
    new_rows = [("n1", "shared"), ("n2", "newonly"), ("n3", "newonly"),
                ("n4", "hot")]
    spark.createDataFrame(old_rows, "rec_key string, block_key string") \
        .write.mode("overwrite").parquet(f"{base}/old_blocks.parquet")
    spark.createDataFrame(new_rows, "rec_key string, block_key string") \
        .write.mode("overwrite").parquet(f"{base}/new_blocks.parquet")
    old_b = spark.read.parquet(f"{base}/old_blocks.parquet")
    new_b = spark.read.parquet(f"{base}/new_blocks.parquet")

    cap = 8  # "hot" block has 12 members -> dropped whole (old+new counted)
    got = {
        (r["a_key"], r["b_key"])
        for r in INC.incremental_pairs(old_b, new_b, cap=cap).collect()
    }
    members: dict[str, list[str]] = {}
    for k, blk in old_rows + new_rows:
        members.setdefault(blk, []).append(k)
    expected = set()
    for blk, ms in members.items():
        if len(ms) > cap:
            continue
        for a in ms:
            for b in ms:
                if a < b and (a.startswith("n") or b.startswith("n")):
                    expected.add((a, b))
    assert got == expected and ("o0", "o1") not in got

    plan = INC.incremental_pairs(old_b, new_b, cap=cap)._jdf.queryExecution() \
        .executedPlan().toString()
    n_old = plan.count("old_blocks.parquet")
    n_new = plan.count("new_blocks.parquet")
    assert n_old < n_new, f"old scanned {n_old}x vs new {n_new}x:\n{plan[:3000]}"


def test_decontaminate_broadcasts_eval_single_corpus_exchange(spark, sf_dir):
    """Decontamination's 100 TB contract: the eval n-gram set is broadcast
    (never a shuffle join against the corpus) and the corpus crosses one
    exchange — the partial+final doc aggregate."""
    from entity_linking_spark.operators import curation as CUR
    from entity_linking_spark.operators import dedup as D

    recs = D.doc_records(load_table(spark, sf_dir, "documents"))
    plan = _plan(
        CUR.decontaminate(
            recs.filter(F.col("doc_id") % 20 != 0),
            recs.filter(F.col("doc_id") % 20 == 0),
            n=3,
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial precedes the shuffle


def test_redact_pii_is_pure_projection(spark, sf_dir):
    """PII redaction must stay a narrow scan+project: no exchange, no
    join, and column pruning down to (doc_id, text)."""
    from entity_linking_spark.operators import curation as CUR

    plan = _plan(CUR.redact_pii(load_table(spark, sf_dir, "documents")))
    assert "Exchange" not in plan and "Join" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in read and "n_chars" not in read and "lang" not in read


def test_pack_sequences_distributed_prefix_sum(spark, sf_dir):
    """Packing's 100 TB contract: no global-order window over the corpus —
    the running sum is per-bucket (corpus window partitioned by
    pack_bucket) with the tiny bucket-offset spine broadcast back."""
    from entity_linking_spark.operators import curation as CUR
    from entity_linking_spark.operators import dedup as D

    recs = D.doc_records(load_table(spark, sf_dir, "documents"))
    plan = _plan(CUR.pack_sequences(recs, seq_len=512))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the corpus-side window is keyed on pack_bucket, not a global sort
    assert "windowspecdefinition(pack_bucket" in plan


def test_mixture_sample_fact_side_never_shuffled(spark, sf_dir):
    """Mixture sampling's 100 TB contract: the per-group thresholds are a
    tiny broadcast build side; the corpus itself is scan -> broadcast-join
    -> filter with no shuffle."""
    from entity_linking_spark.operators import sampling as SMP

    plan = _plan(
        SMP.mixture_sample(
            load_table(spark, sf_dir, "documents"), ["lang"], "doc_id"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unigram_logprob_vocab_broadcast(spark, sf_dir):
    """LM scoring's 100 TB contract: the vocabulary and the corpus total
    ship as broadcasts; the exploded corpus never sort-merge-joins."""
    from entity_linking_spark.operators import dedup as D
    from entity_linking_spark.operators import textanalysis as TA

    recs = D.doc_records(load_table(spark, sf_dir, "documents"))
    plan = _plan(TA.unigram_logprob(recs, top_v=24))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
