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
