"""TPC-H-style relational analytics: Spark/DuckDB value parity at
sf0.001 plus the exact-integer money invariant (no float sums anywhere —
the oracle hash compares exact BIGINTs)."""

from __future__ import annotations

from conftest import assert_spark_matches_duck

from entity_linking_spark.operators import relational as REL
from entity_linking_spark.sources.tables import load_table


def test_q1_pricing_summary_parity(spark, duck, sf_dir):
    df = REL.q1_pricing_summary(load_table(spark, sf_dir, "lineitem"))
    assert_spark_matches_duck(df, duck, REL.q1_pricing_summary_sql("SELECT * FROM lineitem"))
    # integer-exact: every aggregate is a long, no doubles survive
    assert all(
        f.dataType.simpleString() in ("bigint", "string")
        for f in df.schema.fields
    ), df.schema


def test_q3_shipping_priority_parity(spark, duck, sf_dir):
    df = REL.q3_shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    assert_spark_matches_duck(
        df, duck, REL.q3_shipping_priority_sql("SELECT * FROM customer", "SELECT * FROM orders", "SELECT * FROM lineitem")
    )


def test_q5_local_supplier_volume_parity(spark, duck, sf_dir):
    df = REL.q5_local_supplier_volume(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    assert_spark_matches_duck(
        df,
        duck,
        REL.q5_local_supplier_volume_sql(
            *[f"SELECT * FROM {t}" for t in
              ("region", "nation", "customer", "supplier", "orders", "lineitem")]
        ),
    )


def test_q14_promo_revenue_parity(spark, duck, sf_dir):
    df = REL.q14_promo_revenue(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "lineitem")
    )
    assert_spark_matches_duck(
        df,
        duck,
        REL.q14_promo_revenue_sql("SELECT * FROM part", "SELECT * FROM lineitem"),
    )
    rows = {r["p_type"]: r for r in df.collect()}
    # promo share only accrues to the PROMO type rows
    assert rows["PROMO"]["promo_rev_c2"] == rows["PROMO"]["total_rev_c2"]
    assert all(r["promo_rev_c2"] == 0 for t, r in rows.items() if t != "PROMO")


def test_q18_large_orders_parity_and_plan(spark, duck, sf_dir):
    df = REL.q18_large_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    assert_spark_matches_duck(
        df,
        duck,
        REL.q18_large_orders_sql(
            "SELECT * FROM customer", "SELECT * FROM orders", "SELECT * FROM lineitem"
        ),
    )
    rows = df.collect()
    assert all(r["total_qty"] > REL.Q18_QTY for r in rows)
    # semi-join shape: the quantity aggregate runs over lineitem alone
    # (partial agg below any join), never on the joined row stream
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg_pos = plan.find("partial_sum")
    first_join = min(
        p for p in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"), plan.find("ShuffledHashJoin"))
        if p >= 0
    )
    assert agg_pos > first_join, "quantity agg should be below (after in text) the joins"


def test_q4_order_priority_parity_and_semi_join(spark, duck, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    df = REL.q4_order_priority(orders, lineitem)
    assert_spark_matches_duck(
        df,
        duck,
        REL.q4_order_priority_sql("SELECT * FROM orders", "SELECT * FROM lineitem"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # EXISTS must stay a semi join (one row per qualifying order, the
    # lineitem side never widens the output) with the quarter filter
    # pushed into the orders scan
    assert "LeftSemi" in plan, plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan, plan


def test_q10_returned_items_parity_and_early_agg(spark, duck, sf_dir):
    df = REL.q10_returned_items(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )
    assert_spark_matches_duck(
        df,
        duck,
        REL.q10_returned_items_sql(
            "SELECT * FROM customer",
            "SELECT * FROM orders",
            "SELECT * FROM lineitem",
            "SELECT * FROM nation",
        ),
    )
    # revenue aggregates BEFORE the customer join: the first HashAggregate
    # groups on o_custkey, and the customer join consumes the aggregate
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg_pos = plan.find("HashAggregate")
    cust_join_pos = plan.find("c_custkey")
    assert agg_pos != -1 and cust_join_pos != -1
