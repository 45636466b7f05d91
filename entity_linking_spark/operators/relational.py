"""General relational analytics over the TPC-H-shaped tables.

The reference is a fixed linking pipeline, but an analytics engine a
reference user migrates to must also run ordinary join/agg SQL; these
three classics (modeled on TPC-H Q1/Q3/Q5, adapted to the testdata
schema) demonstrate the scan → filter → join → aggregate → top-k path
with the physical plan a 100 TB deployment wants:

  * predicate pushdown to the parquet scan (date / segment filters appear
    in PushedFilters — tools/explain_audit.py checks this),
  * broadcast joins for the true dimension tables (nation, region),
    shuffle joins with AQE for fact-fact joins (orders ⋈ lineitem),
  * partial aggregation before the group-by shuffle (Catalyst automatic).

Money arithmetic is **integer cents** end-to-end: every price/discount/
tax is converted per row to an exact integer (cents, percent points)
before any aggregation, so sums are order-independent and the DuckDB
oracle hash-matches bit-for-bit — the double-summation-order hazard that
plagues float aggregates is designed out rather than tolerated. Unit
suffixes: `_c` = cents, `_c2` = cents·%, `_c4` = cents·%·% (int64-safe
to ~10^6× this data scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q1_CUTOFF = "2001-09-01"  # ship dates run 1995-01..2001-11
Q3_DATE = "1998-06-01"
Q3_SEGMENT = "BUILDING"
Q5_YEAR_LO, Q5_YEAR_HI = "1996-01-01", "1998-01-01"


def _cents(col) -> F.Column:
    """Exact integer cents from a 2-dp double price (deterministic and
    identical per row in Spark and DuckDB; round-half-up on positives)."""
    return F.round(col * 100, 0).cast("long")


def _pct(col) -> F.Column:
    """Exact integer percent points from a 2-dp fraction (0.07 -> 7)."""
    return F.round(col * 100, 0).cast("long")


_CENTS_SQL = "CAST(round({x} * 100, 0) AS BIGINT)"


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1: per (returnflag, linestatus) pricing summary over shipped
    rows. Single scan → filter (pushed down) → partial+final hash agg."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
    base_c = _cents(F.col("l_extendedprice"))
    disc_p = _pct(F.col("l_discount"))
    tax_p = _pct(F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
            F.sum(base_c).alias("sum_base_c"),
            F.sum(base_c * (100 - disc_p)).alias("sum_disc_c2"),
            F.sum(base_c * (100 - disc_p) * (100 + tax_p)).alias("sum_charge_c4"),
            F.count("*").alias("count_order"),
        )
    )


def q1_pricing_summary_sql(lineitem_rel: str) -> str:
    base = _CENTS_SQL.format(x="l_extendedprice")
    disc = _CENTS_SQL.format(x="l_discount")
    tax = _CENTS_SQL.format(x="l_tax")
    # CAST(sum(..) AS BIGINT): DuckDB sums BIGINT into HUGEINT, which its
    # pandas bridge renders as float — cast back for exact-integer parity
    return f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum({base}) AS BIGINT) AS sum_base_c,
           CAST(sum({base} * (100 - {disc})) AS BIGINT) AS sum_disc_c2,
           CAST(sum({base} * (100 - {disc}) * (100 + {tax})) AS BIGINT) AS sum_charge_c4,
           count(*) AS count_order
    FROM ({lineitem_rel})
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q3: top-10 open orders of one market segment by discounted
    revenue. customer is filtered then joined (AQE picks broadcast when it
    fits); orders ⋈ lineitem is the fact-fact shuffle join."""
    c = customer.filter(F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey")
    o = orders.filter(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = lineitem.filter(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    ).select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount")))).alias(
            "rev_c2"
        ),
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_c2").alias("revenue_c2"))
        .orderBy(F.desc("revenue_c2"), F.asc("o_orderkey"))
        .limit(10)
    )


def q3_shipping_priority_sql(
    customer_rel: str, orders_rel: str, lineitem_rel: str
) -> str:
    rev = (
        _CENTS_SQL.format(x="l_extendedprice")
        + " * (100 - "
        + _CENTS_SQL.format(x="l_discount")
        + ")"
    )
    return f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(sum({rev}) AS BIGINT) AS revenue_c2
    FROM ({customer_rel}) c
    JOIN ({orders_rel}) o ON c.c_custkey = o.o_custkey
    JOIN ({lineitem_rel}) l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = '{Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_c2 DESC, o_orderkey ASC
    LIMIT 10
    """


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5: revenue by nation where customer and supplier share the
    nation. region/nation are broadcast dims; the fact chain shuffles on
    its join keys with AQE."""
    n = F.broadcast(
        nation.join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
        ).select("n_nationkey", "n_name")
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q5_YEAR_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_YEAR_HI).cast("timestamp"))
    )
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount")))).alias(
            "rev_c2"
        ),
    )
    return (
        customer.join(o, customer["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            supplier,
            (li["l_suppkey"] == supplier["s_suppkey"])
            & (customer["c_nationkey"] == supplier["s_nationkey"]),
        )
        .join(n, supplier["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum("rev_c2").alias("revenue_c2"))
    )


def q5_local_supplier_volume_sql(
    region_rel: str,
    nation_rel: str,
    customer_rel: str,
    supplier_rel: str,
    orders_rel: str,
    lineitem_rel: str,
) -> str:
    rev = (
        _CENTS_SQL.format(x="l_extendedprice")
        + " * (100 - "
        + _CENTS_SQL.format(x="l_discount")
        + ")"
    )
    return f"""
    SELECT n_name, CAST(sum({rev}) AS BIGINT) AS revenue_c2
    FROM ({customer_rel}) c
    JOIN ({orders_rel}) o ON c.c_custkey = o.o_custkey
    JOIN ({lineitem_rel}) l ON o.o_orderkey = l.l_orderkey
    JOIN ({supplier_rel}) s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
    JOIN ({nation_rel}) n ON s.s_nationkey = n.n_nationkey
    JOIN ({region_rel}) r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q5_YEAR_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q5_YEAR_HI} 00:00:00'
    GROUP BY n_name
    """


def q14_promo_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: revenue split by part type with the promo share
    as two exact integer sums (promo_rev_c2, total_rev_c2) instead of a
    float percentage — the ratio is derivable and the hash exact. part
    is a dimension: broadcast-joined against the lineitem fact scan."""
    li = lineitem.select(
        "l_partkey",
        (_cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount")))).alias(
            "rev_c2"
        ),
    )
    p = F.broadcast(part.select("p_partkey", "p_type"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_type")
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("rev_c2")).otherwise(0)
            ).alias("promo_rev_c2"),
            F.sum("rev_c2").alias("total_rev_c2"),
            F.count("*").alias("n_items"),
        )
    )


def q14_promo_revenue_sql(part_rel: str, lineitem_rel: str) -> str:
    rev = (
        _CENTS_SQL.format(x="l_extendedprice")
        + " * (100 - "
        + _CENTS_SQL.format(x="l_discount")
        + ")"
    )
    return f"""
    SELECT p_type,
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE 0 END) AS BIGINT)
             AS promo_rev_c2,
           CAST(sum({rev}) AS BIGINT) AS total_rev_c2,
           count(*) AS n_items
    FROM ({lineitem_rel}) l
    JOIN ({part_rel}) p ON l.l_partkey = p.p_partkey
    GROUP BY p_type
    """


Q18_QTY = 250  # large-order quantity threshold (data max 458, p99 262)


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, qty: int = Q18_QTY
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds `qty`, with
    the buying customer. The semi-join pattern a 100 TB plan wants: the
    HAVING aggregation runs FIRST over the fact table alone (partial
    agg → one shuffle on l_orderkey, output rows = qualifying orders
    only — a tiny set), and only that survivor set joins back to orders
    and customer; AQE turns the survivors' side into a broadcast.
    Quantities are integer-valued — cast to long before summing so the
    aggregate is exact."""
    qty_sum = (
        lineitem.select(
            "l_orderkey", F.round(F.col("l_quantity"), 0).cast("long").alias("q")
        )
        .groupBy("l_orderkey")
        .agg(F.sum("q").alias("total_qty"))
        .filter(F.col("total_qty") > qty)
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = customer.select("c_custkey", "c_name")
    return (
        qty_sum.join(o, qty_sum["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _cents(F.col("o_totalprice")).alias("totalprice_c"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice_c"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


def q18_large_orders_sql(
    customer_rel: str, orders_rel: str, lineitem_rel: str, qty: int = Q18_QTY
) -> str:
    price = _CENTS_SQL.format(x="o_totalprice")
    return f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           {price} AS totalprice_c, total_qty
    FROM (
      SELECT l_orderkey, CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS total_qty
      FROM ({lineitem_rel})
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity, 0) AS BIGINT)) > {qty}
    ) q
    JOIN ({orders_rel}) o ON q.l_orderkey = o.o_orderkey
    JOIN ({customer_rel}) c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice_c DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """


Q4_LO, Q4_HI = "1996-07-01", "1996-10-01"
Q4_LATE_DAYS = 30
Q10_LO, Q10_HI = "1997-01-01", "1997-04-01"


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 (adapted: no commit/receipt dates in this schema — "late"
    means a line shipped > 30 days after the order date): per-priority
    count of one quarter's orders having at least one late line.

    Shape: the EXISTS becomes a LEFT SEMI join — the lineitem side is
    never aggregated or widened, each qualifying order emits exactly one
    row no matter how many late lines it has, and the quarter filter is
    pushed to the orders scan. The semi join carries the non-equi ship-
    vs-order-date condition alongside the key."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (
            li["l_shipdate"]
            > o["o_orderdate"] + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q4_order_priority_sql(orders_rel: str, lineitem_rel: str) -> str:
    return f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM ({orders_rel}) o
    WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
      AND EXISTS (
        SELECT 1 FROM ({lineitem_rel}) l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
      )
    GROUP BY o_orderpriority
    """


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. The quarter filter is pushed to the orders scan, the
    returnflag filter to the lineitem scan; nation broadcasts (25 rows),
    customer joins after the fact-fact join has already shrunk to the
    returned-revenue aggregate's input. Revenue is exact integer
    cents·percent, so the top-20 cut has no float-ordering ambiguity."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount")))).alias(
            "rev_c2"
        ),
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("rev_c2").alias("revenue_c2"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            _cents(F.col("c_acctbal")).alias("acctbal_c"),
            F.col("n_name").alias("nation"),
            "revenue_c2",
        )
        .orderBy(F.desc("revenue_c2"), F.asc("c_custkey"))
        .limit(20)
    )


def q10_returned_items_sql(
    customer_rel: str, orders_rel: str, lineitem_rel: str, nation_rel: str
) -> str:
    rev = (
        _CENTS_SQL.format(x="l_extendedprice")
        + " * (100 - "
        + _CENTS_SQL.format(x="l_discount")
        + ")"
    )
    acct = _CENTS_SQL.format(x="c_acctbal")
    return f"""
    SELECT c_custkey, c_name, {acct} AS acctbal_c, n_name AS nation,
           CAST(sum({rev}) AS BIGINT) AS revenue_c2
    FROM ({orders_rel}) o
    JOIN ({lineitem_rel}) l ON o.o_orderkey = l.l_orderkey
    JOIN ({customer_rel}) c ON o.o_custkey = c.c_custkey
    JOIN ({nation_rel}) n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q10_HI} 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c_custkey, c_name, {acct}, n_name
    ORDER BY revenue_c2 DESC, c_custkey ASC
    LIMIT 20
    """
