"""Bucketed co-located joins: the storage-level answer to repeated
fact-fact shuffles at 100 TB.

A 100 TB lineitem ⋈ orders on orderkey shuffles BOTH tables every time
it runs. Writing both tables bucketed by the join key (same bucket
count) lets Spark plan the join with ZERO exchanges — each bucket pair
joins locally. This is the Spark analogue of the reference's
consistent-hash metric affinity (`AffinityConsistentHashRing.scala`):
co-locate by key once at write time, never move the data again.

These tests pin the plan property: bucketed-join has no Exchange;
the same join unbucketed has two.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from khronus_spark.sources.tables import load_table

BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, oracle_sf_dir):
    """orders + lineitem written bucketed by orderkey into a temp
    warehouse-backed catalog."""
    tmp = tempfile.mkdtemp(prefix="khronus_bucketed_")
    orders = load_table(spark, oracle_sf_dir, "orders")
    li = load_table(spark, oracle_sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .option("path", f"{tmp}/b_orders")  # external table: keep the
        .bucketBy(BUCKETS, "o_orderkey")  # warehouse out of the repo
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .option("path", f"{tmp}/b_lineitem")
        .bucketBy(BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _formatted_plan(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    # at 100 TB neither fact side fits a broadcast; disable the
    # small-testdata auto-broadcast so the plan shows the at-scale shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(b_orders)
        l = spark.table(b_lineitem)
        joined = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join consumes the bucketed scans directly: the only Exchange
    # allowed is the final tiny groupBy on o_orderpriority
    join_part = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part
    assert "SelectedBucketsCount" in plan  # bucketed scan metadata present


def test_unbucketed_join_shuffles_both_sides(spark, oracle_sf_dir):
    """Control: the identical join over plain parquet needs exchanges
    (broadcast or shuffle) — proving the bucketed layout is what
    removed them."""
    o = load_table(spark, oracle_sf_dir, "orders")
    l = load_table(spark, oracle_sf_dir, "lineitem")
    joined = o.join(l, o.o_orderkey == l.l_orderkey)
    plan = _formatted_plan(joined)
    assert "Exchange" in plan or "BroadcastExchange" in plan


def test_bucketed_join_result_correct(spark, bucketed_tables, oracle_sf_dir):
    b_orders, b_lineitem = bucketed_tables
    o = spark.table(b_orders)
    l = spark.table(b_lineitem)
    got = o.join(l, o.o_orderkey == l.l_orderkey).count()
    expected = (
        load_table(spark, oracle_sf_dir, "orders")
        .join(
            load_table(spark, oracle_sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == expected > 0
