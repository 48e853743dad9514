"""Bucketed co-located joins: the join on the bucket key must not
reshuffle either side."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(
        orders, t_orders, ["o_orderkey"], n_buckets=8,
        sort_cols=["o_orderkey"], path=str(tmp_path / t_orders),
    )
    write_bucketed(
        lineitem, t_lineitem, ["l_orderkey"], n_buckets=8,
        sort_cols=["l_orderkey"], path=str(tmp_path / t_lineitem),
    )
    yield t_orders, t_lineitem
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_table(spark, t_orders)
        li = read_table(spark, t_lineitem)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.count("*").alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join itself requires no shuffle of either side
        assert "SortMergeJoin" in plan
        pre_join = plan[plan.index("SortMergeJoin"):]
        assert "Exchange hashpartitioning" not in pre_join, pre_join[:1500]
        # and the correctness is unchanged vs a plain join
        plain = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
