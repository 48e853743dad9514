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


def test_lsh_index_bucketed_serving_no_vector_exchange(spark, tmp_path):
    """The ANN serving shape at 100 TB: build_lsh_index written bucketed
    by `_bucket`; lsh_topk(indexed=True, broadcast_queries=False) then
    sort-merge-joins WITHOUT exchanging the vector side, and returns the
    same rows as the unindexed path."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        build_lsh_index,
        lsh_topk,
    )

    suffix = uuid.uuid4().hex[:8]
    table = f"lsh_idx_{suffix}"
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = build_lsh_index(vecs, n_planes=6)
    write_bucketed(
        idx, table, ["_bucket"], n_buckets=8,
        sort_cols=["_bucket"], path=str(tmp_path / table),
    )
    qs = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        served = lsh_topk(
            read_table(spark, table), qs, k=5, n_planes=6,
            indexed=True, broadcast_queries=False,
        )
        rows = served.collect()
        plan = served._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final, final[:1200]
        assert "Bucketed: true" in final, final[:1200]
        import re as _re

        def n_exchanges(df):
            df.collect()
            p = df._jdf.queryExecution().executedPlan().toString()
            return len(
                _re.findall(
                    r"Exchange hashpartitioning",
                    p.split("== Initial Plan ==")[0],
                )
            )

        # indexed: 2 exchanges (query side + rank window) — the bucketed
        # vector scan provides its own distribution.  The same plan over
        # the UNINDEXED table needs a 3rd exchange to shuffle the vectors.
        assert n_exchanges(served) == 2, final[:2000]
        unindexed = lsh_topk(
            vecs, qs, k=5, n_planes=6, broadcast_queries=False
        )
        assert n_exchanges(unindexed) == 3
        baseline = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in lsh_topk(vecs, qs, k=5, n_planes=6).collect()
        }
        assert {(r["query_id"], r["vec_id"], r["rank"]) for r in rows} == baseline
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {table}")


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
