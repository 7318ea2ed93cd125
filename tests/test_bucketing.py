"""Bucketed co-located join: pre-bucketed tables join WITHOUT a shuffle
exchange — the storage-level strategy for repeated big joins at 100 TB
(north-star: "bucketing for co-located joins")."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope='module')
def bucketed_tables(spark, tmp_path_factory, sf_dir):
    # tables land in the session's default warehouse dir (gitignored)
    orders = spark.read.parquet(os.path.join(sf_dir, 'orders.parquet'))
    lineitem = spark.read.parquet(os.path.join(sf_dir, 'lineitem.parquet'))
    spark.sql('DROP TABLE IF EXISTS b_orders')
    spark.sql('DROP TABLE IF EXISTS b_lineitem')
    (orders.write.bucketBy(8, 'o_orderkey').sortBy('o_orderkey')
           .mode('overwrite').saveAsTable('b_orders'))
    (lineitem.withColumnRenamed('l_orderkey', 'o_orderkey')
             .write.bucketBy(8, 'o_orderkey').sortBy('o_orderkey')
             .mode('overwrite').saveAsTable('b_lineitem'))
    yield 'b_orders', 'b_lineitem'
    spark.sql('DROP TABLE IF EXISTS b_orders')
    spark.sql('DROP TABLE IF EXISTS b_lineitem')


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    old = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
    spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
    try:
        joined = spark.table(t1).join(spark.table(t2), 'o_orderkey') \
                      .groupBy('o_orderstatus').agg(F.sum('l_quantity').alias('sq'))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not re-shuffle bucketed inputs: no Exchange
        # below the SortMergeJoin (the final groupBy exchange is expected)
        join_part = plan.split('SortMergeJoin')[-1]
        assert 'Exchange hashpartitioning(o_orderkey' not in join_part
        # sanity: result matches the plain parquet join
        assert joined.count() == 3
    finally:
        spark.conf.set('spark.sql.autoBroadcastJoinThreshold', old)


def test_bucketed_join_matches_plain(spark, bucketed_tables, sf_dir):
    t1, t2 = bucketed_tables
    joined = spark.table(t1).join(spark.table(t2), 'o_orderkey')
    plain_orders = spark.read.parquet(os.path.join(sf_dir, 'orders.parquet'))
    plain_li = spark.read.parquet(os.path.join(sf_dir, 'lineitem.parquet')) \
                    .withColumnRenamed('l_orderkey', 'o_orderkey')
    plain = plain_orders.join(plain_li, 'o_orderkey')
    assert joined.count() == plain.count()
