from pyspark.sql import functions as F


def _skewed_data(spark):
    # 90% of fact rows share key 0 (the hot key)
    fact = spark.range(0, 2000).select(
        F.when(F.col('id') % 10 < 9, F.lit(0)).otherwise(F.col('id') % 50).alias('k'),
        (F.col('id') * 2).alias('v'))
    dim = spark.range(0, 50).select(F.col('id').alias('k'),
                                    F.concat(F.lit('name_'), F.col('id')).alias('name'))
    return fact, dim


def test_salted_join_matches_plain_inner(spark):
    from rbql_spark.ops.skew import salted_join
    fact, dim = _skewed_data(spark)
    plain = fact.join(dim, on=['k'], how='inner')
    salted = salted_join(fact, dim, on=['k'], how='inner', salt=8)
    assert salted.count() == plain.count()
    a = {(r['k'], r['v'], r['name']) for r in plain.collect()}
    b = {(r['k'], r['v'], r['name']) for r in salted.collect()}
    assert a == b


def test_salted_join_matches_plain_left(spark):
    from rbql_spark.ops.skew import salted_join
    fact, dim = _skewed_data(spark)
    dim_partial = dim.filter(F.col('k') > 10)   # hot key 0 unmatched
    plain = fact.join(dim_partial, on=['k'], how='left')
    salted = salted_join(fact, dim_partial, on=['k'], how='left', salt=8)
    assert salted.count() == plain.count()
    a = sorted((r['k'], r['v'], r['name']) for r in plain.collect())
    b = sorted((r['k'], r['v'], r['name']) for r in salted.collect())
    assert a == b


def test_salt_spreads_hot_key(spark):
    from rbql_spark.ops.skew import SALT_COL
    from rbql_spark.ops.skew import salted_join  # noqa: F401 (import check)
    fact, _ = _skewed_data(spark)
    from pyspark.sql import functions as F2
    salted = fact.withColumn(
        SALT_COL, F2.pmod(F2.xxhash64(F2.monotonically_increasing_id()), F2.lit(8)).cast('int'))
    hot = salted.filter(F2.col('k') == 0).groupBy(SALT_COL).count().collect()
    # the hot key must occupy ALL salt buckets, not one reducer
    assert len(hot) == 8
