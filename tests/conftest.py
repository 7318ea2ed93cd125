import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get('SPARK_GRAFT_TESTDATA', '/root/testdata')


@pytest.fixture(scope='session')
def spark():
    from pyspark.sql import SparkSession
    s = (
        SparkSession.builder
        .master('local[4]')
        .appName('rbql-spark-tests')
        .config('spark.sql.shuffle.partitions', '4')
        .config('spark.default.parallelism', '4')
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.ui.enabled', 'false')
        .config('spark.driver.memory', '4g')
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope='session')
def sf_dir():
    return os.path.join(TESTDATA, 'sf0.001')
