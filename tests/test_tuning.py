"""Input-size-based shuffle-partition advisor (r14 verdict #6)."""
import os

from rbql_spark.tuning import (
    BYTES_PER_PARTITION, advise_shuffle_partitions, dir_bytes,
    estimated_input_bytes, scoped_shuffle_partitions,
)


def test_advisor_never_lowers_current(spark):
    cur = int(spark.conf.get('spark.sql.shuffle.partitions'))
    # tiny input: keep the session's count (sf0.1 behavior unchanged)
    assert advise_shuffle_partitions(spark, 10_000) == cur
    assert advise_shuffle_partitions(spark, None) == cur
    assert advise_shuffle_partitions(spark, 0) == cur


def test_advisor_scales_with_bytes(spark):
    cur = int(spark.conf.get('spark.sql.shuffle.partitions'))
    # a decade past the per-task target raises the count proportionally:
    # per-task bytes, not partition count, is the invariant (SCALING.md)
    big = 1000 * BYTES_PER_PARTITION
    assert advise_shuffle_partitions(spark, big) == max(cur, 1000)
    # expansion multiplies shuffled bytes (band/shingle explodes)
    assert advise_shuffle_partitions(spark, big, expansion=2.0) == \
        max(cur, 2000)
    # capped (runaway-estimate backstop)
    assert advise_shuffle_partitions(spark, 1 << 60, cap=4096) == 4096


def test_advisor_allow_below_floors_small_streams(spark):
    # r16: the streaming-drain mode plans NARROWER than the session count
    # for sub-advisory sources (state-store open/commit is per partition
    # per batch and never AQE-coalesced), floored at STREAM_MIN_PARTITIONS
    from rbql_spark.tuning import STREAM_MIN_PARTITIONS
    cur = int(spark.conf.get('spark.sql.shuffle.partitions'))
    small = advise_shuffle_partitions(spark, 10_000, allow_below=True)
    assert small == min(cur, STREAM_MIN_PARTITIONS)
    # unknown size keeps the session count (the safe direction)
    assert advise_shuffle_partitions(spark, None, allow_below=True) == cur
    # the decade direction is unchanged: big sources still raise
    big = 1000 * BYTES_PER_PARTITION
    assert advise_shuffle_partitions(spark, big, allow_below=True) == 1000


def test_scoped_shuffle_partitions_restores(spark):
    key = 'spark.sql.shuffle.partitions'
    prev = spark.conf.get(key)
    with scoped_shuffle_partitions(spark, 17):
        assert spark.conf.get(key) == '17'
    assert spark.conf.get(key) == prev


def test_estimated_input_bytes_parquet(spark, tmp_path):
    p = str(tmp_path / 'sz.parquet')
    spark.range(10_000).write.parquet(p)
    df = spark.read.parquet(p)
    est = estimated_input_bytes(df)
    disk = dir_bytes(p)
    assert est is not None and est > 0
    # Catalyst's estimate is the file-size sum (footer stats)
    assert 0.5 * disk <= est <= 2 * disk


def test_dir_bytes_counts_files(tmp_path):
    (tmp_path / 'a.bin').write_bytes(b'x' * 100)
    sub = tmp_path / 'sub'
    sub.mkdir()
    (sub / 'b.bin').write_bytes(b'y' * 50)
    assert dir_bytes(str(tmp_path)) == 150
    assert dir_bytes('/nonexistent/path/xyz') == 0
