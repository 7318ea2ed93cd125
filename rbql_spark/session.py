"""Recommended SparkSession configuration for rbql_spark workloads.

``build_session`` encodes the settings the engine is designed around, with
the 100 TB-scale rationale inline.  Local testing and cluster deployment
share the same knobs — only the numbers change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = 'rbql-spark',
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  max_partition_bytes: str = '128m',
                  driver_memory: str | None = None) -> SparkSession:
    """Session with the engine's recommended scale configuration.

    Knob rationale (100 TB design points):

    - ``spark.sql.adaptive.enabled`` + skew-join: runtime re-planning
      coalesces small shuffle partitions and splits hot ones — the first
      line of defense for skewed GROUP BY/JOIN keys (ops/skew.salted_join
      is the explicit fallback).
    - ``spark.sql.shuffle.partitions``: target ~128–256 MB per post-shuffle
      partition.  At 100 TB shuffled that is O(500k) partitions — set it
      high and let AQE coalesce, never the reverse.
    - ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` +
      ``advisoryPartitionSizeInBytes``: the ENGINE'S encoding of the
      measured decade rule (r14 sf10 audit, SCALING.md: per-task bytes,
      not partition count, is the cross-scale invariant).  Every batch
      shuffle starts at 16× the base count and AQE coalesces down to the
      64 MB advisory — so a data decade automatically lands
      proportionally more post-shuffle partitions with NO per-operator
      pinning; small inputs coalesce back to a handful.  Width chosen by
      A/B (NOTES_r15.md): 16×/512 costs ~0.7–1.1 s of map-side
      shuffle-file overhead on three second-scale sf0.1 window queries
      but is the best setting everywhere else — including the BEST sf10
      bpe_vocab time (90 s, beating even a hand-pinned 128 session) —
      while 4×/128 pathologically slowed the broadcast-model scoring
      family ~2.5× (persisted repartition('doc_id') frames pinned at the
      uncoalesced width feed per-partition Arrow workers).  Streaming
      stateful shuffles are not
      AQE re-planned — the drain helpers scope the base count from the
      source's input bytes instead (rbql_spark.tuning).
    - ``spark.sql.files.maxPartitionBytes``: scan-side split size; 128 MB
      keeps a 1000-executor cluster busy on 100 TB (~800k tasks) without
      task-launch overhead dominating.
    - Arrow execution: every Python-boundary operator in this engine
      (pyeval fallback, vectorized minhash, multimodal decode) is
      Arrow-batched; row-at-a-time Python is never on the hot path.
    - ``spark.sql.execution.arrow.maxRecordsPerBatch``: bounds Python worker
      memory per batch for wide text rows.
    """
    cpus = os.cpu_count() or 4
    if master is None:
        master = 'local[{}]'.format(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = cpus if master.startswith('local') else 2000
    b = (SparkSession.builder
         .master(master)
         .appName(app_name)
         .config('spark.sql.adaptive.enabled', 'true')
         .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
         .config('spark.sql.adaptive.skewJoin.enabled', 'true')
         .config('spark.sql.adaptive.coalescePartitions.initialPartitionNum',
                 str(max(shuffle_partitions * 16, 256)))
         # stamp the designed wide width so tuning.apply_plan_width can
         # restore it after planning a sub-advisory query at base width
         .config('spark.rbql.wideInitialPartitionNum',
                 str(max(shuffle_partitions * 16, 256)))
         .config('spark.sql.adaptive.advisoryPartitionSizeInBytes', '64m')
         .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
         .config('spark.sql.files.maxPartitionBytes', max_partition_bytes)
         .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
         .config('spark.sql.execution.arrow.maxRecordsPerBatch', '10000')
         .config('spark.serializer', 'org.apache.spark.serializer.KryoSerializer'))
    if driver_memory:
        b = b.config('spark.driver.memory', driver_memory)
    return b.getOrCreate()
