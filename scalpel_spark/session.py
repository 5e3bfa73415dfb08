"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for correctness tests on local[*] but with every knob chosen to
survive a 1000-executor / 100 TB deployment: AQE on (runtime re-plan +
skew-join splitting), Arrow batches sized for the canonicalization UDFs,
shuffle partitions scaled to parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = 'scalpel-spark',
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get('SPARK_GRAFT_MASTER', 'local[*]')
    if shuffle_partitions is None:
        cpus = os.environ.get('SPARK_GRAFT_CPUS')
        shuffle_partitions = int(cpus) if cpus else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.execution.arrow.maxRecordsPerBatch', '65536')
        .config('spark.sql.autoBroadcastJoinThreshold', str(64 * 1024 * 1024))
        .config('spark.driver.memory', os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g'))
        .config('spark.sql.session.timeZone', 'UTC')
        .config('spark.ui.enabled', 'false')
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
