"""Scalable dense sequence assignment (the frontier priority counter).

The reference's FIFO queue assigns each URL an implicit global insertion index
(``any_io/queue.py:80-87``). Reproducing that with a single global
``row_number()`` window would funnel the whole wave through ONE partition —
a non-starter at 10^10 rows. Instead we use the classic two-pass pattern:

1. range-repartition + sort within partitions on the order key
   (a total order — caller must guarantee uniqueness of the key tuple);
2. per-partition local indices via ``mapInPandas`` (Arrow, no per-row
   Python);
3. partition row-counts → driver cumulative offsets (one tiny collect of
   #partitions rows) → broadcast-joined back.

Wall-clock is one range shuffle + one map pass, fully parallel; the only
serial work is the #partitions-sized cumsum on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dense_sequence(df: DataFrame, order_cols: list[str], out_col: str, start: int = 0) -> DataFrame:
    """Assign ``out_col`` = start, start+1, ... in the total order given by
    ``order_cols`` (which must be a unique key tuple for determinism)."""
    return dense_sequence_with_count(df, order_cols, out_col, start)[0]


def dense_sequence_with_count(df: DataFrame, order_cols: list[str], out_col: str,
                              start: int = 0) -> tuple[DataFrame, int]:
    """:func:`dense_sequence` plus the total row count — FREE, because the
    offset pass already collects per-partition counts; callers needing
    ``start + n`` (the engine's next_priority) avoid a whole extra job."""
    spark = df.sparkSession
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)

    out_schema = T.StructType(ranged.schema.fields + [
        T.StructField('_pid', T.IntegerType(), False),
        T.StructField('_local_idx', T.LongType(), False),
    ])

    def add_local_idx(batches):
        pid = TaskContext.get().partitionId()
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf['_pid'] = np.int32(pid)
            pdf['_local_idx'] = np.arange(i, i + len(pdf), dtype='int64')
            i += len(pdf)
            yield pdf

    indexed = ranged.mapInPandas(add_local_idx, out_schema)
    indexed.persist()
    counts = {r['_pid']: r['cnt'] for r in indexed.groupBy('_pid').agg(F.count('*').alias('cnt')).collect()}
    offsets, acc = [], start
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        indexed.unpersist()
        return df.withColumn(out_col, F.lit(start).cast('long')), 0
    offsets_df = spark.createDataFrame(pd.DataFrame(offsets, columns=['_pid', '_offset']))
    result = (
        indexed.join(F.broadcast(offsets_df), '_pid')
        .withColumn(out_col, (F.col('_local_idx') + F.col('_offset')).cast('long'))
        .drop('_pid', '_local_idx', '_offset')
    )
    return result, acc - start
