"""Hot-key salting for grouped/windowed per-host stages.

AQE's skew-join splitting cannot split ``applyInPandas`` / window groups
(SURVEY.md §4.2), so per-host stages salt explicitly: detect heavy-hitter
hosts with a map-side-combined count, then scatter each hot host across
``num_salts`` sub-keys via a hash of the row key. Cold hosts keep salt 0 so
their group boundaries (and exact FIFO slot order) are unchanged; hot hosts
trade exact intra-host slot order for parallelism while politeness *budget*
stays exact by splitting the budget across salt buckets (each bucket gets
ceil(B / num_salts), enforced post-merge by a bound, see engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(df: DataFrame, key_col: str, threshold: int) -> DataFrame:
    """Keys with more than ``threshold`` rows. groupBy+count is map-side
    combined, so the shuffle carries one row per distinct key."""
    return df.groupBy(key_col).count().filter(F.col('count') > threshold).select(key_col)


def with_salt(df: DataFrame, key_col: str, hash_col: str, hot_keys: DataFrame, num_salts: int) -> DataFrame:
    """Adds a ``salt`` column: pmod(hash, num_salts) for hot keys, 0 for the
    rest. hot_keys is small by construction → broadcast left-semi mark."""
    marked = df.join(
        F.broadcast(hot_keys.withColumn('_hot', F.lit(True))), key_col, 'left'
    )
    return marked.withColumn(
        'salt',
        F.when(F.col('_hot'), F.pmod(F.col(hash_col), F.lit(num_salts)).cast('int')).otherwise(F.lit(0)),
    ).drop('_hot')
