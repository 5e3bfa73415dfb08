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


def skew_report(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Key-skew diagnosis for a planned groupBy/join key: one row per
    hot key plus one ``__total__`` summary row — the numbers that decide
    between plain hash partitioning, AQE skew-join, and explicit salting
    (`salted_aggregation`) BEFORE a 100 TB job discovers its straggler.

    Columns: ``key`` (stringified), ``n_rows``, ``share_ppm`` (exact
    integral share of all rows), ``rank``. The summary row carries
    ``n_rows`` = total rows and ``share_ppm`` = the max key share — the
    single number to alert on (a share over ~1/shuffle_partitions ppm
    means one task owns that fraction of the stage).

    One partial-agg groupBy; the top-k cut is ``orderBy().limit(k)`` —
    Spark plans that as TakeOrdered (per-partition top-k merged at the
    driver), so no task ever globally sorts the key counts; the rank
    window then runs over the k surviving rows only.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).cast('string').alias('key')).agg(
        F.count(F.lit(1)).alias('n_rows'))
    tot = counts.agg(
        F.sum('n_rows').alias('_t'),
        F.max('n_rows').alias('_mx')).withColumn('_j', F.lit(1))
    w = Window.orderBy(F.desc('n_rows'), 'key')
    top = (
        counts.orderBy(F.desc('n_rows'), 'key').limit(top_k)
        .withColumn('rank', F.row_number().over(w))
        .withColumn('_j', F.lit(1))
        .join(F.broadcast(tot), '_j')
        .select(
            'key', 'n_rows',
            F.expr('n_rows * 1000000L div _t').alias('share_ppm'),
            F.col('rank').cast('long').alias('rank'),
        )
    )
    summary = tot.select(
        F.lit('__total__').alias('key'),
        F.col('_t').cast('long').alias('n_rows'),
        F.expr('_mx * 1000000L div _t').alias('share_ppm'),
        F.lit(0).cast('long').alias('rank'),
    )
    return summary.unionByName(top)
