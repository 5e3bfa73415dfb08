"""SURT at-rest frontier layout (plans/storage.write_surt_sorted):
registered domains land contiguous + sorted, enabling min/max file
pruning and shuffle-light per-domain grouping."""

from pyspark.sql import functions as F

from scalpel_spark.plans.storage import write_surt_sorted


def _frontier(spark):
    """600 URLs over 3 registered domains x 4 subdomains each, emitted in
    a deliberately interleaved (hash-ish) order."""
    domains = ['alpha.com', 'beta.co.uk', 'gamma.org']
    subs = ['www', 'a', 'b', 'news']
    rows = []
    for i in range(600):
        d, s = domains[i % 3], subs[(i // 3) % 4]
        rows.append((f'http://{s}.{d}/p/{i:04d}',))
    return spark.createDataFrame(rows, 'url string')


def test_surt_sorted_layout_is_contiguous_and_sorted(spark, tmp_path):
    out = str(tmp_path / 'frontier_surt')
    write_surt_sorted(_frontier(spark), out, n_partitions=6)
    back = spark.read.parquet(out).withColumn('file', F.input_file_name())

    # (a) contiguity: each registered domain touches at most
    # ceil(rows_dom/rows_per_file)+1 files — far fewer than it would under
    # hash partitioning (which scatters every domain over ~all 6 files).
    from scalpel_spark.functions.urls import registered_domain_col
    host = F.parse_url('url', F.lit('HOST'))
    per_dom = (back.withColumn('dom', registered_domain_col(host))
               .groupBy('dom').agg(F.countDistinct('file').alias('nf'))
               .collect())
    assert len(per_dom) == 3
    for r in per_dom:
        assert r['nf'] <= 3, (r['dom'], r['nf'])   # 200 rows / ~100-row files

    # (b) within-file sortedness: parquet preserves row order per file
    for f in [r['file'] for r in back.select('file').distinct().collect()]:
        keys = [r['surt_key'] for r in
                spark.read.parquet(f).select('surt_key').collect()]
        assert keys == sorted(keys)

    # (c) global range disjointness across files: max(key) of one file
    # never exceeds min(key) of the next file in range order
    stats = (back.groupBy('file')
             .agg(F.min('surt_key').alias('lo'), F.max('surt_key').alias('hi'))
             .collect())
    spans = sorted([(r['lo'], r['hi']) for r in stats])
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo

    # (d) round trip: nothing lost, surt_key column added
    assert back.count() == 600
    assert set(back.columns) == {'url', 'surt_key', 'file'}
