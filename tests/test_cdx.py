"""CDX-style capture index (operators/cdx.py): SURT urlkeys, digest-based
revisit records, sorted at-rest layout with pushed-down prefix lookups."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalpel_spark.operators import cdx


def _docs(spark, rows):
    """rows: (url, wave, content_key). Same key => identical spans."""
    data = [
        {'doc_id': url, 'wave': wave,
         'spans': [
             {'kind': 'text', 'text': f'c{key}', 'media_ref': None, 'offset': 0},
             {'kind': 'media', 'text': None, 'media_ref': f'm{key}', 'offset': 1},
         ]}
        for url, wave, key in rows
    ]
    return spark.createDataFrame(
        data,
        'doc_id string, wave int, '
        'spans array<struct<kind:string,text:string,media_ref:string,offset:int>>')


def test_cdx_fields_and_revisit_classification(spark):
    docs = _docs(spark, [
        ('http://www.example.org/a', 0, 1),
        ('http://mirror.example.net/copy', 1, 1),   # same content, later wave
        ('http://www.example.org/b', 0, 2),
    ])
    rows = {r['url']: r for r in cdx.cdx_index(docs).collect()}
    a = rows['http://www.example.org/a']
    assert a['urlkey'] == 'org,example,www)/a'
    assert (a['revisit'], a['original_wave']) == (False, 0)
    copy = rows['http://mirror.example.net/copy']
    assert copy['urlkey'] == 'net,example,mirror)/copy'
    assert (copy['revisit'], copy['original_wave']) == (True, 0)
    assert copy['digest'] == a['digest']
    b = rows['http://www.example.org/b']
    assert (b['revisit'], b['digest'] != a['digest']) == (False, True)
    assert a['n_spans'] == 2 and a['content_chars'] == 2  # 'c1' only


def test_cdx_within_wave_tie_breaks_on_urlkey(spark):
    # same wave, same digest: the lexicographically-first urlkey is the
    # original — deterministic regardless of partitioning
    docs = _docs(spark, [
        ('http://b.test/x', 0, 7),
        ('http://a.test/x', 0, 7),
    ])
    rows = {r['url']: r['revisit'] for r in cdx.cdx_index(docs).collect()}
    assert rows['http://a.test/x'] is False
    assert rows['http://b.test/x'] is True


def test_cdx_lookup_pushes_prefix_to_parquet(spark, tmp_path):
    docs = _docs(spark, [
        (f'http://h{i}.example.org/p{j}', 0, i * 10 + j)
        for i in range(4) for j in range(5)
    ])
    path = str(tmp_path / 'cdx')
    cdx.write_cdx(cdx.cdx_index(docs), path, num_files=4)
    at_rest = spark.read.parquet(path)
    hits = cdx.cdx_lookup(at_rest, 'org,example,h2)')
    assert hits.count() == 5
    assert all(r['urlkey'].startswith('org,example,h2)')
               for r in hits.collect())
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert 'StartsWith' in plan  # reaches PushedFilters on the scan


def test_cdx_sorted_layout(spark, tmp_path):
    docs = _docs(spark, [
        (f'http://h{i}.example.org/p{j}', j % 2, i * 10 + j)
        for i in range(3) for j in range(4)
    ])
    path = str(tmp_path / 'cdx')
    cdx.write_cdx(cdx.cdx_index(docs), path, num_files=2)
    # within every file, rows are (urlkey, wave)-sorted
    files = (spark.read.parquet(path)
             .withColumn('f', F.input_file_name())
             .collect())
    by_file = {}
    for r in files:
        by_file.setdefault(r['f'], []).append((r['urlkey'], r['wave']))
    for rows in by_file.values():
        assert rows == sorted(rows)
