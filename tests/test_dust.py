"""DUST rule mining and application (`operators/dust.py`)."""

from __future__ import annotations

from scalpel_spark.operators import dust

SCHEMA = 'url STRING, sig STRING'


def _evidence(spark):
    """Per r: A=?id&sess, B=?id (same sig as A — sess is noise),
    C=?sess (different sig — id is load-bearing)."""
    rows = []
    for r in range(4):
        base = f'https://a.example.com/p{r % 2}'
        sig = f's-{r % 2}-{r % 3}'
        rows.append((f'{base}?id={r % 3}&sess=z{r}', sig))
        rows.append((f'{base}?id={r % 3}', sig))
        rows.append((f'{base}?sess=z{r}', f'other-{r}'))
    return spark.createDataFrame(rows, SCHEMA)


def test_mine_finds_ignorable_param_only(spark):
    rules = dust.mine_param_rules(_evidence(spark), min_support=2).collect()
    assert [(r['host'], r['param'], r['support']) for r in rules] == [
        ('a.example.com', 'sess', 4)]


def test_mine_one_counterexample_kills_rule(spark):
    df = _evidence(spark).union(spark.createDataFrame(
        [('https://a.example.com/p0?id=9&sess=zz', 'x1'),
         ('https://a.example.com/p0?id=9', 'DIFFERENT')], SCHEMA))
    assert dust.mine_param_rules(df, min_support=2).count() == 0


def test_mine_min_support(spark):
    assert dust.mine_param_rules(_evidence(spark), min_support=5).count() == 0
    assert dust.mine_param_rules(_evidence(spark), min_support=4).count() == 1


def test_mine_rules_are_per_host(spark):
    other = spark.createDataFrame(
        [('https://b.example.com/q?id=1&sess=s1', 'bs'),
         ('https://b.example.com/q?id=1', 'bs')], SCHEMA)
    rules = dust.mine_param_rules(_evidence(spark).union(other),
                                  min_support=1)
    got = {(r['host'], r['param']) for r in rules.collect()}
    assert got == {('a.example.com', 'sess'), ('b.example.com', 'sess')}


def test_strip_rewrites_only_ruled_hosts_and_keeps_order(spark):
    rules = spark.createDataFrame(
        [('a.example.com', 'sess', 4)], 'host STRING, param STRING, support LONG')
    frontier = spark.createDataFrame([
        ('https://a.example.com/p?x=1&sess=9&y=2',),
        ('https://a.example.com/p?sess=9',),
        ('https://a.example.com/plain',),
        ('https://c.example.com/p?sess=9',),
    ], 'url STRING')
    out = [r['url'] for r in dust.strip_params(frontier, rules).collect()]
    assert sorted(out) == sorted([
        'https://a.example.com/p?x=1&y=2',   # survivors keep order
        'https://a.example.com/p',           # query emptied entirely
        'https://a.example.com/plain',       # no query: byte-identical
        'https://c.example.com/p?sess=9',    # no rule for this host
    ])


def test_strip_out_col_and_plan_jvm(spark):
    rules = spark.createDataFrame(
        [('a.example.com', 'sess', 2)], 'host STRING, param STRING, support LONG')
    frontier = spark.createDataFrame(
        [('https://a.example.com/p?sess=1&k=v',)], 'url STRING')
    out = dust.strip_params(frontier, rules, out_col='canon')
    row = out.collect()[0]
    assert row['url'].endswith('sess=1&k=v') and row['canon'].endswith('p?k=v')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Python' not in plan and 'BatchEvalPython' not in plan
    mine_plan = dust.mine_param_rules(_evidence(spark))._jdf \
        .queryExecution().executedPlan().toString()
    assert 'Python' not in mine_plan
