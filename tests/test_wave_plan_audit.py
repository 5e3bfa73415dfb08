"""Engine wave-loop physical-plan audit (VERDICT r4 Missing #3).

The static plans of the `crawl_*` driver queries are just result scans
(the callable runs the whole crawl), so the wave loop's physical shape
was previously pinned only indirectly. `CrawlEngine(plan_capture=True)`
records each wave's EXECUTED plans (AQE final — captured right after
the stage's action) for the two load-bearing frames:

* ``schedule_dedup`` — the seen probe. Must be a LeftAnti join from
  wave 1 on (wave 0 has an empty seen set and correctly plans no join),
  with the small seen side BROADCAST at this scale, and NO Python nodes:
  the frontier hash path is pure JVM column algebra (xxhash64).
* ``fetch`` — the wave working set. Must carry the BroadcastHashJoin
  for host_state, the per-host politeness Window, and the ONLY Python
  node allowed in corpus_join mode: the once-per-host robots.txt parse
  (``operators/robots.py:100`` mapInPandas — the reference's
  urllib.robotparser evaluation, a sanctioned Arrow boundary per
  DESIGN.md).

Reference semantics being pinned: the seen probe is
`_is_url_already_processed` (any_io/static_spider.py:100-106), robots
evaluation is `RobotsAnalyzer.can_fetch` (any_io/robots.py:43-77), and
dispatch pacing is the worker sleep loop (any_io/static_spider.py:
177-187) — each re-expressed as the join/window the executed plans show.
"""

from __future__ import annotations

import re
import tempfile

from scalpel_spark.config import CrawlConfig
from scalpel_spark.plans.engine import CrawlEngine
from scalpel_spark.plans.storage import SnapshotStore
from scalpel_spark.sources.corpus import synthetic_corpus, synthetic_robots

PYTHON_NODES = (r'(BatchEvalPython|ArrowEvalPython|MapInPandas'
                r'|FlatMapGroupsInPandas|MapInArrow)')


def _crawl_with_capture(spark):
    corpus = synthetic_corpus(spark, n_pages=200, n_hosts=8, seed=42)
    robots = synthetic_robots(spark, n_hosts=8)
    cfg = CrawlConfig(follow_robots_txt=True,
                      max_dispatch_per_host_per_wave=10, max_waves=3)
    eng = CrawlEngine(spark, corpus, robots, cfg,
                      SnapshotStore(tempfile.mkdtemp()), plan_capture=True)
    eng.run([r['doc_id'] for r in corpus.limit(4).collect()])
    return eng.captured_plans


def test_wave_loop_executed_plan_shape(spark):
    plans = _crawl_with_capture(spark)
    stages = {(w, s) for w, s, _ in plans}
    # both frames captured for every wave that ran
    waves = {w for w, _, _ in plans}
    assert waves >= {0, 1}
    for w in waves:
        assert (w, 'schedule_dedup') in stages and (w, 'fetch') in stages

    for wave, stage, plan in plans:
        pynodes = set(re.findall(PYTHON_NODES, plan))
        if stage == 'schedule_dedup':
            # seen probe: LeftAnti from wave 1 (wave 0 = empty seen set),
            # broadcast seen side at this scale, zero Python anywhere
            if wave >= 1:
                assert 'LeftAnti' in plan, f'wave {wave}: no LeftAnti'
                assert 'BroadcastHashJoin' in plan
            assert not pynodes, f'wave {wave} dedup has Python: {pynodes}'
        else:
            # fetch working set: broadcast host_state + politeness window;
            # the once-per-host robots parse is the only sanctioned
            # Python node in corpus_join mode
            assert 'BroadcastHashJoin' in plan, f'wave {wave}: host_state not broadcast'
            assert 'Window' in plan, f'wave {wave}: no politeness window'
            assert pynodes <= {'MapInPandas'}, \
                f'wave {wave} fetch has unsanctioned Python: {pynodes}'


def test_wave_loop_codegen_covers_column_algebra(spark):
    """The executed wave plans must run under whole-stage codegen — the
    `*(n)` stage markers in the AQE final plan (the static explain shows
    none; see tools/plan_audit.py)."""
    plans = _crawl_with_capture(spark)
    for wave, stage, plan in plans:
        n = len(set(re.findall(r'\*\((\d+)\)', plan)))
        assert n >= 2, f'wave {wave} {stage}: only {n} codegen spans'


def test_plan_capture_off_by_default(spark):
    corpus = synthetic_corpus(spark, n_pages=60, n_hosts=4, seed=42)
    eng = CrawlEngine(spark, corpus, config=CrawlConfig(max_waves=2),
                      store=SnapshotStore(tempfile.mkdtemp()))
    eng.run([r['doc_id'] for r in corpus.limit(2).collect()])
    assert eng.captured_plans == []
