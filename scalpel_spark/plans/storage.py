"""SnapshotStore — Iceberg-style atomic multi-table snapshots over Parquet.

No Iceberg/Delta jars are available offline (SURVEY.md §7), so this layer
reproduces the two Iceberg properties the engine needs — *atomic commit* and
*time-travel to a named snapshot* — with plain Parquet data files plus a
JSON manifest whose replacement is a single atomic ``os.replace`` (rename).
On a real cluster the same interface swaps to
``df.writeTo('catalog.db.tbl')`` / ``spark.read.table`` with Iceberg
snapshot IDs; the engine only talks to this interface.

Layout::

    root/
      manifest.json                      # {"current": id, "snapshots": [...]}
      data/<snapshot_id>/<table>/*.parquet

A snapshot is committed by (1) writing every table's parquet directory under
a new snapshot id, (2) writing ``manifest.json.tmp``, (3) ``os.replace`` —
readers either see the old manifest or the new one, never a torn state.
Crash between (1) and (3) leaves orphan data files but a consistent
manifest, exactly like Iceberg's uncommitted data files.

This is the checkpoint/resume mechanism: resume = read the latest manifest,
load its tables, re-enter the wave loop at ``snapshot['wave'] + 1``
(reference has no persistence at all — crash = restart; SURVEY.md §2.9 T4).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, 'manifest.json')

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {'current': None, 'snapshots': []}
        with open(self._manifest_path) as f:
            return json.load(f)

    @staticmethod
    def _next_seq(manifest: dict) -> int:
        """Monotone snapshot sequence: max numeric prefix of existing ids
        plus one — NOT ``len(snapshots)``, which collides with a retained
        snapshot's id (and silently overwrites its data directory) after
        :meth:`expire_snapshots` shrinks the list."""
        seqs = [int(m.group(1)) for s in manifest['snapshots']
                if (m := re.match(r's(\d+)-', s['id']))]
        return max(seqs, default=-1) + 1

    def commit(self, tables: dict[str, DataFrame], wave: int, metadata: Optional[dict] = None) -> str:
        """Atomically commit one snapshot containing all ``tables``.

        Returns the snapshot id. Data is written first — all tables
        concurrently (Spark schedules actions from multiple threads; this
        is the Iceberg pattern of parallel data-file writes before the
        single metadata swap) — then the manifest rename is the commit
        point.
        """
        from concurrent.futures import ThreadPoolExecutor

        manifest = self._read_manifest()
        snapshot_id = f's{self._next_seq(manifest):06d}-w{wave}'
        entry: dict = {'id': snapshot_id, 'wave': wave, 'ts': time.time(), 'tables': {}, 'metadata': metadata or {}}

        def write_one(item):
            name, df = item
            path = os.path.join(self.root, 'data', snapshot_id, name)
            df.write.mode('overwrite').parquet(path)
            return name, path

        with ThreadPoolExecutor(max_workers=max(len(tables), 1)) as pool:
            for name, path in pool.map(write_one, tables.items()):
                entry['tables'][name] = path
        manifest['snapshots'].append(entry)
        manifest['current'] = snapshot_id
        tmp = self._manifest_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)  # atomic commit point
        return snapshot_id

    def current(self) -> Optional[dict]:
        manifest = self._read_manifest()
        if manifest['current'] is None:
            return None
        return next(s for s in manifest['snapshots'] if s['id'] == manifest['current'])

    def snapshots(self) -> list[dict]:
        return self._read_manifest()['snapshots']

    def load(self, spark: SparkSession, snapshot: dict, table: str) -> DataFrame:
        return spark.read.parquet(snapshot['tables'][table])

    def state_paths(self, delta_name: str) -> list[str]:
        """Data paths whose union is the current state of an append-only
        delta table, honoring compaction: a ``<base>_compacted`` table in a
        snapshot REPLACES all earlier history (Iceberg rewrite semantics —
        the engine's ``forget()`` commits one to drop recrawled URLs);
        later deltas append on top of it."""
        return self.state_paths_at(delta_name, None)

    def state_paths_at(self, delta_name: str, snapshot_id: Optional[str]) -> list[str]:
        """Time-travel variant of :meth:`state_paths`: the accumulated state
        of a delta table AS OF ``snapshot_id`` (inclusive) — the Iceberg
        ``VERSION AS OF`` read over our manifest. ``None`` means current.

        Raises ``KeyError`` for an unknown snapshot id (misspelled ids must
        not silently read the full history)."""
        compacted_name = delta_name.replace('_delta', '_compacted')
        snaps = self.snapshots()
        if snapshot_id is not None:
            ids = [s['id'] for s in snaps]
            if snapshot_id not in ids:
                raise KeyError(f'unknown snapshot id: {snapshot_id!r} (have {ids})')
            snaps = snaps[: ids.index(snapshot_id) + 1]
        paths: list[str] = []
        for snap in snaps:
            if compacted_name in snap['tables']:
                paths = [snap['tables'][compacted_name]]
            if delta_name in snap['tables']:
                paths.append(snap['tables'][delta_name])
        return paths

    def load_current(self, spark: SparkSession, table: str) -> Optional[DataFrame]:
        """Latest committed copy of a FULL (non-delta) table: the most
        recent snapshot that contains it (a snapshot may legitimately omit
        a table, e.g. an empty-wave commit)."""
        for snap in reversed(self.snapshots()):
            if table in snap['tables']:
                return self.load(spark, snap, table)
        return None

    # -- maintenance (Iceberg rewrite_data_files / expire_snapshots /
    #    remove_orphan_files parity) ------------------------------------------

    def _table_bases(self) -> tuple[set[str], set[str]]:
        """(delta-table base names, full-table names) across the whole
        manifest history — derived, never hardcoded, so new engine tables
        are maintained automatically."""
        deltas: set[str] = set()
        fulls: set[str] = set()
        for snap in self.snapshots():
            for name in snap['tables']:
                if name.endswith('_delta'):
                    deltas.add(name[: -len('_delta')])
                elif name.endswith('_compacted'):
                    deltas.add(name[: -len('_compacted')])
                else:
                    fulls.add(name)
        return deltas, fulls

    def live_paths(self) -> set[str]:
        """Every data path that contributes to the CURRENT state: the
        accumulated paths of each delta table (compaction-aware, via
        :meth:`state_paths`) plus the latest copy of each full table.
        A snapshot none of whose paths is live is fully superseded."""
        deltas, fulls = self._table_bases()
        live: set[str] = set()
        for base in deltas:
            live.update(self.state_paths(f'{base}_delta'))
        for name in fulls:
            for snap in reversed(self.snapshots()):
                if name in snap['tables']:
                    live.add(snap['tables'][name])
                    break
        return live

    def checkpoint(self, spark: SparkSession) -> str:
        """Iceberg ``rewrite_data_files``: commit ONE snapshot holding the
        full accumulated state of every table in the manifest — each delta
        table rewritten as ``<base>_compacted``, each full table carried
        forward — so every earlier snapshot becomes fully superseded and
        therefore expirable. State before == state after (pinned by
        tests/test_expire.py). Returns the checkpoint snapshot id."""
        cur = self.current()
        if cur is None:
            raise ValueError('nothing to checkpoint: no committed snapshot')
        deltas, fulls = self._table_bases()
        tables: dict[str, DataFrame] = {}
        for base in sorted(deltas):
            paths = self.state_paths(f'{base}_delta')
            if paths:
                tables[f'{base}_compacted'] = spark.read.parquet(*paths)
        for name in sorted(fulls):
            df = self.load_current(spark, name)
            if df is not None:
                tables[name] = df
        # carry the current metadata (next_priority, ...) forward: resume()
        # reads it from the LATEST snapshot, which this one becomes
        return self.commit(tables, cur['wave'],
                           metadata={**cur.get('metadata', {}),
                                     'compaction': True, 'checkpoint': True})

    def expire_snapshots(self, retain_last: int = 1) -> list[str]:
        """Iceberg ``expire_snapshots``: drop the longest PREFIX of history
        whose snapshots are fully superseded (no live path), keeping at
        least the last ``retain_last`` entries and always the current one.

        Prefix-only on purpose: expiring a superseded snapshot that sits
        *below* a retained one would silently truncate the retained
        snapshot's time-travel view (``state_paths_at`` unions every delta
        up to it) — stopping at the first keeper guarantees every retained
        snapshot still reconstructs exactly. Run :meth:`checkpoint` first
        to supersede history; without it everything stays live and this is
        a no-op.

        The manifest rewrite is the commit point; data directories are
        deleted after it, so a crash in between leaves orphans (cleaned by
        :meth:`remove_orphan_files`), never a manifest pointing at deleted
        data. Returns the expired snapshot ids."""
        manifest = self._read_manifest()
        snaps = manifest['snapshots']
        live = self.live_paths()
        cutoff = max(len(snaps) - max(retain_last, 1), 0)
        expired: list[dict] = []
        for snap in snaps[:cutoff]:
            if snap['id'] == manifest['current']:
                break
            if any(p in live for p in snap['tables'].values()):
                break
            expired.append(snap)
        if not expired:
            return []
        manifest['snapshots'] = snaps[len(expired):]
        tmp = self._manifest_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)
        for snap in expired:
            shutil.rmtree(os.path.join(self.root, 'data', snap['id']),
                          ignore_errors=True)
        return [s['id'] for s in expired]

    def remove_orphan_files(self) -> list[str]:
        """Delete ``data/<id>`` directories no manifest entry references —
        leftovers of a crash between data write and manifest commit (or
        between expiry's manifest rewrite and its directory deletes).
        Returns the removed snapshot-directory names."""
        data_dir = os.path.join(self.root, 'data')
        if not os.path.isdir(data_dir):
            return []
        known = {s['id'] for s in self.snapshots()}
        removed = []
        for d in sorted(os.listdir(data_dir)):
            if d not in known:
                shutil.rmtree(os.path.join(data_dir, d), ignore_errors=True)
                removed.append(d)
        return removed


def write_surt_sorted(
    urls_df: DataFrame,
    path: str,
    url_col: str = 'url',
    n_partitions: Optional[int] = None,
) -> None:
    """Write a URL table range-partitioned AND sorted by its SURT key —
    the at-rest layout for a 10^10-URL frontier.

    SURT order (``functions/urls.surt_key_col``: ``org,example,www)/path``)
    is the Heritrix/Common Crawl layout: every host of a registered domain
    is contiguous in key space, so (a) per-domain politeness grouping
    reads a contiguous partition range instead of shuffling the world,
    (b) domain/host prefix scans prune to a handful of files via parquet
    min/max statistics on ``surt_key``, and (c) same-domain URLs compress
    together (shared key prefixes). ``repartitionByRange`` samples the
    keys, so output files stay balanced even when one domain dominates.
    One shuffle at write time, amortized over every later wave that reads
    the frontier back.
    """
    from pyspark.sql import functions as F

    from scalpel_spark.functions.urls import surt_key_col

    keyed = urls_df.withColumn('surt_key', surt_key_col(F.col(url_col)))
    if n_partitions is not None:
        ranged = keyed.repartitionByRange(n_partitions, 'surt_key')
    else:
        ranged = keyed.repartitionByRange('surt_key')
    ranged.sortWithinPartitions('surt_key').write.mode('overwrite').parquet(path)
