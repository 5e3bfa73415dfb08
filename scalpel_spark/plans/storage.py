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
        snapshot_id = f's{len(manifest["snapshots"]):06d}-w{wave}'
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
