"""URL-seen set: numpy bloom filter (Arrow lane) + exact anti-join, with a
cuckoo-filter fallback for delete-capable membership.

Reference semantics: the seen set is *exact* Python-set membership
(``any_io/static_spider.py:100-106``). Here the bloom filter is only a
prefilter that shrinks the anti-join's shuffle volume; the LEFT ANTI JOIN on
``url_hash`` remains the source of truth, so the final set semantics stay
exact (SURVEY.md §4.2).

Scale notes (10^10 URLs): one flat bitmap does not fit (12.5 GB at 10
bits/key), so ``build_bloom`` shards the key space by ``url_hash`` range
into independent bitmaps that are OR-merged per shard; on a cluster the
shards live in the broadcast as a dict and each executor probes only the
shard a key hashes into. In-sandbox we default to a single shard sized for
the test scales. Everything is numpy over Arrow batches — no per-row
Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _next_pow2(n: int) -> int:
    return 1 << max(13, (n - 1).bit_length())


# a single shard's bitmap is capped so one shard always fits comfortably in
# an executor/broadcast slot; 10^10 keys at 12 bits/key = ~15 GB total →
# ~60 shards of 256 MB, each independently built, merged, and probed
MAX_SHARD_BYTES = 256 << 20


def shards_for(expected: int, bits_per_key: int = 12) -> int:
    """Power-of-2 shard count so each shard bitmap stays under
    ``MAX_SHARD_BYTES`` (1 at every sandbox scale)."""
    total_bytes = _next_pow2(max(expected, 1) * bits_per_key) >> 3
    n = 1
    while total_bytes // n > MAX_SHARD_BYTES:
        n <<= 1
    return n


def _shard_of(h: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard routing on hash bits 32..(32+log2 n) — disjoint from both the
    bloom's double-hash mix and the cuckoo fingerprint (bits 48..63) /
    bucket (low bits), so sharding never correlates with in-shard
    placement."""
    return ((h.astype(np.uint64) >> np.uint64(32)) % np.uint64(n_shards)).astype(np.int64)


class Bloom:
    """Bloom filter over signed-64 hash values (F.xxhash64), sharded by
    hash range: ``shards[i]`` is an independent bitmap holding the keys
    whose bits 32.. route to shard i. One shard (the sandbox default) is
    the classic flat bitmap; at 10^10 keys the shards are what keeps each
    bitmap under :data:`MAX_SHARD_BYTES` (broadcastable as a dict, probed
    per owning shard)."""

    def __init__(self, shards: list[np.ndarray], num_bits: int, num_hashes: int):
        self.shards = shards  # per-shard uint8[num_bits/8]
        self.num_bits = num_bits  # bits PER SHARD
        self.num_hashes = num_hashes

    @property
    def n_shards(self) -> int:
        return len(self.shards)

    @staticmethod
    def _indices(h: np.ndarray, k: int, num_bits: int) -> np.ndarray:
        """Double hashing: idx_k = (h + k*(h>>32|1)) mod bits, all uint64."""
        h = h.astype(np.uint64)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        return (h + np.uint64(k) * h2) % np.uint64(num_bits)

    def _add_to_shard(self, bitmap: np.ndarray, hashes: np.ndarray) -> None:
        for k in range(self.num_hashes):
            idx = self._indices(hashes, k, self.num_bits)
            np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))

    def add_array(self, hashes: np.ndarray) -> None:
        if self.n_shards == 1:
            self._add_to_shard(self.shards[0], hashes)
            return
        sh = _shard_of(hashes, self.n_shards)
        for s in np.unique(sh):
            self._add_to_shard(self.shards[s], hashes[sh == s])

    def contains_array(self, hashes: np.ndarray) -> np.ndarray:
        out = np.ones(len(hashes), dtype=bool)
        if self.n_shards == 1:
            groups = [(self.shards[0], slice(None), hashes)]
        else:
            sh = _shard_of(hashes, self.n_shards)
            groups = [(self.shards[s], sh == s, hashes[sh == s]) for s in np.unique(sh)]
        for bitmap, sel, h in groups:
            hit = np.ones(len(h), dtype=bool)
            for k in range(self.num_hashes):
                idx = self._indices(h, k, self.num_bits)
                bits = bitmap[(idx >> np.uint64(3)).astype(np.int64)] & (
                    np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)
                )
                hit &= bits != 0
            out[sel] = hit
        return out

    def merge(self, other: 'Bloom') -> 'Bloom':
        assert other.n_shards == self.n_shards and other.num_bits == self.num_bits
        for mine, theirs in zip(self.shards, other.shards):
            np.bitwise_or(mine, theirs, out=mine)
        return self


def build_bloom(df: DataFrame, hash_col: str, expected: int, bits_per_key: int = 12,
                num_hashes: int = 4, n_shards: int | None = None) -> Bloom:
    """Build per-(partition, shard) bitmaps in mapInPandas (numpy over
    Arrow), then OR-merge them *executor-side* per shard with
    ``aggregateByKey`` keyed on the shard id — map-side partial merge, one
    reducer per shard, the driver receives each shard's final bitmap
    exactly once. A collect-and-merge-on-driver variant is
    O(partitions × bitmap) serial driver work, which caps scaling (Amdahl)
    once partitions track core count — SURVEY.md §4.2.

    ``n_shards`` defaults to :func:`shards_for` (1 below ~10^8 keys); each
    shard is sized for its expected/n_shards keys, so the total bit budget
    — and the false-positive rate — is identical at any shard count."""
    if n_shards is None:
        n_shards = shards_for(expected, bits_per_key)
    num_bits = _next_pow2(max(expected // n_shards, 1) * bits_per_key)
    schema = T.StructType([T.StructField('shard', T.IntegerType()),
                           T.StructField('bitmap', T.BinaryType())])

    def per_partition(batches):
        bitmaps: dict[int, np.ndarray] = {}
        proto = Bloom([], num_bits, num_hashes)
        for pdf in batches:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            if not len(h):
                continue
            sh = _shard_of(h, n_shards)
            for s in np.unique(sh):
                bitmap = bitmaps.setdefault(int(s), np.zeros(num_bits >> 3, dtype=np.uint8))
                proto._add_to_shard(bitmap, h[sh == s])
        for s, bitmap in bitmaps.items():
            yield pd.DataFrame({'shard': [s], 'bitmap': [bitmap.tobytes()]})

    def or_bytes(a: bytes, b: bytes) -> bytes:
        return np.bitwise_or(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    parts = df.select(hash_col).mapInPandas(per_partition, schema).rdd.map(
        lambda r: (r['shard'], r['bitmap']))
    merged = dict(parts.aggregateByKey(bytes(num_bits >> 3), or_bytes, or_bytes,
                                       numPartitions=n_shards).collect())
    shards = [np.frombuffer(merged.get(s, bytes(num_bits >> 3)), dtype=np.uint8).copy()
              for s in range(n_shards)]
    return Bloom(shards, num_bits, num_hashes)


def bloom_prefiltered_anti_join(candidates: DataFrame, seen: DataFrame, bloom: 'Bloom',
                                hash_col: str = 'url_hash',
                                exact_cols: tuple[str, ...] = ('url_hash', 'url')) -> DataFrame:
    """The prefilter+confirm core: rows whose hash is *definitely not* in
    ``bloom`` skip the join entirely; only "maybe" rows shuffle into the
    exact anti-join on ``exact_cols`` — set semantics stay exact even
    under a 64-bit collision. Callers own the bloom lifecycle (the engine
    maintains one incrementally across waves; :func:`anti_join_seen`
    builds a one-shot one)."""
    keys = list(exact_cols)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((bloom.shards, bloom.num_bits, bloom.num_hashes))

    @F.pandas_udf('boolean')
    def maybe_seen(h: pd.Series) -> pd.Series:
        shards, num_bits, num_hashes = bc.value
        b = Bloom(shards, num_bits, num_hashes)
        return pd.Series(b.contains_array(h.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn('_maybe', maybe_seen(F.col(hash_col)))
    definite_new = flagged.filter(~F.col('_maybe')).drop('_maybe')
    maybe = flagged.filter(F.col('_maybe')).drop('_maybe')
    return definite_new.unionByName(maybe.join(seen.select(*keys), keys, 'left_anti'))


def anti_join_seen(candidates: DataFrame, seen: DataFrame, hash_col: str = 'url_hash',
                   seen_count: int | None = None, bloom_threshold: int = 4096,
                   exact_cols: tuple[str, ...] = ('url_hash', 'url')) -> DataFrame:
    """candidates ⟕ seen LEFT ANTI, bloom-prefiltered (one-shot bloom).

    Below ``bloom_threshold`` seen rows the bloom build costs more than it
    saves — plain anti-join then (Catalyst broadcasts the small seen side).
    """
    keys = list(exact_cols)
    if seen_count is None:
        seen_count = seen.count()
    if seen_count == 0:
        return candidates
    if seen_count < bloom_threshold:
        return candidates.join(seen.select(*keys), keys, 'left_anti')
    bloom = build_bloom(seen, hash_col, expected=seen_count)
    return bloom_prefiltered_anti_join(candidates, seen, bloom, hash_col, exact_cols)


def anti_join_seen_cuckoo(candidates: DataFrame, seen: DataFrame, cuckoo: 'ShardedCuckooStore',
                          hash_col: str = 'url_hash',
                          exact_cols: tuple[str, ...] = ('url_hash', 'url')) -> DataFrame:
    """candidates ⟕ seen LEFT ANTI, prefiltered by the persistent sharded
    cuckoo sidecar — the delete-capable alternative to the per-run bloom.

    Unlike :func:`anti_join_seen`'s bloom (rebuilt from a full scan of the
    seen table), the cuckoo is maintained *incrementally*: the engine
    bulk-inserts each wave's newly-scheduled hashes executor-side
    (:meth:`ShardedCuckooStore.insert_df`) and ``forget()`` deletes
    recrawled ones, so no wave rescans the seen table to build its
    prefilter. Rows whose hash is definitely absent skip the join; "maybe"
    rows are confirmed by the exact anti-join, so set semantics stay exact
    under fingerprint collisions.

    MUST NOT be used after the filter has dropped an insert (saturation):
    a dropped key is a false NEGATIVE and would re-schedule a seen URL —
    the engine tracks this and falls back to :func:`anti_join_seen`.
    """
    keys = list(exact_cols)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((cuckoo.load_tables(), cuckoo.n_shards))

    @F.pandas_udf('boolean')
    def maybe_seen(h: pd.Series) -> pd.Series:
        tables, n_shards = bc.value
        return pd.Series(ShardedCuckooStore.contains_tables(
            tables, h.to_numpy(dtype=np.int64), n_shards))

    flagged = candidates.withColumn('_maybe', maybe_seen(F.col(hash_col)))
    definite_new = flagged.filter(~F.col('_maybe')).drop('_maybe')
    maybe = flagged.filter(F.col('_maybe')).drop('_maybe')
    return definite_new.unionByName(maybe.join(seen.select(*keys), keys, 'left_anti'))


class CuckooFilter:
    """Bucketed cuckoo filter (2 candidate buckets × 4 slots, 16-bit
    fingerprints) — the delete-capable structure named in the north star
    for when the seen set must *forget* (recrawl windows), which a bloom
    cannot. numpy-vectorized inserts/probes.

    Scale note (10^10 URLs): one table is ~2 bytes/key → 20 GB; like the
    bloom's shard-by-hash-range plan (module docstring), a cluster
    deployment shards the table by hash range into independently
    updatable/broadcastable segments. In-sandbox a single table sized for
    the test scales; the engine's per-wave updates are vectorized numpy
    over the wave's (wave-bounded, 8-byte) hash array.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, num_buckets: int):
        self.num_buckets = _next_pow2(num_buckets) // 8192 * 8192 or 8192
        # store fingerprints, 0 = empty
        self.table = np.zeros((self.num_buckets, self.SLOTS), dtype=np.uint16)
        self._rng = np.random.default_rng(42)

    @classmethod
    def from_table(cls, table: np.ndarray, num_buckets: int) -> 'CuckooFilter':
        """Rehydrate from a persisted/broadcast table (probe-side use)."""
        cf = cls.__new__(cls)
        cf.num_buckets = num_buckets
        cf.table = table
        cf._rng = np.random.default_rng(42)
        return cf

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _bucket1(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.uint64) % np.uint64(self.num_buckets)).astype(np.int64)

    def _bucket2(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: b2 = b1 XOR hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.num_buckets)
        return (b1.astype(np.uint64) ^ fph).astype(np.uint64) % np.uint64(self.num_buckets)

    def insert(self, hashes: np.ndarray) -> int:
        """Insert; returns number of failed (dropped) keys.

        Vectorized (round-2 verdict #3): slot-filling passes place one key
        per distinct bucket per pass with pure numpy indexing — per-key
        Python survives only on the rare eviction (kick) path, for keys
        whose both candidate buckets are already full."""
        h = hashes.astype(np.int64)
        fp = self._fingerprint(h)
        b1 = self._bucket1(h)
        b2 = self._bucket2(b1, fp).astype(np.int64)
        pending = np.arange(len(h), dtype=np.int64)
        for bucket_arr in (b1, b2):
            while len(pending):
                b = bucket_arr[pending]
                order = np.argsort(b, kind='stable')
                bs = b[order]
                first = np.ones(len(bs), dtype=bool)
                first[1:] = bs[1:] != bs[:-1]
                cand = pending[order[first]]  # one key per distinct bucket
                cb = bucket_arr[cand]
                empty = self.table[cb] == 0
                has = empty.any(axis=1)
                if not has.any():
                    break  # every pending bucket full on this side
                slot = empty.argmax(axis=1)  # first empty slot per bucket
                placed = cand[has]
                self.table[cb[has], slot[has]] = fp[placed]
                keep = np.ones(len(h), dtype=bool)
                keep[placed] = False
                pending = pending[keep[pending]]
            if not len(pending):
                break
        failed = 0
        for i in pending:  # eviction path: both buckets full
            if not self._insert_one(int(b1[i]), int(b2[i]), int(fp[i])):
                failed += 1
        return failed

    def _insert_one(self, b1: int, b2: int, fp: int) -> bool:
        for b in (b1, b2):
            empty = np.nonzero(self.table[b] == 0)[0]
            if len(empty):
                self.table[b, empty[0]] = fp
                return True
        b = b1
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[b, slot] = int(self.table[b, slot]), fp
            fph = (np.uint64(fp) * np.uint64(0x5BD1E995)) % np.uint64(self.num_buckets)
            b = int((np.uint64(b) ^ fph) % np.uint64(self.num_buckets))
            empty = np.nonzero(self.table[b] == 0)[0]
            if len(empty):
                self.table[b, empty[0]] = fp
                return True
        return False

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.int64)
        fp = self._fingerprint(h)
        b1 = self._bucket1(h)
        b2 = self._bucket2(b1, fp).astype(np.int64)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, hashes: np.ndarray) -> int:
        """Delete one occurrence per key; returns number actually deleted."""
        h = hashes.astype(np.int64)
        fp = self._fingerprint(h)
        b1 = self._bucket1(h)
        b2 = self._bucket2(b1, fp).astype(np.int64)
        deleted = 0
        for i in range(len(h)):
            for b in (int(b1[i]), int(b2[i])):
                slots = np.nonzero(self.table[b] == fp[i])[0]
                if len(slots):
                    self.table[b, slots[0]] = 0
                    deleted += 1
                    break
        return deleted


class ShardedCuckooStore:
    """Executor-maintained persistent cuckoo sidecar (round-2 verdict #3).

    The delete-capable seen-prefilter lives as ``n_shards`` independent
    cuckoo tables, one ``shard_{i}.npz`` per shard under ``directory``
    (shared storage on a cluster; shard routing on hash bits 32.., like
    the sharded bloom). ALL maintenance — rebuild-from-seen, per-wave
    inserts, forget() deletes — runs as ONE Spark job per operation:

        df.groupBy(shard).applyInPandas(...)

    so each shard's hashes shuffle to that shard's single task, which
    loads its table, applies a vectorized bulk insert/delete
    (:meth:`CuckooFilter.insert` / ``delete``), and writes the file back
    atomically (unique tmp + rename). The driver only ever receives the
    per-shard summary rows (shard, n_changed, saturated) — never a hash
    array — replacing the per-wave collect + Python insert loop that
    serialized every wave's hashes through the driver.

    Retry/speculation safety (round-3 verdict #4): cuckoo inserts are
    NOT idempotent — a task retried after its rename completed would
    re-insert the wave's keys as doubled fingerprints, and a doubled
    fingerprint survives one ``forget()`` delete. Every
    ``insert_df``/``delete_df`` call therefore mints ONE apply-id on the
    driver (captured by the task closure, so every retry/speculative
    copy of a shard task carries the same id) and each shard file
    records the ids it has applied (last ``_APPLIED_KEEP``): a shard
    task whose apply-id is already recorded no-ops. A speculative twin
    racing the original both load the same pre-state and both save a
    once-applied table, so the atomic rename keeps either outcome
    correct. Requires ``directory`` on storage shared by all executors
    (NFS/EFS/fuse mount — same requirement as any Spark checkpoint
    location); the load→mutate→rename cycle assumes Spark's guarantee
    that one logical operation's shard task set is the only writer
    between waves.

    Saturation (a dropped insert ⇒ possible false negative) is recorded
    per shard IN the shard file and is sticky; the engine checks
    :meth:`any_saturated` and falls back to the exact path, like before.
    """

    _SUMMARY_SCHEMA = 'shard int, n_changed long, saturated boolean'
    # applied-op ids kept per shard file; one id per insert_df/delete_df
    # call, so 64 covers far more in-flight retry ambiguity than Spark's
    # task-attempt horizon ever spans
    _APPLIED_KEEP = 64

    def __init__(self, directory: str, num_buckets: int, n_shards: int = 1):
        import os

        self.directory = directory
        self.n_shards = max(1, n_shards)
        self.num_buckets_per_shard = max(num_buckets // self.n_shards, 8192)
        os.makedirs(directory, exist_ok=True)

    # -- shard files ---------------------------------------------------------

    def _path(self, shard: int) -> str:
        import os

        return os.path.join(self.directory, f'shard_{shard}.npz')

    @staticmethod
    def _load_shard(path: str, num_buckets: int) -> tuple['CuckooFilter', bool, list]:
        import os

        if os.path.exists(path):
            data = np.load(path)
            applied = ([str(a) for a in data['applied']]
                       if 'applied' in data.files else [])
            return (CuckooFilter.from_table(data['table'], int(data['num_buckets'])),
                    bool(data['saturated']), applied)
        return CuckooFilter(num_buckets), False, []

    @staticmethod
    def _save_shard(path: str, cf: 'CuckooFilter', saturated: bool,
                    applied: list) -> None:
        import os
        import uuid

        tmp = f'{path}.{uuid.uuid4().hex}.tmp.npz'
        np.savez(tmp, table=cf.table, num_buckets=np.int64(cf.num_buckets),
                 saturated=np.bool_(saturated),
                 applied=np.array(applied, dtype='U32'))
        os.replace(tmp, path)

    def exists(self) -> bool:
        """True if ANY shard file exists (an insert job only writes the
        shards that received keys)."""
        import os

        return any(f.startswith('shard_') and f.endswith('.npz')
                   for f in os.listdir(self.directory))

    def any_saturated(self) -> bool:
        sat = False
        for s in range(self.n_shards):
            _, s_sat, _ = self._load_shard(self._path(s), self.num_buckets_per_shard)
            sat |= s_sat
        return sat

    # -- distributed maintenance ---------------------------------------------

    def _shard_col(self, hash_col: str):
        return F.pmod(F.shiftrightunsigned(F.col(hash_col), 32),
                      F.lit(self.n_shards)).cast('int')

    def _apply(self, df: DataFrame, hash_col: str, op: str,
               apply_id: str | None = None) -> list:
        """One grouped-map job: per shard, load → bulk op → atomic save.
        Returns the collected per-shard summaries (≤ n_shards tiny rows).

        ``apply_id`` identifies the logical operation: a shard whose file
        already records it no-ops (task retry / speculative re-execution
        after a completed rename must not double-insert — see the class
        docstring). Minted once per call on the DRIVER so every attempt
        of a shard task shares it."""
        import uuid

        buckets = self.num_buckets_per_shard
        keep = self._APPLIED_KEEP
        path_of = self._path
        load, save = self._load_shard, self._save_shard
        if apply_id is None:
            apply_id = uuid.uuid4().hex

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf['_shard'].iloc[0])
            cf, saturated, applied = load(path_of(shard), buckets)
            if apply_id in applied:
                return pd.DataFrame({'shard': [shard], 'n_changed': [0],
                                     'saturated': [saturated]})
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            if op == 'insert':
                if cf.insert(h) > 0:
                    saturated = True
                n_changed = len(h)
            else:
                n_changed = cf.delete(h)
            applied = (applied + [apply_id])[-keep:]
            save(path_of(shard), cf, saturated, applied)
            return pd.DataFrame({'shard': [shard], 'n_changed': [n_changed],
                                 'saturated': [saturated]})

        keyed = df.select(F.col(hash_col)).withColumn('_shard', self._shard_col(hash_col))
        return keyed.groupBy('_shard').applyInPandas(per_shard, self._SUMMARY_SCHEMA).collect()

    def insert_df(self, df: DataFrame, hash_col: str = 'url_hash',
                  apply_id: str | None = None) -> bool:
        """Bulk-insert the hashes of ``df`` executor-side; returns True if
        any shard is (now) saturated. ``apply_id`` (default: a fresh
        uuid per call) makes re-application of the same logical insert a
        no-op per shard."""
        rows = self._apply(df, hash_col, 'insert', apply_id)
        return any(r['saturated'] for r in rows)

    def delete_df(self, df: DataFrame, hash_col: str = 'url_hash',
                  apply_id: str | None = None) -> int:
        rows = self._apply(df, hash_col, 'delete', apply_id)
        return sum(r['n_changed'] for r in rows)

    # -- probe side ------------------------------------------------------------

    def load_tables(self) -> list[tuple[np.ndarray, int]]:
        """(table, num_buckets) per shard — the broadcast payload for
        :func:`anti_join_seen_cuckoo`'s membership UDF."""
        out = []
        for s in range(self.n_shards):
            cf, _, _ = self._load_shard(self._path(s), self.num_buckets_per_shard)
            out.append((cf.table, cf.num_buckets))
        return out

    @staticmethod
    def contains_tables(tables: list, hashes: np.ndarray, n_shards: int) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        if n_shards == 1:
            table, nb = tables[0]
            return CuckooFilter.from_table(table, nb).contains(hashes)
        sh = ((hashes.astype(np.uint64) >> np.uint64(32)) % np.uint64(n_shards)).astype(np.int64)
        for s in np.unique(sh):
            table, nb = tables[s]
            sel = sh == s
            out[sel] = CuckooFilter.from_table(table, nb).contains(hashes[sel])
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Driver-side probe (tests / small sets)."""
        return self.contains_tables(self.load_tables(), hashes, self.n_shards)


def sizing_for(expected: int, target_fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate."""
    num_bits = int(-expected * math.log(target_fpp) / (math.log(2) ** 2))
    num_hashes = max(1, round(num_bits / max(expected, 1) * math.log(2)))
    return _next_pow2(num_bits), num_hashes
