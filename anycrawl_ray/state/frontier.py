"""Sharded URL frontier + seen-set — the stateful heart of the crawl engine.

Replaces the reference's four state stores (Crawlee RequestQueueV2 on disk,
Redis progress hash, SQL job counters, BullMQ job data — SURVEY.md §3.2)
with a pool of Ray actors plus a thin driver-side facade:

- **seen-set sharding** by ``url_key % num_shards`` (uniform): each shard
  holds a cuckoo filter fast path + exact key set (see state/cuckoo.py),
  reproducing RequestQueueV2's exact uniqueKey dedup (Base.ts:412-420)
  with first-sight-wins semantics (SURVEY.md §2.7);
- **queue sharding** by ``host_hash % num_shards`` (locality): per-(job,
  host) FIFO deques holding breadth-first ``(depth, host_seq)``-ordered
  entries — per-host FIFO politeness (north_rule);
- per-shard counters replace the Redis progress hash
  (packages/scrape/src/managers/Progress.ts:8-18).

**Deterministic admission order** (SURVEY.md §7.1): each epoch the crawl
driver offers candidate links grouped per parent page, parents in admission
order, links in DOM order. The facade assigns the global
``discovered_seq`` in that order — exactly the admission order the
reference produces at ``maxConcurrency=1``. Seed URLs are admitted
*without* entering the seen set (the reference seeds with a
``randomUUID()-`` uniqueKey that never dedups,
packages/scrape/src/managers/EngineQueue.ts:122-127), so a crawled link
back to the seed is re-admitted — faithfully reproduced here.

**Limit semantics** (Base.ts:324-337 + EngineConfigurator.ts:63-136): a
parent whose pre-enqueue check sees ``enqueued >= limit`` enqueues nothing
(its links never touch the seen set); a parent that starts under the limit
enqueues ALL its new links (the per-call cap equals the job limit). The
fetch gate (``done >= limit``) lives in the crawl driver.

**Two-pass dedup, no rollback**: pass 1 is a read-only ``contains`` fan-out
to key shards; the driver then walks parent groups in order simulating the
limit gate exactly; pass 2 inserts only the truly admitted keys and
enqueues them on host shards. Epoch-synchronous execution makes this free
of write races by construction.

**Scale path**: payloads are columnar; one epoch costs two bounded RPC
fan-outs per shard. Hot hosts: ``take_wave`` budgets per host per wave, so
a hot host streams at its politeness rate while other hosts fill the wave
(SURVEY.md §4 skew row). Checkpoint/resume: per-shard snapshot blobs + a
JSON manifest written atomically (tmp dir + rename); ``restore`` rebuilds
the pool from the latest manifest (north_rule resumability).
"""

from __future__ import annotations

import json
import os
import pickle
import threading
from collections import defaultdict, deque

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urls import canonicalize, host_of, xxh64
from .cuckoo import CuckooFilter

WAVE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        ("url_key", pa.uint64()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("job_id", pa.string()),
        ("parent_url", pa.string()),
        ("discovered_seq", pa.int64()),
        ("host_seq", pa.int64()),
    ]
)

_WAVE_FIELDS = WAVE_SCHEMA.names

# shard take_wave output: _ENTRY_FIELDS columns + host (job_id implied)
_EMPTY_SHARD_WAVE = pa.table({
    "depth": pa.array([], pa.int32()),
    "host_seq": pa.array([], pa.int64()),
    "discovered_seq": pa.array([], pa.int64()),
    "url": pa.array([], pa.string()),
    "canonical_url": pa.array([], pa.string()),
    "url_key": pa.array([], pa.uint64()),
    "parent_url": pa.array([], pa.string()),
    "host": pa.array([], pa.string()),
})

# process-unique spill-file naming: id(self) alone collides across actor
# processes sharing one spill_dir (identically-initialized workers reuse
# addresses); pid + a per-process counter is unique while processes live
_SPILL_COUNTER = [0]


def _link_or_copy(src: str, dst: str) -> None:
    """Hardlink when possible (spill files are immutable once written and
    unlink only drops a directory entry), byte-copy across filesystems.

    Only link-incapability errors fall back to copy; anything else (notably
    FileExistsError from a name collision) propagates — silently overwriting
    the destination would mask data loss."""
    import errno

    try:
        os.link(src, dst)
    except OSError as e:
        if e.errno not in (errno.EXDEV, errno.EPERM, errno.EACCES,
                           errno.ENOTSUP, errno.ENOSYS,
                           getattr(errno, "EOPNOTSUPP", errno.ENOTSUP),
                           errno.EMLINK):
            raise
        import shutil as _sh

        _sh.copyfile(src, dst)


def _spill_name(kind: str) -> str:
    _SPILL_COUNTER[0] += 1
    return f"{kind}_{os.getpid()}_{_SPILL_COUNTER[0]}.pkl"

# queue-entry tuple layout (single source of truth for the pack/unpack
# sites below and the (depth, seq) sort in next_wave)
_ENTRY_FIELDS = ("depth", "host_seq", "discovered_seq", "url",
                 "canonical_url", "url_key", "parent_url")
_E_DEPTH, _E_HOST_SEQ, _E_SEQ = 0, 1, 2


def _entry_from_rows(rows: dict, i: int) -> tuple:
    return tuple(rows[f][i] for f in _ENTRY_FIELDS)


def _append_wave_row(rows: dict, *, url: str, canon: str, key: int, host: str,
                     depth: int, job_id: str, parent: str, seq: int,
                     hseq: int) -> None:
    rows["url"].append(url)
    rows["canonical_url"].append(canon)
    rows["url_key"].append(key)
    rows["host"].append(host)
    rows["depth"].append(depth)
    rows["job_id"].append(job_id)
    rows["parent_url"].append(parent)
    rows["discovered_seq"].append(seq)
    rows["host_seq"].append(hseq)


class SpillQueue:
    """FIFO queue with disk-spilled middle segments (ARCHITECTURE.md §2:
    a 10^10-entry pending frontier is ~1 TB — only the head and the
    freshest tail stay in memory).

    Order invariant: ``head ++ segments (oldest first) ++ tail``.
    ``appendleft`` targets the head (wave-overflow requeue), ``append``
    the tail (new admissions), ``popleft`` drains head, then segments in
    order, then tail — byte-identical ordering to a plain deque (tests
    compare against one)."""

    __slots__ = ("head", "tail", "segments", "seg_counts", "spill_dir",
                 "segment_size")

    def __init__(self, spill_dir: str | None = None, segment_size: int = 1024,
                 items=()):
        self.head: deque = deque(items)
        self.tail: deque = deque()
        self.segments: list[str] = []
        self.seg_counts: list[int] = []
        self.spill_dir = spill_dir
        self.segment_size = segment_size

    def append(self, item) -> None:
        self.tail.append(item)
        if self.spill_dir is not None and len(self.tail) >= self.segment_size:
            self._flush_tail()

    def appendleft(self, item) -> None:
        self.head.appendleft(item)

    def _flush_tail(self) -> None:
        os.makedirs(self.spill_dir, exist_ok=True)
        path = os.path.join(self.spill_dir, _spill_name("seg"))
        with open(path, "wb") as f:
            pickle.dump(list(self.tail), f)
        self.segments.append(path)
        self.seg_counts.append(len(self.tail))
        self.tail.clear()

    def popleft(self):
        if not self.head:
            if self.segments:
                path = self.segments.pop(0)
                self.seg_counts.pop(0)
                with open(path, "rb") as f:
                    self.head.extend(pickle.load(f))
                os.unlink(path)
            elif self.tail:
                self.head, self.tail = self.tail, self.head
        return self.head.popleft()

    def __len__(self) -> int:
        return len(self.head) + sum(self.seg_counts) + len(self.tail)

    def __bool__(self) -> bool:
        return len(self) > 0

    def __iter__(self):
        yield from self.head
        for path in self.segments:
            with open(path, "rb") as f:
                yield from pickle.load(f)
        yield from self.tail

    @property
    def spilled_entries(self) -> int:
        return sum(self.seg_counts)


class SeenStore:
    """Exact seen-set for one (shard, job): in-memory delta + sorted runs
    flushed to disk (ARCHITECTURE.md §2's disk-resident exact side).

    Only consulted on cuckoo-filter positives, so run lookups are rare
    (~FP-rate x candidate rate). A run stores its sorted key array on
    disk; memory holds (path, min, max, count) plus a one-run read cache.
    Values (canonical url, first_seen_seq) ride along for the ``seen``
    table export."""

    __slots__ = ("delta", "runs", "spill_dir", "threshold",
                 "_cache_path", "_cache_keys")

    def __init__(self, spill_dir: str | None, threshold: int):
        self.delta: dict[int, tuple[str, int]] = {}
        self.runs: list[tuple[str, int, int, int]] = []  # (path, min, max, n)
        self.spill_dir = spill_dir
        self.threshold = threshold
        self._cache_path: str | None = None
        self._cache_keys = None

    def __contains__(self, k: int) -> bool:
        if k in self.delta:
            return True
        for path, lo, hi, _n in self.runs:
            if lo <= k <= hi and self._run_has(path, k):
                return True
        return False

    def _run_has(self, path: str, k: int) -> bool:
        if self._cache_path != path:
            with open(path, "rb") as f:
                self._cache_keys = pickle.load(f)["keys"]
            self._cache_path = path
        keys = self._cache_keys
        import bisect

        i = bisect.bisect_left(keys, k)
        return i < len(keys) and keys[i] == k

    def add(self, k: int, url: str, seq: int) -> None:
        self.delta[k] = (url, seq)
        if self.spill_dir is not None and len(self.delta) >= self.threshold:
            self.flush()

    def flush(self) -> None:
        if not self.delta:
            return
        os.makedirs(self.spill_dir, exist_ok=True)
        items = sorted(self.delta.items())
        path = os.path.join(self.spill_dir, _spill_name("seen"))
        with open(path, "wb") as f:
            pickle.dump({"keys": [k for k, _ in items],
                         "vals": [v for _, v in items]}, f)
        self.runs.append((path, items[0][0], items[-1][0], len(items)))
        self.delta = {}

    def items(self):
        for path, *_ in self.runs:
            with open(path, "rb") as f:
                data = pickle.load(f)
            yield from zip(data["keys"], data["vals"])
        yield from self.delta.items()

    def __len__(self) -> int:
        return len(self.delta) + sum(n for *_x, n in self.runs)


class ShardState:
    """Pure-Python shard logic (actor-wrapped below; used inline in tests)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 17,
                 spill_dir: str | None = None,
                 spill_segment_size: int = 4096,
                 seen_spill_threshold: int = 1 << 30) -> None:
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity, seed=1000 + shard_id)
        # keys the saturated filter rejected — checked alongside the filter
        # so a full filter degrades to exact lookups, never to missed dedup
        self.overflow: set[int] = set()
        # exact authoritative seen set: delta + disk runs per job
        self._seen_threshold = seen_spill_threshold
        self.seen: dict[str, SeenStore] = defaultdict(
            lambda: SeenStore(spill_dir, seen_spill_threshold)
        )
        # per-(job, host) FIFO queues of pending entries (disk-spilled
        # middles when spill_dir is set)
        self._spill_dir = spill_dir
        self._spill_segment_size = spill_segment_size
        self.queues: dict[tuple[str, str], SpillQueue] = defaultdict(
            lambda: SpillQueue(spill_dir, spill_segment_size)
        )
        self.counters: dict[str, dict[str, int]] = defaultdict(
            lambda: {"enqueued": 0, "done": 0, "succeeded": 0, "failed": 0,
                     "bytes_fetched": 0, "credits_used": 0}
        )

    # -- seen-set (key-sharded calls) ------------------------------------
    def contains(self, job_id: str, keys: list[int]) -> list[bool]:
        """Membership probe: cuckoo-filter negative short-circuits; positive
        confirmed against the exact set (keeps semantics exact)."""
        job_seen = self.seen.get(job_id)
        if job_seen is None:
            return [False] * len(keys)
        return [
            (k in job_seen) if (self.filter.contains(k) or k in self.overflow)
            else False
            for k in keys
        ]

    def contains_np(self, job_id: str, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: one batched cuckoo pass; only
        filter-positives (true hits + ~0.003% FPs) pay the exact-set
        lookup. Returns a bool array aligned with ``keys``."""
        job_seen = self.seen.get(job_id)
        if job_seen is None:
            return np.zeros(len(keys), dtype=bool)
        maybe = self.filter.contains_batch(keys)
        if self.overflow:
            ov = np.fromiter(self.overflow, dtype=np.uint64,
                             count=len(self.overflow))
            maybe |= np.isin(keys, ov)
        out = np.zeros(len(keys), dtype=bool)
        for i in np.flatnonzero(maybe).tolist():
            out[i] = int(keys[i]) in job_seen
        return out

    def insert_seen(self, job_id: str, keys: list[int], urls: list[str],
                    seqs: list[int]) -> None:
        job_seen = self.seen[job_id]
        for k, u, s in zip(keys, urls, seqs):
            if k not in job_seen:
                if not self.filter.insert(k):
                    self.overflow.add(k)
                job_seen.add(k, u, s)

    def apply_writes(self, job_id: str, insert, enq_rows, done) -> None:
        """Fused write RPC: one round carries this shard's seen inserts
        (``insert`` = (keys, urls, seqs) or None), queue enqueues
        (``enq_rows`` dict or None) and completion accounting (``done`` =
        (n_ok, n_fail, nbytes, credits) or None). Exactly equivalent to
        the three separate calls — fusing only cuts driver dispatch count
        (the serial Amdahl term of the crawl's consume path)."""
        if insert is not None:
            self.insert_seen(job_id, *insert)
        if enq_rows is not None:
            self.enqueue(enq_rows)
        if done is not None:
            self.mark_done(job_id, *done)

    # -- queues (host-sharded calls) -------------------------------------
    def enqueue(self, rows: dict) -> int:
        n = len(rows["url"])
        for i in range(n):
            job = rows["job_id"][i]
            self.queues[(job, rows["host"][i])].append(_entry_from_rows(rows, i))
            self.counters[job]["enqueued"] += 1
        return n

    def enqueue_front(self, rows: dict) -> int:
        """Push rows back to the FRONT of their host queues preserving order
        (used when a wave budget truncates an already-popped wave)."""
        n = len(rows["url"])
        for i in range(n - 1, -1, -1):
            job = rows["job_id"][i]
            self.queues[(job, rows["host"][i])].appendleft(_entry_from_rows(rows, i))
        return n

    def take_wave(self, job_id: str, per_host_budget: int) -> pa.Table:
        """Pop up to ``per_host_budget`` entries per host (FIFO) and return
        them as an Arrow table SORTED by (depth, discovered_seq). No shard-
        local total cap: a cap here would select by queue-insertion order
        and starve earlier-discovered URLs on later-created queues (the
        facade is the only truncation point — it merges the pre-sorted
        shard tables and front-requeues overflow). Returning Arrow keeps
        wave assembly off the driver: the per-entry Python cost (queue
        tuples -> columns) is paid HERE, in parallel across shards, and
        the facade only does vectorized merges/gathers. Wave size is
        bounded by budget x live hosts; finite politeness bounds it."""
        entries: list[tuple] = []
        hosts: list[str] = []
        for (job, host), q in list(self.queues.items()):
            if job != job_id or not q:
                continue
            take = min(per_host_budget, len(q))
            for _ in range(take):
                entries.append(q.popleft())
            hosts.extend([host] * take)
        if not entries:
            return _EMPTY_SHARD_WAVE
        depth, hseq, seq, url, canon, key, parent = map(list, zip(*entries))
        t = pa.table({
            "depth": pa.array(depth, pa.int32()),
            "host_seq": pa.array(hseq, pa.int64()),
            "discovered_seq": pa.array(seq, pa.int64()),
            "url": pa.array(url, pa.string()),
            "canonical_url": pa.array(canon, pa.string()),
            "url_key": pa.array(key, pa.uint64()),
            "parent_url": pa.array(parent, pa.string()),
            "host": pa.array(hosts, pa.string()),
        })
        order = np.lexsort((np.asarray(t.column("discovered_seq"),
                                       dtype=np.int64),
                            np.asarray(t.column("depth"), dtype=np.int64)))
        return t.take(pa.array(order))

    def pending_count(self, job_id: str) -> int:
        return sum(len(q) for (job, _h), q in self.queues.items() if job == job_id)

    def mark_done(self, job_id: str, n_ok: int, n_fail: int, nbytes: int, credits: int) -> None:
        c = self.counters[job_id]
        c["done"] += n_ok + n_fail
        c["succeeded"] += n_ok
        c["failed"] += n_fail
        c["bytes_fetched"] += nbytes
        c["credits_used"] += credits

    def stats(self, job_id: str) -> dict[str, int]:
        return dict(self.counters[job_id])

    def dispose_spill_files(self) -> None:
        """Unlink this state's spill artifacts (called before the state is
        replaced on restore — otherwise dead segment/run files accumulate
        in spill_dir forever)."""
        for q in self.queues.values():
            for path in q.segments:
                try:
                    os.unlink(path)
                except OSError:
                    pass
            q.segments.clear()
            q.seg_counts.clear()
        for store in self.seen.values():
            for path, *_x in store.runs:
                try:
                    os.unlink(path)
                except OSError:
                    pass
            store.runs.clear()

    def seen_rows(self, job_id: str) -> dict:
        job_seen = self.seen.get(job_id)
        items = list(job_seen.items()) if job_seen is not None else []
        return {
            "job_id": [job_id] * len(items),
            "url_key": [k for k, _ in items],
            "canonical_url": [v[0] for _, v in items],
            "first_seen_seq": [v[1] for _, v in items],
        }

    # -- checkpoint -------------------------------------------------------
    def snapshot(self, file_dir: str | None = None) -> bytes:
        """Serialize shard state. With ``file_dir`` (a checkpoint directory
        on storage this process can write), spilled queue segments and seen
        runs are COPIED as files and referenced by name — the blob stays
        O(in-memory state) instead of materializing the whole spilled
        frontier (ARCHITECTURE.md §2 checkpoint-cost contract). Without
        ``file_dir`` everything inlines into the blob (small states)."""
        if file_dir is None:
            seen = {j: {"delta": list(store.items()), "runs": []}
                    for j, store in self.seen.items()}
            queues = {k: {"items": list(v), "segments": []}
                      for k, v in self.queues.items()}
        else:
            os.makedirs(file_dir, exist_ok=True)

            def copy_file(path: str) -> str:
                base = f"sh{self.shard_id}_{os.path.basename(path)}"
                _link_or_copy(path, os.path.join(file_dir, base))
                return base

            seen = {}
            for j, store in self.seen.items():
                seen[j] = {
                    "delta": list(store.delta.items()),
                    "runs": [(copy_file(path), lo, hi, n)
                             for path, lo, hi, n in store.runs],
                }
            queues = {}
            for k, q in self.queues.items():
                queues[k] = {
                    "head": list(q.head),
                    "tail": list(q.tail),
                    "segments": [
                        (copy_file(path), n)
                        for path, n in zip(q.segments, q.seg_counts)
                    ],
                }
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "filter": self.filter.to_bytes(),
                "overflow": sorted(self.overflow),
                "seen": seen,
                "queues": queues,
                "counters": {j: dict(v) for j, v in self.counters.items()},
            }
        )

    @classmethod
    def from_snapshot(cls, blob: bytes, spill_dir: str | None = None,
                      spill_segment_size: int = 4096,
                      seen_spill_threshold: int = 1 << 30,
                      file_dir: str | None = None) -> "ShardState":
        data = pickle.loads(blob)
        obj = cls(data["shard_id"], spill_dir=spill_dir,
                  spill_segment_size=spill_segment_size,
                  seen_spill_threshold=seen_spill_threshold)
        obj.filter = CuckooFilter.from_bytes(data["filter"])
        obj.overflow = set(data.get("overflow", ()))

        def restore_file(base: str) -> str:
            # re-materialize a checkpointed spill file into the live
            # spill_dir under a fresh name (popleft unlinks; the checkpoint
            # copy must stay intact for future restores). Never write into
            # the checkpoint dir itself — a later rmtree/unlink there would
            # corrupt either the live frontier or the checkpoint.
            target_dir = obj._spill_dir
            if target_dir is None:
                import tempfile

                target_dir = obj._spill_dir = tempfile.mkdtemp(
                    prefix="frontier_spill_")
            os.makedirs(target_dir, exist_ok=True)
            dest = os.path.join(target_dir, _spill_name("restored"))
            _link_or_copy(os.path.join(file_dir, base), dest)
            return dest

        for j, v in data["seen"].items():
            store = obj.seen[j]  # defaultdict creates with shard config
            if isinstance(v, dict) and "delta" not in v:
                v = {"delta": list(v.items()), "runs": ()}  # pre-SeenStore dict
            elif isinstance(v, list):
                v = {"delta": v, "runs": ()}  # pre-file-reference list shape
            store.delta = {int(k): tuple(val) for k, val in v["delta"]}
            for base, lo, hi, n in v.get("runs", ()):
                store.runs.append((restore_file(base), lo, hi, n))
        for k, v in data["queues"].items():
            if isinstance(v, list):
                v = {"items": v}  # pre-file-reference list shape
            if "items" in v:
                q = SpillQueue(obj._spill_dir, obj._spill_segment_size,
                               (tuple(e) for e in v["items"]))
            else:
                q = SpillQueue(obj._spill_dir, obj._spill_segment_size,
                               (tuple(e) for e in v["head"]))
                for base, n in v.get("segments", ()):
                    q.segments.append(restore_file(base))
                    q.seg_counts.append(n)
                q.tail.extend(tuple(e) for e in v["tail"])
            obj.queues[k] = q
        for j, v in data["counters"].items():
            obj.counters[j].update(v)
        return obj


# Memoized shard-actor pools, keyed by ctor config. Spawning a shard actor
# is a fresh worker process (~80 ms each, serial ~0.6 s for 8 shards) paid
# per crawl before the first wave can start — pure parallelism-independent
# overhead. Pools are leased exclusively (a live Frontier owns the pool;
# concurrent Frontiers with the same config fall back to private actors)
# and reset to empty state on reuse. Only spill-less configs are memoized:
# file-backed state must never outlive its Frontier's spill_dir.
# All cache access holds _SHARD_POOLS_LOCK (the API server runs sync
# crawls in request threads), and release verifies the caller actually
# holds the cached actor list — otherwise thread A releasing its private
# fallback pool could unlease the entry thread B is mid-crawl on, letting
# a third crawl reset B's live shard state.
_SHARD_POOLS: dict[tuple, dict] = {}
_SHARD_POOLS_LOCK = threading.Lock()


def _lease_shard_pool(num_shards: int, capacity: int, spill_dir,
                      spill_segment_size: int, seen_spill_threshold: int):
    """Return an exclusive, freshly-reset shard-actor pool for this config
    (creating and caching one on miss), or None when the config is not
    memoizable (spill files) or the cached pool is busy/dead."""
    if spill_dir is not None:
        return None
    import ray

    key = (num_shards, capacity, spill_segment_size, seen_spill_threshold)
    with _SHARD_POOLS_LOCK:
        entry = _SHARD_POOLS.get(key)
        if entry is not None and entry["leased"]:
            return None
        if entry is not None:
            entry["leased"] = True  # claim before the un-locked reset RPC
    if entry is not None:
        try:
            ray.get([a.reset_all.remote() for a in entry["actors"]],
                    timeout=10)
        except Exception:  # dead actors (session restarted) — recreate
            with _SHARD_POOLS_LOCK:
                if _SHARD_POOLS.get(key) is entry:
                    del _SHARD_POOLS[key]
        else:
            return entry["actors"]
    cls = _make_actor_class()
    actors = [
        cls.options(num_cpus=0).remote(i, capacity, None,
                                       spill_segment_size,
                                       seen_spill_threshold)
        for i in range(num_shards)
    ]
    with _SHARD_POOLS_LOCK:
        if key not in _SHARD_POOLS:
            _SHARD_POOLS[key] = {"actors": actors, "leased": True}
        # a racing thread registered first: use our actors privately
        # (uncached — they die with the Frontier), leave its entry alone
    return actors


def _release_shard_pool(key: tuple, actors) -> None:
    with _SHARD_POOLS_LOCK:
        entry = _SHARD_POOLS.get(key)
        if entry is not None and entry["actors"] is actors:
            entry["leased"] = False


def close_shard_pools() -> None:
    """Kill every cached (unleased) shard-actor pool — end-of-phase
    cleanup so idle shard actors don't hold seen-set memory while
    unrelated Dataset stages run (bench.py calls this between its crawl
    and query phases). Leased pools are left alone."""
    import ray

    with _SHARD_POOLS_LOCK:
        keys = [k for k, e in _SHARD_POOLS.items() if not e["leased"]]
        entries = [_SHARD_POOLS.pop(k) for k in keys]
    for entry in entries:
        for a in entry["actors"]:
            try:
                ray.kill(a)
            except Exception:  # noqa: BLE001 — already dead
                pass


def _make_actor_class():
    import ray

    @ray.remote
    class FrontierShard:
        def __init__(self, shard_id: int, capacity: int,
                     spill_dir: str | None = None, spill_segment_size: int = 4096,
                     seen_spill_threshold: int = 1 << 30):
            self._ctor = (shard_id, capacity, spill_dir, spill_segment_size,
                          seen_spill_threshold)
            self.state = ShardState(shard_id, capacity, spill_dir,
                                    spill_segment_size, seen_spill_threshold)

        def reset_all(self):
            """Fresh state for pool reuse (same ctor config). Spill-less
            pools only — file-backed state is never memoized."""
            self.state = ShardState(*self._ctor)
            return True

        def contains(self, job_id, keys):
            return self.state.contains(job_id, keys)

        def contains_np(self, job_id, keys):
            return self.state.contains_np(job_id, keys)

        def insert_seen(self, job_id, keys, urls, seqs):
            return self.state.insert_seen(job_id, keys, urls, seqs)

        def apply_writes(self, job_id, insert, enq_rows, done):
            return self.state.apply_writes(job_id, insert, enq_rows, done)

        def enqueue(self, rows):
            return self.state.enqueue(rows)

        def enqueue_front(self, rows):
            return self.state.enqueue_front(rows)

        def take_wave(self, job_id, per_host_budget):
            return self.state.take_wave(job_id, per_host_budget)

        def pending_count(self, job_id):
            return self.state.pending_count(job_id)

        def mark_done(self, job_id, n_ok, n_fail, nbytes, credits):
            return self.state.mark_done(job_id, n_ok, n_fail, nbytes, credits)

        def stats(self, job_id):
            return self.state.stats(job_id)

        def seen_rows(self, job_id):
            return self.state.seen_rows(job_id)

        def snapshot(self, file_dir=None):
            return self.state.snapshot(file_dir)

        def dispose_spill(self):
            self.state.dispose_spill_files()
            return True

        def load_snapshot(self, blob, file_dir=None):
            # restored shards keep THIS shard's spill/seen configuration
            old = self.state
            old.dispose_spill_files()
            self.state = ShardState.from_snapshot(
                blob, old._spill_dir, old._spill_segment_size,
                old._seen_threshold, file_dir=file_dir)
            return True

    return FrontierShard


def _empty_rows() -> dict[str, list]:
    return {f: [] for f in _WAVE_FIELDS}


class AdmissionLog:
    """Bounded-memory admission record (seq, url, canon, depth, parent).

    Modes:
    - ``enabled=False``: appends are no-ops (production crawls that don't
      need the golden-order table pay nothing);
    - ``spool_dir`` set: buffers spill to disk in pickle segments past
      ``spool_threshold`` entries — driver memory stays O(threshold);
    - neither: plain in-memory list (tests / small jobs).
    """

    def __init__(self, enabled: bool = True, spool_dir: str | None = None,
                 spool_threshold: int = 1 << 20) -> None:
        self.enabled = enabled
        self.spool_dir = spool_dir
        self.spool_threshold = spool_threshold
        self._buf: dict[str, list[tuple]] = defaultdict(list)
        self._segments: dict[str, list[str]] = defaultdict(list)

    def _maybe_spool(self, job_id: str, buf: list) -> None:
        if self.spool_dir is not None and len(buf) >= self.spool_threshold:
            os.makedirs(self.spool_dir, exist_ok=True)
            path = os.path.join(self.spool_dir, _spill_name("admlog"))
            with open(path, "wb") as f:
                pickle.dump(buf, f, protocol=pickle.HIGHEST_PROTOCOL)
            self._segments[job_id].append(path)
            buf.clear()

    def append(self, job_id: str, row: tuple) -> None:
        if not self.enabled:
            return
        buf = self._buf[job_id]
        buf.append(row)
        self._maybe_spool(job_id, buf)

    def extend(self, job_id: str, rows: list[tuple]) -> None:
        if not self.enabled or not rows:
            return
        buf = self._buf[job_id]
        if self.spool_dir is None:
            buf.extend(rows)
            return
        # chunked so spooled segments stay ~threshold-sized (bounded
        # read-back memory, same as the per-append path)
        step = max(1, self.spool_threshold - len(buf))
        i = 0
        while i < len(rows):
            buf.extend(rows[i:i + step])
            self._maybe_spool(job_id, buf)
            i += step
            step = self.spool_threshold

    def rows(self, job_id: str) -> list[tuple]:
        """All admissions in seq order (segments were flushed in order)."""
        out: list[tuple] = []
        for path in self._segments.get(job_id, []):
            with open(path, "rb") as f:
                out.extend(pickle.load(f))
        out.extend(self._buf.get(job_id, []))
        return out

    def dispose(self) -> None:
        for paths in self._segments.values():
            for p in paths:
                try:
                    os.unlink(p)
                except OSError:
                    pass
        self._segments.clear()
        self._buf.clear()


class Frontier:
    """Driver-side facade over the shard pool.

    ``use_actors=False`` runs shards inline (unit tests / the conformance
    oracle run without a Ray session); semantics are identical — actors
    distribute the memory and CPU of dedup at scale.
    """

    def __init__(self, num_shards: int = 4, capacity_per_shard: int = 1 << 17,
                 use_actors: bool = True, hot_host_lane_size: int = 1 << 30,
                 spill_dir: str | None = None,
                 spill_segment_size: int = 4096,
                 seen_spill_threshold: int = 1 << 30,
                 record_admissions: bool = True,
                 admission_spool_threshold: int = 1 << 20,
                 seen_mirror_limit: int = 8_000_000) -> None:
        """``hot_host_lane_size``: north_rule skew control — a host's queue
        entries are split into lanes of this many URLs, lane ``k`` routed to
        shard ``hash(host + '#' + k)``. A hot domain therefore spreads over
        shards instead of pinning one actor's memory/CPU, while global
        admission order is untouched (next_wave sorts by (depth, seq)) and
        per-host FIFO is preserved (lane index is monotone in host_seq; the
        global sort interleaves lanes back into seq order). Default = no
        splitting (determinism fixtures). ``spill_dir`` enables disk-spilled
        queue middles (SpillQueue)."""
        self._spill_dir = spill_dir
        self._spill_segment_size = spill_segment_size
        self._seen_spill_threshold = seen_spill_threshold
        self.num_shards = num_shards
        self.use_actors = use_actors
        self.hot_host_lane_size = hot_host_lane_size
        self._pool_key = None
        if use_actors:
            self.shards = _lease_shard_pool(
                num_shards, capacity_per_shard, spill_dir,
                spill_segment_size, seen_spill_threshold)
            if self.shards is not None:
                self._pool_key = (num_shards, capacity_per_shard,
                                  spill_segment_size, seen_spill_threshold)
            else:
                cls = _make_actor_class()
                # num_cpus=0: shard work is tiny bookkeeping and
                # parallelism is bounded by num_shards; a CPU reservation
                # would let idle shards starve Dataset stages in small
                # sessions (observed deadlock at num_cpus=2 with 8 shards
                # at 0.25 each)
                self.shards = [
                    cls.options(num_cpus=0).remote(i, capacity_per_shard,
                                                   spill_dir,
                                                   spill_segment_size,
                                                   seen_spill_threshold)
                    for i in range(num_shards)
                ]
        else:
            self.shards = [
                ShardState(i, capacity_per_shard, spill_dir, spill_segment_size,
                           seen_spill_threshold)
                for i in range(num_shards)
            ]
        # driver-held admission state (authoritative, checkpointed)
        self.next_seq: dict[str, int] = defaultdict(int)
        self.host_seq: dict[tuple[str, str], int] = defaultdict(int)
        self.enqueued: dict[str, int] = defaultdict(int)
        # diagnostic admission log (golden_order oracle; not checkpointed).
        # Bounded: spools segments to spill_dir past the threshold, so a
        # 10^9-URL crawl does not hold one driver tuple per admission
        self.admission_log = AdmissionLog(
            enabled=record_admissions, spool_dir=spill_dir,
            spool_threshold=admission_spool_threshold)
        # write RPCs whose results nobody reads (insert_seen / enqueue /
        # mark_done) are NOT gathered synchronously — Ray executes actor
        # tasks from one caller in submission order, so any later read on
        # the same shard observes them; gathering is deferred to the next
        # read barrier purely to bound in-flight futures and surface
        # errors. This takes the pass-2 RPC round-trip out of the driver's
        # serial admission path (the Amdahl term the 2->8 scaling pays).
        self._pending_writes: list = []
        # -- driver-side exact seen MIRROR: this facade is the seen-set's
        # SINGLE WRITER (every insert_seen RPC originates here; seeds
        # bypass seen by reference semantics), so a sorted-uint64 mirror
        # of the keys it has inserted is exact and lets the admission
        # probe run as a local searchsorted instead of a synchronous
        # per-key-shard RPC round (measured ~0.3 s/run of the crawl
        # driver's serial time at 8 cpus). Dual path, broadcast-limit
        # style: past ``seen_mirror_limit`` keys (8 bytes each; default
        # 64 MB) or after ``restore`` (shards hold state the driver never
        # saw) the mirror disables itself and probes fall back to the
        # sharded RPC pass — shards stay authoritative either way.
        self.seen_mirror_limit = seen_mirror_limit
        self._seen_mirror: dict[str, np.ndarray] = {}
        self._mirror_ok = True
        # accumulated completion accounting, flushed as a piggyback field
        # of the next fused apply_writes round (or at any read barrier):
        # (job_id, shard) -> [n_ok, n_fail, nbytes, credits]
        self._done_acc: dict[tuple[str, int], list[int]] = {}

    # -- shard RPC helpers -------------------------------------------------
    def _call(self, shard_idx: int, method: str, *args):
        shard = self.shards[shard_idx]
        if self.use_actors:
            return getattr(shard, method).remote(*args)
        return getattr(shard, method)(*args)

    def _gather(self, futures):
        if self.use_actors:
            import ray

            return ray.get(futures)
        return futures

    def _defer(self, futures) -> None:
        """Queue write futures for a later barrier gather (actor mode);
        in local mode the calls already ran synchronously."""
        if self.use_actors:
            self._pending_writes.extend(futures)
            if len(self._pending_writes) > 4096:
                self._drain_writes()

    def _drain_writes(self) -> None:
        self._flush_done()
        if self._pending_writes:
            pending, self._pending_writes = self._pending_writes, []
            self._gather(pending)

    def _flush_done(self) -> None:
        """Ship any accumulated mark_done counters that no apply_writes
        round has piggybacked yet (read barriers and job-boundary calls)."""
        if self._done_acc:
            acc, self._done_acc = self._done_acc, {}
            if self.use_actors:
                self._pending_writes.extend(
                    self._call(s, "mark_done", job, *vals)
                    for (job, s), vals in acc.items())
            else:
                for (job, s), vals in acc.items():
                    self._call(s, "mark_done", job, *vals)

    # -- seen mirror (driver-exact probe fast path) ------------------------
    def _mirror_contains(self, job_id: str, keys: np.ndarray):
        """Exact membership against the driver mirror, or None when the
        mirror is unavailable (post-restore / over the memory guard) and
        the caller must run the sharded RPC probe."""
        if not self._mirror_ok:
            return None
        arr = self._seen_mirror.get(job_id)
        if arr is None or arr.size == 0:
            return np.zeros(keys.size, dtype=bool)
        idx = np.searchsorted(arr, keys)
        hit = idx < arr.size
        hit[hit] = arr[idx[hit]] == keys[hit]
        return hit

    def _mirror_insert(self, job_id: str, keys_new: np.ndarray) -> None:
        if not self._mirror_ok or keys_new.size == 0:
            return
        arr = self._seen_mirror.get(job_id)
        merged = (np.sort(np.asarray(keys_new, dtype=np.uint64))
                  if arr is None else np.union1d(arr, keys_new))
        if merged.size > self.seen_mirror_limit:
            self._mirror_ok = False
            self._seen_mirror.clear()
        else:
            self._seen_mirror[job_id] = merged

    def _key_shard(self, k: int) -> int:
        return k % self.num_shards

    def _host_shard(self, host: str, host_seq: int = 0) -> int:
        lane = host_seq // self.hot_host_lane_size
        key = host if lane == 0 else f"{host}#{lane}"
        return xxh64(key) % self.num_shards

    # -- admission ---------------------------------------------------------
    def _admit(self, job_id: str, url: str, canon: str, key: int, depth: int,
               parent: str, admit_rows: dict[int, dict[str, list]]) -> None:
        host = host_of(canon)
        hseq = self.host_seq[(job_id, host)]
        self.host_seq[(job_id, host)] = hseq + 1
        seq = self.next_seq[job_id]
        self.next_seq[job_id] = seq + 1
        self.enqueued[job_id] += 1
        self.admission_log.append(job_id, (seq, url, canon, depth, parent))
        _append_wave_row(admit_rows[self._host_shard(host, hseq)], url=url,
                         canon=canon, key=key, host=host, depth=depth,
                         job_id=job_id, parent=parent, seq=seq, hseq=hseq)

    def add_seeds(self, job_id: str, urls: list[str]) -> int:
        """Admit seed URLs unconditionally, bypassing the seen set
        (EngineQueue.ts:122-127 random-uniqueKey behavior; enqueued counter
        +1 per seed, Worker.ts:150-152)."""
        admit_rows: dict[int, dict[str, list]] = defaultdict(_empty_rows)
        for u in urls:
            canon = canonicalize(u)
            self._admit(job_id, u, canon, xxh64(canon), 0, "", admit_rows)
        self._gather([self._call(s, "enqueue", r) for s, r in admit_rows.items()])
        return len(urls)

    def offer_groups(
        self,
        job_id: str,
        groups: list[tuple],
        limit: int | None = None,
    ) -> int:
        """Offer candidate links per parent page, in deterministic order.

        ``groups`` is ordered by parent admission order; each entry is
        ``(parent_url, child_urls_in_dom_order, child_depth)``, the
        5-tuple form ``(..., canonical_urls, xxh64_keys)``, or the 6-tuple
        form ``(..., hosts)`` with ALL per-URL string work pre-computed
        worker-side (the parse stage emits these). Scope / include /
        exclude / depth filtering happened upstream. Returns the number
        admitted. Semantics per module docstring (limit gate before dedup;
        first-sight-wins; per-call cap = limit).

        **Distributed-sequencer implementation** (ARCHITECTURE.md §2):
        candidates arrive already totally ordered by (parent admission
        order, DOM link position). The seen-probe fans out per key shard
        as ONE vectorized ``contains_np`` RPC each (batched cuckoo pass
        shard-side); within-batch first-sight-wins is a stable argsort
        rank; the limit gate is a per-group prefix-sum; ``discovered_seq``
        / ``host_seq`` are cumsum ranks over the admitted mask. The driver
        does no per-candidate Python — only O(#groups + #unique-hosts)
        bookkeeping plus numpy kernels — so admission throughput scales
        with shard count instead of capping at a driver loop (the round-2
        ceiling, ~56k admissions/s).

        **Why the prefix-sum gate is exact** (equivalence with the serial
        gate proven by the pinned test against ``_offer_groups_serial``):
        the gate is monotone — ``enqueued`` never decreases, so gated
        groups form a suffix. A plain cumsum over per-group pass-counts
        therefore flags exactly the real gated suffix: counts of gated
        groups only ever inflate the cumsum of LATER groups, which are
        gated either way. Dedup restricted to the non-gated prefix equals
        global first-occurrence restricted to that prefix, because a
        duplicate's first sighting can never be in a (later) gated group.
        """
        (urls_a, canons_a, keys, hosts_a, gis, glens, parents_g, depths_g
         ) = self._flatten_groups(groups, limit)
        return self._offer_flat(job_id, urls_a, canons_a, keys, hosts_a,
                                gis, glens, parents_g, depths_g, limit)

    def offer_table(self, job_id: str, parsed: pa.Table,
                    limit: int | None = None, allowed_fn=None) -> int:
        """``offer_groups`` over a parse-result wave table, flattened with
        Arrow kernels instead of nested ``to_pylist`` + a per-page Python
        loop (the driver's serial admission-prep cost — the Amdahl term
        the N->4N crawl scaling pays). One row = one parent page with
        ``url``/``depth`` and parallel list columns ``candidates`` /
        ``cand_canon`` / ``cand_key`` / ``cand_host`` (the parse stage's
        worker-side precompute); child depth = page depth + 1.

        ``allowed_fn`` (e.g. ``RobotsCache.allowed_batch``) maps the flat
        candidate-URL list to a keep-mask, applied BEFORE the per-call
        ``[:limit]`` slice — exactly where the per-group path filtered.
        Pinned equivalent to building one group per row and calling
        offer_groups (tests)."""
        cands = parsed.column("candidates").combine_chunks()
        flat_urls = pc.list_flatten(cands)
        if len(flat_urls) == 0:
            return 0
        gis = pc.list_parent_indices(cands).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_groups = parsed.num_rows
        urls_a = flat_urls.to_numpy(zero_copy_only=False)
        canons_a = pc.list_flatten(
            parsed.column("cand_canon").combine_chunks()).to_numpy(
            zero_copy_only=False)
        keys = pc.list_flatten(
            parsed.column("cand_key").combine_chunks()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        hosts_a = pc.list_flatten(
            parsed.column("cand_host").combine_chunks()).to_numpy(
            zero_copy_only=False)
        if allowed_fn is not None:
            keep = np.asarray(allowed_fn(urls_a.tolist()), dtype=bool)
            urls_a, canons_a = urls_a[keep], canons_a[keep]
            keys, hosts_a, gis = keys[keep], hosts_a[keep], gis[keep]
            if gis.size == 0:
                return 0
        if limit is not None and gis.size:
            # per-call Crawlee slice: first `limit` candidates PER GROUP
            # (gis is ascending; rank = position within its group run)
            starts = np.concatenate(
                ([0], np.flatnonzero(gis[1:] != gis[:-1]) + 1))
            run_id = np.cumsum(np.concatenate(
                ([True], gis[1:] != gis[:-1]))) - 1
            rank = np.arange(gis.size, dtype=np.int64) - starts[run_id]
            m = rank < limit
            if not m.all():
                urls_a, canons_a = urls_a[m], canons_a[m]
                keys, hosts_a, gis = keys[m], hosts_a[m], gis[m]
        glens = np.bincount(gis, minlength=n_groups).astype(np.int64)
        parents_g = parsed.column("url").to_numpy(zero_copy_only=False)
        depths_g = parsed.column("depth").to_numpy(
            zero_copy_only=False).astype(np.int64) + 1
        return self._offer_flat(job_id, urls_a, canons_a, keys, hosts_a,
                                gis, glens, parents_g, depths_g, limit)

    def _offer_flat(self, job_id: str, urls_a, canons_a, keys, hosts_a,
                    gis, glens, parents_g, depths_g,
                    limit: int | None) -> int:
        n = keys.size
        if n == 0:
            return 0
        # pass 1: membership probe — local searchsorted against the exact
        # driver mirror when available (no RPC round-trip at all), else
        # the vectorized read-only probe per key shard
        shard_ids = (keys % np.uint64(self.num_shards)).astype(np.int64)
        in_seen = self._mirror_contains(job_id, keys)
        if in_seen is None:
            in_seen = np.zeros(n, dtype=bool)
            futures, order = [], []
            for s in range(self.num_shards):
                idx = np.flatnonzero(shard_ids == s)
                if idx.size:
                    futures.append(
                        self._call(s, "contains_np", job_id, keys[idx]))
                    order.append(idx)
            for idx, res in zip(order, self._gather(futures)):
                in_seen[idx] = res
        # within-batch first occurrence per key (stable sort = flat order)
        sort_idx = np.argsort(keys, kind="stable")
        sk = keys[sort_idx]
        first_sorted = np.empty(n, dtype=bool)
        first_sorted[0] = True
        first_sorted[1:] = sk[1:] != sk[:-1]
        is_first = np.empty(n, dtype=bool)
        is_first[sort_idx] = first_sorted
        passes = ~in_seen & is_first
        # limit gate: per-group prefix-sum (exactness argued above)
        if limit is not None:
            counts = np.bincount(gis[passes], minlength=len(glens))
            cum_before = self.enqueued[job_id] + np.concatenate(
                ([0], np.cumsum(counts)[:-1]))
            admitted = passes & (cum_before < limit)[gis]
        else:
            admitted = passes
        adm = np.flatnonzero(admitted)
        n_adm = int(adm.size)
        if n_adm == 0:
            return 0
        urls_adm = urls_a[adm]
        canons_adm = canons_a[adm]
        keys_adm = keys[adm]
        hosts_adm = hosts_a[adm]
        depths_adm = np.repeat(np.asarray(depths_g, dtype=np.int64), glens)[adm]
        parents_adm = np.repeat(np.asarray(parents_g, dtype=object), glens)[adm]
        # dense discovered_seq = admission rank + persistent base
        base = self.next_seq[job_id]
        seqs = base + np.arange(n_adm, dtype=np.int64)
        self.next_seq[job_id] = base + n_adm
        self.enqueued[job_id] += n_adm
        # host_seq = within-host admission rank + persistent per-host base
        uniq_hosts, inv = np.unique(hosts_adm, return_inverse=True)
        host_counts = np.bincount(inv)
        by_host = np.argsort(inv, kind="stable")
        group_starts = np.concatenate(([0], np.cumsum(host_counts)[:-1]))
        hseqs = np.empty(n_adm, dtype=np.int64)
        hseqs[by_host] = np.arange(n_adm) - np.repeat(group_starts, host_counts)
        uniq_list = uniq_hosts.tolist()
        bases = np.array(
            [self.host_seq[(job_id, h)] for h in uniq_list], dtype=np.int64)
        hseqs += bases[inv]
        for h, c in zip(uniq_list, host_counts.tolist()):
            self.host_seq[(job_id, h)] += c
        if self.admission_log.enabled:
            self.admission_log.extend(job_id, list(zip(
                seqs.tolist(), urls_adm.tolist(), canons_adm.tolist(),
                depths_adm.tolist(), parents_adm.tolist())))
        # route: host shard per admitted candidate (hot-host lane split)
        host_hashes = np.array(
            [xxh64(h) for h in uniq_list], dtype=np.uint64)
        host_shards = (host_hashes[inv] % np.uint64(self.num_shards)
                       ).astype(np.int64)
        if self.hot_host_lane_size < (1 << 62):
            lanes = hseqs // self.hot_host_lane_size
            for i in np.flatnonzero(lanes > 0).tolist():
                host_shards[i] = xxh64(
                    f"{hosts_adm[i]}#{lanes[i]}") % self.num_shards
        # pass 2: persist seen inserts (key shards) + enqueue (host shards)
        # + any accumulated completion counters, fused into ONE apply_writes
        # RPC per touched shard (driver dispatch is the serial cost here)
        self._mirror_insert(job_id, keys_adm)
        key_shards = shard_ids[adm]
        inserts: dict[int, tuple] = {}
        for s in np.unique(key_shards):
            m = key_shards == s
            inserts[int(s)] = (keys_adm[m].tolist(), canons_adm[m].tolist(),
                               seqs[m].tolist())
        nj = [job_id]  # broadcast-multiply below keeps one string object
        enqueues: dict[int, dict] = {}
        for s in np.unique(host_shards):
            m = host_shards == s
            enqueues[int(s)] = {
                "url": urls_adm[m].tolist(),
                "canonical_url": canons_adm[m].tolist(),
                "url_key": keys_adm[m].tolist(),
                "host": hosts_adm[m].tolist(),
                "depth": depths_adm[m].tolist(),
                "job_id": nj * int(m.sum()),
                "parent_url": parents_adm[m].tolist(),
                "discovered_seq": seqs[m].tolist(),
                "host_seq": hseqs[m].tolist(),
            }
        dones = {s: self._done_acc.pop((job_id, s))
                 for (j, s) in list(self._done_acc)
                 if j == job_id}
        futures = [
            self._call(s, "apply_writes", job_id, inserts.get(s),
                       enqueues.get(s), tuple(dones[s]) if s in dones else None)
            for s in sorted(set(inserts) | set(enqueues) | set(dones))
        ]
        self._defer(futures)
        return n_adm

    @staticmethod
    def _flatten_groups(groups: list[tuple], limit: int | None):
        """Flatten parent groups into columnar arrays in candidate order.
        Applies the Crawlee per-call slice (``children[:limit]`` BEFORE
        dedup) and fills canon/key/host for the unprepared tuple forms."""
        urls_l: list[str] = []
        canons_l: list[str] = []
        keys_l: list[int] = []
        hosts_l: list[str] = []
        glens: list[int] = []
        parents_g: list[str] = []
        depths_g: list[int] = []
        for grp in groups:
            hosts = None
            if len(grp) == 6:
                parent, children, depth, canons, keys, hosts = grp
            elif len(grp) == 5:
                parent, children, depth, canons, keys = grp
            else:
                parent, children, depth = grp
                canons = [canonicalize(u) for u in children]
                keys = [xxh64(c) for c in canons]
            if limit is not None:
                children = children[:limit]
                canons = canons[:limit]
                keys = keys[:limit]
                if hosts is not None:
                    hosts = hosts[:limit]
            if hosts is None:
                hosts = [host_of(c) for c in canons]
            parents_g.append(parent)
            depths_g.append(depth)
            glens.append(len(children))
            urls_l.extend(children)
            canons_l.extend(canons)
            keys_l.extend(keys)
            hosts_l.extend(hosts)
        glens_a = np.asarray(glens, dtype=np.int64)
        gis = np.repeat(np.arange(len(glens), dtype=np.int64), glens_a)
        return (np.asarray(urls_l, dtype=object),
                np.asarray(canons_l, dtype=object),
                np.asarray(keys_l, dtype=np.uint64),
                np.asarray(hosts_l, dtype=object),
                gis, glens_a, parents_g, depths_g)

    def _offer_groups_serial(
        self,
        job_id: str,
        groups: list[tuple],
        limit: int | None = None,
    ) -> int:
        """Reference implementation of ``offer_groups`` — the round-1/2
        driver loop, kept verbatim as the semantic oracle the vectorized
        path is pinned against (tests/test_frontier_spill.py)."""
        flat: list[tuple[int, str, str, int, str, int]] = []  # (gi, url, canon, key, parent, depth)
        for gi, grp in enumerate(groups):
            if len(grp) == 6:
                parent, children, depth, canons, keys, _hosts = grp
            elif len(grp) == 5:
                parent, children, depth, canons, keys = grp
            else:
                parent, children, depth = grp
                canons = keys = None
            # Crawlee's enqueueLinks slices the filtered candidate list at
            # `limit` BEFORE dedup/transform (per-call cap on candidates
            # considered, not on admissions)
            if limit is not None:
                children = children[:limit]
                if canons is not None:
                    canons = canons[:limit]
                    keys = keys[:limit]
            if canons is not None:
                for u, c, k in zip(children, canons, keys):
                    flat.append((gi, u, c, k, parent, depth))
            else:
                for u in children:
                    c = canonicalize(u)
                    flat.append((gi, u, c, xxh64(c), parent, depth))
        if not flat:
            return 0
        # pass 1: read-only membership probe, fanned out by key shard
        by_shard: dict[int, list[int]] = defaultdict(list)
        for i, item in enumerate(flat):
            by_shard[self._key_shard(item[3])].append(i)
        futures, order = [], []
        for s, idxs in by_shard.items():
            futures.append(self._call(s, "contains", job_id, [flat[i][3] for i in idxs]))
            order.append(idxs)
        in_seen = [False] * len(flat)
        for idxs, res in zip(order, futures if not self.use_actors else self._gather(futures)):
            for i, hit in zip(idxs, res):
                in_seen[i] = hit
        # driver-side exact gate simulation in offer order
        admit_rows: dict[int, dict[str, list]] = defaultdict(_empty_rows)
        insert_rows: dict[int, dict[str, list]] = defaultdict(
            lambda: {"keys": [], "urls": [], "seqs": []}
        )
        batch_seen: set[int] = set()
        admitted = 0
        cur_group = -1
        group_gated = False
        for i, (gi, url, canon, key, parent, depth) in enumerate(flat):
            if gi != cur_group:
                cur_group = gi
                group_gated = limit is not None and self.enqueued[job_id] >= limit
            if group_gated:
                continue
            if in_seen[i] or key in batch_seen:
                continue
            batch_seen.add(key)
            seq = self.next_seq[job_id]  # seq that _admit will assign
            self._admit(job_id, url, canon, key, depth, parent, admit_rows)
            ks = self._key_shard(key)
            insert_rows[ks]["keys"].append(key)
            insert_rows[ks]["urls"].append(canon)
            insert_rows[ks]["seqs"].append(seq)
            admitted += 1
        # pass 2: persist seen inserts + enqueue on host shards
        futures = [
            self._call(s, "insert_seen", job_id, r["keys"], r["urls"], r["seqs"])
            for s, r in insert_rows.items()
        ]
        futures += [self._call(s, "enqueue", r) for s, r in admit_rows.items()]
        self._defer(futures)
        # keep the driver mirror coherent (the vectorized path may run
        # next on this same frontier)
        self._mirror_insert(job_id, np.array(
            [k for r in insert_rows.values() for k in r["keys"]],
            dtype=np.uint64))
        return admitted

    def next_wave(self, job_id: str, per_host_budget: int = 1_000_000,
                  max_pages: int | None = None) -> pa.Table:
        """Collect the next BFS wave, globally sorted by
        ``(depth, discovered_seq)`` — the deterministic admission order.
        Overflow beyond ``max_pages`` is pushed back to queue FRONTS."""
        # barrier: surface any deferred-write failures before reading.
        # (Visibility needs no wait — actor tasks run in submission order.)
        self._drain_writes()
        futures = [
            self._call(s, "take_wave", job_id, per_host_budget)
            for s in range(self.num_shards)
        ]
        # shards return Arrow tables pre-sorted by (depth, seq); the
        # facade's wave assembly is one concat + one vectorized lexsort
        # merge + (maybe) one slice — no Python tuple lists, no
        # driver-side per-row work, no ceiling from the job limit
        parts = [t for t in self._gather(futures) if t.num_rows]
        if not parts:
            merged = _EMPTY_SHARD_WAVE
        else:
            merged = pa.concat_tables(parts).combine_chunks()
            order = np.lexsort((
                np.asarray(merged.column("discovered_seq"), dtype=np.int64),
                np.asarray(merged.column("depth"), dtype=np.int64)))
            merged = merged.take(pa.array(order))
        if max_pages is not None and merged.num_rows > max_pages:
            self._requeue_front(job_id, merged.slice(max_pages))
            merged = merged.slice(0, max_pages)
        return pa.table(
            {
                "url": merged.column("url"),
                "canonical_url": merged.column("canonical_url"),
                "url_key": merged.column("url_key"),
                "host": merged.column("host"),
                "depth": merged.column("depth"),
                "job_id": pa.array([job_id] * merged.num_rows, pa.string()),
                "parent_url": merged.column("parent_url"),
                "discovered_seq": merged.column("discovered_seq"),
                "host_seq": merged.column("host_seq"),
            },
            schema=WAVE_SCHEMA,
        )

    def _requeue_front(self, job_id: str, overflow: pa.Table) -> None:
        by_shard: dict[int, dict[str, list]] = defaultdict(_empty_rows)
        cols = {n: overflow.column(n).to_pylist()
                for n in overflow.column_names}
        for i in range(overflow.num_rows):
            host, hseq = cols["host"][i], cols["host_seq"][i]
            _append_wave_row(by_shard[self._host_shard(host, hseq)],
                             url=cols["url"][i],
                             canon=cols["canonical_url"][i],
                             key=cols["url_key"][i], host=host,
                             depth=cols["depth"][i], job_id=job_id,
                             parent=cols["parent_url"][i],
                             seq=cols["discovered_seq"][i], hseq=hseq)
        self._gather([self._call(s, "enqueue_front", r) for s, r in by_shard.items()])

    def pending(self, job_id: str) -> int:
        self._drain_writes()
        return sum(self._gather(
            [self._call(s, "pending_count", job_id) for s in range(self.num_shards)]
        ))

    def mark_done_batch(self, job_id: str, hosts, ok,
                        nbytes, credits_each: int = 1) -> None:
        """Completion accounting, attributed to the host-owning shard so the
        lineage table stays per-partition (Progress.ts:143-265 analogue).
        Accepts lists or numpy arrays; reduction is vectorized per UNIQUE
        host (one xxh64 per host, not per page) — this runs on the
        driver's serial admission path once per consumed slice."""
        hosts_a = np.asarray(hosts, dtype=object)
        if hosts_a.size == 0:
            return
        ok_a = np.asarray(ok, dtype=bool).astype(np.int64)
        nb_a = np.asarray(nbytes, dtype=np.int64)
        uniq, inv = np.unique(hosts_a, return_inverse=True)
        shard_u = np.array([self._host_shard(h) for h in uniq.tolist()],
                           dtype=np.int64)
        sh = shard_u[inv]
        for s in np.unique(sh):
            m = sh == s
            n_ok = int(ok_a[m].sum())
            n_all = int(m.sum())
            acc = self._done_acc.setdefault((job_id, int(s)), [0, 0, 0, 0])
            acc[0] += n_ok
            acc[1] += n_all - n_ok
            acc[2] += int(nb_a[m].sum())
            acc[3] += n_all * credits_each
        # counters ride the next fused apply_writes round (or flush at the
        # next read barrier) — zero standalone RPCs on the consume path

    def stats(self, job_id: str) -> dict[str, int]:
        """Global counters = reduce over shard counters (replaces the Redis
        hash + Lua finalize of Progress.ts:270-355; epoch-synchronous
        termination needs no in-flight gauge — SURVEY.md §2.5 A2)."""
        totals = {"enqueued": 0, "done": 0, "succeeded": 0, "failed": 0,
                  "bytes_fetched": 0, "credits_used": 0}
        self._drain_writes()
        for st in self._gather([self._call(s, "stats", job_id) for s in range(self.num_shards)]):
            for k, v in st.items():
                totals[k] += v
        totals["enqueued"] = self.enqueued[job_id]
        return totals

    def lineage_rows(self, job_id: str, epoch: int) -> pa.Table:
        """Per-shard lineage/metrics rows (schemas.LINEAGE shape)."""
        self._drain_writes()
        stats = self._gather([self._call(s, "stats", job_id) for s in range(self.num_shards)])
        return pa.table(
            {
                "job_id": [job_id] * self.num_shards,
                "partition_id": pa.array(range(self.num_shards), pa.int32()),
                "epoch": pa.array([epoch] * self.num_shards, pa.int64()),
                "enqueued": pa.array([s["enqueued"] for s in stats], pa.int64()),
                "done": pa.array([s["done"] for s in stats], pa.int64()),
                "succeeded": pa.array([s["succeeded"] for s in stats], pa.int64()),
                "failed": pa.array([s["failed"] for s in stats], pa.int64()),
                "bytes_fetched": pa.array([s["bytes_fetched"] for s in stats], pa.int64()),
                "credits_used": pa.array([s["credits_used"] for s in stats], pa.int64()),
            }
        )

    def seen_table(self, job_id: str) -> pa.Table:
        self._drain_writes()
        parts = self._gather(
            [self._call(s, "seen_rows", job_id) for s in range(self.num_shards)]
        )
        cols: dict[str, list] = {"job_id": [], "url_key": [], "canonical_url": [],
                                 "first_seen_seq": []}
        for p in parts:
            for k in cols:
                cols[k].extend(p[k])
        order = np.argsort(np.array(cols["first_seen_seq"], dtype=np.int64), kind="stable")
        return pa.table(
            {
                "job_id": [cols["job_id"][i] for i in order],
                "url_key": pa.array([int(cols["url_key"][i]) for i in order], pa.uint64()),
                "canonical_url": [cols["canonical_url"][i] for i in order],
                "first_seen_seq": pa.array(
                    [int(cols["first_seen_seq"][i]) for i in order], pa.int64()
                ),
            }
        )

    def admission_table(self, job_id: str) -> pa.Table:
        """Golden admission order as a table (reads back any spooled
        segments); empty when ``record_admissions=False``."""
        log = self.admission_log.rows(job_id)
        return pa.table(
            {
                "job_id": [job_id] * len(log),
                "admission_seq": pa.array([e[0] for e in log], pa.int64()),
                "url": [e[1] for e in log],
                "canonical_url": [e[2] for e in log],
                "depth": pa.array([e[3] for e in log], pa.int32()),
                "parent_url": [e[4] for e in log],
            }
        )

    def dispose_spill_files(self) -> None:
        """Unlink all shards' live spill files (call when the frontier is
        no longer needed — restored ``restored_*`` copies otherwise
        accumulate in a shared spill_dir across restore cycles)."""
        self._drain_writes()
        if self.use_actors:
            import ray

            ray.get([s.dispose_spill.remote() for s in self.shards])
        else:
            for shard in self.shards:
                shard.dispose_spill_files()
        self.admission_log.dispose()
        self.release_pool()

    def release_pool(self) -> None:
        """Return this frontier's memoized shard pool (if any) to the
        cache. Idempotent; safe to call from error paths that skip
        dispose_spill_files."""
        # error paths must not hand a pool back with failed writes
        # unsurfaced — but they also must not raise here and mask the
        # original error; drop the refs (gathering best-effort)
        try:
            self._drain_writes()
        except Exception:  # noqa: BLE001 — pool return must not raise
            self._pending_writes = []
        if self._pool_key is not None:
            _release_shard_pool(self._pool_key, self.shards)
            self._pool_key = None

    # -- checkpoint / restore ---------------------------------------------
    def checkpoint(self, ckpt_dir: str, epoch: int, extra: dict | None = None,
                   keep_epochs: int = 2) -> str:
        """Write epoch_N atomically, update LATEST, prune old epochs.

        ``keep_epochs`` retains the newest K epoch dirs (K>=1; default 2 so a
        torn LATEST can still fall back one epoch) — without pruning, a long
        crawl with per-epoch checkpoints grows the dir without bound.
        """
        self._drain_writes()  # a failed deferred write must fail the ckpt
        os.makedirs(ckpt_dir, exist_ok=True)
        tmp = os.path.join(ckpt_dir, f".epoch_{epoch}.tmp")
        final = os.path.join(ckpt_dir, f"epoch_{epoch}")
        if os.path.exists(tmp):
            # a crashed earlier attempt may have left partial spill copies;
            # shipping them into the durable dir would orphan them forever
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp)
        # shards copy their spilled segment/run files straight into the
        # checkpoint dir and reference them by name — blobs stay
        # O(in-memory state) even with a disk-resident frontier
        blobs = self._gather(
            [self._call(s, "snapshot", tmp) for s in range(self.num_shards)]
        )
        for i, blob in enumerate(blobs):
            with open(os.path.join(tmp, f"shard_{i}.bin"), "wb") as f:
                f.write(blob)
        manifest = {
            "epoch": epoch,
            "num_shards": self.num_shards,
            "spill_dir": getattr(self, "_spill_dir", None),
            "spill_segment_size": getattr(self, "_spill_segment_size", 4096),
            "seen_spill_threshold": getattr(self, "_seen_spill_threshold", 1 << 30),
            "hot_host_lane_size": self.hot_host_lane_size,
            "next_seq": dict(self.next_seq),
            "host_seq": {f"{j}\t{h}": v for (j, h), v in self.host_seq.items()},
            "enqueued": dict(self.enqueued),
            "extra": extra or {},
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        # atomic LATEST update: a crash mid-write must never leave a torn /
        # empty LATEST that bricks resume (matches the tmp+rename protocol
        # used for the epoch dir itself)
        latest_tmp = os.path.join(ckpt_dir, "LATEST.tmp")
        with open(latest_tmp, "w") as f:
            f.write(str(epoch))
        os.replace(latest_tmp, os.path.join(ckpt_dir, "LATEST"))
        if keep_epochs >= 1:
            import shutil

            for name in os.listdir(ckpt_dir):
                if not name.startswith("epoch_"):
                    continue
                try:
                    old = int(name[len("epoch_"):])
                except ValueError:
                    continue
                if old <= epoch - keep_epochs:
                    shutil.rmtree(os.path.join(ckpt_dir, name),
                                  ignore_errors=True)
        return final

    @classmethod
    def latest_epoch(cls, ckpt_dir: str) -> int | None:
        latest = os.path.join(ckpt_dir, "LATEST")
        try:
            with open(latest) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            # missing or torn LATEST: fall back to the highest epoch_N dir
            # that holds a complete manifest (epoch dirs are renamed in
            # atomically, so a manifest implies a usable checkpoint)
            best = None
            if os.path.isdir(ckpt_dir):
                for name in os.listdir(ckpt_dir):
                    if not name.startswith("epoch_"):
                        continue
                    try:
                        n = int(name[len("epoch_"):])
                    except ValueError:
                        continue
                    if os.path.exists(os.path.join(ckpt_dir, name,
                                                   "manifest.json")):
                        best = n if best is None else max(best, n)
            return best

    @classmethod
    def restore(cls, ckpt_dir: str, use_actors: bool = True) -> tuple["Frontier", dict]:
        epoch = cls.latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        path = os.path.join(ckpt_dir, f"epoch_{epoch}")
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        obj = cls(num_shards=manifest["num_shards"], use_actors=use_actors,
                  spill_dir=manifest.get("spill_dir"),
                  spill_segment_size=manifest.get("spill_segment_size", 4096),
                  seen_spill_threshold=manifest.get("seen_spill_threshold", 1 << 30),
                  hot_host_lane_size=manifest.get("hot_host_lane_size", 1 << 30))
        blobs = []
        for i in range(manifest["num_shards"]):
            with open(os.path.join(path, f"shard_{i}.bin"), "rb") as f:
                blobs.append(f.read())
        if use_actors:
            import ray

            ray.get([s.load_snapshot.remote(b, path)
                     for s, b in zip(obj.shards, blobs)])
        else:
            obj.shards = [
                ShardState.from_snapshot(
                    b, obj._spill_dir, obj._spill_segment_size,
                    obj._seen_spill_threshold, file_dir=path)
                for b in blobs
            ]
        # restored shards hold seen keys this driver never inserted — the
        # exact-mirror invariant (driver = single writer) no longer holds,
        # so probes fall back to the sharded RPC pass
        obj._mirror_ok = False
        obj.next_seq.update(manifest["next_seq"])
        for k, v in manifest["host_seq"].items():
            j, h = k.split("\t", 1)
            obj.host_seq[(j, h)] = v
        obj.enqueued.update(manifest["enqueued"])
        manifest["epoch"] = epoch
        return obj, manifest
