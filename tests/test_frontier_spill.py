"""Spill-queue semantics: order-identical to a deque; crawl with spilling
matches crawl without."""

from __future__ import annotations

from collections import deque

from anycrawl_ray.state.frontier import Frontier, SpillQueue


def test_spillqueue_order_matches_deque(tmp_path):
    import random

    rng = random.Random(7)
    sq = SpillQueue(str(tmp_path), segment_size=16)
    dq = deque()
    popped_sq, popped_dq = [], []
    for step in range(3000):
        op = rng.random()
        if op < 0.55:
            item = ("it", step)
            sq.append(item)
            dq.append(item)
        elif op < 0.7 and dq:
            item = ("front", step)
            sq.appendleft(item)
            dq.appendleft(item)
        elif dq:
            popped_sq.append(sq.popleft())
            popped_dq.append(dq.popleft())
        assert len(sq) == len(dq)
    assert popped_sq == popped_dq
    assert list(sq) == list(dq)
    # something actually hit disk during the run
    total_spilled = sq.spilled_entries
    while dq:
        assert sq.popleft() == dq.popleft()
    assert len(sq) == 0


def test_crawl_with_spilling_matches(tmp_path):
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="sp", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=400)
    base = run_crawl(job, pages, use_ray=False)

    # frontier with aggressive spilling (segment 8) — identical results
    res = run_crawl(job, pages, use_ray=False,
                    spill_dir=str(tmp_path / "spill"), spill_segment_size=8)
    assert res.order.equals(base.order)
    assert res.documents.equals(base.documents)
    assert res.seen.to_pydict() == base.seen.to_pydict()


def test_spill_survives_snapshot(tmp_path):
    f = Frontier(num_shards=2, use_actors=False,
                 spill_dir=str(tmp_path / "sp"), spill_segment_size=4)
    f.add_seeds("j", ["http://s.test/"])
    urls = [f"http://s.test/p{i}" for i in range(100)]
    f.offer_groups("j", [("http://s.test/", urls, 1)])
    assert sum(q.spilled_entries for s in f.shards for q in s.queues.values()) > 0
    f.checkpoint(str(tmp_path / "ck"), 0)
    g, _ = Frontier.restore(str(tmp_path / "ck"), use_actors=False)
    assert g.pending("j") == f.pending("j")
    w_f = f.next_wave("j")
    w_g = g.next_wave("j")
    assert w_f.equals(w_g)


def test_seen_store_spills_and_stays_exact(tmp_path):
    """SeenStore with a tiny flush threshold: dedup stays exact across disk
    runs; seen-table export merges runs + delta; crawl results identical."""
    f = Frontier(num_shards=2, use_actors=False,
                 spill_dir=str(tmp_path / "seen"), seen_spill_threshold=16)
    f.add_seeds("j", ["http://s.test/"])
    urls = [f"http://s.test/p{i}" for i in range(300)]
    assert f.offer_groups("j", [("http://s.test/", urls, 1)]) == 300
    assert any(len(s.seen["j"].runs) > 0 for s in f.shards)  # spilled
    # exactness: nothing re-admits, including keys that live in disk runs
    assert f.offer_groups("j", [("http://s.test/q", urls, 2)]) == 0
    table = f.seen_table("j")
    assert table.num_rows == 300
    assert sorted(table.column("canonical_url").to_pylist()) == sorted(urls)

    # full crawl with aggressive seen-spilling matches the plain crawl
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="se", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=400)
    base = run_crawl(job, pages, use_ray=False)
    res = run_crawl(job, pages, use_ray=False,
                    spill_dir=str(tmp_path / "seen2"), seen_spill_threshold=8)
    assert res.order.equals(base.order)
    assert res.seen.to_pydict() == base.seen.to_pydict()


def test_wave_truncation_takes_global_seq_prefix():
    """Review regression: near the limit, next_wave must return the
    earliest-admitted entries globally, not whatever queue-insertion order
    yields on a shard (earlier finding returned seqs [5,6] over [3,4])."""
    f = Frontier(num_shards=1, use_actors=False)
    f.add_seeds("j", ["http://a.test/"])  # seq 0 hostA
    f.next_wave("j")  # drain seed
    # admit to hostA first (creates its queue), then interleave
    f.offer_groups("j", [
        ("http://a.test/", ["http://a.test/1", "http://a.test/2"], 1),  # seqs 1,2 hostA
        ("http://a.test/1", ["http://b.test/3", "http://b.test/4"], 2),  # seqs 3,4 hostB
    ])
    # ask for 2 pages only: must be seqs 1,2? no - sorted by (depth, seq):
    # depth1 seqs 1,2 first. Now drain them and interleave depths:
    w = f.next_wave("j", max_pages=2)
    assert w.column("discovered_seq").to_pylist() == [1, 2]
    # hostB (later-created queue) holds the earliest remaining seqs now
    f.offer_groups("j", [("http://a.test/2", ["http://a.test/5", "http://a.test/6"], 2)])
    w2 = f.next_wave("j", max_pages=2)
    assert w2.column("discovered_seq").to_pylist() == [3, 4]  # not [5, 6]
    w3 = f.next_wave("j")
    assert w3.column("discovered_seq").to_pylist() == [5, 6]


def test_restore_preserves_spill_config(tmp_path):
    """Review regression: restore must rebuild shards WITH their spill/seen
    configuration (it silently reverted to memory-only)."""
    f = Frontier(num_shards=2, use_actors=False,
                 spill_dir=str(tmp_path / "sp"), spill_segment_size=4,
                 seen_spill_threshold=8, hot_host_lane_size=16)
    f.add_seeds("j", ["http://s.test/"])
    f.offer_groups("j", [("http://s.test/",
                          [f"http://s.test/p{i}" for i in range(50)], 1)])
    f.checkpoint(str(tmp_path / "ck"), 0)
    g, m = Frontier.restore(str(tmp_path / "ck"), use_actors=False)
    assert g._spill_dir == str(tmp_path / "sp")
    assert g._spill_segment_size == 4
    assert g._seen_spill_threshold == 8
    assert g.hot_host_lane_size == 16
    for shard in g.shards:
        assert shard._spill_dir == str(tmp_path / "sp")
        for q in shard.queues.values():
            assert q.spill_dir == str(tmp_path / "sp")
    # restored frontier actually spills on further load
    g.offer_groups("j", [("http://s.test/q",
                          [f"http://s.test/z{i}" for i in range(50)], 2)])
    assert any(q.spilled_entries > 0 for s in g.shards for q in s.queues.values())


def test_deferred_writes_visible_and_drained(ray_session):
    """offer_groups/mark_done defer their write-RPC gathers (actor tasks
    execute in submission order, so later reads on the same shard see
    them without waiting); read barriers drain the future backlog."""
    f = Frontier(num_shards=4, use_actors=True)
    f.add_seeds("dw", ["http://s.test/"])
    f.offer_groups("dw", [("http://s.test/",
                           [f"http://h{i % 5}.test/p{i}" for i in range(50)],
                           1)])
    f.mark_done_batch("dw", ["h0.test"], [True], [123])
    assert f._pending_writes, "writes were gathered synchronously"
    # reads see the deferred writes (per-actor ordering), and drain them
    st = f.stats("dw")
    assert st["enqueued"] == 51 and st["done"] == 1
    assert st["bytes_fetched"] == 123
    assert not f._pending_writes
    f.offer_groups("dw", [("http://s.test/",
                           ["http://h0.test/p0", "http://hNEW.test/x"], 1)])
    w = f.next_wave("dw")  # drains again; dedup saw the deferred inserts
    assert not f._pending_writes
    urls = set(w.column("url").to_pylist())
    assert "http://hNEW.test/x" in urls
    assert w.num_rows == 52  # 1 seed + 50 + 1 new (p0 deduped)
    f.release_pool()


def test_offer_table_matches_offer_groups(ray_session):
    """offer_table (Arrow-kernel flatten) == offer_groups (per-group
    tuples) admission-for-admission, including empty candidate lists,
    an allowed_fn mask, and the per-call [:limit] slice."""
    import pyarrow as pa

    def parsed_tbl():
        urls = ["http://a.test/", "http://b.test/", "http://c.test/"]
        cands = [
            [f"http://h{i % 3}.test/p{i}" for i in range(6)],
            [],
            ["http://h0.test/p0", "http://h9.test/only",
             "http://blockme.test/x", "http://h9.test/extra"],
        ]
        from anycrawl_ray.functions.urls import canonicalize, host_of, xxh64
        canon = [[canonicalize(u) for u in c] for c in cands]
        key = [[xxh64(x) for x in cc] for cc in canon]
        host = [[host_of(x) for x in cc] for cc in canon]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([0, 1, 1], pa.int32()),
            "candidates": pa.array(cands, pa.list_(pa.string())),
            "cand_canon": pa.array(canon, pa.list_(pa.string())),
            "cand_key": pa.array(key, pa.list_(pa.uint64())),
            "cand_host": pa.array(host, pa.list_(pa.string())),
        })

    def blockfn(urls):
        return ["blockme" not in u for u in urls]

    t = parsed_tbl()
    for lim, fn in [(None, None), (3, None), (2, blockfn), (None, blockfn)]:
        fa = Frontier(num_shards=3, use_actors=False)
        fb = Frontier(num_shards=3, use_actors=False)
        for f in (fa, fb):
            f.add_seeds("j", ["http://a.test/"])
        groups = []
        for i in range(t.num_rows):
            c = t.column("candidates")[i].as_py()
            cc = t.column("cand_canon")[i].as_py()
            ck = t.column("cand_key")[i].as_py()
            ch = t.column("cand_host")[i].as_py()
            if fn is not None:
                keep = fn(c)
                c = [x for x, k in zip(c, keep) if k]
                cc = [x for x, k in zip(cc, keep) if k]
                ck = [x for x, k in zip(ck, keep) if k]
                ch = [x for x, k in zip(ch, keep) if k]
            if c:
                groups.append((t.column("url")[i].as_py(), c,
                               t.column("depth")[i].as_py() + 1,
                               cc, ck, ch))
        na = fa.offer_groups("j", groups, limit=lim)
        nb = fb.offer_table("j", t, limit=lim, allowed_fn=fn)
        assert na == nb, (lim, fn)
        wa, wb = fa.next_wave("j"), fb.next_wave("j")
        assert wa.equals(wb), (lim, fn)


def test_spill_with_actor_shards(ray_session, tmp_path):
    """Review regression: shards are separate PROCESSES sharing one
    spill_dir — segment filenames must not collide across them (id(self)
    did; pid+counter doesn't). Crawl with actor shards + aggressive
    spilling must equal the plain crawl."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="as", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=300)
    base = run_crawl(job, pages, use_ray=False)
    res = run_crawl(job, pages, use_ray=True, ray_wave_threshold=8,
                    num_shards=4, spill_dir=str(tmp_path / "sp"),
                    spill_segment_size=8, seen_spill_threshold=16)
    assert res.order.equals(base.order)
    assert res.documents.equals(base.documents)
    assert res.seen.to_pydict() == base.seen.to_pydict()
    # spill files were actually produced by multiple shard processes
    import os

    import re

    # the crawl disposes its spill files on completion (spill hygiene), so
    # inspect filenames on a LIVE actor-shard frontier: multiple shard
    # PROCESSES sharing one spill_dir must produce kind_pid_counter names
    # with distinct pids (a regression to id(self) naming fails this)
    live = str(tmp_path / "live_sp")
    f = Frontier(num_shards=4, use_actors=True, spill_dir=live,
                 spill_segment_size=8)
    f.add_seeds("fn", ["http://s.test/"])
    f.offer_groups("fn", [("http://s.test/",
                           [f"http://h{i % 7}.test/p{i}" for i in range(400)],
                           1)])
    # enqueue writes are deferred futures now; any read barrier (here:
    # pending) guarantees they executed before out-of-band FS inspection
    assert f.pending("fn") == 401
    names = os.listdir(live)
    assert names, "no spill files were produced by live actor shards"
    pat = re.compile(r"^[A-Za-z]+_(\d+)_(\d+)\.pkl$")
    matches = [pat.match(n) for n in names]
    assert all(matches), f"unexpected spill filename(s): {names}"
    pids = {m.group(1) for m in matches}
    assert len(pids) > 1, (
        f"expected multiple shard processes to spill, got pids={pids}"
    )
    f.dispose_spill_files()


def test_checkpoint_references_spill_files_not_blobs(tmp_path):
    """Review regression: checkpointing a spilled frontier must copy the
    segment/run files (bounded blob) and restore must reattach working
    copies — including a crash-consuming-then-rerestore cycle."""
    import os
    import pickle

    f = Frontier(num_shards=2, use_actors=False,
                 spill_dir=str(tmp_path / "sp"), spill_segment_size=8,
                 seen_spill_threshold=16)
    f.add_seeds("j", ["http://s.test/"])
    urls = [f"http://s.test/p{i}" for i in range(200)]
    f.offer_groups("j", [("http://s.test/", urls, 1)])
    ck = str(tmp_path / "ck")
    f.checkpoint(ck, 0)
    epoch_dir = os.path.join(ck, "epoch_0")
    copied = [n for n in os.listdir(epoch_dir)
              if n.startswith("sh") and not n.endswith(".bin")]
    assert copied, "spill files were not copied into the checkpoint"
    # blobs reference files instead of inlining spilled entries
    blob = pickle.loads(open(os.path.join(epoch_dir, "shard_0.bin"), "rb").read())
    for q in blob["queues"].values():
        assert "segments" in q and "items" not in q
    # restore twice: the checkpoint copy must survive the first restore
    # consuming its queues
    g1, _ = Frontier.restore(ck, use_actors=False)
    w1 = g1.next_wave("j")
    g2, _ = Frontier.restore(ck, use_actors=False)
    w2 = g2.next_wave("j")
    assert w1.equals(w2)
    assert w1.num_rows == 201


def test_latest_torn_falls_back_to_epoch_scan(tmp_path):
    """Advisor fix: a torn/empty LATEST must not brick resume — latest_epoch
    falls back to the highest epoch_N dir holding a manifest, and LATEST
    itself is written via tmp+rename (no .tmp residue on success)."""
    import os

    f = Frontier(num_shards=2, use_actors=False)
    f.add_seeds("j", ["http://s.test/"])
    ck = str(tmp_path / "ck")
    f.checkpoint(ck, 0)
    f.checkpoint(ck, 1)
    assert not os.path.exists(os.path.join(ck, "LATEST.tmp"))
    # simulate the crash-mid-write: truncate LATEST
    open(os.path.join(ck, "LATEST"), "w").close()
    assert Frontier.latest_epoch(ck) == 1
    g, manifest = Frontier.restore(ck, use_actors=False)
    assert manifest["epoch"] == 1
    assert g.next_wave("j").num_rows == 1
    # garbage content likewise
    with open(os.path.join(ck, "LATEST"), "w") as fh:
        fh.write("not-a-number")
    assert Frontier.latest_epoch(ck) == 1
    # missing entirely
    os.unlink(os.path.join(ck, "LATEST"))
    assert Frontier.latest_epoch(ck) == 1


def test_checkpoint_prunes_old_epochs(tmp_path):
    """Advisor fix: per-epoch checkpoints must not grow the dir without
    bound — only the newest keep_epochs dirs survive."""
    import os

    f = Frontier(num_shards=1, use_actors=False)
    f.add_seeds("j", ["http://s.test/"])
    ck = str(tmp_path / "ck")
    for e in range(4):
        f.checkpoint(ck, e)  # default keep_epochs=2
    dirs = sorted(n for n in os.listdir(ck) if n.startswith("epoch_"))
    assert dirs == ["epoch_2", "epoch_3"]
    assert Frontier.latest_epoch(ck) == 3
    # keep_epochs=0 disables pruning
    f.checkpoint(ck, 4, keep_epochs=0)
    dirs = sorted(n for n in os.listdir(ck) if n.startswith("epoch_"))
    assert dirs == ["epoch_2", "epoch_3", "epoch_4"]


def test_link_or_copy_refuses_overwrite(tmp_path):
    """Advisor fix: a destination-name collision must surface, not be
    silently overwritten by the cross-filesystem copy fallback."""
    import pytest

    from anycrawl_ray.state.frontier import _link_or_copy

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.write_bytes(b"a")
    dst.write_bytes(b"b")
    with pytest.raises(OSError):
        _link_or_copy(str(src), str(dst))
    assert dst.read_bytes() == b"b"


def test_admission_log_spools_and_reads_back(tmp_path):
    """Advisor/judge fix: the admission log must not grow driver memory
    unboundedly — with a spill_dir it spools segments to disk past the
    threshold, and admission_table reads them back in seq order."""
    f = Frontier(num_shards=2, use_actors=False,
                 spill_dir=str(tmp_path / "sp"), admission_spool_threshold=64)
    f.add_seeds("j", ["http://s.test/"])
    urls = [f"http://s.test/p{i}" for i in range(500)]
    f.offer_groups("j", [("http://s.test/", urls, 1)])
    # spooled: in-memory buffer is bounded by the threshold
    assert len(f.admission_log._buf["j"]) < 64
    assert len(f.admission_log._segments["j"]) >= 7
    t = f.admission_table("j")
    assert t.num_rows == 501
    assert t.column("admission_seq").to_pylist() == list(range(501))
    assert t.column("url").to_pylist()[1:] == urls
    f.dispose_spill_files()
    assert not any(n.startswith("admlog") for n in
                   __import__("os").listdir(str(tmp_path / "sp")))


def test_record_admissions_off_is_free(tmp_path):
    f = Frontier(num_shards=2, use_actors=False, record_admissions=False)
    f.add_seeds("j", ["http://s.test/"])
    f.offer_groups("j", [("http://s.test/",
                          [f"http://s.test/p{i}" for i in range(100)], 1)])
    assert f.admission_log.rows("j") == []
    assert f.admission_table("j").num_rows == 0
    # crawl itself is unaffected
    assert f.next_wave("j").num_rows == 101


def test_offer_groups_precomputed_keys_match(tmp_path):
    """The 5-tuple offer path (worker-precomputed canon/key) must admit
    identically to the 3-tuple driver-computed path."""
    from anycrawl_ray.functions.urls import canonicalize, xxh64

    urls = [f"http://s.test/p{i}" for i in range(50)] + ["http://s.test/p0"]
    f1 = Frontier(num_shards=2, use_actors=False)
    f1.add_seeds("j", ["http://s.test/"])
    f1.offer_groups("j", [("http://s.test/", urls, 1)])
    f2 = Frontier(num_shards=2, use_actors=False)
    f2.add_seeds("j", ["http://s.test/"])
    canons = [canonicalize(u) for u in urls]
    keys = [xxh64(c) for c in canons]
    f2.offer_groups("j", [("http://s.test/", urls, 1, canons, keys)])
    assert f1.next_wave("j").equals(f2.next_wave("j"))
    assert f1.admission_table("j").equals(f2.admission_table("j"))


def _random_offer_scenario(rng, n_groups, n_hosts, n_paths):
    """Random parent groups with heavy key collisions (dup URLs within and
    across groups) to stress first-sight-wins + the limit gate."""
    groups = []
    for g in range(n_groups):
        k = rng.randint(0, 12)
        children = [
            f"http://h{rng.randrange(n_hosts)}.test/p{rng.randrange(n_paths)}"
            for _ in range(k)
        ]
        groups.append((f"http://seed.test/parent{g}", children, 1))
    return groups


def test_offer_groups_vectorized_matches_serial_reference():
    """The round-3 vectorized admission sequencer is pinned against the
    round-1/2 serial driver loop (`_offer_groups_serial`) on randomized
    scenarios: same admitted count, same wave rows (seq/host_seq/order),
    same golden admission log, same seen set — with and without limits,
    across multiple offer calls."""
    import random

    rng = random.Random(20260817)
    for trial in range(12):
        limit = rng.choice([None, 3, 10, 25, 60])
        f_vec = Frontier(num_shards=3, use_actors=False)
        f_ser = Frontier(num_shards=3, use_actors=False)
        seeds = [f"http://h{i}.test/" for i in range(3)]
        f_vec.add_seeds("j", seeds)
        f_ser.add_seeds("j", seeds)
        for _call in range(rng.randint(1, 4)):
            groups = _random_offer_scenario(
                rng, n_groups=rng.randint(0, 8), n_hosts=4, n_paths=30)
            a = f_vec.offer_groups("j", groups, limit=limit)
            b = f_ser._offer_groups_serial("j", groups, limit=limit)
            assert a == b, (trial, limit)
        assert f_vec.enqueued["j"] == f_ser.enqueued["j"]
        assert f_vec.next_seq["j"] == f_ser.next_seq["j"]
        assert dict(f_vec.host_seq) == dict(f_ser.host_seq)
        assert f_vec.admission_table("j").equals(f_ser.admission_table("j"))
        wv, ws = f_vec.next_wave("j"), f_ser.next_wave("j")
        assert wv.equals(ws), (trial, limit)
        sv = sorted(zip(*[f_vec.seen_table("j").column(c).to_pylist()
                          for c in ("url_key", "first_seen_seq")]))
        ss = sorted(zip(*[f_ser.seen_table("j").column(c).to_pylist()
                          for c in ("url_key", "first_seen_seq")]))
        assert sv == ss


def test_offer_groups_vectorized_matches_serial_with_hosts_and_actors():
    """6-tuple (precomputed host) path over real shard actors equals the
    inline serial path."""
    from anycrawl_ray.functions.urls import canonicalize, host_of, xxh64

    urls = ([f"http://h{i % 5}.test/p{i % 37}" for i in range(200)]
            + ["http://h0.test/p0"] * 3)
    canons = [canonicalize(u) for u in urls]
    keys = [xxh64(c) for c in canons]
    hosts = [host_of(c) for c in canons]
    groups6 = [("http://seed.test/", urls[i:i + 20], 1, canons[i:i + 20],
                keys[i:i + 20], hosts[i:i + 20]) for i in range(0, len(urls), 20)]
    groups3 = [(g[0], g[1], g[2]) for g in groups6]
    f_vec = Frontier(num_shards=4, use_actors=True)
    f_ser = Frontier(num_shards=4, use_actors=False)
    f_vec.add_seeds("j", ["http://h0.test/"])
    f_ser.add_seeds("j", ["http://h0.test/"])
    a = f_vec.offer_groups("j", groups6, limit=100)
    b = f_ser._offer_groups_serial("j", groups3, limit=100)
    assert a == b
    assert f_vec.next_wave("j").equals(f_ser.next_wave("j"))
    assert f_vec.admission_table("j").equals(f_ser.admission_table("j"))


def test_cuckoo_contains_batch_matches_scalar():
    import numpy as np

    from anycrawl_ray.state.cuckoo import CuckooFilter

    rng = np.random.default_rng(7)
    f = CuckooFilter(capacity=4096, seed=11)
    inserted = rng.integers(0, 1 << 63, size=3000, dtype=np.uint64)
    for k in inserted.tolist():
        f.insert(k)
    probes = np.concatenate(
        [inserted[:500], rng.integers(0, 1 << 63, size=2000, dtype=np.uint64)])
    batch = f.contains_batch(probes)
    scalar = np.array([f.contains(int(k)) for k in probes.tolist()])
    assert (batch == scalar).all()
    assert batch[:500].all()  # no false negatives


def test_shard_pool_memoization(ray_session):
    """Actor pools are reused across Frontier instances (reset to empty
    state on lease), leased exclusively, and never memoized for
    spill-backed configs."""
    from anycrawl_ray.state import frontier as F

    fr1 = F.Frontier(num_shards=3, use_actors=True)
    actors1 = list(fr1.shards)
    fr1.add_seeds("j1", ["http://a.test/"])
    assert fr1.offer_groups("j1", [("http://a.test/", ["http://a.test/x"], 1)]) == 1
    # concurrent second frontier with the same config must NOT share
    fr2 = F.Frontier(num_shards=3, use_actors=True)
    assert [a._actor_id for a in fr2.shards] != [a._actor_id for a in actors1]
    fr1.dispose_spill_files()  # releases the lease
    fr3 = F.Frontier(num_shards=3, use_actors=True)
    assert [a._actor_id for a in fr3.shards] == [a._actor_id for a in actors1]
    # reused pool starts empty: the same URL is admitted again for the
    # same job_id (fresh seen-set)
    fr3.add_seeds("j1", ["http://a.test/"])
    assert fr3.offer_groups("j1", [("http://a.test/", ["http://a.test/x"], 1)]) == 1
    fr3.dispose_spill_files()


def test_shard_pool_not_memoized_with_spill(ray_session, tmp_path):
    from anycrawl_ray.state import frontier as F

    fr = F.Frontier(num_shards=3, use_actors=True,
                    spill_dir=str(tmp_path))
    assert fr._pool_key is None
    fr.dispose_spill_files()


def test_seen_mirror_guard_crossing_matches_rpc_probe():
    """Admission is identical whether the probe runs on the driver-exact
    seen mirror or on the sharded RPC fallback: a frontier whose mirror
    guard disables after the first insert batch must admit exactly what
    the default (mirror-on) frontier admits, across multiple calls with
    cross-call duplicates."""
    import random

    rng = random.Random(20260819)
    f_mir = Frontier(num_shards=3, use_actors=False)
    f_rpc = Frontier(num_shards=3, use_actors=False, seen_mirror_limit=1)
    for f in (f_mir, f_rpc):
        f.add_seeds("j", ["http://h0.test/"])
    urls_pool = [f"http://h{i % 4}.test/p{i % 50}" for i in range(400)]
    for call in range(5):
        sample = rng.sample(urls_pool, 60)
        groups = [(f"http://h0.test/parent{call}", sample[k:k + 15], 1)
                  for k in range(0, 60, 15)]
        a = f_mir.offer_groups("j", groups, limit=200)
        b = f_rpc.offer_groups("j", groups, limit=200)
        assert a == b, call
    assert not f_rpc._mirror_ok and f_mir._mirror_ok
    assert f_mir.next_wave("j").equals(f_rpc.next_wave("j"))
    assert f_mir.admission_table("j").equals(f_rpc.admission_table("j"))


def test_seen_mirror_disabled_after_restore(tmp_path):
    """A restored frontier holds seen keys the (new) driver never
    inserted — the mirror must disable itself and later offers must still
    dedup against the restored shard state via the RPC probe."""
    f1 = Frontier(num_shards=2, use_actors=False)
    f1.add_seeds("j", ["http://h0.test/"])
    f1.offer_groups("j", [("http://h0.test/", ["http://h0.test/a",
                                               "http://h0.test/b"], 1)])
    f1.checkpoint(str(tmp_path), epoch=0)
    f2, manifest = Frontier.restore(str(tmp_path), use_actors=False)
    assert manifest["epoch"] == 0
    assert not f2._mirror_ok
    # re-offering the same URLs must admit nothing (restored seen set)
    admitted = f2.offer_groups("j", [("http://h0.test/",
                                      ["http://h0.test/a",
                                       "http://h0.test/b"], 1)])
    assert admitted == 0
    # a genuinely new URL still admits
    assert f2.offer_groups("j", [("http://h0.test/",
                                  ["http://h0.test/new"], 1)]) == 1


def test_mark_done_accumulates_and_flushes_at_barriers():
    """mark_done_batch accumulates driver-side (zero standalone RPCs on
    the consume path) and every read barrier — stats, lineage — observes
    the full counts."""
    import numpy as np

    f = Frontier(num_shards=4, use_actors=False)
    f.add_seeds("j", ["http://h0.test/"])
    hosts = np.array(["h0.test", "h1.test", "h0.test", "h2.test"],
                     dtype=object)
    f.mark_done_batch("j", hosts, [True, False, True, True],
                      [100, 0, 50, 25])
    # accumulated, not yet shipped
    assert f._done_acc
    st = f.stats("j")
    assert not f._done_acc  # barrier flushed
    assert st["done"] == 4 and st["succeeded"] == 3 and st["failed"] == 1
    assert st["bytes_fetched"] == 175 and st["credits_used"] == 4
    # a second batch rides the next fused offer round
    f.mark_done_batch("j", hosts[:2], [True, True], [10, 10])
    f.offer_groups("j", [("http://h0.test/", ["http://h0.test/x"], 1)])
    lin = f.lineage_rows("j", epoch=0)
    assert sum(lin.column("done").to_pylist()) == 6
