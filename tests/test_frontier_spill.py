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

    names = os.listdir(str(tmp_path / "sp"))
    pids = {n.split("_")[1] for n in names} if names else set()
    assert len(names) == len(set(names))


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
