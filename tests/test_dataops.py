"""Training-data operator tests: dedup family, similarity search, text
analysis, media plumbing. These run small in-memory datasets through the
same map_batches/groupby code paths the queries use."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from anycrawl_ray.stages.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    jaccard,
    minhash_lsh_pairs,
    shingle_hashes,
    simhash64,
    simhash_pairs,
)
from anycrawl_ray.stages.similarity import ivf_knn, kmeans_fit, knn_brute
from anycrawl_ray.stages.text_analysis import (
    Fingerprinter,
    LangId,
    text_stats_batch,
)
from anycrawl_ray.stages.media import (
    MediaFeatureExtractor,
    extract_media_features,
    media_table_from_documents,
)


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
    }))


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight")


def test_exact_dedup_keeps_min_doc_id(ray_session):
    ds = _docs_ds([(5, "aaa"), (2, "bbb"), (9, "aaa"), (1, "aaa"), (7, "ccc")])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert dict(zip(out["text"], out["doc_id"])) == {"aaa": 1, "bbb": 2, "ccc": 7}
    assert dict(zip(out["text"], out["n_copies"])) == {"aaa": 3, "bbb": 1, "ccc": 1}


def test_exact_dedup_distributed_path_matches_broadcast(ray_session):
    rows = [(i, f"text-{i % 7}") for i in range(40)] + [(100, "unique one")]
    fast = (exact_dedup(_docs_ds(rows)).to_pandas()
            [["doc_id", "text", "n_copies"]]
            .sort_values("doc_id").reset_index(drop=True))
    # broadcast_limit=0 forces the distributed fat-bucket first-wins plan
    dist = (exact_dedup(_docs_ds(rows), broadcast_limit=0).to_pandas()
            [["doc_id", "text", "n_copies"]]
            .sort_values("doc_id").reset_index(drop=True))
    assert fast.equals(dist)
    assert set(fast["doc_id"]) == {0, 1, 2, 3, 4, 5, 6, 100}
    assert fast.loc[fast["doc_id"] == 0, "n_copies"].iloc[0] == 6


def test_jaccard_and_shingles():
    assert jaccard(BASE, BASE) == 1.0
    assert jaccard(BASE, "completely different words here entirely") == 0.0
    near = BASE + " extra"
    assert 0.7 < jaccard(BASE, near) < 1.0
    assert shingle_hashes("a b", k=3).size == 2  # falls back to unique tokens


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=60).tolist()
        rows.append((i, " ".join(words)))
    # plant: 100/101 near-identical, 102/103 identical
    rows.append((100, BASE))
    rows.append((101, BASE + " tail"))
    rows.append((102, "x " + BASE))
    rows.append((103, "x " + BASE))
    pairs = minhash_lsh_pairs(_docs_ds(rows), threshold=0.5)
    found = set(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()))
    assert (100, 101) in found
    assert (102, 103) in found
    # verified jaccard values are exact
    jac = dict(zip(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()),
                   pairs.column("jaccard").to_pylist()))
    assert jac[(102, 103)] == 1.0
    assert jac[(100, 101)] == pytest.approx(jaccard(BASE, BASE + " tail"))


def test_pairs_from_buckets_guard_crossing(ray_session):
    """The driver-fold pair kernel, the fat-bucket distributed path
    (driver_limit=0) and a brute per-bucket Python reference must agree
    exactly — including the row-count [2, max_bucket] gate (applied to
    RAW rows, before the distinct-doc dedup) and the distinct-doc gate."""
    import ray.data as rd

    from anycrawl_ray.stages.dedup import _pairs_from_buckets

    rng = np.random.default_rng(3)
    buckets = rng.integers(0, 40, 500).astype(np.int64)
    docs = rng.integers(0, 60, 500).astype(np.int64)
    # plant an oversized bucket (row count > max_bucket) and a singleton
    buckets = np.concatenate([buckets, np.full(30, 777), [888]])
    docs = np.concatenate([docs, rng.integers(0, 60, 30), [5]])
    t = pa.table({"bucket": pa.array(buckets), "doc_id": pa.array(docs),
                  "band_id": pa.array(np.zeros(buckets.size, np.int32))})
    max_bucket = 25

    def brute():
        out = set()
        import collections
        by = collections.defaultdict(list)
        for bk, d in zip(buckets.tolist(), docs.tolist()):
            by[bk].append(d)
        for bk, ds_ in by.items():
            if not (2 <= len(ds_) <= max_bucket):
                continue
            ids = sorted(set(ds_))
            if len(ids) < 2 or len(ids) > max_bucket:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out.add((ids[i], ids[j]))
        return out

    def run(**kw):
        got = _pairs_from_buckets(rd.from_arrow(t).repartition(7),
                                  max_bucket=max_bucket, **kw).to_pandas()
        return set(zip(got["a"], got["b"]))

    want = brute()
    assert run() == want                     # driver fold
    assert run(driver_limit=0) == want       # fat-bucket distributed path


def test_simhash_blocking_finds_hamming_neighbors(ray_session):
    s1 = simhash64(BASE)
    s2 = simhash64(BASE + " tail")
    assert bin(s1 ^ s2).count("1") <= 8  # similar docs -> close hashes
    rows = [(1, BASE), (2, BASE), (3, "unrelated totally different content here")]
    pairs = simhash_pairs(_docs_ds(rows), max_hamming=3)
    got = set(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()))
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def _emb_ds(mat, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(mat)))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def test_embedding_neardup_planted(ray_session):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 16))
    mat[10] = mat[4] + 0.01 * rng.standard_normal(16)  # plant near-dup
    out = embedding_neardup_pairs(_emb_ds(mat), threshold=0.95)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (4, 10) in pairs


def test_embedding_verify_batch_matches_scalar(ray_session):
    """The vectorized cosine verify (verify_batch_fn) and the scalar
    per-pair path must admit the SAME pair set (scores agree to float
    drift far inside every consumer's threshold margin) across both the
    broadcast and join attach plans."""
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((60, 16))
    for j in range(0, 20, 2):  # plant near-dups so the set is non-trivial
        mat[j + 1] = mat[j] + 0.05 * rng.standard_normal(16)
    outs = []
    for bl in (100_000, 0):  # broadcast plan, then forced join plan
        out = embedding_neardup_pairs(_emb_ds(mat), threshold=0.9,
                                      broadcast_limit=bl)
        outs.append(set(zip(out.column("a").to_pylist(),
                            out.column("b").to_pylist())))
    assert outs[0] == outs[1]
    # scalar ground truth
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    want = {(a, b) for a in range(60) for b in range(a + 1, 60)
            if sims[a, b] >= 0.9}
    # LSH may miss pairs (recall < 1) but never invent them; planted
    # near-identical pairs must all surface
    assert outs[0] <= want
    assert {(j, j + 1) for j in range(0, 20, 2)} <= outs[0]


def test_knn_brute_matches_numpy(ray_session):
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((200, 16))
    ds = _emb_ds(mat)
    q = mat[:3]
    out = knn_brute(ds, q, [0, 1, 2], k=5).to_pandas()
    # numpy ground truth
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = (q / np.linalg.norm(q, axis=1, keepdims=True)) @ nm.T
    for qi in range(3):
        want = np.argsort(-sims[qi], kind="stable")[:5].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert got[0] == qi  # self is rank 1
        assert set(got) == set(want)


def test_ivf_recall_vs_brute(ray_session):
    rng = np.random.default_rng(2)
    centers = rng.standard_normal((8, 32)) * 3
    mat = np.concatenate([c + rng.standard_normal((40, 32)) for c in centers])
    ds = _emb_ds(mat)
    q = mat[:5]
    ids = list(range(5))
    brute = knn_brute(ds, q, ids, k=10).to_pandas()
    approx = ivf_knn(ds, q, ids, k=10, n_clusters=8, nprobe=3).to_pandas()
    recalls = []
    for qi in ids:
        b = set(brute[brute["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.8


def test_kmeans_deterministic():
    rng = np.random.default_rng(5)
    sample = rng.standard_normal((100, 8))
    c1 = kmeans_fit(sample, n_clusters=4, seed=9)
    c2 = kmeans_fit(sample, n_clusters=4, seed=9)
    assert np.array_equal(c1, c2)


def test_hash_centroids_distributed_equals_global(ray_session):
    """The map-side local-top-n + driver-merge selection equals a global
    lexsort over (mix64(vec_id), vec_id) — regardless of block layout."""
    from anycrawl_ray.stages.similarity import _mix64_np, hash_centroids

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((97, 8))
    ds = _emb_ds(mat).repartition(7)  # vec_ids 0..96, several blocks
    got = hash_centroids(ds, n_clusters=6)
    ids = np.arange(97, dtype=np.int64)
    order = np.lexsort((ids, _mix64_np(ids.astype(np.uint64))))[:6]
    want = mat[order].astype(np.float32).astype(np.float64)  # f32 storage round-trip
    assert np.array_equal(got, want)


def test_ivf_index_search_equals_ivf_knn(ray_session, tmp_path):
    """With shared centroids, the persistent partition-pruned index and the
    one-shot ivf_knn return the SAME rows — no cross-query candidate bleed
    from the union of probed cluster paths."""
    from anycrawl_ray.stages.similarity import IVFIndex, hash_centroids

    rng = np.random.default_rng(12)
    mat = rng.standard_normal((300, 16))
    ds = _emb_ds(mat)
    cents = hash_centroids(ds, n_clusters=8)
    q, ids = mat[:4], list(range(4))
    one_shot = ivf_knn(ds, q, ids, k=7, nprobe=2, centroids=cents).to_pandas()
    index = IVFIndex.build(ds, str(tmp_path / "ivf_eq"), n_clusters=8,
                           centroids=cents)
    via_index = index.search(q, ids, k=7, nprobe=2).to_pandas()
    assert one_shot[["query_id", "neighbor_id", "rank"]].values.tolist() == \
        via_index[["query_id", "neighbor_id", "rank"]].values.tolist()


def test_media_bulk_decode_equals_scalar():
    from anycrawl_ray.stages.media import (decode_image, decode_images_bulk,
                                           fnv1a_bytes, fnv1a_bytes_bulk)

    payloads = [b"", b"a", b"hello world", bytes(range(256)), b"x" * 1000]
    bulk = decode_images_bulk(payloads)
    for p, g in zip(payloads, bulk):
        assert np.array_equal(decode_image(p), g)
    assert fnv1a_bytes_bulk(payloads).tolist() == [fnv1a_bytes(p) for p in payloads]
    assert fnv1a_bytes(b"") == 0xCBF29CE484222325  # FNV offset basis


def test_text_stats_vectorized():
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["the cat and a dog!", ""]})
    out = text_stats_batch(batch)
    row = out.to_pylist()[0]
    assert row["n_tokens"] == 5
    assert row["stop_hits"] == 3  # the, and, a
    assert row["punct_hits"] == 1
    empty = out.to_pylist()[1]
    assert empty["n_tokens"] == 0 and empty["quality"] == 0.0


def test_langid_and_fingerprint():
    lid = LangId()
    assert lid.guess("der hund ist gut und die katze") == "de"
    assert lid.guess("le chat est sur la table et il dort") == "fr"
    assert lid.guess("数据 处理 系统") == "zh"
    assert lid.guess("plain words only") == "en"
    fp = Fingerprinter()
    a = fp.fingerprint("one two three")
    assert a == fp.fingerprint("one   two\tthree")  # whitespace-insensitive
    assert a != fp.fingerprint("three two one")  # order-sensitive
    assert fp.fingerprint("") == 0


def test_media_pipeline_plumbing(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).slice(0, 50)
    media = media_table_from_documents(docs)
    assert media.schema.field("payload").type == pa.binary()
    out_ds = extract_media_features(rd.from_arrow(media), concurrency=2, batch_size=16)
    out = pa.concat_tables(out_ds.iter_batches(batch_size=1024, batch_format="pyarrow"))
    assert out.num_rows == 50
    assert "payload" not in out.schema.names  # blobs dropped after featurize
    feat = out.column("feature").to_pylist()[0]
    assert len(feat) == 8 and all(0.0 <= v <= 1.0 for v in feat)
    # deterministic features
    direct = MediaFeatureExtractor()(media.slice(0, 4))
    assert direct.column("payload_hash").to_pylist() == out.column(
        "payload_hash").to_pylist()[:4]


def test_verify_join_path_matches_broadcast(ray_session):
    """The at-scale hash-join verify path (broadcast_limit=0) must produce
    byte-identical results to the default broadcast path, for both text
    jaccard and embedding cosine payloads."""
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    rows = [(i, " ".join(rng.choice(vocab, size=60).tolist())) for i in range(60)]
    rows += [(100, BASE), (101, BASE + " tail"), (102, "x " + BASE),
             (103, "x " + BASE)]
    bcast = minhash_lsh_pairs(_docs_ds(rows), threshold=0.5)
    joined = minhash_lsh_pairs(_docs_ds(rows), threshold=0.5, broadcast_limit=0)
    assert bcast.equals(joined)
    assert bcast.num_rows >= 2

    mat = rng.standard_normal((50, 16))
    mat[10] = mat[4] + 0.01 * rng.standard_normal(16)
    e_b = embedding_neardup_pairs(_emb_ds(mat), threshold=0.95)
    e_j = embedding_neardup_pairs(_emb_ds(mat), threshold=0.95, broadcast_limit=0)
    assert e_b.equals(e_j)
    assert e_b.num_rows >= 1


def test_embedding_brute_matches_numpy_and_lsh_recall(ray_session):
    """embedding_brute_pairs == exact numpy all-pairs; the LSH variant's
    output is a subset with high recall at the same threshold."""
    from anycrawl_ray.stages.dedup import embedding_brute_pairs

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((120, 32))
    mat[7] = mat[3] + 0.05 * rng.standard_normal(32)
    ds = _emb_ds(mat)
    thr = 0.5
    brute = embedding_brute_pairs(ds, threshold=thr)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    ii, jj = np.nonzero(np.triu(sims >= thr, k=1))
    want = sorted(zip(ii.tolist(), jj.tolist()))
    got = sorted(zip(brute.column("a").to_pylist(), brute.column("b").to_pylist()))
    assert got == want
    assert (3, 7) in got
    lsh = embedding_neardup_pairs(_emb_ds(mat), threshold=thr, num_planes=16,
                                  bands=8)
    lsh_pairs = set(zip(lsh.column("a").to_pylist(), lsh.column("b").to_pylist()))
    assert lsh_pairs <= set(got)
    assert len(lsh_pairs) >= 0.7 * len(got)  # banded recall


def test_media_resize_and_frame_sampling(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.media import (
        FrameSampler,
        ImageResizer,
        decode_image,
        media_table_from_documents,
        resize_images,
        sample_frames,
    )

    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": ["alpha beta", "gamma delta", "epsilon"]})
    media = media_table_from_documents(docs)
    # give row 2 a video-ish duration so frame sampling explodes it
    media = media.set_column(media.schema.get_field_index("duration_ms"),
                             "duration_ms", pa.array([0, 2500, 999], pa.int32()))

    out = pa.concat_tables(resize_images(
        rd.from_arrow(media), target_w=4, target_h=4,
        concurrency=2).iter_batches(batch_size=100, batch_format="pyarrow"))
    assert out.column("width").to_pylist() == [4, 4, 4]
    assert all(len(p) == 16 for p in out.column("payload").to_pylist())
    # deterministic: equals the inline kernel
    inline = ImageResizer(4, 4)._resize(decode_image("alpha beta".encode()))
    row = out.filter(pa.compute.equal(out.column("media_id"), "m1"))
    assert row.column("payload").to_pylist()[0] == inline.tobytes()

    frames = pa.concat_tables(sample_frames(
        rd.from_arrow(media), every_ms=1000,
        concurrency=2).iter_batches(batch_size=100, batch_format="pyarrow"))
    per = frames.group_by("media_id").aggregate([("frame_idx", "count")])
    counts = dict(zip(per.column("media_id").to_pylist(),
                      per.column("frame_idx_count").to_pylist()))
    # 0ms -> 1 frame, 2500ms -> 3 frames (0,1000,2000), 999ms -> 1
    assert counts == {"m1": 1, "m2": 3, "m3": 1}
    m2 = frames.filter(pa.compute.equal(frames.column("media_id"), "m2"))
    assert sorted(m2.column("ts_ms").to_pylist()) == [0, 1000, 2000]
    # frames at different timestamps differ (reseeded decode)
    payloads = m2.column("frame_payload").to_pylist()
    assert len(set(payloads)) == 3
    # inline equality for a specific frame
    f = FrameSampler(1000)
    want = decode_image("gamma delta".encode() + (1000).to_bytes(8, "little"))
    got = m2.filter(pa.compute.equal(m2.column("ts_ms"), 1000))
    assert got.column("frame_payload").to_pylist()[0] == want.tobytes()


def test_ivf_index_partition_pruning(ray_session, tmp_path):
    """IVFIndex: build writes hive-partitioned cluster dirs; search reads
    only probed clusters and its results equal ivf_knn-style ANN recall
    (>= brute recall bound pinned for ivf_knn); centroids round-trip."""
    import os

    from anycrawl_ray.stages.similarity import IVFIndex, knn_brute

    rng = np.random.default_rng(2)
    centers = rng.standard_normal((8, 32)) * 3
    mat = np.concatenate([c + rng.standard_normal((40, 32)) for c in centers])
    ds = _emb_ds(mat)
    idx_dir = str(tmp_path / "ivf")
    index = IVFIndex.build(ds, idx_dir, n_clusters=8)
    parts = [n for n in os.listdir(idx_dir) if n.startswith("cluster=")]
    assert len(parts) >= 4  # clustered data spreads over partitions
    # reload from disk
    index2 = IVFIndex.load(idx_dir)
    assert np.array_equal(index.centroids, index2.centroids)
    q = mat[:5]
    ids = list(range(5))
    brute = knn_brute(_emb_ds(mat), q, ids, k=10).to_pandas()
    approx = index2.search(q, ids, k=10, nprobe=3).to_pandas()
    recalls = []
    for qi in ids:
        want = set(brute[brute["query_id"] == qi]["neighbor_id"])
        got = set(approx[approx["query_id"] == qi]["neighbor_id"])
        recalls.append(len(want & got) / len(want))
    assert sum(recalls) / len(recalls) >= 0.8
    # pruning is real: ask for MORE neighbors than the probed cluster
    # holds — a pruned read can only return that cluster's members, while
    # a regression to scanning every cluster dir would return k=100 rows
    from anycrawl_ray.stages.similarity import _normalize

    nm = _normalize(mat)
    assign = (nm @ index2.centroids.T).argmax(axis=1)
    probed = int((_normalize(q[:1]) @ index2.centroids.T).argmax())
    cluster_size = int((assign == probed).sum())
    assert cluster_size < 100 < len(mat)
    one = index2.search(q[:1], [0], k=100, nprobe=1).to_pandas()
    assert len(one) == cluster_size
    assert all(assign[nid] == probed for nid in one["neighbor_id"])


def test_decontaminate_semantics(ray_session):
    """Corpus docs sharing >= min_shared distinct word n-grams with any
    benchmark doc are flagged with their DISTINCT shared-gram count."""
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.stages.dedup import decontaminate

    bench = rd.from_arrow(pa.table({
        "doc_id": [0], "text": ["the quick brown fox jumps high"]}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # shares 'the quick brown' AND 'quick brown fox' (2 grams)
            "so the quick brown fox ran",
            # shares exactly one gram ('fox jumps high')
            "big fox jumps high again",
            # words overlap but no full trigram
            "quick fox brown the jumps",
            # repeated gram counts ONCE (distinct grams)
            "the quick brown then the quick brown",
        ]}))
    out = decontaminate(corpus, bench, n=3, min_shared=1)
    assert out.to_pylist() == [
        {"doc_id": 1, "n_shared": 2},
        {"doc_id": 2, "n_shared": 1},
        {"doc_id": 4, "n_shared": 1},
    ]
    # min_shared gate
    out2 = decontaminate(corpus, bench, n=3, min_shared=2)
    assert out2.to_pylist() == [{"doc_id": 1, "n_shared": 2}]
    # empty benchmark -> nothing flagged, empty typed table
    empty = decontaminate(
        corpus, rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                        "text": pa.array([], pa.string())})),
        n=3)
    assert empty.num_rows == 0 and empty.schema.names == ["doc_id",
                                                          "n_shared"]


def test_pack_sequences_prefix_sum(ray_session):
    """Bins are exact even when buckets and blocks split mid-bin: doc d's
    bin = floor(tokens-before-d / budget), global over doc_id order."""
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import pack_sequences

    # 10 docs x 3 tokens, budget 7 -> before = 0,3,6,9,... bins 0,0,0,1,...
    texts = ["a b c"] * 10
    ds = rd.from_arrow(pa.table({"doc_id": list(range(10)),
                                 "text": texts})).repartition(4)
    out = pack_sequences(ds, budget=7, bucket_size=3)  # buckets of 3 docs
    rows = out.to_pylist()
    # serial reference
    before, bins = 0, {}
    for _ in range(10):
        b = before // 7
        bins[b] = bins.get(b, [0, 0])
        bins[b][0] += 1
        bins[b][1] += 3
        before += 3
    expect = [{"bin": b, "n_docs": v[0], "sum_tokens": v[1]}
              for b, v in sorted(bins.items())]
    assert rows == expect
    # distributed prefix-sum path (driver-fold guard forced off) is
    # pinned equal to the driver fold; unicode whitespace + empty docs
    # keep the Arrow tokenizer on split() parity
    texts2 = ["a　b  c ", "", "  ", "x y", "one"] * 4
    ds2 = rd.from_arrow(pa.table({"doc_id": list(range(20)),
                                  "text": texts2})).repartition(3)
    fold = pack_sequences(ds2, budget=5, bucket_size=4).to_pylist()
    dist = pack_sequences(ds2, budget=5, bucket_size=4,
                          driver_limit=0).to_pylist()
    assert fold == dist
    serial_counts = [len(t.split()) for t in texts2]
    assert sum(r["sum_tokens"] for r in fold) == sum(serial_counts)


def test_neardup_components_vs_union_find(ray_session):
    """Distributed min-label propagation == driver union-find on a graph
    with chains, a diamond, singleton-free pairs, and disjoint islands."""
    import pyarrow as pa

    from anycrawl_ray.stages.dedup import neardup_components

    edges = [(1, 2), (2, 3), (3, 4),      # chain -> rep 1
             (10, 11), (10, 12), (11, 12),  # triangle -> rep 10
             (20, 21),                     # island -> rep 20
             (31, 30), (32, 33), (30, 33)]  # diamond-ish merge -> rep 30
    pairs = pa.table({"a": [e[0] for e in edges],
                      "b": [e[1] for e in edges]})
    out = {r["doc_id"]: r["cluster_rep"]
           for r in neardup_components(pairs).to_pylist()}

    # driver union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert out == expect
    assert out[4] == 1 and out[12] == 10 and out[33] == 30

    # guard crossing: driver_limit=0 forces the distributed per-round
    # join/groupby propagation; must equal the driver fold
    dist = {r["doc_id"]: r["cluster_rep"]
            for r in neardup_components(pairs,
                                        driver_limit=0).to_pylist()}
    assert dist == expect

    # empty input -> typed empty table
    empty = neardup_components(pa.table({"a": pa.array([], pa.int64()),
                                         "b": pa.array([], pa.int64())}))
    assert empty.num_rows == 0
    assert empty.schema.names == ["doc_id", "cluster_rep"]


def test_asof_join_matches_pandas(ray_session):
    """asof_join == pandas merge_asof per key, incl. no-match and empty-
    right-side keys."""
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import asof_join

    rng = np.random.default_rng(21)
    n_l, n_r = 120, 80
    left = pa.table({
        "event_id": pa.array(range(n_l), pa.int64()),
        "user_id": pa.array(rng.integers(0, 6, n_l), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n_l), pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array(rng.integers(0, 4, n_r), pa.int64()),  # users 4,5 empty
        "ts": pa.array(rng.integers(0, 10_000, n_r), pa.int64()),
    })
    got = asof_join(rd.from_arrow(left).repartition(3),
                    rd.from_arrow(right).repartition(2),
                    key="user_id", ts_col="ts",
                    out_cols=["event_id", "user_id", "ts"],
                    prior_col="prior_ts").to_pandas()
    want = pd.merge_asof(
        left.to_pandas().sort_values("ts"),
        right.to_pandas().sort_values("ts").rename(columns={"ts": "prior_ts"}),
        left_on="ts", right_on="prior_ts", by="user_id",
        direction="backward")
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    # int ts -> nullable Int64 output (exact above 2^53, unlike float64)
    g = got["prior_ts"].astype("float64").to_numpy()
    w = want["prior_ts"].to_numpy()
    assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()


def test_asof_join_empty_left_buckets_keep_schema(ray_session):
    """Buckets whose keys have ONLY right rows must still emit the full
    output schema incl. the prior column — otherwise Ray sees blocks with
    inconsistent schemas. (A truly-empty overall result loses its schema
    inside Ray's empty-dataset representation; that's a Ray property, not
    an operator one.)"""
    import ray.data as rd

    from anycrawl_ray.stages.window import asof_join

    left = pa.table({"event_id": pa.array([7], pa.int64()),
                     "user_id": pa.array([1], pa.int64()),
                     "ts": pa.array([15], pa.int64())})
    right = pa.table({"user_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                      "ts": pa.array([10, 20, 30, 40, 50, 60], pa.int64())})
    got = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    key="user_id", ts_col="ts",
                    out_cols=["event_id", "user_id", "ts"],
                    prior_col="prior_ts").to_pandas()
    assert list(got.columns) == ["event_id", "user_id", "ts", "prior_ts"]
    assert got["event_id"].tolist() == [7]
    assert got["prior_ts"].tolist() == [10]


def test_running_total_matches_pandas(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.window import running_total

    rng = np.random.default_rng(22)
    n = 200
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 50, n), pa.int64()),  # ts ties!
        "cents": pa.array(rng.integers(-100, 1000, n), pa.int64()),
    })
    got = running_total(rd.from_arrow(t).repartition(4), key="user_id",
                        order_cols=["ts", "event_id"], cents_col="cents",
                        out_cols=["event_id", "user_id"]).to_pandas()
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["want"] = df.groupby("user_id")["cents"].cumsum()
    merged = got.merge(df[["event_id", "want"]], on="event_id")
    assert (merged["running_cents"] == merged["want"]).all()
    assert len(merged) == n


def test_group_quantiles_percentile_disc(ray_session):
    """Histogram read-off == quantile_disc (element at ceil(p*n)) on a
    corpus with heavy value ties."""
    import duckdb
    import ray.data as rd

    from anycrawl_ray.stages.window import group_quantiles

    rng = np.random.default_rng(23)
    n = 500
    t = pa.table({
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(np.round(rng.uniform(0, 3, n), 2)),  # many ties
    })
    got = group_quantiles(rd.from_arrow(t).repartition(4), key="event_type",
                          value_col="value", ps=[0.5, 0.95]).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute("""
        SELECT event_type, COUNT(*) AS n,
               quantile_disc(CAST(round_even(value*100, 0) AS BIGINT), 0.5) AS q50_cents,
               quantile_disc(CAST(round_even(value*100, 0) AS BIGINT), 0.95) AS q95_cents
        FROM t GROUP BY event_type ORDER BY event_type""").df()
    got = got.sort_values("event_type").reset_index(drop=True)
    assert got[["event_type", "n", "q50_cents", "q95_cents"]].astype(str) \
        .values.tolist() == want.astype(str).values.tolist()


def test_range_join_count_matches_bruteforce(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.window import range_join_count

    rng = np.random.default_rng(24)
    n_l, n_r = 100, 150
    left = pa.table({
        "event_id": pa.array(range(n_l), pa.int64()),
        "user_id": pa.array(rng.integers(0, 5, n_l), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, n_l), pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array(rng.integers(0, 5, n_r), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, n_r), pa.int64()),
    })
    got = range_join_count(rd.from_arrow(left).repartition(3),
                           rd.from_arrow(right).repartition(2),
                           key="user_id", ts_col="ts",
                           out_cols=["event_id", "user_id"],
                           low=0, high=50).to_pandas()
    lu, lt = left.column("user_id").to_numpy(), left.column("ts").to_numpy()
    ru, rt = right.column("user_id").to_numpy(), right.column("ts").to_numpy()
    want = {int(e): int(((ru == u) & (rt > t) & (rt <= t + 50)).sum())
            for e, u, t in zip(left.column("event_id").to_numpy(), lu, lt)}
    got_map = dict(zip(got["event_id"], got["n_in_range"]))
    assert got_map == want


def test_winnow_guarantee_and_selection():
    """Winnowing guarantee: two docs sharing a token run of >= w+k-1
    tokens share a fingerprint; selection density is ~2/(w+1); short and
    empty docs behave."""
    from anycrawl_ray.stages.dedup import winnow_fingerprints

    k, w = 3, 4
    shared_run = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    a = "one two three " + shared_run + " four five six"
    b = "seven eight " + shared_run + " nine ten"
    fa = set(winnow_fingerprints(a, k, w).tolist())
    fb = set(winnow_fingerprints(b, k, w).tolist())
    assert fa & fb, "guaranteed shared fingerprint missing"
    # unrelated docs share nothing
    fc = set(winnow_fingerprints(
        "完全 不同 的 内容 词 序列 没有 重叠", k, w).tolist())
    assert not (fa & fc)
    # density: selected <= grams, roughly 2/(w+1) on random text
    long = " ".join(f"t{i}" for i in range(500))
    sel = winnow_fingerprints(long, k, w)
    assert 0 < sel.size <= 500 - k + 1
    # short docs: one window over all grams -> exactly one fingerprint
    assert winnow_fingerprints("just two", k, w).size == 1
    assert winnow_fingerprints("", k, w).size == 0


def test_winnow_pairs_planted(ray_session):
    from anycrawl_ray.stages.dedup import winnow_pairs

    rng = np.random.default_rng(25)
    vocab = [f"w{i}" for i in range(300)]
    rows = [(i, " ".join(rng.choice(vocab, size=40).tolist()))
            for i in range(30)]
    rows.append((100, BASE))
    rows.append((101, BASE + " coda"))
    out = winnow_pairs(_docs_ds(rows), k=3, w=4, min_shared=2)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (100, 101) in pairs


def test_pagerank_int_matches_numpy_reference(ray_session):
    """Distributed integer PageRank == a serial numpy replay of the same
    integer recurrence (order-free arithmetic, so equality is exact)."""
    from anycrawl_ray.stages.graph import pagerank_int, synthetic_degrees

    n, iters, scale = 97, 6, 10 ** 12
    got = pagerank_int(n, iters=iters, scale=scale)
    ids = np.arange(n, dtype=np.int64)
    deg = synthetic_degrees(ids, n)
    scale0 = scale // n
    r = np.full(n, scale0, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        cv = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        c1 = 2 * ids + 1
        m = c1 < n
        np.add.at(s, c1[m], cv[m])
        c2 = 2 * ids + 2
        m = c2 < n
        np.add.at(s, c2[m], cv[m])
        m = ids % 3 == 0
        np.add.at(s, (7 * ids[m] + 3) % n, cv[m])
        r = (15 * scale0 + 85 * s) // 100
    assert got.column("doc_id").to_pylist() == ids.tolist()
    assert got.column("rank_scaled").to_pylist() == r.tolist()
    # sanity: ranks positive, seeds of hubs rank above leaves on average
    assert min(r.tolist()) > 0
    # guard crossing: broadcast_limit=0 forces the distributed
    # groupby-Sum iteration; it must equal the dense driver fold
    dist = pagerank_int(n, iters=iters, scale=scale, broadcast_limit=0)
    assert dist.equals(got)


def test_ppr_and_walks_guard_crossing(ray_session):
    """ppr_int and graph_walks: dense driver fold (default) ==
    distributed path (broadcast_limit=0), exactly."""
    from anycrawl_ray.stages.graph import graph_walks, ppr_int, site_edges
    import ray.data as rd

    n = 97
    dense = ppr_int(n, seed_mod=10, iters=4)
    dist = ppr_int(n, seed_mod=10, iters=4, broadcast_limit=0)
    assert dist.equals(dense)

    ids = rd.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(n, dtype=np.int64))})).repartition(3)
    dense_w = graph_walks(site_edges(ids, n), n, walk_len=3)
    dist_w = graph_walks(site_edges(ids, n), n, walk_len=3,
                         broadcast_limit=0)
    assert dist_w.equals(dense_w)


def test_ngram_novelty_guard_crossing(ray_session):
    """ngram_novelty: driver fold (default) == distributed groupby path
    (driver_limit=0), exactly, including empty docs and full dups."""
    from anycrawl_ray.stages.dedup import ngram_novelty

    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, "totally novel text here indeed"), (4, "")]
    ds = _docs_ds(rows)
    fold = ngram_novelty(ds, k=3)
    dist = ngram_novelty(_docs_ds(rows), k=3, driver_limit=0)
    assert fold.equals(dist)
    nov = dict(zip(fold.column("doc_id").to_pylist(),
                   fold.column("novelty_ppm").to_pylist()))
    assert nov[1] == 1_000_000  # first copy: fully novel
    assert nov[2] == 0          # exact dup of doc 1: nothing novel
    assert nov[4] == 0          # empty doc


def test_pair_ops_empty_and_disjoint_corpora(ray_session):
    """Clean corpora (no shared grams / fingerprints anywhere) must return
    typed empty pair tables, not crash — regression for the empty-bucket
    IndexError (ngram) and zero-batch concat ArrowInvalid (winnow)."""
    from anycrawl_ray.stages.dedup import ngram_jaccard_pairs, winnow_pairs

    disjoint = _docs_ds([(1, "alpha beta gamma delta"),
                         (2, "one two three four")])
    out = ngram_jaccard_pairs(disjoint, threshold_pct=25, n=2)
    assert out.num_rows == 0 and out.column_names == ["a", "b"]
    out = winnow_pairs(disjoint, k=3, w=4, min_shared=1)
    assert out.num_rows == 0
    assert out.column_names == ["a", "b", "shared"]
    empties = _docs_ds([(1, ""), (2, "")])
    assert winnow_pairs(empties).num_rows == 0
    assert ngram_jaccard_pairs(empties).num_rows == 0


def test_ngram_jaccard_stop_gram_cap(ray_session):
    """A universal bigram present in EVERY doc must not create pairs once
    its df exceeds max_df — the quadratic-bucket guard. Near-dup pairs
    built from uncapped grams still qualify."""
    from anycrawl_ray.stages.dedup import ngram_jaccard_pairs

    stop = "of the"  # one universal bigram, df = n_docs
    rows = [(i, f"{stop} unique{i} tail{i}") for i in range(50)]
    # plant a true near-dup pair sharing non-stop grams
    rows.append((100, "shared alpha beta gamma delta run"))
    rows.append((101, "shared alpha beta gamma delta jog"))
    ds = _docs_ds(rows)
    out = ngram_jaccard_pairs(ds, threshold_pct=25, n=2, max_df=10)
    got = list(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert got == [(100, 101)]
    # uncapped (max_df=None) exact mode: the stop gram creates a df=52
    # clique where every doc shares 1 of ~3 grams -> i*100 >= 25*union
    # admits the tiny docs' pairs; the cap removes exactly those
    unc = ngram_jaccard_pairs(ds, threshold_pct=10, n=2, max_df=None)
    assert unc.num_rows > 1


def test_keyword_topk_integer_idf(ray_session):
    """score = sum tf * (N // df); absent terms contribute nothing; ties
    break by doc_id ascending."""
    from anycrawl_ray.stages.text_analysis import keyword_topk

    rows = [(1, "the cat the dog"),        # tf(the)=2
            (2, "the fish"),               # tf(the)=1
            (3, "data data data"),         # tf(data)=3
            (4, "nothing relevant here"),
            (5, "the data")]               # tf(the)=1 tf(data)=1
    out = keyword_topk(_docs_ds(rows), ["the", "data", "zzz_absent"], k=3)
    n = 5  # df(the)=3 (docs 1,2,5), df(data)=2 (docs 3,5)
    scores = {1: 2 * (n // 3), 2: 1 * (n // 3), 3: 3 * (n // 2),
              5: 1 * (n // 3) + 1 * (n // 2)}
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = list(zip(out.column("doc_id").to_pylist(),
                   out.column("score").to_pylist()))
    assert got == want
    # no query term anywhere -> typed empty
    none = keyword_topk(_docs_ds([(1, "aa bb")]), ["zzz"], k=3)
    assert none.num_rows == 0 and none.column_names == ["doc_id", "score"]


def test_running_total_salted_equals_unsalted(ray_session):
    """Hot-key salting (chunked shuffle + carry-in offsets) computes the
    SAME per-key running totals as the unsalted operator — exact integer
    equality, including negative cents and single-chunk keys."""
    import ray.data as rd

    from anycrawl_ray.stages.window import running_total, running_total_salted

    rng = np.random.default_rng(31)
    n = 400
    ts = rng.integers(0, 200, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 3, n), pa.int64()),  # hot keys
        "ts": pa.array(ts, pa.int64()),
        "cents": pa.array(rng.integers(-50, 500, n), pa.int64()),
        "chunk": pa.array(ts // 20, pa.int64()),  # monotone in ts
    })
    base = running_total(rd.from_arrow(t).repartition(4), key="user_id",
                         order_cols=["ts", "event_id"], cents_col="cents",
                         out_cols=["event_id"]).to_pandas()
    salted = running_total_salted(
        rd.from_arrow(t).repartition(4), key="user_id",
        order_cols=["ts", "event_id"], cents_col="cents",
        out_cols=["event_id"], chunk_col="chunk").to_pandas()
    merged = base.merge(salted, on="event_id", suffixes=("_u", "_s"))
    assert len(merged) == n
    assert (merged["running_cents_u"] == merged["running_cents_s"]).all()


def test_running_total_auto_routes_hot_keys(ray_session):
    """Auto hot-key detection: a skewed corpus (one whale user, many small
    ones) must split — whale through the salted path, rest through the
    plain path — and the union must equal the plain operator on the whole
    input exactly. Also: no hot keys -> identical to plain."""
    import ray.data as rd

    from anycrawl_ray.stages.window import running_total, running_total_auto

    rng = np.random.default_rng(7)
    n = 600
    user = np.where(rng.random(n) < 0.6, 999, rng.integers(0, 40, n))
    ts = rng.integers(0, 300, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "cents": pa.array(rng.integers(-50, 500, n), pa.int64()),
        "chunk": pa.array(ts // 30, pa.int64()),
    })
    base = running_total(rd.from_arrow(t).repartition(4), key="user_id",
                         order_cols=["ts", "event_id"], cents_col="cents",
                         out_cols=["event_id"]).to_pandas()
    # threshold 100: user 999 (~360 rows) is hot, the 40 others are not
    auto = running_total_auto(
        rd.from_arrow(t).repartition(4), key="user_id",
        order_cols=["ts", "event_id"], cents_col="cents",
        out_cols=["event_id"], chunk_col="chunk",
        hot_threshold=100).to_pandas()
    merged = base.merge(auto, on="event_id", suffixes=("_u", "_a"))
    assert len(merged) == n
    assert (merged["running_cents_u"] == merged["running_cents_a"]).all()
    # threshold above every key: pure plain plan, same rows
    cold = running_total_auto(
        rd.from_arrow(t).repartition(4), key="user_id",
        order_cols=["ts", "event_id"], cents_col="cents",
        out_cols=["event_id"], chunk_col="chunk",
        hot_threshold=10_000).to_pandas()
    m2 = base.merge(cold, on="event_id", suffixes=("_u", "_a"))
    assert (m2["running_cents_u"] == m2["running_cents_a"]).all()
    # every key hot: pure salted plan, still exact
    allhot = running_total_auto(
        rd.from_arrow(t).repartition(4), key="user_id",
        order_cols=["ts", "event_id"], cents_col="cents",
        out_cols=["event_id"], chunk_col="chunk",
        hot_threshold=1).to_pandas()
    m3 = base.merge(allhot, on="event_id", suffixes=("_u", "_a"))
    assert len(m3) == n
    assert (m3["running_cents_u"] == m3["running_cents_a"]).all()


def test_funnel_vectorized_matches_reference(ray_session):
    """The batched-searchsorted kernel must equal a straightforward
    per-key scan on a randomized corpus (dup timestamps, missing stages,
    keys split across input blocks)."""
    import ray.data as rd

    from anycrawl_ray.stages.window import funnel

    rng = np.random.default_rng(11)
    n = 3000
    stages = ["signup", "click", "purchase"]
    within = 40
    keys = rng.integers(0, 300, n)
    ts = rng.integers(0, 200, n)
    types = rng.choice(stages + ["other"], n)
    t = pa.table({"user_id": pa.array(keys, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "event_type": pa.array(types)})
    got = funnel(rd.from_arrow(t).repartition(5), key="user_id",
                 ts_col="ts", type_col="event_type", stages=stages,
                 within=within)
    # reference: per-key first-strictly-after walk
    import pandas as pd

    df = pd.DataFrame({"k": keys, "ts": ts, "ty": types})
    want = [0] * len(stages)
    for _, g in df.groupby("k"):
        per = {s: np.sort(g.loc[g["ty"] == s, "ts"].to_numpy())
               for s in stages}
        if per[stages[0]].size == 0:
            continue
        t_prev = per[stages[0]][0]
        want[0] += 1
        for i, s in enumerate(stages[1:], start=1):
            cand = per[s]
            j = np.searchsorted(cand, t_prev, side="right")
            if j == cand.size or cand[j] > t_prev + within:
                break
            t_prev = cand[j]
            want[i] += 1
    assert got.column("n_keys").to_pylist() == want


def test_funnel_semantics(ray_session):
    """Funnel: stage i+1 must be strictly after stage i's time and within
    the window OF THAT time (first qualifying event advances the clock);
    events before the funnel entry don't count."""
    import ray.data as rd

    from anycrawl_ray.stages.window import funnel

    rows = [
        # user 1: full funnel
        (1, 100, "signup"), (1, 150, "click"), (1, 200, "purchase"),
        # user 2: click BEFORE signup only -> stops at signup
        (2, 100, "click"), (2, 200, "signup"),
        # user 3: click outside the window (within=100) -> stops at signup
        (3, 100, "signup"), (3, 250, "click"), (3, 260, "purchase"),
        # user 4: purchase at 280 is within the SECOND click's window
        # (190+100) but the FIRST qualifying click (t=110) sets the clock
        # -> 280 > 110+100 stops at click (discriminates MIN-based from
        # greedy re-anchoring semantics)
        (4, 100, "signup"), (4, 110, "click"), (4, 190, "click"),
        (4, 280, "purchase"),
        # user 5: never signed up
        (5, 100, "click"), (5, 150, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel(rd.from_arrow(t).repartition(3), key="user_id",
                 ts_col="ts", type_col="event_type",
                 stages=["signup", "click", "purchase"], within=100)
    assert out.column("stage").to_pylist() == ["signup", "click", "purchase"]
    assert out.column("n_keys").to_pylist() == [4, 2, 1]


def test_dedup_incremental_anti_join(ray_session):
    """Delta dedup: new docs whose text exists in the prior snapshot drop;
    new-only content survives (even exact dups WITHIN the new batch both
    survive — incremental dedup is vs the snapshot, not self-dedup)."""
    import ray.data as rd

    from anycrawl_ray.stages.dedup import dedup_incremental

    prior = _docs_ds([(0, "seen before"), (2, "also seen")])
    new = _docs_ds([(1, "seen before"),      # drops
                    (3, "brand new"),        # survives
                    (5, "also seen"),        # drops
                    (7, "brand new")])       # survives (self-dup kept)
    out = dedup_incremental(new, prior).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [3, 7]


def test_kmv_distinct_exact_below_k_and_estimates_above(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.sketches import kmv_distinct

    # below k: exact (mix64 is a bijection — no collision correction)
    t = pa.table({"u": pa.array([1, 2, 3, 2, 1, 7], pa.int64())})
    out = kmv_distinct(rd.from_arrow(t).repartition(3), "u", k=256)
    assert out.column("est_distinct").to_pylist() == [4]
    # above k: estimator within 20% of truth for 5000 distinct, k=256
    big = pa.table({"u": pa.array(np.arange(5000, dtype=np.int64))})
    est = kmv_distinct(rd.from_arrow(big).repartition(4), "u",
                       k=256).column("est_distinct")[0].as_py()
    assert abs(est - 5000) / 5000 < 0.2
    # block-split invariance: same estimate regardless of partitioning
    est2 = kmv_distinct(rd.from_arrow(big).repartition(13), "u",
                        k=256).column("est_distinct")[0].as_py()
    assert est == est2


def test_retention_cohorts_small(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.window import retention_cohorts

    wk = 604_800_000_000
    # user 1: weeks 0,1,3 / user 2: weeks 1,1 (dup events) / user 3: week 3
    rows = [(1, 0), (1, 1), (1, 3), (2, 1), (2, 1), (3, 3)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * wk + 5 for r in rows],
                       pa.timestamp("us")),
    })
    out = retention_cohorts(rd.from_arrow(t).repartition(3))
    got = {(c, o): n for c, o, n in zip(
        out.column("cohort_week").to_pylist(),
        out.column("week_offset").to_pylist(),
        out.column("n_users").to_pylist())}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (3, 0): 1}


def test_repetition_scores_fixed_point():
    from anycrawl_ray.stages.text_analysis import repetition_scores_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a b c a b c a b c",   # 7 trigrams, 3 distinct
                 "all words unique here now",  # 3 trigrams, all distinct
                 "xy",                    # < 3 tokens -> omitted
                 "w w w w"],              # 2 trigrams, 1 distinct
    })
    out = repetition_scores_batch(t)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("rep_scaled").to_pylist()))
    assert got == {1: (7 - 3) * 1_000_000 // 7, 2: 0,
                   4: (2 - 1) * 1_000_000 // 2}


def test_funnel_stage_with_zero_events(ray_session):
    """A bucket whose keys entered the funnel but where a LATER stage has
    no events at all must count zero, not crash (regression: the batched
    kernel eagerly indexed the empty candidate array)."""
    import ray.data as rd

    from anycrawl_ray.stages.window import funnel

    t = pa.table({"user_id": pa.array([1, 2, 3], pa.int64()),
                  "ts": pa.array([10, 20, 30], pa.int64()),
                  "event_type": pa.array(["signup"] * 3)})
    out = funnel(rd.from_arrow(t), key="user_id", ts_col="ts",
                 type_col="event_type",
                 stages=["signup", "click", "purchase"], within=100)
    assert out.column("n_keys").to_pylist() == [3, 0, 0]


def test_bm25_matches_float_reference(ray_session):
    """Integer BM25 with cleared denominators must rank exactly like the
    float textbook formula (idf quantized to N//df on both sides)."""
    from anycrawl_ray.stages.text_analysis import bm25_topk

    rows = [(1, "data systems love data and more data"),
            (2, "the quick fox and the lazy dog"),
            (3, "of data of systems of pipelines"),
            (4, "no query words here at all"),
            (5, "data")]
    out = bm25_topk(_docs_ds(rows), ["data", "the", "of"], k=5)
    got = out.column("doc_id").to_pylist()
    # float reference
    docs = {d: t.split() for d, t in rows}
    n = len(docs)
    tl = sum(len(t) for t in docs.values())
    avgdl = tl / n
    df = {}
    for t in docs.values():
        for q in {"data", "the", "of"} & set(t):
            df[q] = df.get(q, 0) + 1
    scores = {}
    for d, t in docs.items():
        s = 0.0
        for q in ("data", "the", "of"):
            tf = t.count(q)
            if tf == 0 or q not in df:
                continue
            idf = n // df[q]
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
        if s > 0:
            scores[d] = s
    want = sorted(scores, key=lambda d: (-scores[d], d))
    assert got == want
    # doc 4 (no query terms) must not appear
    assert 4 not in got


def test_redact_pii_counts_and_rewrites():
    from anycrawl_ray.stages.text_analysis import redact_pii_batch

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["mail a.b+c@x-y.co.uk and d@e.io today",
                           "no addresses here"]})
    out = redact_pii_batch(t)
    assert out.column("n_redactions").to_pylist() == [2, 0]
    assert out.column("clean_text").to_pylist()[0] == \
        "mail [EMAIL] and [EMAIL] today"


def test_chunk_overlap_boundaries():
    from anycrawl_ray.stages.text_analysis import chunk_overlap_batch

    toks = " ".join(f"t{i}" for i in range(100))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": [toks, ""]})
    out = chunk_overlap_batch(t, size=64, stride=48)
    # starts 0, 48, 96 -> lengths 64, 52, 4; empty doc emits nothing
    assert out.column("doc_id").to_pylist() == [1, 1, 1]
    assert out.column("n_tokens").to_pylist() == [64, 52, 4]
    first = out.column("chunk_text").to_pylist()
    assert first[0].startswith("t0 ") and first[0].endswith(" t63")
    assert first[2] == "t96 t97 t98 t99"


def test_substring_dup_coverage_planted(ray_session):
    """Plant an identical 8-token span in two docs; a third doc shares
    nothing. Coverage must mark exactly the span tokens (interval union,
    incl. overlapping occurrences within one doc)."""
    import ray.data as rd

    from anycrawl_ray.stages.dedup import substring_dup_coverage

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"one two three {span} four five",            # 13 tokens, 8 dup
            f"{span} six seven eight nine ten eleven",    # 14 tokens, 8 dup
            "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12",     # no dup
        ]),
    })
    out = substring_dup_coverage(rd.from_arrow(docs), k=8)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["dup_tokens"] == 8 and rows[1]["n_tokens"] == 13
    assert rows[2]["dup_tokens"] == 8 and rows[2]["n_tokens"] == 14
    assert rows[3]["dup_tokens"] == 0
    assert rows[1]["frac_ppm"] == 8 * 1_000_000 // 13

    # overlapping occurrences inside ONE doc: "a b c a b c a b c" with k=3
    # duplicates every 3-gram; the union must cover the whole doc, not 3x
    rep = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array(["a b c a b c a b c"])})
    out2 = substring_dup_coverage(rd.from_arrow(rep), k=3)
    r = out2.to_pylist()[0]
    assert r["n_tokens"] == 9 and r["dup_tokens"] == 9
    assert r["frac_ppm"] == 1_000_000


def test_interarrival_stats_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import interarrival_stats

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
    })
    out = interarrival_stats(rd.from_pandas(df), key="user_id",
                             ts_col="ts").to_pandas()

    ref = df.sort_values(["user_id", "ts"]).copy()
    ref["gap"] = ref.groupby("user_id")["ts"].diff().dt.total_seconds() * 1e6
    agg = (ref.dropna(subset=["gap"]).groupby("user_id")["gap"]
           .agg(n_gaps="count", sum_gap_us="sum", max_gap_us="max")
           .reset_index())
    agg = agg.astype({"n_gaps": "int64", "sum_gap_us": "int64",
                      "max_gap_us": "int64"})
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  agg.reset_index(drop=True))


def test_unigram_surprise_tiny(ray_session):
    """Hand-checkable corpus: counts {x:3, y:2, z:1}, T=6 ->
    surprise(x)=2, (y)=3, (z)=6."""
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import unigram_surprise

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["x x y", "x y z"])})
    out = unigram_surprise(rd.from_arrow(docs))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["mean_surprise"] == (2 + 2 + 3) // 3
    assert rows[2]["mean_surprise"] == (2 + 3 + 6) // 3
    assert rows[1]["n_tokens"] == 3 and rows[2]["n_tokens"] == 3


def test_quality_rules_edges():
    from anycrawl_ray.stages.text_analysis import quality_rules_batch

    long_good = " ".join(["words"] * 29 + ["the"])         # 30 tokens, stop
    short = "the tiny one"                                  # fails len
    no_stop = " ".join(["zzzz"] * 40)                       # fails stop
    symbols = " ".join(["!!"] * 30 + ["the"]) + " " + \
        " ".join(["word"] * 9)                              # symbol-heavy
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([long_good, short, no_stop, symbols])})
    out = quality_rules_batch(t).to_pylist()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["keep"] == 1
    assert by[2]["keep"] == 0 and by[2]["rule_len"] == 0
    assert by[3]["keep"] == 0 and by[3]["rule_stop"] == 0
    assert by[4]["rule_symbol"] == 0 and by[4]["keep"] == 0


def test_knn_graph_matches_bruteforce(ray_session):
    """Exact graph vs direct numpy all-pairs; also crosses chunk
    boundaries (chunk_rows < n) so the running-top-k merge is exercised."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import knn_graph

    rng = np.random.default_rng(5)
    n, d, k = 300, 16, 4
    emb = rng.normal(size=(n, d))
    tbl = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(list(emb),
                                          pa.list_(pa.float64()))})
    out = knn_graph(rd.from_arrow(tbl), k=k, chunk_rows=64).to_pandas()

    nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(n):
        order = np.lexsort((np.arange(n), -sims[i]))[:k]
        got = out[out.vec_id == i].sort_values("rank")
        assert got["neighbor_id"].tolist() == order.tolist(), i
    assert len(out) == n * k


def test_knn_graph_tied_duplicates_deterministic(ray_session):
    """More than k exact-duplicate embeddings: every prune step must keep
    the SQL oracle's tie order (cosine DESC, neighbor_id ASC), so the
    neighbors of a duplicated vector are exactly the k smallest other ids
    in its duplicate class (review finding: argpartition pruning dropped
    arbitrary tied neighbors)."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import knn_graph

    n, k = 40, 3
    base = np.ones(8)
    emb = np.tile(base, (n, 1))                     # all identical
    tbl = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(list(emb),
                                          pa.list_(pa.float64()))})
    out = knn_graph(rd.from_arrow(tbl), k=k, chunk_rows=7).to_pandas()
    for i in range(n):
        want = [j for j in range(n) if j != i][:k]
        got = out[out.vec_id == i].sort_values("rank")["neighbor_id"].tolist()
        assert got == want, (i, got, want)


def test_heavy_hitters_skewed_exact(ray_session):
    """Zipf-ish corpus where the per-block pruning actually drops items:
    output must equal the exact HAVING-threshold answer, including
    counts."""
    import ray.data as rd

    from anycrawl_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(7)
    # 3 hot items + a long tail of 2000 cold items, shuffled
    vals = np.concatenate([
        np.repeat(np.int64(101), 3000),
        np.repeat(np.int64(202), 1200),
        np.repeat(np.int64(303), 900),
        rng.integers(10_000, 12_000, 4900).astype(np.int64),
    ])
    rng.shuffle(vals)
    k = 10  # threshold = n/k = 1000
    n = vals.size
    ds = rd.from_arrow(pa.table({"item": pa.array(vals, pa.int64())})
                       ).repartition(8)
    got = heavy_hitters(ds, "item", k=k).to_pandas()
    import collections

    exact = collections.Counter(vals.tolist())
    want = sorted(((c, i) for i, c in exact.items() if c * k > n),
                  key=lambda t: (-t[0], t[1]))
    assert got["item"].tolist() == [i for _, i in want]
    assert got["cnt"].tolist() == [c for c, _ in want]
    assert got["item"].tolist() == [101, 202]  # 303 at 900 < 1000 misses


def test_heavy_hitters_none_qualify(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.sketches import heavy_hitters

    vals = np.arange(1000, dtype=np.int64)  # all distinct
    ds = rd.from_arrow(pa.table({"item": pa.array(vals, pa.int64())}))
    got = heavy_hitters(ds, "item", k=50).to_pandas()
    assert len(got) == 0


def test_transition_matrix_matches_bruteforce_with_ties(ray_session):
    import duckdb
    import ray.data as rd

    from anycrawl_ray.stages.window import transition_matrix

    rng = np.random.default_rng(11)
    n = 600
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        # coarse timestamps -> many exact ties inside a user
        "ts": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "event_id": pa.array(np.arange(n), pa.int64()),
    })
    got = transition_matrix(rd.from_arrow(t).repartition(5),
                            n_buckets=7).to_pandas()
    con = duckdb.connect()
    con.register("events", t.to_pandas())
    want = con.execute("""
        WITH s AS (SELECT event_type,
                          LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT prev AS prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM s WHERE prev IS NOT NULL GROUP BY 1,2 ORDER BY 1,2""").df()
    assert got.values.tolist() == want.values.tolist()


def _tri_brute(edges, n):
    """Per-node triangle counts by explicit enumeration."""
    import itertools

    adj = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cnt = [0] * n
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            cnt[x] += 1
            cnt[y] += 1
            cnt[z] += 1
    return {i: c for i, c in enumerate(cnt) if c}


def test_triangle_counts_random_graph(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(3)
    n = 40
    pairs = {(a, b) for a, b in zip(rng.integers(0, n, 220),
                                    rng.integers(0, n, 220)) if a != b}
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    # feed duplicated, unsorted rows: the op must dedup + canonicalize
    a = [e[0] for e in edges] + [e[1] for e in edges]
    b = [e[1] for e in edges] + [e[0] for e in edges]
    ds = rd.from_arrow(pa.table({"a": pa.array(a, pa.int64()),
                                 "b": pa.array(b, pa.int64())})
                       ).repartition(4)
    got = triangle_counts(ds, n).to_pandas()
    want = _tri_brute(edges, n)
    assert dict(zip(got["doc_id"], got["n_tri"])) == want
    assert len(want) > 0  # the random graph really has triangles
    # join path (broadcast guard forced off) must match byte-for-byte
    forced = triangle_counts(ds, n, broadcast_limit=0).to_pandas()
    assert forced.values.tolist() == got.values.tolist()
    # middle (bucketed-broadcast) path: n above the guard but the
    # degree table below it (only nodes WITH edges count) — pad the id
    # space with isolated nodes so n=80 > limit=60 >= deg rows
    mid = triangle_counts(ds, 80, broadcast_limit=60).to_pandas()
    assert dict(zip(mid["doc_id"], mid["n_tri"])) == want
    dense80 = triangle_counts(ds, 80).to_pandas()
    assert dense80.values.tolist() == mid.values.tolist()
    # distributed wedge generation inside the dense path (driver-fold
    # guard forced off) must also match byte-for-byte
    dist = triangle_counts(ds, n, wedge_driver_limit=0).to_pandas()
    assert dist.values.tolist() == got.values.tolist()


def test_triangle_counts_complete_and_star(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.graph import triangle_counts

    n = 9
    comp = [(a, b) for a in range(n) for b in range(a + 1, n)]
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in comp], pa.int64()),
        "b": pa.array([e[1] for e in comp], pa.int64())}))
    got = triangle_counts(ds, n).to_pandas()
    per_node = (n - 1) * (n - 2) // 2  # K9: C(8,2) per node
    assert got["n_tri"].tolist() == [per_node] * n

    star = [(0, i) for i in range(1, 30)]  # hub, triangle-free
    ds2 = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in star], pa.int64()),
        "b": pa.array([e[1] for e in star], pa.int64())}))
    assert len(triangle_counts(ds2, 30).to_pandas()) == 0


def _kmeans_ref(ids, emb, k, iters, scale=100, offset=1000):
    """Driver-side reference of the exact integer k-means recurrence."""
    q = (np.rint(np.asarray(emb, dtype=np.float64) * scale)
         + offset).astype(np.int64)
    from anycrawl_ray.stages.text_analysis import _mix64_np

    rank = _mix64_np(np.asarray(ids, dtype=np.int64).view(np.uint64))
    seed_idx = np.lexsort((ids, rank))[:k]
    cents = q[seed_idx].copy()
    for _ in range(iters):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                cents[j] = q[a == j].sum(axis=0) // np.int64((a == j).sum())
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)


def test_kmeans_int_matches_reference(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.similarity import kmeans_int

    rng = np.random.default_rng(5)
    n, d, k = 300, 16, 6
    emb = rng.normal(0, 1, (n, d))  # negative coords exercised
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(emb.astype(np.float32)),
                                          pa.list_(pa.float32()))})
    got = kmeans_int(rd.from_arrow(tbl).repartition(5), n_clusters=k,
                     iters=3).to_pandas()
    want = _kmeans_ref(ids, emb.astype(np.float32), k, 3)
    assert got["vec_id"].tolist() == ids.tolist()
    assert got["cluster"].tolist() == want.tolist()


def test_kmeans_int_empty_cluster_keeps_centroid(ray_session):
    """A seed with no members after reassignment must keep its previous
    centroid (not crash or drift) — engineered by placing every point on
    top of one seed."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import kmeans_int

    n, d = 40, 4
    emb = np.full((n, d), 5.0)
    emb[0] = -5.0  # one far seed candidate
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(emb.astype(np.float32)),
                                          pa.list_(pa.float32()))})
    got = kmeans_int(rd.from_arrow(tbl), n_clusters=3, iters=3).to_pandas()
    want = _kmeans_ref(ids, emb.astype(np.float32), 3, 3)
    assert got["cluster"].tolist() == want.tolist()


def test_kmeans_int_partitioning_invariant(ray_session):
    """Identical assignments regardless of block layout — the integer
    recurrence is order-free, so repartitioning must not change any
    label (float means would not survive this test)."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import kmeans_int

    rng = np.random.default_rng(9)
    emb = rng.normal(0, 2, (240, 8)).astype(np.float32)
    ids = np.arange(len(emb), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(emb),
                                          pa.list_(pa.float32()))})
    a = kmeans_int(rd.from_arrow(tbl).repartition(2), n_clusters=5,
                   iters=3).to_pandas()
    b = kmeans_int(rd.from_arrow(tbl).repartition(13), n_clusters=5,
                   iters=3).to_pandas()
    assert a["cluster"].tolist() == b["cluster"].tolist()


def test_containment_catches_excerpt_jaccard_misses(ray_session):
    """A short excerpt fully contained in a long doc: containment >= 50
    admits it, Jaccard at the same threshold cannot (sizes lopsided)."""
    import ray.data as rd

    from anycrawl_ray.stages.dedup import ngram_jaccard_pairs

    long_words = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(40, 60))
    ds = _docs_ds([(1, long_words), (2, excerpt), (3, "unrelated text x")])
    cont = ngram_jaccard_pairs(ds, threshold_pct=50,
                               mode="containment").to_pandas()
    jac = ngram_jaccard_pairs(ds, threshold_pct=50).to_pandas()
    assert cont.values.tolist() == [[1, 2]]
    assert len(jac) == 0


def test_cooccurrence_pmi_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import cooccurrence_pmi

    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for d in range(80):
        n = rng.integers(5, 40)
        docs.append((d, " ".join(rng.choice(vocab, n))))
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    got = cooccurrence_pmi(rd.from_arrow(tbl).repartition(4),
                           max_tokens=8, min_cooc=4,
                           top_k=25).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl.to_pandas())
    want = con.execute(r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(
               regexp_split_to_array(text, '\s+'), x -> x <> ''), 1) AS pos
    FROM documents),
firsts AS (SELECT doc_id, tok, MIN(pos) AS fp FROM toks GROUP BY 1, 2),
capped AS (SELECT doc_id, tok FROM firsts
           QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY fp) <= 8),
df AS (SELECT tok, COUNT(*) AS df FROM capped GROUP BY 1),
n AS (SELECT COUNT(*) AS nd FROM documents),
pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS cooc
          FROM capped a JOIN capped b
            ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY 1, 2 HAVING COUNT(*) >= 4)
SELECT tok_a, tok_b, CAST(cooc AS BIGINT) AS cooc,
       CAST((cooc * n.nd * 1000) // (da.df * db.df) AS BIGINT) AS score
FROM pairs, n
JOIN df da ON da.tok = pairs.tok_a
JOIN df db ON db.tok = pairs.tok_b
ORDER BY score DESC, tok_a, tok_b LIMIT 25""").df()
    assert got.values.tolist() == want.values.tolist()


def test_pq_codes_match_per_subspace_kmeans(ray_session):
    """PQ codes are definitionally the per-subspace kmeans_int labels;
    the two subspaces must be trained independently (a vector moved in
    dims 0-31 changes code_0 only)."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import kmeans_int, pq_codes

    rng = np.random.default_rng(17)
    emb = rng.normal(0, 2, (120, 16)).astype(np.float32)
    ids = np.arange(120, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(emb),
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(3)
    got = pq_codes(ds, n_sub=2, n_clusters=3, iters=2, dim=16).to_pandas()
    k0 = kmeans_int(ds, n_clusters=3, iters=2, dim_lo=0,
                    dim_hi=8).to_pandas()
    k1 = kmeans_int(ds, n_clusters=3, iters=2, dim_lo=8,
                    dim_hi=16).to_pandas()
    assert got["code_0"].tolist() == k0["cluster"].tolist()
    assert got["code_1"].tolist() == k1["cluster"].tolist()

    emb2 = emb.copy()
    emb2[:, :8] = rng.normal(0, 2, (120, 8))  # perturb subspace 0 only
    tbl2 = pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": pa.array(list(emb2),
                                           pa.list_(pa.float32()))})
    got2 = pq_codes(rd.from_arrow(tbl2), n_sub=2, n_clusters=3, iters=2,
                    dim=16).to_pandas()
    assert got2["code_1"].tolist() == got["code_1"].tolist()
    assert got2["code_0"].tolist() != got["code_0"].tolist()


def test_triangles_broadcast_and_join_paths_equal(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(21)
    n = 30
    pairs = {(a, b) for a, b in zip(rng.integers(0, n, 150),
                                    rng.integers(0, n, 150)) if a != b}
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64())})).repartition(3)
    fast = triangle_counts(ds, n).to_pandas()
    slow = triangle_counts(ds, n, broadcast_limit=0).to_pandas()
    assert fast.values.tolist() == slow.values.tolist()
    assert len(fast) > 0


def test_cooccurrence_broadcast_and_join_paths_equal(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import cooccurrence_pmi

    rng = np.random.default_rng(22)
    vocab = [f"t{i}" for i in range(15)]
    docs = [(d, " ".join(rng.choice(vocab, rng.integers(4, 20))))
            for d in range(50)]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    ds = rd.from_arrow(tbl).repartition(3)
    fast = cooccurrence_pmi(ds, max_tokens=6, min_cooc=3,
                            top_k=20).to_pandas()
    slow = cooccurrence_pmi(ds, max_tokens=6, min_cooc=3, top_k=20,
                            broadcast_limit=0).to_pandas()
    assert fast.values.tolist() == slow.values.tolist()
    assert len(fast) > 0


def test_orders_rollup_levels_consistent(ray_session, tmp_path):
    """The three rollup levels must be internally consistent and match
    DuckDB's GROUP BY ROLLUP exactly (sentinel -1 for rolled columns)."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from anycrawl_ray.pipelines.queries import _ORDERS_ROLLUP_SQL, \
        orders_rollup

    rng = np.random.default_rng(31)
    n = 400
    d = tmp_path / "sf"
    d.mkdir()
    custkeys = np.arange(1, 41)
    pq.write_table(pa.table({
        "c_custkey": pa.array(custkeys, pa.int64()),
        "c_nationkey": pa.array(rng.integers(0, 5, 40).astype(np.int32)),
        "c_acctbal": pa.array(np.zeros(40))}), d / "customer.parquet")
    dates = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2000, n), unit="D")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.choice(custkeys, n), pa.int64()),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(np.round(rng.uniform(1, 9999, n), 2)),
        "o_orderdate": pa.array(dates),
        "o_orderpriority": pa.array(["5-LOW"] * n)}),
        d / "orders.parquet")
    got = orders_rollup(str(d)).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.execute(_ORDERS_ROLLUP_SQL).df()
    assert got.values.tolist() == want.values.tolist()
    grand = got[got["c_nationkey"] == -1]
    assert grand["n_orders"].tolist() == [n]
    detail = got[(got["c_nationkey"] >= 0) & (got["o_year"] >= 0)]
    assert detail["n_orders"].sum() == n


def test_cumulative_users_matches_window_sql(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    # exercised through a synthetic events table with ties + gaps
    rng = np.random.default_rng(33)
    n = 800
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(pd.Timestamp("2024-01-01")
                       + pd.to_timedelta(rng.integers(0, 40 * 86400, n),
                                         unit="s")),
        "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array([""] * n),
    })
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp(dir="/tmp")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    from anycrawl_ray.pipelines.queries import _CUMULATIVE_USERS_SQL, \
        events_cumulative_users

    got = events_cumulative_users(d).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{d}/events.parquet'")
    want = con.execute(_CUMULATIVE_USERS_SQL).df()
    assert got.values.tolist() == want.values.tolist()
    assert got["cumulative_users"].iloc[-1] == 60  # every user counted


def test_sample_weighted_favors_long_docs(ray_session, tmp_path):
    """Statistical sanity at the op level: the weighted sample picks
    long docs far more often than uniform would, and the result is a
    deterministic function of (doc_id, n_chars)."""
    import pyarrow.parquet as pq

    from anycrawl_ray.pipelines.queries import docs_sample_weighted

    n = 2000
    n_chars = np.where(np.arange(n) < 100, 50_000, 10)  # 100 giants
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array([""] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(n_chars, pa.int64())}),
        d / "documents.parquet")
    got = docs_sample_weighted(str(d)).to_pandas()
    again = docs_sample_weighted(str(d)).to_pandas()
    assert got.values.tolist() == again.values.tolist()
    # giants are 5% of docs but 99.6% of mass; expect the sample to be
    # dominated by them (uniform would pick ~1 giant in 20)
    assert (got["doc_id"] < 100).sum() >= 15


def test_hamming_pairs_from_sigs_near_neighbors(ray_session):
    """The generic u64-signature blocking must find 1-3-bit neighbors
    (pigeonhole guarantee), reject 4+-bit ones, and report exact
    distances — handcrafted signatures, since the stub image grids are
    avalanche-random and only produce distance-0 pairs."""
    import ray.data as rd

    from anycrawl_ray.stages.dedup import hamming_pairs_from_sigs

    base = np.uint64(0xDEADBEEFCAFE1234)
    sigs = [
        (0, base),
        (1, base ^ np.uint64(1)),                      # d=1
        (2, base ^ np.uint64(0b111)),                  # d=3
        (3, base ^ np.uint64(0x8000000000000001)),     # d=2, bit 63
        (4, base ^ np.uint64(0xF0F0)),                 # d=8 -> rejected
        (5, np.uint64(0x0123456789ABCDEF)),            # far away
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in sigs], pa.int64()),
        "simhash": pa.array([s for _, s in sigs], pa.uint64()),
    })).repartition(2)
    got = hamming_pairs_from_sigs(ds, max_hamming=3).to_pandas()
    have = {(a, b): h for a, b, h in got.values.tolist()}
    assert have[(0, 1)] == 1 and have[(0, 2)] == 3 and have[(0, 3)] == 2
    assert (4 not in {a for a, _ in have} | {b for _, b in have}
            or all(4 not in p for p in have))
    # transitive near pairs between the perturbed sigs
    assert have[(1, 2)] == 2  # 0b111 ^ 0b1 = 0b110
    assert (0, 4) not in have and (0, 5) not in have


def test_dedup_incremental_bloom_path_equals_plain(ray_session):
    """Bloom prefilter must be output-invariant (no false negatives; FP
    slice re-verified by the join) — checked against the plain LEFT
    ANTI path on a corpus with real dups, and with a tiny filter (64
    bits) that forces heavy false-positive traffic through the join."""
    import ray.data as rd

    from anycrawl_ray.stages.dedup import dedup_incremental

    rng = np.random.default_rng(41)
    prior_rows = [(i, f"doc {i % 37} body") for i in range(0, 200, 2)]
    new_rows = [(i, f"doc {i % 37} body") for i in range(1, 120, 2)]
    new_rows += [(1001, "genuinely new a"), (1003, "genuinely new b")]
    prior = _docs_ds(prior_rows).repartition(4)
    new = _docs_ds(new_rows).repartition(3)

    plain = (dedup_incremental(new, prior).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    for bits in (1 << 20, 64):  # roomy filter and FP-saturated filter
        fast = (dedup_incremental(new, prior, bloom_bits=bits)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert fast.values.tolist() == plain.values.tolist(), bits
    assert {1001, 1003} <= set(plain["doc_id"])


def test_user_overlap_asymmetric_sets(ray_session, tmp_path):
    """Engineered corpus: weekday-only, weekend-only, and both-side
    users must land in the right counters (the sf data is dense enough
    that every user hits both sides, so this is the discriminating
    case)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import os

    from anycrawl_ray.pipelines.queries import _USER_OVERLAP_SQL, \
        events_user_overlap

    mon = pd.Timestamp("2024-01-01")  # a Monday
    sat = pd.Timestamp("2024-01-06")  # a Saturday
    rows = []
    for u in range(10):
        rows.append((u, mon))            # 10 weekday users
    for u in range(5, 18):
        rows.append((u, sat))            # 13 weekend users, 5 overlap
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([ts for _, ts in rows]),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array(np.zeros(len(rows))),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = events_user_overlap(str(d)).to_pandas()
    assert got.values.tolist() == [[10, 13, 5, 18]]
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{d}/events.parquet'")
    assert con.execute(_USER_OVERLAP_SQL).df().values.tolist() == \
        got.values.tolist()


def test_semdedup_components_and_zero_vectors(ray_session):
    """SemDeDup contract: transitive in-cluster components collapse to the
    min vec_id (a~b, b~c admits c even though a!~c), singletons survive,
    and zero-norm vectors never match anything (dot > 0 is strict) —
    including another zero vector."""
    import math

    import ray.data as rd

    from anycrawl_ray.stages.similarity import semdedup

    def unit(theta_deg):
        t = math.radians(theta_deg)
        return [math.cos(t), math.sin(t), 0.0, 0.0]

    vecs = [
        unit(0),        # 0: chain head
        unit(45),       # 1: cos(0,45)=.707 >= .5, cos(45,90)=.707
        unit(90),       # 2: cos(0,90)=0 < .5 — admitted transitively
        [0.0, 0.0, 1.0, 0.0],   # 3: singleton (orthogonal to the chain
                                 #    except vec 2's axis? no: dim 2)
        [0.0, 0.0, 0.0, 0.0],   # 4: zero vector
        [0.0, 0.0, 0.0, 0.0],   # 5: second zero vector
    ]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    out = semdedup(ds, n_clusters=1, iters=1, tau_num=1, tau_den=2
                   ).to_pandas().set_index("vec_id")
    # chain 0-1-2 is one component represented by 0; only 0 kept
    assert out.loc[0, "rep"] == 0 and out.loc[0, "keep"] == 1
    assert out.loc[1, "rep"] == 0 and out.loc[1, "keep"] == 0
    assert out.loc[2, "rep"] == 0 and out.loc[2, "keep"] == 0
    # vec 3 is similar to nothing at tau=1/2 except itself... but vec 2 is
    # orthogonal and the zero vectors produce dot=0: singleton survives
    assert out.loc[3, "rep"] == 3 and out.loc[3, "keep"] == 1
    # both zero vectors survive: cosine undefined => never duplicates
    assert out.loc[4, "keep"] == 1 and out.loc[5, "keep"] == 1
    # every row present, reps never exceed their member ids
    assert len(out) == 6 and (out["rep"] <= out.index).all()


def test_dsir_weights_upsample_target_like_docs(ray_session, tmp_path):
    """DSIR contract: documents whose bigrams look like the target slice
    score above raw-corpus-typical documents; < 2-token docs weigh 0; and
    the integer arithmetic replays in DuckDB."""
    import duckdb
    import pyarrow.parquet as pq_

    import ray.data as rd

    from anycrawl_ray.pipelines.queries import _dsir_sql, docs_dsir_weights

    rows = []
    for i in range(20):          # target slice: distinctive vocabulary
        rows.append((i, "alpha beta gamma delta alpha beta", "en"))
    for i in range(20, 40):      # background: different vocabulary
        rows.append((i, "zeta eta theta iota zeta eta", "fr"))
    rows.append((40, "alpha beta gamma delta", "fr"))  # en-like non-en doc
    rows.append((41, "solo", "fr"))                    # 1 token -> 0 grams
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(t, d / "documents.parquet")
    got = docs_dsir_weights(str(d)).to_pandas().set_index("doc_id")
    # the en-like fr doc scores with the target, far above background fr
    assert got.loc[40, "weight_ppm"] > got.loc[20, "weight_ppm"]
    assert got.loc[0, "weight_ppm"] > got.loc[20, "weight_ppm"]
    assert got.loc[41, "n_grams"] == 0 and got.loc[41, "weight_ppm"] == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{d}/documents.parquet'")
    want = con.execute(_dsir_sql()).df()
    assert want.values.tolist() == got.reset_index().values.tolist()


def test_bpe_merges_cascade_and_overlap(ray_session):
    """BPE training contract: round 1 merges the top pair (overlapping
    occurrences counted, greedy application), and round 2 can merge a
    symbol MADE in round 1 (the cascade that makes it BPE rather than
    one-shot pair counting)."""
    import numpy as np
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import bpe_merges, token_hashes

    # 'a a' dominates round 1 (4 overlapping occurrences across docs);
    # after merging, '<aa> b' dominates round 2
    docs = ["a a a b", "a a b x", "y a a b"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    }))
    out = bpe_merges(ds, n_merges=2).to_pandas()
    ha, hb = (int(token_hashes("a")[0]), int(token_hashes("b")[0]))
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        haa = int(np.uint64(ha) * prime + np.uint64(hb - hb + ha))
    assert [int(out.loc[0, "p1"]), int(out.loc[0, "p2"])] == [ha, ha]
    assert int(out.loc[0, "cnt"]) == 4  # overlapping pairs all counted
    assert int(out.loc[0, "merged"]) == haa
    # round 2: the fresh <aa> symbol followed by b (3 occurrences: the
    # greedy rewrite leaves 'a a a b' as '<aa> a b'... so '<aa> b' appears
    # in docs 1 and 2 only; 'a b' also appears twice (docs 0 rewritten +
    # nowhere else) — tie broken by symbol order
    assert int(out.loc[1, "p1"]) in (haa, ha)
    assert len(out) == 2 and out["round"].tolist() == [1, 2]


def test_session_window_overlap_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import session_window_overlap

    rng = np.random.default_rng(23)
    n = 3000
    gap_us = 1_800_000_000
    t = np.sort(rng.integers(0, 10**6, n)) * 1_000_000  # epoch us
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime(rng.permutation(t), unit="us"),
    })
    tmin, tmax = int(df["ts"].min().value // 1000), int(df["ts"].max().value // 1000)
    span = tmax - tmin
    k = 6
    i = np.arange(k, dtype=np.int64)
    ws = tmin + i * span // k
    we = ws + span // 4
    windows = pa.table({"window_id": pa.array(i, pa.int64()),
                        "ws_us": pa.array(ws, pa.int64()),
                        "we_us": pa.array(we, pa.int64())})
    out = session_window_overlap(rd.from_pandas(df), windows).to_pandas()

    # pandas reference: sessionize, then overlap per window
    ref = df.copy()
    ref["t"] = ref["ts"].astype("int64") // 1000
    ref = ref.sort_values(["user_id", "t"])
    brk = ref.groupby("user_id")["t"].diff() > gap_us
    ref["sid"] = brk.groupby(ref["user_id"]).cumsum()
    sess = ref.groupby(["user_id", "sid"])["t"].agg(["min", "max", "count"]) \
        .reset_index()
    for j in range(k):
        m = (sess["min"] <= we[j]) & (sess["max"] >= ws[j])
        row = out[out["window_id"] == j].iloc[0]
        assert row["n_sessions"] == int(m.sum())
        assert row["n_events"] == int(sess.loc[m, "count"].sum())
        assert row["n_users"] == sess.loc[m, "user_id"].nunique()
        assert row["ws_us"] == ws[j] and row["we_us"] == we[j]


def test_session_window_overlap_zero_windows_present(ray_session):
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import session_window_overlap

    df = pd.DataFrame({"user_id": [1, 1, 2],
                       "ts": pd.to_datetime([10, 20, 30], unit="s")})
    # one window far outside the event span, one covering everything
    windows = pa.table({"window_id": pa.array([0, 1], pa.int64()),
                        "ws_us": pa.array([10**15, 0], pa.int64()),
                        "we_us": pa.array([10**15 + 1, 10**9], pa.int64())})
    out = session_window_overlap(rd.from_pandas(df), windows).to_pandas()
    assert out["n_sessions"].tolist() == [0, 2]
    assert out["n_users"].tolist() == [0, 2]
    assert out["n_events"].tolist() == [0, 3]


def test_session_gap_boundary_is_exclusive(ray_session):
    """A gap of EXACTLY 30 min stays one session (break is strict >)."""
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import session_window_overlap

    base = 10**12
    df = pd.DataFrame({
        "user_id": [7, 7, 7],
        "ts": pd.to_datetime([base, base + 1_800_000_000,
                              base + 1_800_000_000 * 2 + 1], unit="us"),
    })
    windows = pa.table({"window_id": pa.array([0], pa.int64()),
                        "ws_us": pa.array([0], pa.int64()),
                        "we_us": pa.array([2 * base], pa.int64())})
    out = session_window_overlap(rd.from_pandas(df), windows).to_pandas()
    assert out["n_sessions"].tolist() == [2]  # 3rd event breaks (gap+1us)


def test_locf_hourly_matches_python_reference(ray_session):
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import locf_hourly

    rng = np.random.default_rng(31)
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 30, n),
        "ts": pd.to_datetime(rng.integers(0, 400 * 3600, n), unit="s"),
        "value": np.round(rng.uniform(0, 100, n), 4),
    })
    # force in-hour ties to exercise the (ts, event_id) tie-break
    df.loc[1::7, "ts"] = df.loc[0::7, "ts"].to_numpy()[: len(df.loc[1::7])]
    out = locf_hourly(rd.from_pandas(df)).to_pandas()

    ref_rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        g["h"] = g["ts"].astype("int64") // (3600 * 10**9)
        last = g.groupby("h").tail(1)
        hours = np.arange(g["h"].min(), g["h"].max() + 1)
        vh = last.set_index("h")["value"]
        idx = np.searchsorted(vh.index.to_numpy(), hours, side="right") - 1
        filled = np.rint(vh.to_numpy()[idx] * 10_000).astype(np.int64)
        ref_rows.append((uid, len(hours), int(filled.sum())))
    ref = pd.DataFrame(ref_rows, columns=["user_id", "n_hours", "locf_sum"]) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), ref,
                                  check_dtype=False)


def test_locf_hourly_single_event_user(ray_session):
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import locf_hourly

    df = pd.DataFrame({"event_id": [0], "user_id": [5],
                       "ts": pd.to_datetime([7200], unit="s"),
                       "value": [2.5]})
    out = locf_hourly(rd.from_pandas(df)).to_pandas()
    assert out.iloc[0].tolist() == [5, 1, 25000]


def test_bigram_surprise_tiny(ray_session):
    """Hand-checkable: corpus transitions 'a b'(x2), 'a c'(x1), 'b a'(x1)
    -> ctx(a)=3, ctx(b)=1; surprise(a->b)=3//2=1, (a->c)=3//1=3,
    (b->a)=1//1=1."""
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import bigram_surprise

    ds = rd.from_items([
        {"doc_id": 0, "text": "a b a c"},   # a->b, b->a, a->c
        {"doc_id": 1, "text": "a b"},        # a->b
        {"doc_id": 2, "text": "solo"},       # no transition -> excluded
        {"doc_id": 3, "text": "   "},        # no tokens -> excluded
    ])
    out = bigram_surprise(ds).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 1]
    # doc 0: (1 + 1 + 3) // 3 = 1 ; doc 1: 1
    assert out.loc[0, "n_transitions"] == 3
    assert out.loc[0, "mean_surprise"] == (1 + 1 + 3) // 3
    assert out.loc[1, "n_transitions"] == 1
    assert out.loc[1, "mean_surprise"] == 1


def test_edit_distance_le1_exact():
    from anycrawl_ray.stages.text_analysis import _edit_distance_le1

    assert _edit_distance_le1("abc", "abc")
    assert _edit_distance_le1("abc", "abd")       # substitution
    assert _edit_distance_le1("abc", "abcd")      # insertion at end
    assert _edit_distance_le1("abc", "xabc")      # insertion at start
    assert _edit_distance_le1("abc", "ac")        # deletion
    assert not _edit_distance_le1("abc", "adc_x")
    assert not _edit_distance_le1("abc", "acb")   # transposition = 2
    assert not _edit_distance_le1("abc", "xbd")


def test_edit1_pairs_matches_brute_force(ray_session):
    """SymSpell blocking finds EXACTLY the brute-force ED<=1 pair set."""
    import itertools

    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import (_edit_distance_le1,
                                                   edit1_pairs)

    vocab = ["table", "tble", "tab", "fable", "cable", "cables", "stream",
             "dream", "steam", "hash", "bash", "mash", "mesh", "zzz",
             "table"]  # duplicate word must not self-pair
    ds = rd.from_items([{"w": w} for w in vocab])
    out = edit1_pairs(ds).to_pandas()
    got = set(map(tuple, out[["w1", "w2"]].to_numpy()))
    uniq = sorted(set(vocab))
    want = {(a, b) for a, b in itertools.combinations(uniq, 2)
            if _edit_distance_le1(a, b)}
    assert got == want
    assert ("bash", "hash") in got and ("steam", "stream") in got


def test_common_neighbor_pairs_matches_brute(ray_session):
    import itertools

    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.graph import common_neighbor_pairs

    rng = np.random.default_rng(17)
    n = 60
    m = 150
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))
    eset = {(min(x, y), max(x, y)) for x, y in zip(a.tolist(), b.tolist())}

    def adjacent(aa: np.ndarray, bb: np.ndarray) -> np.ndarray:
        return np.fromiter(((x, y) in eset for x, y in
                            zip(aa.tolist(), bb.tolist())),
                           count=aa.size, dtype=bool)

    out = common_neighbor_pairs(edges, n, adjacent_fn=adjacent,
                                min_common=2).to_pandas()
    got = {(r.a, r.b): r.n_common for r in out.itertuples()}

    nbrs = {v: set() for v in range(n)}
    for x, y in eset:
        nbrs[x].add(y)
        nbrs[y].add(x)
    want = {}
    for u, w in itertools.combinations(range(n), 2):
        if (u, w) in eset:
            continue
        c = len(nbrs[u] & nbrs[w])
        if c >= 2:
            want[(u, w)] = c
    assert got == want


def test_common_neighbor_hub_cap_drops_centers(ray_session):
    """A star hub over max_degree contributes no wedges; the spokes'
    other connections still do."""
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.graph import common_neighbor_pairs

    # hub 0 connects to 1..9; nodes 1,2 also both connect to 10 and 11
    rows = [(0, i) for i in range(1, 10)] + \
        [(1, 10), (2, 10), (1, 11), (2, 11)]
    edges = rd.from_pandas(pd.DataFrame(rows, columns=["a", "b"]))

    def never_adjacent(a, b):
        return np.zeros(a.size, dtype=bool)

    capped = common_neighbor_pairs(edges, 12, adjacent_fn=never_adjacent,
                                   min_common=2, max_degree=4).to_pandas()
    # hub wedges gone; (1,2) still share {10, 11} (and NOT 0: hub dropped)
    got = {(r.a, r.b): r.n_common for r in capped.itertuples()}
    assert got[(1, 2)] == 2
    assert (3, 4) not in got  # only common neighbor was the capped hub
    assert (10, 11) in got and got[(10, 11)] == 2  # centers 1,2 survive


def test_locf_hourly_pre_epoch_floor_parity(ray_session):
    """Negative epoch hours: numpy floors, DuckDB // truncates — the
    oracle uses the floor-div idiom, so both sides must agree on a
    pre-1970 timestamp."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.pipelines.queries import ORACLE_SQL
    from anycrawl_ray.stages.window import locf_hourly

    df = pd.DataFrame({
        "event_id": [0, 1, 2],
        "user_id": [1, 1, 1],
        "ts": pd.to_datetime([-90 * 60 * 10**6, -30 * 60 * 10**6,
                              45 * 60 * 10**6], unit="us"),
        "value": [1.0, 2.0, 3.0],
    })
    out = locf_hourly(rd.from_pandas(df)).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    ref = con.sql(ORACLE_SQL["events_gap_fill"]).df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # hours -2, -1, 0: LOCF = 10000 (h=-2), 20000 (h=-1), 30000 (h=0)
    assert out.iloc[0]["n_hours"] == 3
    assert out.iloc[0]["locf_sum"] == 60000


def test_late_arrivals_matches_pandas(ray_session):
    """Distributed chunked prefix-max == a serial watermark scan,
    including carry-ins across chunk boundaries (n_chunks=4 on 400
    rows forces many boundaries)."""
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import late_arrivals

    rng = np.random.default_rng(41)
    n = 400
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
    })
    thr = 50_000_000
    out = late_arrivals(rd.from_pandas(df), key="event_type",
                        order_col="event_id", threshold_us=thr,
                        n_chunks=4).to_pandas()

    ref = df.sort_values("event_id")
    t = ref["ts"].astype("int64").to_numpy() // 1000
    wm = np.empty(n, dtype=np.int64)
    wm[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(t[:-1], out=wm[1:])
    late = wm > t + thr
    want = (pd.DataFrame({"event_type": ref["event_type"].to_numpy(),
                          "late": late})
            .groupby("event_type").agg(n_late=("late", "sum"),
                                       n_events=("late", "size"))
            .reset_index())
    got = out.sort_values("event_type").reset_index(drop=True)
    want = want.sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_late"].sum() > 0  # permuted arrivals must contain late rows


def test_late_arrivals_in_order_stream_has_none(ray_session):
    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.window import late_arrivals

    df = pd.DataFrame({
        "event_id": np.arange(100, dtype=np.int64),
        "event_type": ["x"] * 100,
        "ts": pd.to_datetime(np.arange(100) * 60, unit="s"),
    })
    out = late_arrivals(rd.from_pandas(df), key="event_type",
                        order_col="event_id", threshold_us=1,
                        n_chunks=4).to_pandas()
    assert out["n_late"].tolist() == [0]
    assert out["n_events"].tolist() == [100]


def test_resource_alloc_weights_match_brute(ray_session):
    import itertools

    import pandas as pd
    import ray.data as rd

    from anycrawl_ray.stages.graph import common_neighbor_pairs

    rng = np.random.default_rng(53)
    n = 40
    a = rng.integers(0, n, 90)
    b = rng.integers(0, n, 90)
    keep = a != b
    a, b = a[keep], b[keep]
    eset = {(min(x, y), max(x, y)) for x, y in zip(a.tolist(), b.tolist())}
    edges = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))

    def adjacent(aa, bb):
        return np.fromiter(((x, y) in eset for x, y in
                            zip(aa.tolist(), bb.tolist())),
                           count=aa.size, dtype=bool)

    out = common_neighbor_pairs(edges, n, adjacent_fn=adjacent,
                                min_common=1, ra_scale=10**6).to_pandas()
    got = {(r.a, r.b): (r.n_common, r.ra) for r in out.itertuples()}

    nbrs = {v: set() for v in range(n)}
    for x, y in eset:
        nbrs[x].add(y)
        nbrs[y].add(x)
    want = {}
    for u, w in itertools.combinations(range(n), 2):
        if (u, w) in eset:
            continue
        shared = nbrs[u] & nbrs[w]
        if shared:
            want[(u, w)] = (len(shared),
                            sum(10**6 // len(nbrs[z]) for z in shared))
    assert got == want


def test_shuffle_shards_is_permutation_and_seed_sensitive(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import shuffle_shards

    ds = rd.range(1000).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow")
    a = shuffle_shards(ds, n_shards=8, seed=1).to_pandas()
    b = shuffle_shards(ds, n_shards=8, seed=2).to_pandas()
    # per-shard positions are each a dense 0..k-1 permutation
    for s, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    # deterministic: same seed reproduces bit-identically
    a2 = shuffle_shards(ds, n_shards=8, seed=1).to_pandas()
    assert a.equals(a2)
    # a different seed is a different permutation
    assert not a[["shard", "pos"]].equals(b[["shard", "pos"]])


def test_perplexity_buckets_terciles(ray_session):
    """Buckets partition the corpus; thresholds follow the integer-rank
    rule on a hand-built score spread."""
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import perplexity_buckets

    # 9 docs, 3 clearly separated score groups (common / mixed / rare
    # vocab) — each tercile gets 3 docs
    common = "the the the the"
    docs = [common] * 3 + [f"{common} mid{i}" for i in range(3)] + \
        [f"rare{i} rare{i + 10} rare{i + 20} odd{i}" for i in range(3)]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(docs)])
    out = perplexity_buckets(ds).to_pandas()
    assert out["bucket"].tolist() == [0, 1, 2]
    assert out["n_docs"].sum() == 9
    assert out["n_docs"].tolist() == [3, 3, 3]
    # buckets are ordered score ranges
    assert out["max_score"][0] <= out["min_score"][1]
    assert out["max_score"][1] <= out["min_score"][2]


def test_text_index_prunes_partitions_and_matches_full_scan(ray_session, tmp_path):
    import os

    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import TextIndex

    docs = [
        {"doc_id": 0, "text": "alpha beta beta gamma"},
        {"doc_id": 1, "text": "alpha alpha delta"},
        {"doc_id": 2, "text": "gamma gamma gamma epsilon"},
        {"doc_id": 3, "text": "zeta eta theta"},
    ]
    ds = rd.from_items(docs)
    idx = TextIndex.build(ds, str(tmp_path / "ti"), n_buckets=16)

    # pruning is real: the lookup's path set is a strict subset of the
    # bucket dirs on disk (16 buckets, <= 2 terms' worth read)
    all_buckets = [d for d in os.listdir(tmp_path / "ti")
                   if d.startswith("bucket=")]
    pruned = idx.pruned_paths(["alpha", "gamma"])
    pruned_buckets = {p.split("bucket=")[1].split("/")[0] for p in pruned}
    assert len(pruned_buckets) <= 2 < len(all_buckets)

    out = idx.lookup(["alpha", "gamma"], k=10).to_pandas()
    # manual scoring: N=4, df(alpha)=2, df(gamma)=2 -> idf=2 each
    # doc0: 1*2 + 1*2 = 4; doc1: 2*2 = 4; doc2: 3*2 = 6
    assert out[["doc_id", "score"]].values.tolist() == [
        [2, 6], [0, 4], [1, 4]]
    assert out["rank"].tolist() == [1, 2, 3]

    # reload from disk reproduces bit-identically
    idx2 = TextIndex.load(str(tmp_path / "ti"))
    assert idx2.lookup(["alpha", "gamma"], k=10).equals(
        idx.lookup(["alpha", "gamma"], k=10))


def test_text_index_missing_terms(ray_session, tmp_path):
    import ray.data as rd

    from anycrawl_ray.stages.text_analysis import TextIndex

    ds = rd.from_items([{"doc_id": 0, "text": "only these words"}])
    idx = TextIndex.build(ds, str(tmp_path / "ti2"), n_buckets=8)
    out = idx.lookup(["absent"], k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score", "rank"]


def test_first_touch_attribution_tiebreak_and_partials(ray_session):
    """First event resolved by (ts, event_id) across block boundaries;
    users without conversions still count toward `users`."""
    import ray.data as rd

    from anycrawl_ray.stages.window import first_touch_attribution

    # user 1: tie at ts=10 -> event_id 2 ('view') wins over 5 ('click');
    # 2 purchases. user 2: first is 'signup', 0 purchases.
    # user 3: first IS the purchase.
    rows = [
        (5, 1, 10, "click"), (2, 1, 10, "view"),
        (7, 1, 20, "purchase"), (9, 1, 30, "purchase"),
        (3, 2, 5, "signup"), (4, 2, 50, "click"),
        (8, 3, 7, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    out = first_touch_attribution(rd.from_arrow(t).repartition(4))
    got = {ft: (u, c) for ft, u, c in zip(
        out.column("first_touch").to_pylist(),
        out.column("users").to_pylist(),
        out.column("conversions").to_pylist())}
    assert got == {"view": (1, 2), "signup": (1, 0), "purchase": (1, 1)}


def test_rfm_segments_known_quartiles(ray_session):
    """4 users with strictly ordered metrics land in 4 distinct buckets;
    recency derives from the corpus max ts; cents use half-even rint."""
    import ray.data as rd

    from anycrawl_ray.stages.window import rfm_segments

    day = 86_400_000_000
    # user k (1..4): last event at day 10-k (r = k days before gmax+10),
    # k events, value sum k dollars. gmax belongs to user 1 (ts=9*day).
    rows = []
    for k in (1, 2, 3, 4):
        for j in range(k):
            rows.append((k, (9 - k) * day - j * 1000, float(k) / k))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    out = rfm_segments(rd.from_arrow(t).repartition(3)).to_pandas()
    # metrics: r = k-1 days, f = k, m = 100*k -> user k scores (k,k,k)
    got = {(r, f, m): n for r, f, m, n in out.itertuples(index=False)}
    assert got == {(1, 1, 1): 1, (2, 2, 2): 1, (3, 3, 3): 1, (4, 4, 4): 1}


def test_rfm_segments_all_tied(ray_session):
    """Identical users: every quartile cut equals the value, so all
    scores collapse to 1 (v > cut is false everywhere)."""
    import ray.data as rd

    from anycrawl_ray.stages.window import rfm_segments

    t = pa.table({
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([100, 100, 100], pa.timestamp("us")),
        "value": pa.array([2.5, 2.5, 2.5], pa.float64()),
    })
    out = rfm_segments(rd.from_arrow(t)).to_pandas()
    assert out.to_dict("records") == [
        {"r_score": 1, "f_score": 1, "m_score": 1, "n_users": 3}]


def test_hits_int_matches_numpy_reference(ray_session):
    """Distributed integer HITS == a serial numpy replay of the same
    integer recurrence (gather + floor-decomposed sum normalization)."""
    from anycrawl_ray.stages.graph import hits_int

    n, iters, scale = 61, 3, 10 ** 9
    got = hits_int(n, iters=iters, scale=scale)

    ids = np.arange(n, dtype=np.int64)
    srcs, dsts = [], []
    for child in (2 * ids + 1, 2 * ids + 2):
        m = child < n
        srcs.append(ids[m]); dsts.append(child[m])
    m = ids % 3 == 0
    srcs.append(ids[m]); dsts.append((7 * ids[m] + 3) % n)
    src = np.concatenate(srcs); dst = np.concatenate(dsts)

    def norm(s):
        tot = int(s.sum())
        return (s // tot) * scale + ((s % tot) * scale) // tot

    h = np.full(n, scale // n, dtype=np.int64)
    a = None
    for _ in range(iters):
        ar = np.zeros(n, dtype=np.int64)
        np.add.at(ar, dst, h[src])
        a = norm(ar)
        hr = np.zeros(n, dtype=np.int64)
        np.add.at(hr, src, a[dst])
        h = norm(hr)
    assert got.column("doc_id").to_pylist() == ids.tolist()
    assert got.column("hub_scaled").to_pylist() == h.tolist()
    assert got.column("auth_scaled").to_pylist() == a.tolist()
    # leaves with no out-edges are hub 0 but may still hold authority
    assert h[(2 * ids + 1 >= n) & (2 * ids + 2 >= n) & (ids % 3 != 0)].max() == 0


def test_tfidf_cosine_pairs_exact_small(ray_session):
    """Hand-computed integer cosine on a 3-doc corpus, plus df-cap
    semantics: the capped term leaves vocabulary (norms AND dots)."""
    from anycrawl_ray.stages.dedup import tfidf_cosine_pairs

    # vocab (unigrams): x shared by all 3 (df=3), y shared by 1&2 (df=2),
    # z only doc3 (df=1). With max_df=2 the 'x' term drops entirely.
    ds = _docs_ds([(1, "x y"), (2, "x y"), (3, "x z")])
    out = tfidf_cosine_pairs(ds, threshold_ppm=0, min_shared=1,
                             max_df=2, gram_n=1)
    # vocabulary: y (df=2, w=1500), z (df=1, w=3000)
    # doc1 = doc2 = {y}: norm 1500^2; doc3 = {z}: no shared terms
    rows = list(zip(out.column("a").to_pylist(),
                    out.column("b").to_pylist(),
                    out.column("shared").to_pylist(),
                    out.column("cos2_ppm").to_pylist()))
    w2 = 1500 * 1500
    assert rows == [(1, 2, 1, w2 * w2 * 1_000_000 // (w2 * w2))]
    assert rows[0][3] == 1_000_000  # identical capped vectors -> cos^2=1


def test_tfidf_cosine_paths_equal(ray_session):
    """Broadcast-norm and join-norm paths return byte-equal tables."""
    from anycrawl_ray.stages.dedup import tfidf_cosine_pairs

    docs = [(i, "alpha beta gamma delta epsilon zeta") for i in range(8)]
    docs += [(100, "совершенно other words here unrelated text")]
    ds = _docs_ds(docs)
    a = tfidf_cosine_pairs(ds, threshold_ppm=900_000, min_shared=2,
                           gram_n=2)
    b = tfidf_cosine_pairs(_docs_ds(docs), threshold_ppm=900_000,
                           min_shared=2, gram_n=2, broadcast_limit=0)
    assert a.equals(b)
    assert a.num_rows == 28  # identical 8-doc clique, all cos^2 = 1


def test_count_min_overestimates_and_conserves_mass(ray_session):
    """CM invariants: n_est >= n_exact for every key; each sketch row
    conserves total mass (sum of estimates' source counters == n_rows,
    checked via the exact column sum)."""
    import ray.data as rd

    from anycrawl_ray.stages.sketches import count_min

    vals = ([7] * 30 + [13] * 11 + list(range(100, 140)) * 2)
    t = pa.table({"user_id": pa.array(vals, pa.int64())})
    out = count_min(rd.from_arrow(t).repartition(4), "user_id",
                    depth=4, width=8)  # narrow width forces collisions
    exact = dict(zip(out.column("user_id").to_pylist(),
                     out.column("n_exact").to_pylist()))
    est = dict(zip(out.column("user_id").to_pylist(),
                   out.column("n_est").to_pylist()))
    assert exact[7] == 30 and exact[13] == 11
    assert all(est[k] >= exact[k] for k in exact)
    assert sum(exact.values()) == len(vals)
    # with width 8 and 42 keys, at least one estimate must collide
    assert any(est[k] > exact[k] for k in exact)


def test_cluster_purity_bounds(ray_session):
    """Purity rows: one per non-empty cluster, maj_n <= n, purity in
    (0, 1e6], total n equals the corpus size."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import cluster_purity

    rng = np.random.default_rng(7)
    n = 120
    emb = rng.normal(size=(n, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 3).astype(np.int32),
                          pa.int32()),
    })
    out = cluster_purity(rd.from_arrow(t).repartition(3), n_clusters=4,
                         iters=2)
    assert out.num_rows <= 4
    nn = np.asarray(out.column("n"))
    mj = np.asarray(out.column("maj_n"))
    pp = np.asarray(out.column("purity_ppm"))
    assert nn.sum() == n
    assert (mj <= nn).all() and (pp > 0).all() and (pp <= 1_000_000).all()


def test_mmr_diversifies_vs_pure_relevance(ray_session):
    """A clique of near-identical high-relevance vectors: pure top-k
    would take the whole clique; MMR (lambda=1/2) must interleave the
    orthogonal lower-relevance item. Exact greedy replayed in numpy."""
    import ray.data as rd

    from anycrawl_ray.stages.similarity import mmr_topk

    # query along e0+e1: ids 1-3 an identical clique on e0, id 4 on e1
    # (equal relevance, orthogonal to the clique)
    vecs = {1: [1.0, 0.0], 2: [1.0, 0.0], 3: [1.0, 0.0],
            4: [0.0, 1.0]}
    t = pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                              pa.list_(pa.float32())),
    })
    out = mmr_topk(rd.from_arrow(t).repartition(2),
                   np.array([1.0, 1.0]), k=3, pool=4)
    picked = out.column("vec_id").to_pylist()
    # step1: all rel 10000, tie -> id 1. step2: clique penalized
    # (10000 - 10000 = 0) but id 4 keeps 10000 - 0 -> DIVERSIFIES.
    # step3: ids 2,3 tie at 0, ms(2)=max(sim to 1, sim to 4)=10000.
    assert picked == [1, 4, 2]
    assert out.column("score").to_pylist() == [10000, 10000, 0]
    # pure relevance would have returned the clique [1, 2, 3]


def test_market_basket_lift_exact(ray_session):
    """Brand-pair lift on a hand-built basket set, via a temp parquet
    pair (the query function reads sf_dir directly)."""
    import os
    import tempfile

    import pyarrow.parquet as pqt

    from anycrawl_ray.pipelines.queries import orders_market_basket

    with tempfile.TemporaryDirectory() as d:
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["X", "Y", "Z"], pa.string())})
        # 6 orders: {X,Y} x5 (co-buy), {Z} x1
        ok, pk = [], []
        for o in range(5):
            ok += [o, o]; pk += [1, 2]
        ok += [9]; pk += [3]
        li = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                       "l_partkey": pa.array(pk, pa.int64())})
        pqt.write_table(part, os.path.join(d, "part.parquet"))
        pqt.write_table(li, os.path.join(d, "lineitem.parquet"))
        out = orders_market_basket(d)
    rows = list(zip(out.column("brand_a").to_pylist(),
                    out.column("brand_b").to_pylist(),
                    out.column("cooc").to_pylist(),
                    out.column("lift_ppm").to_pylist()))
    # lift(X,Y) = 5 * 6 * 1e6 // (5 * 5) = 1_200_000 (positive assoc)
    assert rows == [("X", "Y", 5, 1_200_000)]


def test_chi2_ab_known_value(ray_session):
    """Chi-square on a constructed split: variant A converts 3/4,
    variant B 1/4 -> chi2 = 8*(3*3-1*1)^2/(4*4*4*4) = 2.0."""
    import os
    import tempfile

    import pyarrow.parquet as pqt

    from anycrawl_ray.pipelines.queries import events_chi2_ab

    rows = []
    eid = 0
    for u in range(8):  # users 0..7, variant = u % 2
        conv = (u % 2 == 0 and u != 6) or (u == 1)
        rows.append((eid, u, "purchase" if conv else "view"))
        eid += 1
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([100 + i for i in range(len(rows))],
                       pa.timestamp("us")),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pqt.write_table(t, os.path.join(d, "events.parquet"))
        out = events_chi2_ab(d)
    r = {c: out.column(c)[0].as_py() for c in out.column_names}
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (4, 3, 4, 1)
    assert r["chi2_ppm"] == 8 * (3 * 3 - 1 * 1) ** 2 * 1_000_000 // 256


def test_hits_paths_equal(ray_session):
    """All three HITS paths — full driver fold (default), dense
    broadcast (driver_limit=0), join-gather (both limits 0) — are
    byte-equal."""
    from anycrawl_ray.stages.graph import hits_int

    a = hits_int(61, iters=2)
    b = hits_int(61, iters=2, driver_limit=0)
    c = hits_int(61, iters=2, driver_limit=0, broadcast_limit=0)
    assert a.equals(b)
    assert a.equals(c)


def test_postings_size_varint_exact(ray_session):
    """Varint byte model: gap 0..127 -> 1 byte, 128 -> 2; first posting
    encodes doc_id + 1."""
    from anycrawl_ray.stages.text_analysis import postings_size_topk

    # 'w' appears in docs 0, 100, 228: gaps 1(=0+1), 100, 128
    #   -> bytes 1 + 1 + 2 = 4, df 3
    # 'z' appears only in doc 200: gap 201 -> 2 bytes, df 1
    ds = _docs_ds([(0, "w"), (100, "w"), (228, "w"), (200, "z")])
    out = postings_size_topk(ds, k=10)
    got = {t: (d, b) for t, d, b in zip(out.column("term").to_pylist(),
                                        out.column("df").to_pylist(),
                                        out.column("bytes").to_pylist())}
    assert got == {"w": (3, 4), "z": (1, 2)}


def test_kcore_matches_numpy_peel(ray_session):
    """kcore_rounds == serial numpy peel of the same fixed-round rule."""
    from anycrawl_ray.stages.graph import kcore_rounds

    n, k, rounds = 61, 4, 3
    ids = np.arange(n, dtype=np.int64)
    a_parts, b_parts = [], []
    c1, c2 = 2 * ids + 1, 2 * ids + 2
    m = c1 < n
    a_parts.append(ids[m]); b_parts.append(c1[m])
    m2 = c2 < n
    a_parts.append(ids[m2]); b_parts.append(c2[m2])
    a_parts.append(c1[m2]); b_parts.append(c2[m2])
    ch = (7 * ids + 3) % n
    m3 = ch != ids
    a_parts.append(np.minimum(ids[m3], ch[m3]))
    b_parts.append(np.maximum(ids[m3], ch[m3]))
    packed = np.unique(np.concatenate(a_parts) * n
                       + np.concatenate(b_parts))
    ea, eb = packed // n, packed % n

    active = np.ones(n, dtype=bool)
    deg = np.zeros(n, dtype=np.int64)
    for _ in range(rounds):
        m = active[ea] & active[eb]
        deg = np.zeros(n, dtype=np.int64)
        np.add.at(deg, ea[m], 1)
        np.add.at(deg, eb[m], 1)
        active &= deg >= k
    got = kcore_rounds(n, k=k, rounds=rounds)
    assert got.column("doc_id").to_pylist() == \
        np.flatnonzero(active).tolist()
    assert got.column("deg").to_pylist() == deg[active].tolist()
    assert 0 < got.num_rows < n  # the fixture actually peels


def test_kcore_join_path_crosses_guard(ray_session):
    """kcore_rounds above broadcast_limit == dense path bit-for-bit:
    force a tiny limit so the distributed edge-join fallback runs on a
    graph that is 'too big' for the dense mask, and pin it to the
    dense result on the same fixture (the hits_int dual-path pin)."""
    from anycrawl_ray.stages.graph import kcore_rounds

    n, k, rounds = 61, 4, 3
    dense = kcore_rounds(n, k=k, rounds=rounds,
                         broadcast_limit=10_000_000)
    joined = kcore_rounds(n, k=k, rounds=rounds, broadcast_limit=16)
    assert joined.equals(dense)
    assert 0 < joined.num_rows < n

    # k<1 on the join path keeps zero-degree nodes invisible — refuse
    import pytest as _pytest
    with _pytest.raises(ValueError):
        kcore_rounds(n, k=0, rounds=1, broadcast_limit=16)


def test_first_touch_attribution_empty(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.window import first_touch_attribution

    t = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
    })
    out = first_touch_attribution(rd.from_arrow(t))
    assert out.num_rows == 0
    assert out.column_names == ["first_touch", "users", "conversions"]


def test_rfm_segments_empty(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.window import rfm_segments

    t = pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    })
    out = rfm_segments(rd.from_arrow(t))
    assert out.num_rows == 0


def test_hll_distinct_accuracy_and_partition_invariance(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.sketches import hll_distinct

    # p=8 -> ~6.5% standard error; 5000 distinct should land within 20%
    big = pa.table({"u": pa.array(np.arange(5000, dtype=np.int64))})
    out = hll_distinct(rd.from_arrow(big).repartition(4), "u", p=8)
    assert out.column("m").to_pylist() == [256]
    est = out.column("est_raw")[0].as_py()
    assert abs(est - 5000) / 5000 < 0.2
    # register maxima commute with block splits: identical output
    out2 = hll_distinct(rd.from_arrow(big).repartition(13), "u", p=8)
    assert out.equals(out2)
    # duplicates do not move registers
    dup = pa.table({"u": pa.array(
        np.tile(np.arange(5000, dtype=np.int64), 3))})
    out3 = hll_distinct(rd.from_arrow(dup).repartition(7), "u", p=8)
    assert out3.column("est_raw")[0].as_py() == est
    # negative ids fail loudly on both engines (oracle CAST would error)
    neg = pa.table({"u": pa.array([-1, 2], pa.int64())})
    with pytest.raises((ValueError, Exception)):
        hll_distinct(rd.from_arrow(neg), "u", p=8).column("m")


def test_oph_signature_properties():
    from anycrawl_ray.stages.dedup import (_OPH_OFFSET, oph_signature,
                                           shingle_hashes)

    s = shingle_hashes("the quick brown fox jumps over the lazy dog", 3)
    sig = oph_signature(s, nbins=32)
    assert sig.shape == (32,) and sig.dtype == np.uint64
    # deterministic, and identical shingle sets -> identical signatures
    assert np.array_equal(sig, oph_signature(s.copy(), nbins=32))
    # empty docs: all-zeros (minhash parity)
    assert not oph_signature(np.array([], np.uint64), 32).any()
    # filled bins hold the true per-bin minimum
    bins = (s % np.uint64(32)).astype(np.int64)
    for b in np.unique(bins):
        assert sig[b] == s[bins == b].min()
    # a single shingle densifies every bin with distinct offsets
    one = np.array([12345], dtype=np.uint64)
    sig1 = oph_signature(one, nbins=32)
    b0 = int(one[0] % 32)
    assert sig1[b0] == one[0]
    with np.errstate(over="ignore"):
        exp = one[0] + np.uint64((b0 - (b0 + 1) % 32 + 32) % 32) * _OPH_OFFSET
    # bin (b0+1)%32 borrows from b0 at rotation distance 31
    assert sig1[(b0 + 1) % 32] == exp
    assert np.unique(sig1).size == 32


def test_oph_pairs_finds_planted_near_dup(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.dedup import oph_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base + " phi"  # one extra token: very high Jaccard
    far = "one two three four five six seven eight nine ten"
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([base, near, far])})
    out = oph_pairs(rd.from_arrow(t).repartition(2))
    assert out.column("a").to_pylist() == [1]
    assert out.column("b").to_pylist() == [2]
    assert out.column("matched")[0].as_py() >= 16


def test_graph_walks_matches_numpy_reference(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.graph import graph_walks, site_edges
    from anycrawl_ray.stages.text_analysis import _mix64_np

    n, W = 40, 4
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(n, dtype=np.int64))})).repartition(3)
    out = graph_walks(site_edges(ids, n), n, walk_len=W)

    # reference: dense adjacency + sequential walk replay
    adj = {i: set() for i in range(n)}
    for i in range(n):
        for j in (2 * i + 1, 2 * i + 2):
            if j < n:
                adj[i].add(j); adj[j].add(i)
        if 2 * i + 2 < n:
            adj[2 * i + 1].add(2 * i + 2); adj[2 * i + 2].add(2 * i + 1)
        ch = (7 * i + 3) % n
        if ch != i:
            adj[i].add(ch); adj[ch].add(i)
    G = np.uint64(0x9E3779B97F4A7C15)
    visits = np.zeros(n, dtype=np.int64)
    for s in range(n):
        cur = s
        for t in range(W):
            nbrs = sorted(adj[cur])
            with np.errstate(over="ignore"):
                key = (np.uint64(cur) * G
                       + np.uint64(s) * np.uint64(W) + np.uint64(t))
            cur = nbrs[int(_mix64_np(np.array([key]))[0]
                           % np.uint64(len(nbrs)))]
            visits[cur] += 1
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("visits").to_pylist()))
    for i in range(n):
        assert got.get(i, 0) == visits[i], f"node {i}"
    assert sum(got.values()) == n * W


def test_mrl_recall_full_dims_is_perfect(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.similarity import mrl_recall

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((80, 8)).astype(np.float64)
    t = pa.table({"vec_id": pa.array(np.arange(80, dtype=np.int64)),
                  "embedding": pa.array(list(emb), pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(4)
    q = emb[:3]
    # truncating to the FULL dimension must reproduce the exact top-k
    out = mrl_recall(ds, q, [0, 1, 2], k=5, dims=8)
    assert out.column("recall_ppm").to_pylist() == [1_000_000] * 3
    # heavy truncation degrades but stays a valid ppm in [0, 1e6]
    out2 = mrl_recall(ds, q, [0, 1, 2], k=5, dims=2)
    for v in out2.column("recall_ppm").to_pylist():
        assert 0 <= v <= 1_000_000


def test_lsh_multiprobe_self_hit_and_probe_gain(ray_session):
    import ray.data as rd

    from anycrawl_ray.stages.similarity import lsh_multiprobe_knn

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((200, 16)).astype(np.float64)
    t = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                  "embedding": pa.array(list(emb), pa.list_(pa.float64()))})
    ds = rd.from_arrow(t).repartition(4)
    q = emb[:4]
    out = lsh_multiprobe_knn(ds, q, [0, 1, 2, 3], k=5, probes=3).to_pandas()
    # every query's own bucket contains itself -> rank-1 self hit
    r1 = out[out["rank"] == 1]
    assert dict(zip(r1["query_id"], r1["neighbor_id"])) == {
        0: 0, 1: 1, 2: 2, 3: 3}
    # probing strictly widens (or keeps) the candidate pool
    out0 = lsh_multiprobe_knn(ds, q, [0, 1, 2, 3], k=5,
                              probes=0).to_pandas()
    assert len(out) >= len(out0)
    got0 = set(zip(out0["query_id"], out0["neighbor_id"]))
    # probes=0 results all come from the query's own bucket, which the
    # probes=3 run also scans: rank lists only grow
    for qid in (0, 1, 2, 3):
        sub3 = set(out[out["query_id"] == qid]["neighbor_id"])
        sub0 = set(out0[out0["query_id"] == qid]["neighbor_id"])
        assert sub0 - sub3 == set() or len(sub3) == 5


# ------------------------------------------------- round-4 sixth batch
def test_user_streaks_matches_pandas_reference(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.stages.window import user_streaks

    rng = np.random.default_rng(7)
    n = 5000
    users = rng.integers(0, 40, n)
    days = rng.integers(0, 30, n)
    ts = pa.array((days * 86400 + rng.integers(0, 86400, n)) * 10**6,
                  pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({"user_id": pa.array(users, pa.int64()),
                                 "ts": ts})).repartition(8)
    got = user_streaks(ds)

    ref = pd.DataFrame({"user_id": users, "day": days}) \
        .drop_duplicates().sort_values(["user_id", "day"])
    rows = []
    for u, g in ref.groupby("user_id"):
        d = g["day"].to_numpy()
        runs = np.split(d, np.flatnonzero(np.diff(d) != 1) + 1)
        rows.append((u, d.size, max(len(r) for r in runs)))
    want = pd.DataFrame(rows, columns=["user_id", "n_active_days",
                                       "max_streak"])
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_user_streaks_single_day_and_gap(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.stages.window import user_streaks

    us = 86400 * 10**6
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        # user 1: days 0,1,5 (streak 2); user 2: one day
        "ts": pa.array([0, us + 5, 5 * us, 3 * us], pa.timestamp("us"))})
    got = user_streaks(rd.from_arrow(tbl))
    assert got["n_active_days"].tolist() == [3, 1]
    assert got["max_streak"].tolist() == [2, 1]


def test_hard_negatives_tie_break_and_drop(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.stages.similarity import hard_negatives

    # anchor 0 (label 0): two negatives with IDENTICAL dots -> smaller id
    # anchor 1 (label 9): no same-label partner -> dropped entirely
    emb = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [0.5, 0.5], [1.0, 0.0]]
    ids = [0, 1, 2, 3, 4]
    labs = [0, 9, 1, 1, 0]
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(emb, pa.list_(pa.float64())),
                    "label": pa.array(labs, pa.int64())})
    ds = rd.from_arrow(tbl).repartition(3)
    out = hard_negatives(ds, np.asarray(emb[:2]), ids[:2], labs[:2])
    assert out.column("anchor_id").to_pylist() == [0]
    assert out.column("hn_id").to_pylist() == [2]   # tie vs id 3 -> min id
    assert out.column("hp_id").to_pylist() == [4]


def test_dense_topk_int_orders_and_excludes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.stages.similarity import dense_topk_int

    emb = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [1.0, 0.0]]
    tbl = pa.table({"vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "embedding": pa.array(emb, pa.list_(pa.float64()))})
    out = dense_topk_int(rd.from_arrow(tbl).repartition(2),
                         np.array([1.0, 0.0]), k=3, exclude_ids=(0,))
    assert out.column("vec_id").to_pylist() == [3, 1, 2]
    assert out.column("rank").to_pylist() == [1, 2, 3]


def test_hdr_quantiles_error_bound_and_partition_invariance(ray_session):
    """HDR sketch invariants: est <= exact for every (key, p); relative
    error of positive quantiles bounded by 2^-sub_bits; zero/negative
    values pass through the zero bucket exactly; block layout never
    changes the result."""
    import ray.data as rd

    from anycrawl_ray.stages.sketches import hdr_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.lognormal(3.0, 1.5, 4000).round(2) + 0.01,
        np.zeros(5),                     # zero bucket
        np.array([-1.25, -0.03]),        # negative passthrough
    ])
    keys = np.where(np.arange(vals.size) % 3 == 0, "a", "b")
    t = pa.table({"k": pa.array(keys), "value": pa.array(vals)})

    out = hdr_quantiles(rd.from_arrow(t).repartition(5), key="k",
                        value_col="value", sub_bits=3).to_pandas()
    assert len(out) == 6  # 2 keys x 3 quantiles
    assert (out["est_cents"] <= out["exact_cents"]).all()
    pos = out[out["exact_cents"] > 0]
    assert (pos["err_ppm"] <= 1_000_000 // 8).all()
    assert (pos["err_ppm"] >= 0).all()

    out2 = hdr_quantiles(rd.from_arrow(t).repartition(11), key="k",
                         value_col="value", sub_bits=3).to_pandas()
    assert out.equals(out2)

    # exact below the bucketing threshold: a corpus whose cents all fit
    # in sub_bits+1 bits must sketch with zero error
    small = pa.table({"k": pa.array(["s"] * 50),
                      "value": pa.array((rng.integers(1, 16, 50)
                                         / 100).astype(float))})
    outs = hdr_quantiles(rd.from_arrow(small), key="k",
                         value_col="value", sub_bits=3).to_pandas()
    assert (outs["err_ppm"] == 0).all()

    # guard crossing: driver_limit=0 forces the distributed groupby-Sum
    # fold; it must equal the default driver-side pyarrow fold exactly
    out3 = hdr_quantiles(rd.from_arrow(t).repartition(5), key="k",
                         value_col="value", sub_bits=3,
                         driver_limit=0).to_pandas()
    assert out.equals(out3)


def test_textrank_hub_ranks_first_and_partition_invariance(ray_session):
    """TextRank sanity on a hand-built corpus: a token adjacent to every
    other token (the hub) must rank first; result is independent of the
    block layout; isolated tokens (single-token docs) keep the
    teleport-only rank, strictly below connected nodes."""
    import ray.data as rd

    from anycrawl_ray.stages.graph import textrank_keywords

    docs = pa.table({"text": pa.array([
        "hub alpha hub beta hub gamma hub delta",
        "alpha beta",
        "lonely",
    ])})
    out = textrank_keywords(rd.from_arrow(docs), iters=10, topk=10) \
        .to_pandas()
    assert out.iloc[0]["term"] == "hub"
    lonely = out[out["term"] == "lonely"]["rank_scaled"].iloc[0]
    assert lonely < out[out["term"] == "hub"]["rank_scaled"].iloc[0]
    assert (out["rank_scaled"] > 0).all()

    out2 = textrank_keywords(rd.from_arrow(docs).repartition(3),
                             iters=10, topk=10).to_pandas()
    assert out.equals(out2)


def test_kmv_set_ops_exact_below_k_and_estimates_above(ray_session):
    """Below k distinct, every KMV set-op estimate is EXACT (the
    sketches are complete); above k, union/intersection estimates land
    within the sketch's ~1/sqrt(k) band; partition-invariant."""
    import ray.data as rd

    from anycrawl_ray.stages.sketches import kmv_set_ops

    # small: 60 A-users, 40 B-users, 20 overlap -> all exact at k=256
    a_ids = list(range(100, 160))
    b_ids = list(range(140, 180))
    t = pa.table({
        "user_id": pa.array(a_ids + b_ids, pa.int64()),
        "event_type": pa.array(["click"] * len(a_ids)
                               + ["purchase"] * len(b_ids))})
    out = kmv_set_ops(rd.from_arrow(t).repartition(4), "user_id",
                      "event_type", "click", "purchase").to_pandas()
    assert out.iloc[0].tolist() == [60, 40, 80, 20, 20]

    # large: 6000 vs 4000 with 2000 overlap, k=256 -> within 25%
    a2 = list(range(0, 6000))
    b2 = list(range(4000, 8000))
    t2 = pa.table({
        "user_id": pa.array(a2 + b2, pa.int64()),
        "event_type": pa.array(["click"] * len(a2)
                               + ["purchase"] * len(b2))})
    o2 = kmv_set_ops(rd.from_arrow(t2).repartition(7), "user_id",
                     "event_type", "click", "purchase").to_pandas().iloc[0]
    assert o2["exact_inter"] == 2000
    assert abs(o2["est_union"] - 8000) <= 2000
    assert abs(o2["est_inter"] - 2000) <= 800
    o3 = kmv_set_ops(rd.from_arrow(t2).repartition(13), "user_id",
                     "event_type", "click", "purchase").to_pandas().iloc[0]
    assert o2.tolist() == o3.tolist()


def test_profile_table_nulls_views_and_estimates(ray_session):
    """Profiler invariants on a hand-built table: null counting per
    column, cents/str/ts integer views for min-max, HLL estimate exact
    at tiny cardinality (all registers distinct below saturation is not
    guaranteed, but the estimator must be within the p=8 band),
    partition-invariant."""
    import ray.data as rd

    from anycrawl_ray.stages.sketches import profile_table

    n = 3000
    t = pa.table({
        "a": pa.array(list(range(n)), pa.int64()),
        "b": pa.array([None if i % 10 == 0 else round(i * 0.01, 2)
                       for i in range(n)], pa.float64()),
        "s": pa.array(["x" * (i % 7) for i in range(n)], pa.string()),
        # non-ASCII: char-length view (max 2 CHARS, 4 bytes) pins the
        # utf8_length-vs-binary_length choice against DuckDB length()
        "u": pa.array(["é", "éé"] * (n // 2), pa.string()),
    })
    spec = {"a": "int", "b": "cents", "s": "str", "u": "str"}
    out = profile_table(rd.from_arrow(t).repartition(6), spec) \
        .to_pandas().set_index("column")
    assert out.loc["a", "n"] == n and out.loc["a", "n_null"] == 0
    assert out.loc["b", "n_null"] == n // 10
    assert out.loc["a", "min_i"] == 0 and out.loc["a", "max_i"] == n - 1
    # cents view: non-null b values are i*0.01 for i not divisible by 10
    assert out.loc["b", "min_i"] == 1 and out.loc["b", "max_i"] == n - 1
    assert out.loc["s", "min_i"] == 0 and out.loc["s", "max_i"] == 6
    assert out.loc["u", "min_i"] == 1 and out.loc["u", "max_i"] == 2
    # HLL p=8 relative error ~6.5% on high cardinality; allow 3 sigma
    assert abs(out.loc["a", "n_distinct_est"] - n) < 0.2 * n
    # low cardinality: the profiler reports the RAW estimator (the
    # events_hll house convention, no linear-counting correction) —
    # pin it against an independent scalar reimplementation
    from anycrawl_ray.stages.text_analysis import _fnv1a_bulk, _mix64_np
    h = _mix64_np(np.asarray(_fnv1a_bulk(sorted({"x" * k for k in
                                                 range(7)})),
                             dtype=np.uint64))
    m, q = 256, 56
    regs = {}
    for hv in h.tolist():
        w = hv & ((1 << q) - 1)
        rho = q - (w.bit_length() - 1) if w > 0 else q + 1
        r = hv >> q
        regs[r] = max(regs.get(r, 0), rho)
    s_val = (m - len(regs)) * (1 << (q + 1)) \
        + sum(1 << (q + 1 - r) for r in regs.values())
    exp = 7213 * m ** 3 * (1 << (q + 1)) \
        // (10 * (1000 * m + 1079) * s_val)
    assert out.loc["s", "n_distinct_est"] == exp

    out2 = profile_table(rd.from_arrow(t).repartition(13), spec) \
        .to_pandas().set_index("column")
    assert out.equals(out2)


def test_integrity_checks_fire_on_dirty_data(ray_session):
    """The audit kernels must actually FIRE (the sf fixtures are clean,
    so their oracle rows are all-zero): duplicate PKs count rows beyond
    the first, FK orphans count CHILD ROWS (not distinct keys), and
    both are partition-layout invariant."""
    import ray.data as rd

    from anycrawl_ray.pipelines.queries import _fk_orphan_rows, _pk_dup_rows

    dirty = pa.table({"k": pa.array([1, 1, 1, 2, 3, 3], pa.int64())})
    assert _pk_dup_rows(rd.from_arrow(dirty).repartition(3),
                        ["k"]) == 3  # (3-1) + (2-1)

    child = pa.table({"ck": pa.array([10, 10, 11, 12, 12, 12],
                                     pa.int64())})
    parent = pa.table({"pk": pa.array([10, 99], pa.int64())})
    # keys 11 (1 row) and 12 (3 rows) are orphans -> 4 child rows
    n = _fk_orphan_rows(rd.from_arrow(child).repartition(3), "ck",
                        rd.from_arrow(parent).repartition(2), "pk")
    assert n == 4
    n2 = _fk_orphan_rows(rd.from_arrow(child).repartition(5), "ck",
                         rd.from_arrow(parent), "pk")
    assert n2 == 4
    # guard crossing: driver_limit=0 forces the distributed groupby-Sum
    # paths; both must equal the driver-fold answers
    assert _pk_dup_rows(rd.from_arrow(dirty).repartition(3), ["k"],
                        driver_limit=0) == 3
    assert _fk_orphan_rows(rd.from_arrow(child).repartition(3), "ck",
                           rd.from_arrow(parent).repartition(2), "pk",
                           driver_limit=0) == 4


def test_degree_assortativity_star_vs_path(ray_session):
    """Known-answer graphs: a star is maximally DISassortative
    (r = -1 -> r_ppm = -1000000); a 2-edge path has r_ppm strictly
    between -1e6 and 0; the sufficient statistics obey the symmetry
    identities; partition-invariant."""
    import ray.data as rd

    from anycrawl_ray.stages.graph import degree_assortativity

    star = pa.table({"a": pa.array([0, 0, 0, 0], pa.int64()),
                     "b": pa.array([1, 2, 3, 4], pa.int64())})
    out = degree_assortativity(rd.from_arrow(star).repartition(2)) \
        .to_pandas().iloc[0]
    assert out["m2"] == 8  # 2|E|
    assert out["r_ppm"] == -1_000_000
    # guard crossing: driver_limit=0 forces the distributed
    # groupby/join path; must equal the dense driver fold (incl. with
    # duplicate edge rows, which both paths distinct-ify)
    dup = pa.concat_tables([star, star.slice(0, 2)])
    dd = degree_assortativity(rd.from_arrow(dup).repartition(3))
    jj = degree_assortativity(rd.from_arrow(dup).repartition(3),
                              driver_limit=0)
    assert dd.equals(jj)

    # 3-edge path 0-1-2-3: hand-computed r = -1/2 exactly
    path = pa.table({"a": pa.array([0, 1, 2], pa.int64()),
                     "b": pa.array([1, 2, 3], pa.int64())})
    p1 = degree_assortativity(rd.from_arrow(path)).to_pandas().iloc[0]
    assert p1["r_ppm"] == -500_000
    assert (p1["m2"], p1["sx"], p1["sxx"], p1["sxy"]) == (6, 10, 18, 16)
    p2 = degree_assortativity(rd.from_arrow(path).repartition(3)) \
        .to_pandas().iloc[0]
    assert p1.tolist() == p2.tolist()


def test_corpus_build_composition(ray_session):
    """The end-to-end corpus row composes crawl -> paragraph extraction ->
    token quality gate -> packing, and its invariants hold against an
    independent driver-side replay of the same graph + token rules."""
    import numpy as np
    import pyarrow.parquet as pq

    from anycrawl_ray.pipelines.queries import corpus_build
    from anycrawl_ray.sources.synthetic_site import page_links

    sf = "/root/testdata/sf0.001"
    out = corpus_build(sf).to_pylist()
    assert out, "non-empty manifest"
    bins = [r["bin"] for r in out]
    assert bins == list(range(len(bins))), "bins contiguous from 0"

    # independent replay: BFS reachability from page 1 over the shared
    # graph rule, token counts straight from documents.text, gate >= 40,
    # cumulative // 512 binning
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    texts = {d["doc_id"]: d["text"] for d in docs}
    n = len(docs)
    reach, frontier = {1}, [1]
    while frontier:
        nxt = []
        for i in frontier:
            for j in page_links(i, n):
                if j not in reach:
                    reach.add(j)
                    nxt.append(j)
        frontier = nxt
    before, expect = 0, {}
    for i in sorted(reach):
        t = len(texts[i].split())
        if t < 40:
            continue
        b = before // 512
        e = expect.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += t
        before += t
    assert out == [{"bin": b, "n_docs": v[0], "sum_tokens": v[1]}
                   for b, v in sorted(expect.items())]


def test_corpus_dedup_build_merges_text_groups(ray_session):
    """The dedup composition row: the doubled site carries exact duplicate
    pages (text cycles), and exact first-wins dedup keeps min page index
    per DISTINCT TEXT — including texts the source corpus itself
    duplicates across doc_ids (the sf0.1 oracle catch). Independent
    driver-side replay."""
    import collections

    import pyarrow.parquet as pq

    from anycrawl_ray.pipelines.queries import corpus_dedup_build
    from anycrawl_ray.sources.synthetic_site import page_links

    sf = "/root/testdata/sf0.001"
    out = corpus_dedup_build(sf).to_pylist()
    assert out

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    texts = {d["doc_id"]: d["text"] for d in docs}
    n = len(docs)
    c = 2 * n
    dist = {1: 0}
    dq = collections.deque([1])
    while dq:
        i = dq.popleft()
        if dist[i] >= 20:
            continue
        for j in page_links(i, c):
            if j not in dist:
                dist[j] = dist[i] + 1
                dq.append(j)
    keep = {}
    for i in sorted(dist):
        t = texts[i % n]
        if t not in keep:
            keep[t] = i
    before, expect = 0, {}
    for i in sorted(keep.values()):
        tcount = len(texts[i % n].split())
        if tcount < 40:
            continue
        b = before // 512
        e = expect.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += tcount
        before += tcount
    assert out == [{"bin": b, "n_docs": v[0], "sum_tokens": v[1]}
                   for b, v in sorted(expect.items())]
    # the doubled graph really crawled duplicates: survivors < reachable
    assert len(keep) < len(dist)


def test_corpus_build_resumes_to_identical_manifest(ray_session, tmp_path):
    """The corpus composition survives a mid-crawl crash: crash after
    epoch 2, resume from the checkpoint, feed the resumed crawl's
    documents through the same extraction/gate/pack stages — the packing
    manifest must equal the uninterrupted run's, byte for byte."""
    import pytest
    import ray.data as rd

    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.pipelines.queries import _assemble_md_paragraphs
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url
    from anycrawl_ray.stages.text_analysis import pack_sequences

    sf = "/root/testdata/sf0.001"
    pages = build_site_table(f"{sf}/documents.parquet")

    def mk():
        return CrawlJob(job_id="cres", seed_urls=[page_url(1)],
                        strategy="all", max_depth=20, limit=50_000,
                        formats=["markdown"], include_tags=["p"])

    def manifest(res):
        kept = rd.from_arrow(res.documents).map_batches(
            _assemble_md_paragraphs, batch_format="pyarrow")
        return pack_sequences(kept, budget=512)

    golden = manifest(run_crawl(mk(), pages, use_ray=False))
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_crawl(mk(), pages, use_ray=False, out_dir=out,
                  checkpoint_dir=ckpt, crash_after_epoch=2)
    resumed = run_crawl(mk(), pages, use_ray=False, out_dir=out,
                        checkpoint_dir=ckpt, resume=True)
    assert manifest(resumed).equals(golden)
