"""Sink-seam tests: the pluggable storage backend (state/storage.py) — the
parquet path end to end and the import-guarded Lance backend the north
rule names (a config flip on a cluster where `lance` is installed)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from anycrawl_ray.state import storage

LANCE_PRESENT = storage.lance_available()


def test_parquet_roundtrip(tmp_path):
    t = pa.table({"doc_id": ["a", "b"], "n": [1, 2]})
    p = str(tmp_path / "part-0000.parquet")
    storage.write_table(t, p)
    assert storage.read_table(p).equals(t)
    assert storage.is_part("part-0000.parquet")
    assert storage.is_part("part-0000.lance")
    assert not storage.is_part("part-0000.tmp")


def test_require_format_validates():
    assert storage.require_format("parquet") == "parquet"
    with pytest.raises(ValueError, match="unknown storage_format"):
        storage.require_format("orc")


@pytest.mark.skipif(LANCE_PRESENT, reason="lance installed: guard inactive")
def test_lance_guard_raises_clear_error():
    with pytest.raises(RuntimeError, match="lance"):
        storage.require_format("lance")
    with pytest.raises(RuntimeError, match="pylance"):
        storage.write_table(pa.table({"a": [1]}), "/tmp/x.lance")


@pytest.mark.skipif(LANCE_PRESENT, reason="lance installed: guard inactive")
def test_run_crawl_lance_fails_at_submit(tmp_path, ray_session):
    """A missing backend must fail BEFORE any fetching happens."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="lg", seed_urls=[page_url(0)], limit=5)
    with pytest.raises(RuntimeError, match="lance"):
        run_crawl(job, pages, out_dir=str(tmp_path), use_ray=False,
                  storage_format="lance")
    assert not os.path.isdir(tmp_path / "lg")


def test_crawl_explicit_parquet_format(tmp_path, ray_session):
    """storage_format='parquet' through the seam: epoch dirs, readable
    result, format detection."""
    from anycrawl_ray.pipelines.crawl import (CrawlJob, epoch_part_files,
                                              run_crawl)
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="pf", seed_urls=[page_url(0)], strategy="all",
                   limit=40)
    res = run_crawl(job, pages, out_dir=str(tmp_path), use_ray=False,
                    storage_format="parquet")
    job_out = str(tmp_path / "pf")
    parts = epoch_part_files(job_out)
    assert parts and all(p.endswith(".parquet") for p in parts)
    assert res.documents.num_rows == 40
    assert storage.latest_format(job_out) == "parquet"
    assert storage.latest_format(None) == "parquet"
    # streaming read path over the same parts
    ds = storage.read_dataset(parts)
    assert ds.count() == 40


@pytest.mark.skipif(not LANCE_PRESENT, reason="needs lance")
def test_lance_roundtrip(tmp_path):  # pragma: no cover - cluster-only
    t = pa.table({"doc_id": ["a"], "n": [1]})
    p = str(tmp_path / "part-0000.lance")
    storage.write_table(t, p)
    assert storage.read_table(p).equals(t)


@pytest.mark.skipif(LANCE_PRESENT, reason="lance installed: guard inactive")
def test_resume_detects_prior_format(tmp_path, ray_session):
    """Resume must keep writing the format the FIRST run wrote: with a
    .lance part on disk and the default (parquet) argument, detection
    must select lance — proven here by the import guard firing."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="rf", seed_urls=[page_url(0)], strategy="all",
                   limit=60)
    ck = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_crawl(job, pages, out_dir=str(tmp_path), checkpoint_dir=ck,
                  use_ray=False, crash_after_epoch=1)
    # masquerade the finished epochs as lance parts
    job_out = tmp_path / "rf"
    for edir in job_out.glob("epoch=*"):
        for part in edir.glob("*.parquet"):
            part.rename(part.with_suffix(".lance"))
    with pytest.raises(RuntimeError, match="lance"):
        run_crawl(job, pages, out_dir=str(tmp_path), checkpoint_dir=ck,
                  use_ray=False, resume=True)


def test_write_dataset_partitioned_resumable(ray_session, tmp_path):
    """Partitioned sink: atomic part dirs, manifest, and a re-run after
    a simulated crash writes ONLY the missing partitions."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.state.storage import (read_table,
                                            write_dataset_partitioned)

    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "split": pa.array(["train" if i % 10 < 8 else
                           ("valid" if i % 10 == 8 else "test")
                           for i in range(100)]),
    })
    out = str(tmp_path / "o")
    counts = write_dataset_partitioned(rd.from_arrow(t).repartition(4),
                                       out, by="split")
    assert counts == {"train": 80, "valid": 10, "test": 10}
    assert sorted(os.listdir(out)) == ["MANIFEST.json", "part=test",
                                       "part=train", "part=valid"]
    got = read_table(os.path.join(out, "part=train", "data.parquet"))
    assert got.num_rows == 80

    # simulated crash: one partition vanished; re-run restores ONLY it
    import shutil

    shutil.rmtree(os.path.join(out, "part=valid"))
    marker = os.path.join(out, "part=train", "data.parquet")
    before = os.path.getmtime(marker)
    counts2 = write_dataset_partitioned(rd.from_arrow(t).repartition(4),
                                        out, by="split")
    assert counts2 == {"valid": 10}  # finished partitions skipped
    assert os.path.getmtime(marker) == before  # train untouched
    assert sorted(os.listdir(out)) == ["MANIFEST.json", "part=test",
                                       "part=train", "part=valid"]
