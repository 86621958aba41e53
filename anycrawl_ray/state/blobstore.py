"""Blob storage for media payloads (screenshots, images) — the rebuild of
the reference's storage seam (packages/libs/src/s3.ts:38-71 S3Storage /
NoOpStorage selection, ScreenshotTransformer.ts:104-139 key scheme).

No object-store service exists in this sandbox, so the S3 client becomes a
``LocalDirStorage`` with the same interface (``upload`` / ``upload_image``
/ ``get_temporary_url``); a real S3/GCS client drops in behind
``get_storage``. Writes are atomic (tmp + rename) so a crashed worker
never leaves a torn blob, and keys may contain ``/`` (mapped to
subdirectories).

Key scheme for screenshots (ScreenshotTransformer.ts:108-117):
``screenshot-{jobId}-{md5_8}.jpeg`` / ``screenshot-fullPage-{jobId}-...``.
"""

from __future__ import annotations

import os


class LocalDirStorage:
    """Directory-backed IStorage (s3.ts interface)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        path = os.path.join(self.root, key)
        if os.path.commonpath([os.path.abspath(path),
                               os.path.abspath(self.root)]) != \
                os.path.abspath(self.root):
            raise ValueError(f"blob key escapes storage root: {key!r}")
        return path

    def upload(self, key: str, body: bytes | str) -> None:
        data = body.encode() if isinstance(body, str) else body
        path = self._path(key)
        os.makedirs(os.path.dirname(path) or self.root, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def upload_image(self, key: str, image_data: bytes,
                     content_type: str = "image/jpeg") -> None:
        self.upload(key, image_data)

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def get_temporary_url(self, key: str, expires_in: int = 3600) -> str:
        return f"file://{os.path.abspath(self._path(key))}"


class NoOpStorage:
    """s3.ts NoOpStorage — accepted and dropped (storage disabled)."""

    def upload(self, key: str, body) -> None:
        return None

    def upload_image(self, key: str, image_data: bytes,
                     content_type: str = "image/jpeg") -> None:
        return None

    def get(self, key: str) -> bytes:
        raise KeyError(key)

    def exists(self, key: str) -> bool:
        return False

    def get_temporary_url(self, key: str, expires_in: int = 3600) -> str:
        return ""


def get_storage(spec: str | None):
    """s3.ts bottom-of-file selector: falsy/"noop" -> NoOpStorage,
    otherwise a directory path -> LocalDirStorage (the sandbox stand-in
    for the S3 branch)."""
    if not spec or spec == "noop":
        return NoOpStorage()
    return LocalDirStorage(spec)


def screenshot_key(job_id: str, md5_8: str, full_page: bool = False) -> str:
    """ScreenshotTransformer.ts:108-117 file-name scheme."""
    if full_page:
        return f"screenshot-fullPage-{job_id}-{md5_8}.jpeg"
    return f"screenshot-{job_id}-{md5_8}.jpeg"
