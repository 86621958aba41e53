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


class S3Storage:
    """s3.ts:12-71 S3Storage over an injectable client.

    Config comes from the reference's env surface (required-variable
    errors match s3.ts:17-25 verbatim): ``ANYCRAWL_S3_ENDPOINT``,
    ``ANYCRAWL_S3_ACCESS_KEY`` / ``ANYCRAWL_S3_SECRET_ACCESS_KEY``,
    ``ANYCRAWL_S3_BUCKET``, optional ``ANYCRAWL_S3_REGION``.  ``client``
    may be any object with ``put_object`` / ``get_object`` /
    ``head_object`` / ``generate_presigned_url`` (the boto3 S3 client
    shape); when omitted, boto3 is imported lazily — this sandbox has no
    boto3 or network, so tests inject fakes and production drops the
    real client in.
    """

    def __init__(self, client=None, env: dict | None = None) -> None:
        env = os.environ if env is None else env
        if not env.get("ANYCRAWL_S3_ENDPOINT"):
            raise RuntimeError("ANYCRAWL_S3_ENDPOINT is required")
        if not (env.get("ANYCRAWL_S3_ACCESS_KEY")
                and env.get("ANYCRAWL_S3_SECRET_ACCESS_KEY")):
            raise RuntimeError("ANYCRAWL_S3_ACCESS_KEY is required")
        if not env.get("ANYCRAWL_S3_BUCKET"):
            raise RuntimeError("ANYCRAWL_S3_BUCKET is required")
        self.bucket = env["ANYCRAWL_S3_BUCKET"]
        if client is None:  # pragma: no cover - needs boto3 + network
            import boto3

            client = boto3.client(
                "s3",
                endpoint_url=env["ANYCRAWL_S3_ENDPOINT"],
                region_name=env.get("ANYCRAWL_S3_REGION"),
                aws_access_key_id=env["ANYCRAWL_S3_ACCESS_KEY"],
                aws_secret_access_key=env["ANYCRAWL_S3_SECRET_ACCESS_KEY"],
            )
        self.client = client

    def upload(self, key: str, body: bytes | str):
        data = body.encode() if isinstance(body, str) else body
        return self.client.put_object(Bucket=self.bucket, Key=key,
                                      Body=data)

    def upload_image(self, key: str, image_data: bytes,
                     content_type: str = "image/jpeg"):
        return self.client.put_object(Bucket=self.bucket, Key=key,
                                      Body=image_data,
                                      ContentType=content_type)

    def get(self, key: str) -> bytes:
        body = self.client.get_object(Bucket=self.bucket,
                                      Key=key)["Body"]
        return body.read() if hasattr(body, "read") else body

    def exists(self, key: str) -> bool:
        try:
            self.client.head_object(Bucket=self.bucket, Key=key)
            return True
        except Exception:
            return False

    def get_temporary_url(self, key: str, expires_in: int = 3600) -> str:
        return self.client.generate_presigned_url(
            "get_object", Params={"Bucket": self.bucket, "Key": key},
            ExpiresIn=expires_in)


def get_storage(spec: str | None, s3_client=None):
    """s3.ts bottom-of-file selector (createS3Client): "s3" -> S3Storage
    (env-configured; reference gates on ANYCRAWL_STORAGE === "s3"),
    falsy/"noop" -> NoOpStorage, otherwise a directory path ->
    LocalDirStorage (the sandbox stand-in for an object store)."""
    if not spec or spec == "noop":
        return NoOpStorage()
    if spec == "s3":
        return S3Storage(client=s3_client)
    return LocalDirStorage(spec)


def screenshot_key(job_id: str, md5_8: str, full_page: bool = False) -> str:
    """ScreenshotTransformer.ts:108-117 file-name scheme."""
    if full_page:
        return f"screenshot-fullPage-{job_id}-{md5_8}.jpeg"
    return f"screenshot-{job_id}-{md5_8}.jpeg"
