"""In-memory API state: the rebuild's stand-in for the reference's DB
package (``@anycrawl/db`` api_key / jobs / scheduled_tasks /
webhook_subscriptions tables) plus the handles the controllers share —
the page corpus, job runner, scheduler and webhook managers.

Everything is injectable so tests drive fake clocks/transports; a real
deployment swaps these dicts for its database without touching the
controllers (the reference isolates the same boundary behind getDB()).
"""

from __future__ import annotations

import secrets
import uuid as _uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from ..state.scheduler import SchedulerManager
from ..state.webhooks import WebhookManager


@dataclass
class ApiKey:
    """One api_key row (AuthMiddleware.ts key lookup surface)."""

    key: str
    uuid: str = field(default_factory=lambda: str(_uuid.uuid4()))
    user: str | None = None
    is_active: bool = True
    allowed_ips: tuple = ()
    credits: int = 1000


@dataclass
class JobRecord:
    """One jobs row (createJob/getJob/failedJob/cancelJob surface)."""

    job_id: str
    job_type: str  # scrape|crawl|search
    job_queue_name: str
    url: str
    status: str = "pending"  # pending|running|completed|failed|cancelled
    credits_used: int = 0
    total: int = 0
    completed: int = 0
    failed: int = 0
    created_at: str = ""
    payload: dict = field(default_factory=dict)


FINISHED_STATUSES = ("completed", "failed", "cancelled")

_KEY_ALPHABET = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                 "abcdefghijklmnopqrstuvwxyz0123456789")


def generate_api_key() -> str:
    """scripts/generateApiKey.ts:4-14 — ``ac-`` + 32 alphanumeric chars
    drawn per random byte mod alphabet size."""
    raw = secrets.token_bytes(32)
    return "ac-" + "".join(_KEY_ALPHABET[b % len(_KEY_ALPHABET)]
                           for b in raw)


class _RecordingTransport:
    """Default webhook transport: records sends, reports success (the
    sandbox has no network; tests inject failures through their own)."""

    def __init__(self) -> None:
        self.sent: list[dict] = []

    def __call__(self, method, url, headers, body, timeout):
        self.sent.append({"method": method, "url": url,
                          "headers": headers, "body": body})
        return 200, {}, "ok"


class ApiState:
    """Shared state for one API instance."""

    def __init__(self, pages=None, out_dir: str = "/tmp/anycrawl_api_out",
                 checkpoint_dir: str = "/tmp/anycrawl_api_ckpt",
                 documents_path: str | None = None,
                 auth_enabled: bool = False, credits_enabled: bool = False,
                 domain: str | None = None, use_ray: bool = False,
                 run_mode: str = "sync", scheduler_running: bool = True,
                 clock=None, webhook_transport=None,
                 storage_dir: str | None = None) -> None:
        self.pages = pages  # site corpus table (fetch stage input)
        self.documents_path = documents_path  # for SERP fixtures
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.auth_enabled = auth_enabled
        self.credits_enabled = credits_enabled
        self.domain = domain  # ANYCRAWL_DOMAIN; None -> per-request host
        self.use_ray = use_ray
        self.run_mode = run_mode  # sync | manual (tests drain explicitly)
        self.scheduler_running = scheduler_running
        self.clock = clock or (lambda: datetime.now(timezone.utc))
        self.storage_dir = storage_dir  # storage spec (FileController)
        self._storage = None  # built lazily via the blobstore selector

        self.api_keys: dict[str, ApiKey] = {}
        self.jobs: dict[str, JobRecord] = {}
        self.templates: dict[str, dict] = {}
        self.scheduled_tasks: dict[str, dict] = {}  # snake_case rows
        self.webhooks: dict[str, dict] = {}  # snake_case rows (sans secret)
        self._seq = 0

        self.webhook_transport = webhook_transport or _RecordingTransport()
        self.webhook_manager = WebhookManager(
            self.webhook_transport,
            clock=lambda: self.clock().timestamp())
        self.scheduler = SchedulerManager(
            trigger_job=self._trigger_scheduled_job,
            clock=self.clock)
        self._pending: list[str] = []  # manual-mode job queue

    # -- helpers -----------------------------------------------------------

    @property
    def storage(self):
        """Storage backend, resolved once through the s3.ts-style
        selector (noop / s3 / local dir)."""
        if self._storage is None:
            from ..state.blobstore import get_storage

            self._storage = get_storage(self.storage_dir)
        return self._storage

    def add_api_key(self, key: str, **kw) -> ApiKey:
        rec = ApiKey(key=key, **kw)
        self.api_keys[key] = rec
        return rec

    def now_iso(self) -> str:
        return self.clock().isoformat()

    def next_seq(self) -> int:
        self._seq += 1
        return self._seq

    def new_secret(self) -> str:
        # crypto.randomBytes(32).toString("hex")
        return secrets.token_hex(32)

    def _trigger_scheduled_job(self, task, execution) -> str:
        """SchedulerManager trigger seam: launch the task's underlying
        job through the same code path the HTTP handlers use."""
        from .controllers import run_task_payload

        return run_task_payload(self, task.task_type, task.task_payload)

    def tick_scheduler(self) -> list[str]:
        """One scheduler sweep + execution-status reconciliation.  The
        reference's worker reports job completion back through queue
        events; with sync in-process jobs the triggered job is already
        finished when ``tick`` returns, so finalize the execution rows
        here."""
        fired = self.scheduler.tick()
        for e in list(self.scheduler.executions.values()):
            if e.status == "running" and e.job_uuid:
                rec = self.jobs.get(e.job_uuid)
                if rec is not None and rec.status in FINISHED_STATUSES:
                    self.scheduler.complete_execution(
                        e.uuid, "completed" if rec.status == "completed"
                        else "failed")
        return fired
