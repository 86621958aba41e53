"""Webhook dispatcher — driver-side delivery queue with exponential-backoff
retry and auto-disable (packages/scrape/src/managers/Webhook.ts).

Semantics ported (the async-job UX half of the reference's control plane):

- **subscription matching** (Webhook.ts:84-120 triggerEvent): active subs
  whose ``event_types`` contains the event, filtered by user id and scope
  ("all" vs specific task ids);
- **delivery records** (:126-167): one per (subscription, event), status
  pending -> delivered | retrying -> failed, attempt 1..max_attempts
  (sub.max_retries, default 3);
- **private-IP guard** (:10-46, 200-216): localhost / RFC1918 / link-local
  / IPv6-private targets are blocked with ``PRIVATE_IP_BLOCKED`` unless
  ``allow_local`` (ALLOW_LOCAL_WEBHOOKS);
- **HMAC signing** (:371-375): ``sha256=<hexdigest>`` over the JSON body
  with the subscription secret, sent as ``X-AnyCrawl-Signature`` plus the
  event/delivery-id/timestamp headers (:222-231);
- **retry backoff** (:297-320): next_retry_at = now +
  ``backoff_multiplier ** attempt_number`` minutes (base 1 min, default
  multiplier 2) while attempts remain;
- **auto-disable** (:345-367): a FINAL failure increments the
  subscription's consecutive-failure count; reaching
  ``auto_disable_after_failures`` (default 10) deactivates it. Any
  success resets the count to 0 (:264-272);
- **retry processor** (:377-414): due retries re-enter the queue as
  pending.

Transport and clock are injected (``transport(method, url, headers, body,
timeout_s) -> (status, headers, body)``; raise to signal network failure)
so tests drive the full schedule deterministically — the reference's axios
call drops in as a transport.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import re
import uuid as _uuid
from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urlsplit

_PRIVATE_V4 = (
    re.compile(r"^10\."),
    re.compile(r"^172\.(1[6-9]|2[0-9]|3[0-1])\."),
    re.compile(r"^192\.168\."),
    re.compile(r"^169\.254\."),
    # defensive extension beyond Webhook.ts:15-17 (which only matches the
    # literal 127.0.0.1): the whole loopback /8 and the unspecified address
    re.compile(r"^127\."),
    re.compile(r"^0\.0\.0\.0$"),
)


# types/WebhookEvents.ts:6-38 — the full supported-event enum
WEBHOOK_EVENT_TYPES = (
    "scrape.created", "scrape.started", "scrape.completed",
    "scrape.failed", "scrape.cancelled",
    "crawl.created", "crawl.started", "crawl.completed",
    "crawl.failed", "crawl.cancelled",
    "search.created", "search.started", "search.completed",
    "search.failed", "search.cancelled",
    "task.executed", "task.failed", "task.paused", "task.resumed",
    "webhook.test",
)


def is_private_ip(url: str) -> bool:
    """Webhook.ts:10-46 — True for localhost, RFC1918/link-local IPv4,
    private IPv6; unparseable URLs are treated as unsafe."""
    try:
        hostname = urlsplit(url).hostname
        if not hostname:
            return True
    except ValueError:
        return True
    if hostname in ("localhost", "127.0.0.1", "::1"):
        return True
    for rng in _PRIVATE_V4:
        if rng.match(hostname):
            return True
    if ":" in hostname:
        if (hostname.startswith("fe80:") or hostname.startswith("fc")
                or hostname.startswith("fd")):
            return True
    return False


def serialize_payload(payload) -> str:
    """Canonical wire serialization: compact separators + unescaped
    non-ASCII, byte-identical to ``JSON.stringify`` for the payload shapes
    the reference emits. The SAME string is signed and transmitted —
    signing one serialization and sending another would make every
    receiver-side signature check fail."""
    return json.dumps(payload, separators=(",", ":"), ensure_ascii=False)


def sign_payload(payload, secret: str) -> str:
    """Webhook.ts:371-375 — ``sha256=`` + HMAC-SHA256 hex over the wire
    serialization (see ``serialize_payload``)."""
    body = serialize_payload(payload)
    digest = hmac.new(secret.encode(), body.encode(), hashlib.sha256)
    return f"sha256={digest.hexdigest()}"


@dataclass
class WebhookSubscription:
    webhook_url: str
    secret: str = ""
    event_types: tuple = ()
    uuid: str = field(default_factory=lambda: str(_uuid.uuid4()))
    user_id: str | None = None
    scope: str = "all"  # "all" | "specific"
    specific_task_ids: tuple = ()
    is_active: bool = True
    max_retries: int = 3
    retry_backoff_multiplier: float = 2.0
    timeout_seconds: float = 10.0
    auto_disable_after_failures: int = 10
    custom_headers: dict = field(default_factory=dict)
    # stats
    consecutive_failures: int = 0
    total_deliveries: int = 0
    successful_deliveries: int = 0
    failed_deliveries: int = 0
    last_success_at: float | None = None
    last_failure_at: float | None = None


@dataclass
class WebhookDelivery:
    uuid: str
    subscription_uuid: str
    event_type: str
    event_source: str
    event_source_id: str
    request_url: str
    request_method: str = "POST"
    request_headers: dict = field(default_factory=dict)
    request_body: object = None
    status: str = "pending"  # pending|delivered|retrying|failed
    attempt_number: int = 1
    max_attempts: int = 3
    error_message: str | None = None
    error_code: str | None = None
    response_status: int | None = None
    response_body: str | None = None
    next_retry_at: float | None = None
    delivered_at: float | None = None
    created_at: float | None = None


class WebhookManager:
    """Delivery queue + retry scheduler (see module docstring)."""

    def __init__(self, transport, clock=None, allow_local: bool = False) -> None:
        import time

        self.transport = transport
        self.clock = clock or time.time
        self.allow_local = allow_local
        self.subscriptions: dict[str, WebhookSubscription] = {}
        self.deliveries: dict[str, WebhookDelivery] = {}
        self._queue: deque[str] = deque()

    # -- subscription management ------------------------------------------
    def subscribe(self, sub: WebhookSubscription) -> str:
        self.subscriptions[sub.uuid] = sub
        return sub.uuid

    # -- event fan-out (Webhook.ts:84-167) --------------------------------
    def trigger_event(self, event_type: str, payload, event_source: str,
                      event_source_id: str, user_id: str | None = None
                      ) -> list[str]:
        created = []
        for sub in self.subscriptions.values():
            if not sub.is_active or event_type not in sub.event_types:
                continue
            if user_id and sub.user_id != user_id:
                continue
            if sub.scope != "all" and sub.specific_task_ids:
                if event_source_id not in sub.specific_task_ids:
                    continue
            delivery = WebhookDelivery(
                uuid=str(_uuid.uuid4()),
                subscription_uuid=sub.uuid,
                event_type=event_type,
                event_source=event_source,
                event_source_id=event_source_id,
                request_url=sub.webhook_url,
                request_headers=dict(sub.custom_headers),
                request_body=payload,
                max_attempts=sub.max_retries,
                created_at=self.clock(),
            )
            self.deliveries[delivery.uuid] = delivery
            self._queue.append(delivery.uuid)
            created.append(delivery.uuid)
        return created

    # -- delivery (Webhook.ts:169-284) ------------------------------------
    def deliver(self, delivery_id: str) -> None:
        delivery = self.deliveries.get(delivery_id)
        if delivery is None:
            return
        sub = self.subscriptions.get(delivery.subscription_uuid)
        if sub is None or not sub.is_active:
            return  # inactive subscription: skip silently
        if not self.allow_local and is_private_ip(delivery.request_url):
            delivery.status = "failed"
            delivery.error_message = ("Webhook delivery blocked: Private IP "
                                      "addresses are not allowed")
            delivery.error_code = "PRIVATE_IP_BLOCKED"
            return
        now = self.clock()
        headers = {
            "Content-Type": "application/json",
            "X-AnyCrawl-Signature": sign_payload(delivery.request_body,
                                                 sub.secret),
            "X-Webhook-Event": delivery.event_type,
            "X-Webhook-Delivery-Id": delivery.uuid,
            "X-Webhook-Timestamp": str(now),
        }
        headers.update(delivery.request_headers or {})
        headers.update(sub.custom_headers or {})
        try:
            # transport receives the SERIALIZED body — the exact bytes the
            # signature covers
            status, _resp_headers, resp_body = self.transport(
                delivery.request_method, delivery.request_url, headers,
                serialize_payload(delivery.request_body),
                sub.timeout_seconds)
            if not 200 <= status < 300:
                raise RuntimeError(f"HTTP {status}")
        except Exception as e:  # noqa: BLE001 — any transport error retries
            self._handle_failure(delivery, sub, str(e))
            return
        delivery.status = "delivered"
        delivery.response_status = status
        delivery.response_body = (json.dumps(resp_body)[:1000]
                                  if resp_body is not None else None)
        delivery.delivered_at = now
        sub.last_success_at = now
        sub.consecutive_failures = 0
        sub.total_deliveries += 1
        sub.successful_deliveries += 1

    def _handle_failure(self, delivery: WebhookDelivery,
                        sub: WebhookSubscription, message: str) -> None:
        if delivery.attempt_number < delivery.max_attempts:
            backoff_s = (sub.retry_backoff_multiplier
                         ** delivery.attempt_number) * 60.0
            delivery.status = "retrying"
            delivery.attempt_number += 1
            delivery.error_message = message
            delivery.next_retry_at = self.clock() + backoff_s
            return
        delivery.status = "failed"
        delivery.error_message = message
        sub.last_failure_at = self.clock()
        sub.consecutive_failures += 1
        sub.total_deliveries += 1
        sub.failed_deliveries += 1
        if sub.consecutive_failures >= sub.auto_disable_after_failures:
            sub.is_active = False

    # -- queue pumps ------------------------------------------------------
    def process_queue(self) -> int:
        """Drain the pending queue once; returns deliveries attempted."""
        n = 0
        while self._queue:
            self.deliver(self._queue.popleft())
            n += 1
        return n

    def process_retries(self) -> int:
        """Webhook.ts:377-414 retry processor tick: re-enqueue due
        retries (status back to pending) and drain."""
        now = self.clock()
        due = [d for d in self.deliveries.values()
               if d.status == "retrying" and d.next_retry_at is not None
               and d.next_retry_at <= now]
        for d in due:
            d.status = "pending"
            self._queue.append(d.uuid)
        if due:
            self.process_queue()
        return len(due)
