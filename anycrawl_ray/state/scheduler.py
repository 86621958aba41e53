"""Scheduled-task manager — the rebuild of the reference's scheduler
(packages/scrape/src/managers/Scheduler.ts:16-130, 163-330).

The reference delegates cron evaluation to BullMQ repeatable jobs and keeps
the *scheduling policy* in ``processScheduledTaskJob``; here the policy is
ported 1:1 and cron evaluation is a small standard 5-field evaluator, with
clock / job-trigger / credit-check injected so tests drive the schedule
deterministically:

- **active/paused gating** (:186-196): inactive or paused tasks never fire;
- **credit auto-pause** (:198-222): when credit checking is enabled and the
  task's ``min_credits_required`` cannot be met, the task is paused with an
  ``Auto-paused: Insufficient credits`` reason and unscheduled;
- **concurrency mode** (:224-241): ``skip`` drops a firing while an
  execution is pending/running; ``queue`` lets firings pile up;
- **daily cap** (:243-263): at most ``max_executions_per_day`` executions
  per calendar day (UTC);
- **execution records** (:265-299): uuid + monotonically numbered, with a
  ``{task_uuid}-{now_ms}`` idempotency key, status pending -> running ->
  completed/failed, and task stats (total executions, last execution at).
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    """One cron field -> allowed values. Supports ``*``, ``*/n``, ``a``,
    ``a-b``, ``a-b/n`` and comma lists."""
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            lo2, hi2 = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo2, hi2 = int(a), int(b)
        else:
            lo2 = hi2 = int(part)
        for v in range(lo2, hi2 + 1, step):
            if not lo <= v <= hi:
                raise ValueError(f"cron value {v} out of range [{lo},{hi}]")
            out.add(v)
    return frozenset(out)


class Cron:
    """Standard 5-field cron (minute hour day-of-month month day-of-week);
    dom/dow combine with OR when both are restricted, AND otherwise —
    classic Vixie-cron semantics."""

    def __init__(self, expr: str) -> None:
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron expression needs 5 fields: {expr!r}")
        self.minute = _parse_field(fields[0], 0, 59)
        self.hour = _parse_field(fields[1], 0, 23)
        self.dom = _parse_field(fields[2], 1, 31)
        self.month = _parse_field(fields[3], 1, 12)
        # 0 and 7 are both Sunday: parse with 7 allowed, then fold 7 -> 0
        # (a string replace would corrupt ranges/steps like "1-7" or "*/7")
        dow = _parse_field(fields[4], 0, 7)
        self.dow = frozenset(0 if v == 7 else v for v in dow)
        self._dom_star = fields[2] == "*"
        self._dow_star = fields[4] == "*"

    def matches(self, dt) -> bool:
        if dt.minute not in self.minute or dt.hour not in self.hour:
            return False
        if dt.month not in self.month:
            return False
        dom_ok = dt.day in self.dom
        dow_ok = ((dt.weekday() + 1) % 7) in self.dow  # python Mon=0 -> cron Sun=0
        if self._dom_star and self._dow_star:
            return True
        if self._dom_star:
            return dow_ok
        if self._dow_star:
            return dom_ok
        return dom_ok or dow_ok

    def next_after(self, dt):
        """First matching minute strictly after ``dt`` (UTC datetime)."""
        from datetime import timedelta

        probe = dt.replace(second=0, microsecond=0) + timedelta(minutes=1)
        for _ in range(366 * 24 * 60):  # bounded scan: > one year of minutes
            if self.matches(probe):
                return probe
            probe += timedelta(minutes=1)
        raise ValueError("no matching time within a year")


@dataclass
class ScheduledTask:
    name: str
    cron_expression: str
    task_type: str = "crawl"
    task_payload: dict = field(default_factory=dict)
    uuid: str = field(default_factory=lambda: str(_uuid.uuid4()))
    is_active: bool = True
    is_paused: bool = False
    pause_reason: str | None = None
    min_credits_required: int = 0
    concurrency_mode: str = "skip"  # "skip" | "queue"
    max_executions_per_day: int | None = None
    total_executions: int = 0
    consecutive_failures: int = 0
    last_execution_at: object = None


@dataclass
class TaskExecution:
    uuid: str
    scheduled_task_uuid: str
    execution_number: int
    idempotency_key: str
    status: str  # pending|running|completed|failed
    scheduled_for: object
    triggered_by: str = "scheduler"
    job_uuid: str | None = None
    started_at: object = None
    completed_at: object = None


class SchedulerManager:
    """Policy engine (see module docstring). ``trigger_job(task,
    execution) -> job_uuid`` launches the underlying scrape/crawl;
    ``clock() -> datetime`` (UTC) and ``check_credits(task) -> bool`` are
    injectable."""

    def __init__(self, trigger_job, clock=None, check_credits=None,
                 credits_enabled: bool = False) -> None:
        from datetime import datetime, timezone

        self.trigger_job = trigger_job
        self.clock = clock or (lambda: datetime.now(timezone.utc))
        self.check_credits = check_credits or (lambda task: True)
        self.credits_enabled = credits_enabled
        self.tasks: dict[str, ScheduledTask] = {}
        self.executions: dict[str, TaskExecution] = {}
        self._crons: dict[str, Cron] = {}
        self._next_fire: dict[str, object] = {}

    # -- registration (Scheduler.ts:100-160 add/remove) -------------------
    def add_task(self, task: ScheduledTask) -> str:
        self._crons[task.uuid] = Cron(task.cron_expression)
        self.tasks[task.uuid] = task
        self._next_fire[task.uuid] = self._crons[task.uuid].next_after(
            self.clock())
        return task.uuid

    def remove_task(self, task_uuid: str) -> None:
        self.tasks.pop(task_uuid, None)
        self._crons.pop(task_uuid, None)
        self._next_fire.pop(task_uuid, None)

    def pause_task(self, task_uuid: str, reason: str | None = None) -> None:
        task = self.tasks[task_uuid]
        task.is_paused = True
        task.pause_reason = reason

    def resume_task(self, task_uuid: str) -> None:
        task = self.tasks[task_uuid]
        task.is_paused = False
        task.pause_reason = None
        self._next_fire[task_uuid] = self._crons[task_uuid].next_after(
            self.clock())

    # -- firing ------------------------------------------------------------
    def tick(self) -> list[str]:
        """Fire every task whose cron time has arrived; returns created
        execution uuids (one per fired task that passed the gates)."""
        now = self.clock()
        fired: list[str] = []
        for uuid, task in list(self.tasks.items()):
            nxt = self._next_fire.get(uuid)
            if nxt is None or nxt > now:
                continue
            # advance past ALL due slots (a long gap fires once, like a
            # BullMQ repeatable that missed windows)
            cron = self._crons[uuid]
            while self._next_fire[uuid] <= now:
                self._next_fire[uuid] = cron.next_after(self._next_fire[uuid])
            exec_id = self._process(task, now)
            if exec_id:
                fired.append(exec_id)
        return fired

    def _process(self, task: ScheduledTask, now) -> str | None:
        """Scheduler.ts:166-299 processScheduledTaskJob."""
        if not task.is_active or task.is_paused:
            return None
        if self.credits_enabled and task.min_credits_required > 0:
            if not self.check_credits(task):
                task.is_paused = True
                task.pause_reason = ("Auto-paused: Insufficient credits "
                                     f"(required: {task.min_credits_required})")
                self._next_fire.pop(task.uuid, None)  # unscheduled
                return None
        if task.concurrency_mode == "skip":
            running = any(
                e.scheduled_task_uuid == task.uuid
                and e.status in ("pending", "running")
                for e in self.executions.values())
            if running:
                return None
        if task.max_executions_per_day and task.max_executions_per_day > 0:
            day_start = now.replace(hour=0, minute=0, second=0, microsecond=0)
            today = sum(
                1 for e in self.executions.values()
                if e.scheduled_task_uuid == task.uuid
                and e.scheduled_for >= day_start)
            if today >= task.max_executions_per_day:
                return None
        execution = TaskExecution(
            uuid=str(_uuid.uuid4()),
            scheduled_task_uuid=task.uuid,
            execution_number=task.total_executions + 1,
            idempotency_key=f"{task.uuid}-{int(now.timestamp() * 1000)}",
            status="pending",
            scheduled_for=now,
        )
        self.executions[execution.uuid] = execution
        try:
            job_uuid = self.trigger_job(task, execution)
        except Exception:
            # a bad task payload (accepted at create time — validation
            # only requires a dict) must not wedge the tick loop or leave
            # a forever-'pending' execution blocking concurrency_mode
            # 'skip'; the execution records the failure and the task
            # stays schedulable
            execution.status = "failed"
            execution.completed_at = now
            task.last_execution_at = now
            task.total_executions += 1
            task.consecutive_failures += 1
            return execution.uuid
        execution.job_uuid = job_uuid
        execution.status = "running"
        execution.started_at = now
        task.last_execution_at = now
        task.total_executions += 1
        return execution.uuid

    def complete_execution(self, execution_uuid: str,
                           status: str = "completed") -> None:
        execution = self.executions[execution_uuid]
        execution.status = status
        execution.completed_at = self.clock()
