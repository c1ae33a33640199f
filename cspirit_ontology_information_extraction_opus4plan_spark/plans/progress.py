"""Progress callbacks + cancellation for long-running jobs — the
Spark-native counterpart of the reference's ProgressReporter
(parsers/__init__.py:243-293 add/remove/clear_callbacks,
report_progress, cancel/is_cancelled; cancellation checks :787-903).

The reference threads a reporter object through a single-process parse
loop. On Spark the engine already tracks task completion centrally, so
the reporter POLLS `sparkContext.statusTracker()` from a daemon thread
while the driver blocks in the action, and cancellation maps onto
Spark job groups (`cancelJobGroup` aborts every stage the action
scheduled). Callbacks run on the poller thread on the DRIVER — they
see aggregate progress, never per-row hooks (per-row callbacks are the
single-process idiom this engine deliberately drops).

Per-partition durable metrics (the lineage trail) live in
checkpointing.py; this module is the live-UX leg of SURVEY §2.10's
progress row.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ProgressInfo:
    """Aggregate snapshot across the action's active+completed stages
    (ProgressInfo analog, parsers/__init__.py:150-types)."""
    active_stages: int
    total_tasks: int
    completed_tasks: int

    @property
    def fraction(self) -> float:
        return (self.completed_tasks / self.total_tasks
                if self.total_tasks else 0.0)


class OperationCancelled(RuntimeError):
    pass


class ProgressReporter:
    """add/remove/clear callbacks + cancel flag, reference-shaped; a
    failing callback is swallowed like the reference's (report_progress
    :260-270 logs and continues) so one bad observer cannot kill the
    job."""

    def __init__(self) -> None:
        self._callbacks: list[Callable[[ProgressInfo], None]] = []
        self._lock = threading.Lock()
        self._cancelled = False
        self.current: ProgressInfo | None = None

    def add_callback(self, cb: Callable[[ProgressInfo], None]) -> None:
        with self._lock:
            self._callbacks.append(cb)

    def remove_callback(self, cb: Callable[[ProgressInfo], None]) -> None:
        with self._lock:
            if cb in self._callbacks:
                self._callbacks.remove(cb)

    def clear_callbacks(self) -> None:
        with self._lock:
            self._callbacks.clear()

    def cancel(self) -> None:
        with self._lock:
            self._cancelled = True

    def is_cancelled(self) -> bool:
        with self._lock:
            return self._cancelled

    def _report(self, info: ProgressInfo) -> None:
        with self._lock:
            self.current = info
            cbs = list(self._callbacks)
        for cb in cbs:
            try:
                cb(info)
            except Exception:
                pass  # observer errors never stop the job (ref :265)


def run_with_progress(spark: SparkSession, action: Callable[[], object],
                      reporter: ProgressReporter,
                      poll_interval_s: float = 0.2) -> object:
    """Run a blocking driver action (e.g. `lambda: df.count()`) inside
    a dedicated job group, polling the status tracker and feeding the
    reporter until the action returns. `reporter.cancel()` — from a
    callback or another thread — cancels the whole job group and raises
    OperationCancelled."""
    if reporter.is_cancelled():
        raise OperationCancelled("reporter already cancelled")
    sc = spark.sparkContext
    group = f"progress-{uuid.uuid4().hex[:12]}"
    tracker = sc.statusTracker()
    done = threading.Event()

    def poll() -> None:
        while not done.wait(poll_interval_s):
            if reporter.is_cancelled():
                # keep re-issuing until the action returns: a cancel
                # landing between two jobs of a multi-job action (or
                # before the first job is submitted) would otherwise
                # leave later jobs in the group to launch uncancelled
                sc.cancelJobGroup(group)
                continue
            total = completed = active = 0
            for jid in tracker.getJobIdsForGroup(group):
                jinfo = tracker.getJobInfo(jid)
                if jinfo is None:
                    continue
                for sid in jinfo.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is None:
                        continue
                    active += 1 if sinfo.numActiveTasks else 0
                    total += sinfo.numTasks
                    completed += sinfo.numCompletedTasks
            reporter._report(ProgressInfo(active, total, completed))

    poller = threading.Thread(target=poll, daemon=True)
    sc.setJobGroup(group, "run_with_progress", interruptOnCancel=True)
    poller.start()
    try:
        result = action()
    except Exception as exc:
        if reporter.is_cancelled():
            raise OperationCancelled("job group cancelled") from exc
        raise
    finally:
        done.set()
        poller.join(timeout=5)
        sc.setJobGroup(None, None)
    if reporter.is_cancelled():
        raise OperationCancelled("cancelled after completion")
    return result
