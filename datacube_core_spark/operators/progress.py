"""Load progress callbacks + cooperative cancellation.

Reference surface: ``progress_cbk`` — called with (units_done, total)
during a load — and ``TerminateCurrentLoad``, an exception user code
raises from the callback to abort the load
(``datacube/api/core.py:28-34`` and ``:396-399``).

Spark restatement: a load is a Spark action; task completion IS the
progress unit.  ``run_with_progress`` runs the action in a worker thread
tagged with a private job group, polls ``statusTracker`` for
(completed_tasks, total_tasks) across the group's stages, invokes the
callback on change, and translates a ``TerminateCurrentLoad`` raised by
the callback into ``cancelJobGroup`` — the Spark-native equivalent of the
reference's cooperative cancel between file reads.
"""

from __future__ import annotations

import threading
import time
import uuid
from typing import Callable, Optional, TypeVar

T = TypeVar("T")


class TerminateCurrentLoad(Exception):  # noqa: N818 — reference name parity
    """Raise from ``progress_cbk`` to terminate the running load
    (reference ``api/core.py:28-33``)."""


def run_with_progress(
    spark,
    action: Callable[[], T],
    progress_cbk: Optional[Callable[[int, int], None]] = None,
    poll_interval: float = 0.2,
) -> T:
    """Execute ``action`` (any function ending in a Spark action) with
    per-task progress callbacks and cooperative cancellation.

    ``progress_cbk(done, total)`` is invoked whenever the completed-task
    count advances (and once at the end with done == total).  Raising
    :class:`TerminateCurrentLoad` inside the callback cancels the job
    group and re-raises the exception to the caller.
    """
    if progress_cbk is None:
        return action()

    sc = spark.sparkContext
    group = f"dcs-load-{uuid.uuid4().hex[:8]}"
    result: dict = {}
    done_evt = threading.Event()

    def worker():
        sc.setJobGroup(group, "run_with_progress", interruptOnCancel=True)
        try:
            result["value"] = action()
        except BaseException as e:  # noqa: BLE001 — propagated below
            result["error"] = e
        finally:
            sc.setJobGroup("", "")
            done_evt.set()

    th = threading.Thread(target=worker, daemon=True)
    th.start()

    tracker = sc.statusTracker()
    last = -1
    cancelled = False
    try:
        while not done_evt.wait(timeout=poll_interval):
            done, total = _group_progress(tracker, group)
            if total > 0 and done != last:
                last = done
                progress_cbk(done, total)
        if not cancelled:
            done, total = _group_progress(tracker, group)
            if total > 0:
                progress_cbk(total, total)
    except TerminateCurrentLoad:
        cancelled = True
        sc.cancelJobGroup(group)
        done_evt.wait(timeout=60)
        raise
    finally:
        th.join(timeout=60)

    if "error" in result:
        raise result["error"]
    return result["value"]


def _group_progress(tracker, group: str):
    done = total = 0
    for job_id in tracker.getJobIdsForGroup(group):
        job = tracker.getJobInfo(job_id)
        if job is None:
            continue
        for stage_id in job.stageIds:
            st = tracker.getStageInfo(stage_id)
            if st is None:
                continue
            total += st.numTasks
            done += st.numCompletedTasks
    return done, total
