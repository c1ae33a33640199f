"""Progress callbacks + cancellation (reference ProgressReporter,
parsers/__init__.py:243-293) via status-tracker polling + job groups."""

from __future__ import annotations

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark.plans.progress import (
    OperationCancelled,
    ProgressInfo,
    ProgressReporter,
    run_with_progress,
)


def test_callbacks_observe_progress(spark, sf_dir):
    seen: list[ProgressInfo] = []
    rep = ProgressReporter()
    rep.add_callback(seen.append)
    df = api.q_triples_dedup(spark, sf_dir)
    n = run_with_progress(spark, lambda: df.count(), rep,
                          poll_interval_s=0.05)
    assert n > 0
    assert seen, "no progress callbacks fired during a multi-second job"
    # completed-task counts are nondecreasing across snapshots
    comp = [p.completed_tasks for p in seen]
    assert comp == sorted(comp)
    assert rep.current is not None and 0 <= rep.current.fraction <= 1


def test_failing_callback_does_not_kill_job(spark, sf_dir):
    rep = ProgressReporter()
    rep.add_callback(lambda p: (_ for _ in ()).throw(ValueError("boom")))
    df = api.q_ner_mentions(spark, sf_dir)
    assert run_with_progress(spark, lambda: df.count(), rep,
                             poll_interval_s=0.05) > 0


def test_precancelled_reporter_refuses_to_run(spark, sf_dir):
    rep = ProgressReporter()
    rep.cancel()
    with pytest.raises(OperationCancelled):
        run_with_progress(spark, lambda: 1, rep)


def test_cancel_from_callback_aborts_job(spark, sf_dir):
    rep = ProgressReporter()
    rep.add_callback(lambda p: rep.cancel())
    df = api.q_triples_dedup(spark, sf_dir)
    with pytest.raises(OperationCancelled):
        run_with_progress(spark, lambda: df.count(), rep,
                          poll_interval_s=0.05)


def test_callback_registry_add_remove_clear(spark):
    rep = ProgressReporter()
    a, b = [], []
    ca, cb = a.append, b.append
    rep.add_callback(ca)
    rep.add_callback(cb)
    rep.remove_callback(ca)
    rep._report(ProgressInfo(0, 2, 1))
    assert not a and len(b) == 1 and b[0].fraction == 0.5
    rep.clear_callbacks()
    rep._report(ProgressInfo(0, 2, 2))
    assert len(b) == 1


def test_cancel_before_first_job_still_kills_action(spark, sf_dir):
    """A cancel that lands BEFORE the action submits its (first) job
    must still kill that job: the poller re-issues cancelJobGroup every
    tick until the action returns, instead of firing once into an empty
    group and letting the real work run to completion (round-2 advice).
    """
    import time

    rep = ProgressReporter()
    rep.add_callback(lambda p: rep.cancel())  # fires on the first tick
    df = api.q_triples_dedup(spark, sf_dir)
    completed = []

    def action():
        time.sleep(0.5)          # cancel arrives while no job exists
        n = df.count()
        completed.append(n)      # reached only if the job survived
        return n

    with pytest.raises(OperationCancelled):
        run_with_progress(spark, action, rep, poll_interval_s=0.05)
    assert not completed, "job ran to completion despite early cancel"
