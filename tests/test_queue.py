"""ExecProgressQueue behavior: results order, progress reporting,
and mid-job exception draining (reference __init__.py:5394-5402)."""

import time

import pytest

from audiotools_tpu.parallel.queue import ExecProgressQueue
from audiotools_tpu.utils.messenger import Messenger, ProgressDisplay


def _display():
    class Opts:
        verbose = "quiet"
    return ProgressDisplay(Messenger("test", Opts()))


def _job(value, progress=None):
    if progress is not None:
        for i in range(4):
            progress(i, 4)
    return value * 2


def _failing_job(value, progress=None):
    if value == 2:
        raise ValueError("job %d exploded" % (value,))
    time.sleep(0.05)
    return value


def test_queue_serial_results_in_order():
    queue = ExecProgressQueue(_display())
    for i in range(5):
        queue.execute(_job, progress_text="job %d" % (i,), value=i)
    assert queue.run(1) == [0, 2, 4, 6, 8]


def test_queue_parallel_results_in_order():
    queue = ExecProgressQueue(_display())
    for i in range(6):
        queue.execute(_job, progress_text="job %d" % (i,), value=i)
    assert queue.run(3) == [0, 2, 4, 6, 8, 10]


def test_queue_serial_exception_propagates():
    queue = ExecProgressQueue(_display())
    for i in range(4):
        queue.execute(_failing_job, value=i)
    with pytest.raises(ValueError, match="job 2 exploded"):
        queue.run(1)


def test_queue_parallel_exception_drains_and_raises():
    """a failing child must drain remaining jobs and re-raise"""
    queue = ExecProgressQueue(_display())
    for i in range(6):
        queue.execute(_failing_job, value=i)
    with pytest.raises(ValueError, match="job 2 exploded"):
        queue.run(3)


def test_queue_progress_rows_update():
    """progress callbacks reach the shared-memory rows"""
    calls = []

    class Row:
        def update(self, current, total):
            calls.append((current, total))

        def finish(self):
            calls.append("finish")

    class Display:
        def add_row(self, text):
            return Row()

        def display_rows(self):
            pass

        def clear_rows(self):
            pass

    queue = ExecProgressQueue(Display())
    queue.execute(_job, progress_text="p", value=3)
    assert queue.run(2) == [6] or queue.run(1) == [6]
    assert "finish" in calls
