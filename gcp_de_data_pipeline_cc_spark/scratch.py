"""Per-process scratch directories for queries that must land files.

Three hazards this balances (r2 advisor finding + r3 follow-up):

- ``mkdtemp`` per invocation leaks a fresh copy of the staged tables on
  every bench/test run — repeated sessions accumulate junk under /tmp;
- ONE fixed path per query (the earlier lifecycle fix) is safe within a
  process but collides when two processes run the same query
  concurrently (bench + pytest on the same box) — for streaming
  checkpoints a mid-run wipe by the other process kills the query;
- cleanup inside the query function is impossible: plans return LAZY
  DataFrames over the written path, so the only safe delete points are
  the next invocation (same process) and interpreter exit.

So: scratch lives under ``/tmp/spark_graft_work/pid-<pid>/<name>`` —
per-process (no cross-process collisions), wiped per invocation (no
within-process accumulation), and the whole pid dir is removed by an
``atexit`` hook (clean processes leave nothing; a crashed process
leaves at most one copy per query, reused by the next same-pid run).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_BASE = os.path.join(
    tempfile.gettempdir(), "spark_graft_work", f"pid-{os.getpid()}"
)
_registered = False


def scratch_dir(name: str) -> str:
    """Fresh per-(process, query) scratch dir; see module docstring."""
    global _registered
    if not _registered:
        atexit.register(shutil.rmtree, _BASE, ignore_errors=True)
        _registered = True
    path = os.path.join(_BASE, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def scratch_path(name: str) -> str:
    """The same per-(process, query) path WITHOUT the wipe — for
    pipeline stages that must read tiers an upstream stage of the SAME
    run just wrote (the wipe belongs at run start, via scratch_dir)."""
    return os.path.join(_BASE, name)
