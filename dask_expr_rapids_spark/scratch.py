"""Per-process scratch space for query-internal sinks.

Roundtrip queries (csv/parquet/json/orc), streaming drains, and
availableNow checkpoints need a writable directory whose lifetime covers
the whole process: the queries return LAZY DataFrames over the written
path, so the directory cannot be removed inline — but a fresh
``tempfile.mkdtemp`` per invocation leaked one orphaned /tmp dir per
bench run (round-5 advice).  All such sites now allocate under a single
per-process root that is removed once, at interpreter exit — after every
lazy result has been materialized.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: dict[str | None, str] = {}


def scratch_dir(prefix: str, base: str | None = None) -> str:
    """A fresh directory under the per-process scratch root (one root per
    ``base``; ``base=None`` = the system tempdir, pass ``"/dev/shm"`` for
    tmpfs-backed checkpoint scratch).  Removed recursively at exit."""
    root = _ROOTS.get(base)
    if root is None:
        root = tempfile.mkdtemp(prefix="spark_graft_scratch_", dir=base)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _ROOTS[base] = root
    return tempfile.mkdtemp(prefix=prefix, dir=root)
