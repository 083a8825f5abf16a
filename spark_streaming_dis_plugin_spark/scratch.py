"""Process-lifetime scratch directories for harness artifacts.

The oracle-gated physical-source queries materialize real on-disk state
(DIS segment logs, checkpoints, parquet IVF indexes, sink output) under
``tempfile.mkdtemp``. Those roots are intentionally cached for the life of
the process (the bench loop re-reads them), but they must not leak past it:
every root allocated here is registered for ``atexit`` removal, so repeated
in-process runs and CI sweeps don't accumulate orphan temp dirs
(ADVICE r4). Cleanup is best-effort — a root already removed by the OS
tmp-cleaner is not an error.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOTS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp with atexit cleanup registration."""
    root = tempfile.mkdtemp(prefix=prefix)
    _ROOTS.append(root)
    return root


def _cleanup() -> None:
    while _ROOTS:
        shutil.rmtree(_ROOTS.pop(), ignore_errors=True)


atexit.register(_cleanup)
