"""Process-scoped scratch directories for sink/feed operators.

mkdtemp-per-invocation leaks one directory copy per verify/bench run;
``scratch_dir`` keeps AT MOST ONE copy per tag per process: all tags
live under a single process-scoped root (removed at interpreter exit),
and re-requesting a tag rmtree-resets it, so the caller always starts
from an empty directory — the same contract as a fresh mkdtemp,
without the accumulation. Safe for streaming checkpoint/feed dirs too:
a wiped dir can never replay a stale checkpoint.

Lives in its own dependency-free module so both ``plans.*`` and
``streaming.runner`` can import it without a cycle.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

_SCRATCH_ROOT: str | None = None


def scratch_dir(tag: str) -> str:
    """Return a stable scratch directory for ``tag``, wiped clean."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="difc_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    d = os.path.join(_SCRATCH_ROOT, re.sub(r"[^0-9A-Za-z_.-]+", "_", tag))
    if os.path.exists(d):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
