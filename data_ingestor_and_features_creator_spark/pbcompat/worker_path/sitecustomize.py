"""Worker-side protobuf shim (auto-imported by site.py).

This directory is put on PYTHONPATH by ``pbcompat.ensure_protobuf()``
so every Python worker the JVM forks re-applies the same two steps the
driver applied — SDK runtime on sys.path, version gate relaxed —
BEFORE it can import ``StateMessage_pb2``. A real pip-installed
``google.protobuf`` wins (its ``descriptor`` probe succeeds first and
the gate stays strict). See ``pbcompat/__init__.py`` for the full
rationale.

Gotcha that shaped this file: Spark puts ``spark-core_*.jar`` on the
worker's sys.path, and the ``google/protobuf/*.proto`` RESOURCE dirs
inside that jar make ``import google.protobuf`` succeed as an EMPTY
namespace package. So the availability probe must be for a real
module (``descriptor``), and the stale namespace entries must be
dropped from sys.modules before the re-import or the namespace wins
over the SDK's regular package.
"""


def _shim() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return  # real runtime already importable
    except ImportError:
        pass
    import importlib
    import os
    import sys

    sdk = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(sdk, "google", "protobuf")):
        return
    if sdk not in sys.path:
        sys.path.append(sdk)
    for name in [m for m in sys.modules
                 if m == "google" or m.startswith("google.")]:
        del sys.modules[name]
    importlib.invalidate_caches()
    try:
        from google.protobuf import descriptor  # noqa: F401
        from google.protobuf import runtime_version as rv
    except ImportError:
        return
    if not getattr(rv.ValidateProtobufRuntimeVersion, "__wrapped__", None):
        real = rv.ValidateProtobufRuntimeVersion

        def lenient(*args, **kwargs):  # noqa: ANN002, ANN003
            try:
                real(*args, **kwargs)
            except rv.VersionError:
                pass

        lenient.__wrapped__ = real
        rv.ValidateProtobufRuntimeVersion = lenient


_shim()
del _shim
