"""Pure-Python protobuf fallback for the State API v2 workers.

`transformWithStateInPandas` (Spark 4 State API v2) spawns Python worker
processes (a driver-side init worker plus the executor-side state-server
clients) that import ``google.protobuf`` for the StateMessage protocol.
This container has no protobuf install, but the Google Cloud SDK on the
image bundles the pure-Python protobuf runtime (4.23) under
``third_party/cloudsdk``. This module makes that runtime importable:

- :func:`enable` wires the CURRENT process: appends the cloudsdk paths to
  ``sys.path`` (at the END, so a real install always wins) and installs a
  no-op ``google.protobuf.runtime_version`` shim — the only 5.x-runtime
  API pyspark's generated ``StateMessage_pb2`` touches that 4.23 lacks;
  the validation it replaces is a version-skew guard, and the descriptor
  APIs the gencode actually uses all exist in 4.23 (verified by executing
  the full EWMA query end-to-end: value-state reads/writes round-trip the
  protocol correctly).
- :func:`enable_for_workers` additionally prepends a ``sitecustomize``
  shim directory to ``PYTHONPATH`` so python processes spawned LATER (the
  JVM's state workers) self-enable at interpreter startup. Must run
  BEFORE SparkSession creation — the JVM inherits the environment once.

On a deployment with protobuf installed both calls are no-ops returning
True. With neither an install nor the cloudsdk bundle they return False
and the State API v2 operators keep their documented environment seam
(the applyInPandasWithState twins remain the executable path).
"""

from __future__ import annotations

import os
import sys
import types

_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"
_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _bundled_present() -> bool:
    return os.path.isdir(os.path.join(_THIRD_PARTY, "cloudsdk", "google", "protobuf"))


def _real_module(mod) -> bool:
    """A usable protobuf is a REGULAR package. Spark jars on sys.path make
    ``import google.protobuf`` succeed as an empty NAMESPACE package (the
    shaded Java google/protobuf/*.class tree becomes zipimport namespace
    portions, ``__file__ is None``) — that ghost must count as absent."""
    return mod is not None and getattr(mod, "__file__", None) is not None


def _purge_namespace_ghosts() -> None:
    """Drop ONLY namespace-package artifacts (jar portions, ``__file__ is
    None``) from the google.* entries in sys.modules: real already-imported
    google.* packages (google.auth, google.api) must survive — deleting
    them would orphan live module objects in a long-lived process
    (ADVICE r4). ``_pbshim/sitecustomize.py`` carries a self-contained
    twin of this loop — keep them in lockstep."""
    for name in [
        n for n in list(sys.modules) if n == "google" or n.startswith("google.")
    ]:
        if getattr(sys.modules[name], "__file__", None) is None:
            del sys.modules[name]


def enable() -> bool:
    """Make ``google.protobuf`` importable in this process (real install
    preferred, cloudsdk bundle + runtime_version shim otherwise). Returns
    True when protobuf is usable. Idempotent."""
    try:
        import google.protobuf as _probe
    except ImportError:
        _probe = None
    if not _real_module(_probe):
        if not _bundled_present():
            return False
        _purge_namespace_ghosts()
        for p in (_THIRD_PARTY, os.path.join(_THIRD_PARTY, "cloudsdk")):
            if p not in sys.path:
                sys.path.append(p)  # append: a real install must win
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False
        if not _real_module(sys.modules.get("google.protobuf")):
            return False
    import google.protobuf as pb

    if not hasattr(pb, "runtime_version"):
        rv = types.ModuleType("google.protobuf.runtime_version")

        class Domain:  # mirror of protobuf 5.x runtime_version.Domain
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        rv.Domain = Domain
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["google.protobuf.runtime_version"] = rv
        pb.runtime_version = rv
    return True


def enable_for_workers() -> bool:
    """Arrange for python processes spawned after this call (the State API
    v2 workers) to self-enable via a ``sitecustomize`` shim on PYTHONPATH,
    and enable the current process too. Call BEFORE SparkSession creation.
    Returns True when protobuf will be usable in workers."""
    try:
        import google.protobuf as _probe
    except ImportError:
        _probe = None
    if _real_module(_probe):
        return True  # real install: workers inherit it via site-packages
    if not _bundled_present():
        return False
    cur = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in cur.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + cur if cur else "")
        )
    return enable()
