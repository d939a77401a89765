"""Interpreter-startup twin of ``protobuf_compat.enable`` for SPAWNED
python workers (State API v2 state-server clients + driver init worker):
this directory is prepended to PYTHONPATH by
``protobuf_compat.enable_for_workers``, so ``site`` imports this module in
every child interpreter before any pyspark code runs. Self-contained on
purpose — the worker's sys.path need not include the engine package.

TRAP this guards against: Spark puts jars on the worker's sys.path
(spark-core*.jar), and the shaded Java ``google/protobuf/*.class`` tree
inside makes ``import google.protobuf`` "succeed" as an EMPTY Python
namespace package (``__file__ is None``, zipimporter treats the jar dirs
as namespace portions). A naive import-probe therefore reports protobuf
present while ``from google.protobuf import descriptor`` dies with
"unknown location". Only a module WITH ``__file__`` counts; namespace
artifacts are purged from sys.modules before the fallback import so the
regular package from the cloudsdk bundle can win.

All-guarded: on a container without the cloudsdk bundle this is a no-op,
and a real protobuf install always wins (paths are APPENDED)."""

import os
import sys
import types

_TP = "/usr/lib/google-cloud-sdk/lib/third_party"


def _enable():
    try:
        import google.protobuf as _pb
    except ImportError:
        _pb = None
    if _pb is not None and getattr(_pb, "__file__", None) is not None:
        return  # real install present
    if not os.path.isdir(os.path.join(_TP, "cloudsdk", "google", "protobuf")):
        return
    # purge namespace-package artifacts (e.g. from jar entries on sys.path)
    for name in [
        n for n in list(sys.modules) if n == "google" or n.startswith("google.")
    ]:
        del sys.modules[name]
    for p in (_TP, os.path.join(_TP, "cloudsdk")):
        if p not in sys.path:
            sys.path.append(p)
    try:
        import google.protobuf as _pb
    except ImportError:
        return
    if getattr(_pb, "__file__", None) is None:
        return  # still only the namespace ghost: leave untouched
    if not hasattr(_pb, "runtime_version"):
        rv = types.ModuleType("google.protobuf.runtime_version")

        class Domain:
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        rv.Domain = Domain
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["google.protobuf.runtime_version"] = rv
        _pb.runtime_version = rv


try:
    _enable()
except Exception:
    pass
