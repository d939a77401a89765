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
    # purge ONLY namespace-package artifacts (__file__ is None, e.g. jar
    # entries on sys.path): real already-imported google.* packages must
    # survive the purge (ADVICE r4)
    for name in [
        n for n in list(sys.modules) if n == "google" or n.startswith("google.")
    ]:
        if getattr(sys.modules[name], "__file__", None) is None:
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


def _chain_next_sitecustomize():
    """Python imports only the FIRST sitecustomize on sys.path; since this
    dir is PREPENDED to PYTHONPATH, a pre-existing sitecustomize (coverage
    hooks, distro site setup) would be silently shadowed. Find and execute
    the next one on the remaining path entries (ADVICE r4)."""
    import importlib.util
    from importlib.machinery import PathFinder

    here = os.path.dirname(os.path.abspath(__file__))
    rest = []
    for entry in sys.path:
        try:
            if os.path.abspath(entry or ".") == here:
                continue
        except Exception:
            continue
        rest.append(entry)
    spec = PathFinder.find_spec("sitecustomize", rest)
    if spec is None or spec.loader is None:
        return
    mod = importlib.util.module_from_spec(spec)
    # do NOT overwrite sys.modules['sitecustomize'] (that is this module,
    # mid-execution); register the chained one under a distinct key
    sys.modules["_pbshim_chained_sitecustomize"] = mod
    spec.loader.exec_module(mod)


try:
    _enable()
except Exception:
    pass
try:
    _chain_next_sitecustomize()
except Exception:
    pass
