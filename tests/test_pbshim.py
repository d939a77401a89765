"""protobuf_compat / _pbshim hardening (ADVICE r4): the namespace-ghost
purge must not evict real google.* modules, and the PYTHONPATH-prepended
sitecustomize must chain-load a shadowed sitecustomize instead of silently
replacing it."""

from __future__ import annotations

import os
import subprocess
import sys
import types

from reddit_twitter_big_data_pipeline_spark import protobuf_compat

_SHIM = os.path.join(
    os.path.dirname(os.path.abspath(protobuf_compat.__file__)), "_pbshim"
)


def test_purge_keeps_real_modules_drops_ghosts():
    ghost = types.ModuleType("google.__test_ghost__")  # no __file__
    real = types.ModuleType("google.__test_real__")
    real.__file__ = "/somewhere/real.py"
    sys.modules["google.__test_ghost__"] = ghost
    sys.modules["google.__test_real__"] = real
    try:
        protobuf_compat._purge_namespace_ghosts()
        assert "google.__test_ghost__" not in sys.modules
        assert sys.modules.get("google.__test_real__") is real
    finally:
        sys.modules.pop("google.__test_ghost__", None)
        sys.modules.pop("google.__test_real__", None)


def test_sitecustomize_chains_shadowed_sitecustomize(tmp_path):
    (tmp_path / "sitecustomize.py").write_text(
        "import sys\nsys._chained_marker = True\n"
    )
    env = dict(
        os.environ, PYTHONPATH=_SHIM + os.pathsep + str(tmp_path)
    )
    r = subprocess.run(
        [sys.executable, "-c", "import sys; print(getattr(sys, '_chained_marker', False))"],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "True"


def test_sitecustomize_solo_is_noop(tmp_path):
    env = dict(os.environ, PYTHONPATH=_SHIM)
    r = subprocess.run(
        [sys.executable, "-c", "print('ok')"],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0 and r.stdout.strip() == "ok"
