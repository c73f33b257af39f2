"""Build/load the native fastcolumn extension.

Compiles fastcolumn.c with the system compiler on first use (no pip, no
pybind11 — plain CPython C API).  Falls back gracefully: loader returns
None when no toolchain is available and callers use the pure-Python path.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(__file__)
_mod = None
_tried = False


def load():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so_path = os.path.join(_DIR, "fastcolumn" + suffix)
    src = os.path.join(_DIR, "fastcolumn.c")
    if not os.path.exists(so_path) or os.path.getmtime(src) > os.path.getmtime(
        so_path
    ):
        include = sysconfig.get_paths()["include"]
        cc = os.environ.get("CC", "cc")
        cmd = [
            cc, "-O2", "-shared", "-fPIC",
            f"-I{include}", src, "-o", so_path,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        spec = importlib.util.spec_from_file_location("fastcolumn", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:
        _mod = None
    return _mod
