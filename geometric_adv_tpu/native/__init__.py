"""Native (C++) runtime components.

Currently: the PLY batch loader (`_ply_native`), compiled on demand with the
system g++ against the running interpreter's headers and cached next to the
source. Everything here is optional — pure-python fallbacks exist for every
native path (``geometric_adv_tpu.data.ply``).
"""

from __future__ import annotations

import importlib.util
import os
import os.path as osp
import subprocess
import sysconfig
import threading

_HERE = osp.dirname(osp.abspath(__file__))
_LOCK = threading.Lock()
_MODULE = None
_FAILED = False


def _so_path() -> str:
    tag = sysconfig.get_config_var("SOABI") or "native"
    return osp.join(_HERE, f"_ply_native.{tag}.so")


def _compile() -> str:
    src = osp.join(_HERE, "ply_loader.cpp")
    out = _so_path()
    if osp.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", src, "-o", out, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def get_module():
    """Import (compiling if needed) the native extension; None on failure."""
    global _MODULE, _FAILED
    if _MODULE is not None or _FAILED:
        return _MODULE
    with _LOCK:
        if _MODULE is not None or _FAILED:
            return _MODULE
        try:
            so = _compile()
            spec = importlib.util.spec_from_file_location("_ply_native", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _MODULE = mod
        except Exception:
            _FAILED = True
    return _MODULE
