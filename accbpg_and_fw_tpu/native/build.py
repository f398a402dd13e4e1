"""Lazy ctypes build-and-load for the native components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict = {}


def load_native_library(name: str):
    """Compile (if needed) and dlopen native/<name>.cpp -> <name>.so.

    Returns the ctypes.CDLL, or None when no toolchain is available or the
    build fails (callers fall back to pure-Python implementations).
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"{name}.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                tmp = so + ".tmp"
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-o", tmp, src],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.SubprocessError):
            lib = None
        _CACHE[name] = lib
        return lib
