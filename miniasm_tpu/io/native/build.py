"""On-demand builder for the native accelerator library.

Compiles every .cpp in this directory into one shared object with g++
(-O3, zlib).  The result is cached next to the sources; a failed build
disables the native path (callers fall back to Python)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libminiasm_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _sources():
    return sorted(
        os.path.join(_DIR, f) for f in os.listdir(_DIR) if f.endswith(".cpp"))


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    return any(os.path.getmtime(s) > so_mtime for s in _sources())


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        override = os.environ.get("MINIASM_TPU_NATIVE_SO")
        if override:
            # sanitizer/CI builds point at their own .so (scripts/asan.sh)
            try:
                _lib = ctypes.CDLL(override)
            except Exception:
                _lib = None
            return _lib
        try:
            if _needs_build():
                srcs = _sources()
                if not srcs:
                    return None
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-std=c++17", "-pthread", "-o", _SO] + srcs + ["-lz"]
                r = subprocess.run(cmd, capture_output=True, text=True)
                if r.returncode != 0:
                    import sys

                    sys.stderr.write("[W::native] build failed, using Python "
                                     "fallbacks: %s\n" % r.stderr[-400:])
                    return None
            _lib = ctypes.CDLL(_SO)
        except Exception:
            _lib = None
        return _lib
