"""On-demand build of the native host library (g++ -> .so, loaded via ctypes).

The reference ships its runtime as compiled Fortran/C++ built by CMake
(reference CMakeLists.txt); here the native surface is one translation unit,
so a direct g++ invocation cached by source hash keeps the build
dependency-free.  Failure to build is non-fatal: callers fall back to numpy.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "mmio.cpp")


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NTPOLY_TPU_CACHE",
        os.path.join(tempfile.gettempdir(), "ntpoly_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"libntxhost_{digest}.so")


def build(verbose: bool = False) -> str | None:
    """Compile mmio.cpp if not cached; returns the .so path or None."""
    out = _cache_path()
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if verbose:
            print(proc.stderr)
        return None
    os.replace(tmp, out)
    return out


def load_library() -> ctypes.CDLL | None:
    if os.environ.get("NTPOLY_TPU_NO_NATIVE"):
        return None
    path = build()
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None
